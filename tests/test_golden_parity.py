"""Artifact-gated golden parity for the REAL inference path.

The container CI has no onnxruntime/tokenizers and no model artifacts, so
every test here auto-skips. Once ``tools/stage_model.py`` has filled
``FASTEMBED_CACHE_DIR`` on a machine with the runtime installed, this suite
pins the real-ONNX ``embed_text`` path against the reference's golden
checksums:

* golden sums — per-model expected Σ(embedding) for 4 fixed documents,
  tolerance 1e-2, transcribed from the reference's verify_embeddings table
  (/root/reference/tests/text-embeddings.rs:16-111)
* batch invariance — embed(batch=default) ≡ embed(batch=3)
  (text-embeddings.rs:494-523)
* dimension + L2 norm invariants for every staged model

Run: ``FASTEMBED_CACHE_DIR=/path python -m pytest tests/test_golden_parity.py -v``
"""

from __future__ import annotations

import math
import os

import pytest

from fastembed_rs_spark.models.registry import QUANT_DYNAMIC, get_model_spec, list_models


def _have_runtime() -> bool:
    try:
        import onnxruntime  # noqa: F401
        import tokenizers  # noqa: F401
        return True
    except ImportError:
        return False


def _staged(spec) -> bool:
    from fastembed_rs_spark.models.runtime import cache_dir

    d = os.path.join(cache_dir(), spec.model_code.replace("/", "--"))
    return (
        os.path.exists(os.path.join(d, spec.model_file))
        and os.path.exists(os.path.join(d, "tokenizer.json"))
    )


def staged_dense_models() -> list[str]:
    if not _have_runtime():
        return []
    return [
        s.name
        for s in list_models("dense")
        if s.model_code and s.backend == "onnx" and _staged(s)
    ]


STAGED = staged_dense_models()

#: applied to the real-inference tests only — the staging-tool test below
#: runs everywhere
needs_artifacts = pytest.mark.skipif(
    not STAGED,
    reason="real-model golden parity needs onnxruntime+tokenizers and artifacts "
    "staged via tools/stage_model.py (FASTEMBED_CACHE_DIR)",
)

# The reference's fixed golden-test corpus (tests/text-embeddings.rs:126-131).
DOCS = [
    "Hello, World!",
    "This is an example passage.",
    "fastembed-rs is licensed under Apache-2.0",
    "Some other short text here blah blah blah",
]

EPS = 1e-2  # reference tolerance (text-embeddings.rs:16)

# Expected Σ over all dims of each document's embedding, per model —
# transcribed verbatim from the reference's verify_embeddings table
# (tests/text-embeddings.rs:34-88; commit-pinned golden values).
GOLDEN_SUMS: dict[str, list[float]] = {
    "AllMiniLML12V2": [-0.12147753, 0.30144796, -0.06882502, -0.6303331],
    "AllMiniLML12V2Q": [-0.07808663, 0.27919534, -0.0770612, -0.75660324],
    "AllMiniLML6V2": [0.59605527, 0.36542925, -0.16450031, -0.40903988],
    "AllMiniLML6V2Q": [0.5677276, 0.40180072, -0.15454668, -0.4672576],
    "AllMpnetBaseV2": [-0.21253541, -0.050802127, 0.14072442, -0.2908188],
    "BGEBaseENV15": [-0.51290065, -0.4844747, -0.53036124, -0.5337459],
    "BGEBaseENV15Q": [-0.5130697, -0.48461288, -0.53067875, -0.5337806],
    "BGELargeENV15": [-0.19347441, -0.28394595, -0.1549195, -0.22201893],
    "BGELargeENV15Q": [-0.19366685, -0.2842059, -0.15471499, -0.22216901],
    "BGESmallENV15": [0.09881669, 0.15151203, 0.12057499, 0.13641948],
    "BGESmallENV15Q": [0.09881936, 0.15154803, 0.12057378, 0.13639033],
    "BGESmallZHV15": [-1.1194772, -1.0928253, -1.0325904, -1.0050416],
    "BGELargeZHV15": [-0.62066114, -0.76666945, -0.7013123, -0.86202735],
    "BGEM3": [-0.7138151, -0.69116485, -0.7932898, -0.6727733],
    "GTEBaseENV15": [-1.6900877, -1.7148916, -1.7333382, -1.5121834],
    "GTEBaseENV15Q": [-1.7032102, -1.7076654, -1.729326, -1.5317788],
    "GTELargeENV15": [-1.6457459, -1.6582386, -1.6809471, -1.6070237],
    "GTELargeENV15Q": [-1.6044945, -1.6469251, -1.6828246, -1.6265479],
    "ModernBertEmbedLarge": [0.24799639, 0.32174295, 0.17255782, 0.32919246],
    "MultilingualE5Base": [-0.057211064, -0.14287914, -0.071678676, -0.17549144],
    "MultilingualE5Large": [-0.7473163, -0.76040405, -0.7537941, -0.72920954],
    "MultilingualE5Small": [-0.2640718, -0.13929011, -0.08091972, -0.12388548],
    "MxbaiEmbedLargeV1": [-0.2032495, -0.29803938, -0.15803768, -0.23155808],
    "MxbaiEmbedLargeV1Q": [-0.1811538, -0.2884392, -0.1636593, -0.21548103],
    "NomicEmbedTextV1": [0.13788113, 0.10750078, 0.050809078, 0.09284662],
    "NomicEmbedTextV15": [0.1932303, 0.13795732, 0.14700879, 0.14940643],
    "NomicEmbedTextV15Q": [0.20999804, 0.17161125, 0.15987156, 0.19436662],
    "ParaphraseMLMiniLML12V2": [-0.07795018, -0.059113946, -0.043668486, -0.1880083],
    "ParaphraseMLMiniLML12V2Q": [-0.07749095, -0.058981877, -0.043487836, -0.18775631],
    "ParaphraseMLMpnetBaseV2": [0.39132136, 0.49490625, 0.65497226, 0.34237382],
    "ClipVitB32": [0.7057363, 1.3549932, 0.46823958, 0.52351093],
    "JinaEmbeddingsV2BaseCode": [-0.31383067, -0.3758629, -0.24878195, -0.35373706],
    "JinaEmbeddingsV2BaseEN": [-0.055866606, -0.033922599, 0.012131551, -0.0132129812],
    "EmbeddingGemma300M": [0.22703816, 0.6947083, 0.07579082, 1.6958784],
    "EmbeddingGemma300MQ4": [0.3110208, 0.6683019, 0.38347214, 1.787025],
    "EmbeddingGemma300MQ": [0.11791767, 0.34993136, -0.018153993, 1.4971508],
    "SnowflakeArcticEmbedXS": [0.4418098, 0.46424747, 0.37932625, 0.44663674],
    "SnowflakeArcticEmbedXSQ": [0.45034444, 0.46853474, 0.38483432, 0.44833523],
    "SnowflakeArcticEmbedS": [-0.64302516, -0.63146704, -0.57860875, -0.5829098],
    "SnowflakeArcticEmbedSQ": [-0.63687235, -0.6296427, -0.6070188, -0.57358015],
    "SnowflakeArcticEmbedM": [-0.16999032, -0.109130904, -0.016444799, -0.108033374],
    "SnowflakeArcticEmbedMQ": [-0.15008105, -0.11513549, 0.00008662231, -0.08609233],
    "SnowflakeArcticEmbedMLong": [0.20396729, 0.18245143, 0.13489585, 0.15486401],
    "SnowflakeArcticEmbedMLongQ": [0.20531628, 0.18564843, 0.14221531, 0.16035447],
    "SnowflakeArcticEmbedL": [0.4049112, 0.42825335, 0.46401042, 0.4064963],
    "SnowflakeArcticEmbedLQ": [0.40164998, 0.4278314, 0.4612437, 0.40060186],
}


def _embed_docs(spark, model: str, batch_size: int = 256):
    """DOCS through the full Spark embed_text path → {doc_idx: [floats]}."""
    from pyspark.sql import functions as F

    from fastembed_rs_spark.operators.embed import embed_text

    spec = get_model_spec(model)
    df = spark.createDataFrame(list(enumerate(DOCS)), ["i", "text"])
    if spec.quantization == QUANT_DYNAMIC:
        df = df.coalesce(1)  # single calibration batch (impl.rs:330-349)
        batch_size = max(batch_size, len(DOCS))
    out = embed_text(df, "text", model=model, batch_size=batch_size)
    return {r["i"]: list(r["embedding"]) for r in out.orderBy(F.asc("i")).collect()}


@needs_artifacts
@pytest.mark.parametrize("model", STAGED or ["__none__"])
def test_golden_checksums(spark, model):
    spec = get_model_spec(model)
    embs = _embed_docs(spark, model)
    assert len(embs) == len(DOCS)
    for i in range(len(DOCS)):
        assert len(embs[i]) == spec.dim, f"dim mismatch for {model} doc {i}"
        norm = math.sqrt(sum(x * x for x in embs[i]))
        assert norm == pytest.approx(1.0, abs=1e-3), f"norm for {model} doc {i}"
    if model not in GOLDEN_SUMS:
        pytest.skip(f"{model}: staged but no golden row in the reference table")
    for i, expected in enumerate(GOLDEN_SUMS[model]):
        got = sum(embs[i])
        assert abs(got - expected) <= EPS, (
            f"{model} doc {i}: sum {got} != {expected} (reference golden)"
        )


@needs_artifacts
@pytest.mark.parametrize("model", STAGED[:1] or ["__none__"])
def test_batch_size_does_not_change_output(spark, model):
    # reference: embed(batch=None) == embed(batch=3) (text-embeddings.rs:494-523)
    spec = get_model_spec(model)
    if spec.quantization == QUANT_DYNAMIC:
        pytest.skip("dynamic quantization is calibration-batch dependent by design")
    a = _embed_docs(spark, model, batch_size=256)
    b = _embed_docs(spark, model, batch_size=3)
    for i in a:
        assert a[i] == pytest.approx(b[i], abs=1e-5), f"doc {i} differs across batch sizes"


def test_stage_model_from_dir(tmp_path, monkeypatch):
    """The air-gapped staging path (--from-dir) fills the cache layout
    runtime.py probes — exercised without network or onnxruntime."""
    import importlib

    monkeypatch.setenv("FASTEMBED_CACHE_DIR", str(tmp_path / "cache"))
    stage_model = importlib.import_module("tools.stage_model")

    spec = get_model_spec("AllMiniLML6V2")
    src = tmp_path / "src"
    (src / os.path.dirname(spec.model_file)).mkdir(parents=True, exist_ok=True)
    (src / spec.model_file).write_bytes(b"fake-onnx")
    (src / "tokenizer.json").write_text("{}")

    assert not stage_model.is_staged(spec)
    rc = stage_model.stage("AllMiniLML6V2", from_dir=str(src), force=False)
    assert rc == 0
    assert stage_model.is_staged(spec)
    d = stage_model.model_dir(spec)
    assert open(os.path.join(d, spec.model_file), "rb").read() == b"fake-onnx"
    # idempotent re-run
    assert stage_model.stage("AllMiniLML6V2", from_dir=str(src), force=False) == 0
    # missing required artifacts → non-zero
    empty = tmp_path / "empty"
    empty.mkdir()
    assert stage_model.stage("BGESmallENV15", from_dir=str(empty), force=False) == 1
