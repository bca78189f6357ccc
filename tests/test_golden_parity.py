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


# ---------------------------------------------------------------------------
# BGE-M3 joint + sparse golden parity (artifact-gated like the dense tier)
# Transcribed verbatim from /root/reference/tests/bgem3.rs:18-160 (joint,
# model BGEM3Q) and /root/reference/tests/bgem3_comparison.rs:12-50 (sparse,
# FlagEmbedding ground truth).
# ---------------------------------------------------------------------------

BGEM3_DOCS = [
    "fastembed-rs is licensed under Apache  2.0",
    "Superman is the best superhero of all time",
]

BGEM3_DENSE_PREFIX = [  # first 5 dims per doc (bgem3.rs:30-43)
    [-0.018156249076128006, -0.017044715583324432, 0.000982290250249207,
     0.0583689846098423, -0.01868816465139389],
    [-0.011247089132666588, 0.031949788331985474, -0.02800164744257927,
     -0.009801163338124752, -0.014338407665491104],
]

BGEM3_JOINT_SPARSE = [  # (bgem3.rs:55-84)
    {9: 0.04261402785778046, 71: 0.09023943543434143, 83: 0.08396764099597931,
     195: 0.16971012949943542, 1379: 0.10828342288732529,
     1430: 0.13637235760688782, 4271: 0.16798287630081177,
     4295: 0.2422717958688736, 9795: 0.1467694491147995,
     13482: 0.277856707572937, 16655: 0.22456319630146027,
     86872: 0.18163326382637024},
    {70: 0.15444988012313843, 83: 0.1826561987400055, 111: 0.10440966486930847,
     756: 0.1211288720369339, 1601: 0.16578607261180878,
     1733: 0.1628011018037796, 2965: 0.24118179082870483,
     90865: 0.23467521369457245, 183497: 0.30678409337997437},
]

BGEM3_COLBERT_LENS = [13, 10]  # token vectors per doc (bgem3.rs:125-126)
BGEM3_COLBERT_PREFIX = [  # first 3 dims of the first two token vectors per doc
    [[-0.02416383847594261, -0.0405534990131855, -0.0560004822909832],
     [-0.01845022290945053, -0.042646653950214386, -0.033078353852033615]],
    [[-0.013565482571721077, -0.04746083542704582, -0.027890587225556374],
     [0.004542498383671045, -0.05220562964677811, -0.045384544879198074]],
]

SPARSE_BGEM3_EXPECTED = [  # standalone sparse model (bgem3_comparison.rs:21-50)
    {4271: 0.17456965, 195: 0.16260204, 13482: 0.28582922, 9: 0.04153823,
     4295: 0.24856839, 83: 0.07778944, 86872: 0.17708361, 71: 0.08359783,
     1379: 0.10846229, 9795: 0.1580239, 1430: 0.15291117, 16655: 0.223301},
    {183497: 0.32012847, 83: 0.19853045, 70: 0.16743071, 2965: 0.24451455,
     1601: 0.17550871, 90865: 0.25476876, 111: 0.11962792, 756: 0.13541803,
     1733: 0.18622744},
]

BGEM3_EPS = 1e-4  # reference tolerance (bgem3.rs:46 etc.)


def _bgem3_staged(name: str) -> bool:
    if not _have_runtime():
        return False
    spec = get_model_spec(name)
    from fastembed_rs_spark.models.runtime import cache_dir

    d = os.path.join(cache_dir(), spec.model_code.replace("/", "--"))
    ok = _staged(spec)
    if spec.kind == "sparse":
        ok = ok and os.path.exists(os.path.join(d, "sparse_linear.safetensors"))
    return ok


@pytest.mark.skipif(
    not _bgem3_staged("Bgem3Joint"),
    reason="needs onnxruntime + staged Bgem3Joint artifacts",
)
def test_bgem3_joint_golden(spark):
    from fastembed_rs_spark.operators.embed import embed_bgem3

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(BGEM3_DOCS)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r["bgem3"] for r in embed_bgem3(df, "text", model="Bgem3Joint").collect()}
    for i in range(2):
        out = rows[i]
        assert len(out.dense) == 1024
        for j, v in enumerate(BGEM3_DENSE_PREFIX[i]):
            assert abs(out.dense[j] - v) < BGEM3_EPS, (i, j)
        got = dict(zip(out.sparse.indices, out.sparse.values))
        assert len(got) == len(BGEM3_JOINT_SPARSE[i])
        for idx, v in BGEM3_JOINT_SPARSE[i].items():
            assert abs(got[idx] - v) < BGEM3_EPS, (i, idx)
        assert len(out.colbert) == BGEM3_COLBERT_LENS[i]
        for tok in range(2):
            for j, v in enumerate(BGEM3_COLBERT_PREFIX[i][tok]):
                assert abs(out.colbert[tok][j] - v) < BGEM3_EPS, (i, tok, j)


@pytest.mark.skipif(
    not _bgem3_staged("SparseBGEM3"),
    reason="needs onnxruntime + staged SparseBGEM3 artifacts (incl. sparse head)",
)
def test_bgem3_sparse_golden(spark):
    from fastembed_rs_spark.operators.embed import embed_sparse

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(BGEM3_DOCS)], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r["sparse_embedding"]
        for r in embed_sparse(df, "text", model="SparseBGEM3").collect()
    }
    for i in range(2):
        got = dict(zip(rows[i].indices, rows[i].values))
        assert len(got) == len(SPARSE_BGEM3_EXPECTED[i])
        for idx, v in SPARSE_BGEM3_EXPECTED[i].items():
            assert abs(got[idx] - v) < BGEM3_EPS, (i, idx)


# ---------------------------------------------------------------------------
# Python-counterpart element baselines + rerank semantics (artifact-gated)
# Transcribed from tests/text-embeddings.rs:297-601. The input text lives in
# tests/assets/sample_text.txt (fixture data copied from the reference's
# public test assets, with citation).
# ---------------------------------------------------------------------------

def _sample_text() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "assets", "sample_text.txt")) as f:
        return f.read()


#: first 10 embedding dims of sample_text at max_length=384, generated by the
#: python SentenceTransformer counterparts (text-embeddings.rs:536-553, 578-590)
PY_BASELINES = {
    "BGESmallENV15": (1e-3, [
        4.2081937e-2, -2.7481332e-2, 6.7428105e-2, 2.2827905e-2, 4.257192e-2,
        -4.1639835e-2, 6.8148074e-6, -9.643933e-3, -3.475583e-3, 6.606272e-2,
    ]),
    "AllMiniLML6V2": (1e-6, [
        3.5105176e-2, 1.046043e-2, 3.7679985e-2, 7.0736334e-2, 9.097775e-2,
        -2.5077147e-2, -2.214382e-2, -1.0164359e-2, 4.6601273e-2, 7.431366e-2,
    ]),
}


@pytest.mark.parametrize("model", sorted(PY_BASELINES))
def test_python_counterpart_elements(spark, model):
    if model not in STAGED:
        pytest.skip(f"{model} not staged")
    from fastembed_rs_spark.api import InitOptions, TextEmbedding

    tol, baseline = PY_BASELINES[model]
    h = TextEmbedding.try_new(InitOptions.new(model).with_max_length(384))
    emb = h.embed_list(spark, [_sample_text()])[0]
    for i, expected in enumerate(baseline):
        assert abs(emb[i] - expected) < tol, (model, i)


def _staged_rerankers() -> list[str]:
    if not _have_runtime():
        return []
    return [
        s.name for s in list_models("rerank")
        if s.model_code and _staged(s) and not s.name.startswith("stub")
    ]


@pytest.mark.parametrize("model", _staged_rerankers() or ["__none__"])
def test_rerank_semantics_panda(spark, model):
    if model == "__none__":
        pytest.skip("no staged reranker artifacts")
    from fastembed_rs_spark.api import TextRerank

    docs = [
        "hi",
        "The giant panda, sometimes called a panda bear or simply panda, "
        "is a bear species endemic to China.",
        "panda is an animal",
        "i dont know",
        "kind of mammal",
    ]
    res = TextRerank.try_new(model).rerank_list(spark, "what is panda?", docs)
    assert len(res) == len(docs)
    top2 = {res[0]["document"], res[1]["document"]}
    assert top2 == {docs[1], docs[2]}, top2  # text-embeddings.rs:323-337


@needs_artifacts
@pytest.mark.parametrize("model", STAGED[:1] or ["__none__"])
def test_real_path_deterministic_across_calls(spark, model):
    # issue-171 regression in the reference (text-embeddings.rs:604-622):
    # repeated embeds of the same input must be bit-identical
    first = _embed_docs(spark, model, batch_size=256)
    for _ in range(3):
        again = _embed_docs(spark, model, batch_size=256)
        assert again == first
