"""optimum-cli-export compatibility surface.

The reference's export tier (tests/optimum_cli_export.rs:76-176) loads a
user-exported ONNX model — whose graph emits a PRE-POOLED (B,H) sentence
embedding — registers it outside the built-in list, and embeds with a
caller-chosen pooling. The contract that makes those exports work is the
2-D pooling pass-through (src/pooling.rs:22): when the model output is
already pooled, the configured pooling strategy must be a no-op, so cls /
mean / last_token all yield the exported embedding unchanged.

Offline equivalents (no optimum-cli / network needed):
 * ``pool`` identity on 2-D input for every strategy;
 * two BYO "exported" registrations differing only in pooling produce
   bit-identical embeddings through the full encode→run→select→pool→l2n
   chain;
 * the Gemma-family stub (the registry's real pre-pooled export,
   output_key=sentence_embedding) runs end to end through ``embed_text``.
"""

from __future__ import annotations

import numpy as np
import pytest

from fastembed_rs_spark.models.registry import (
    POOL_CLS,
    POOL_LAST_TOKEN,
    POOL_MEAN,
    ModelSpec,
    register,
)
from fastembed_rs_spark.models.stub import StubTokenizer, build_stub_session
from fastembed_rs_spark.operators.embed import _encode, l2n, pool, select_output

DOCS = [
    "Hello, World!",
    "This is an example passage.",
    "fastembed-rs is licensed under Apache-2.0",
    "Some other short text here blah blah blah",
]


@pytest.fixture(autouse=True)
def _registry_isolation():
    """BYO registrations below must not leak into registry-inventory tests."""
    from fastembed_rs_spark.models import registry as R

    snap = (dict(R._REGISTRY), dict(R._ALIASES), dict(R._KIND_ALIASES))
    yield
    R._REGISTRY.clear(); R._REGISTRY.update(snap[0])
    R._ALIASES.clear(); R._ALIASES.update(snap[1])
    R._KIND_ALIASES.clear(); R._KIND_ALIASES.update(snap[2])


@pytest.mark.parametrize("strategy", [POOL_CLS, POOL_MEAN, POOL_LAST_TOKEN])
def test_pool_is_identity_on_2d(strategy):
    h = np.arange(12, dtype=np.float32).reshape(3, 4)
    mask = np.ones((3, 7), dtype=np.int64)  # shape irrelevant for 2-D input
    out = pool(h, mask, strategy)
    assert out is h  # pass-through, not a copy (src/pooling.rs:22)


def _embed_numpy(spec: ModelSpec) -> np.ndarray:
    tokenizer = StubTokenizer(spec.vocab_size, spec.max_length)
    session = build_stub_session(spec)
    ids, mask = _encode(tokenizer, DOCS)
    outputs = dict(zip(session.output_names, [session.run(None, {
        "input_ids": ids, "attention_mask": mask,
    })[n] for n in session.output_names]))
    hidden = select_output(outputs, spec.output_key)
    return l2n(pool(hidden, mask, spec.pooling)).astype(np.float32)


def test_exported_model_pooling_is_moot():
    """Two BYO registrations of the same pre-pooled export, one configured
    cls and one mean, embed identically — the optimum_cli_export.rs
    premise."""
    base = dict(
        dim=48, kind="dense", vocab_size=1000,
        model_code="local/exported-compat-test",
        model_file="model.onnx", output_key="sentence_embedding",
    )
    cls_spec = register(ModelSpec(name="__ExportedCls", pooling=POOL_CLS, **base))
    mean_spec = register(ModelSpec(name="__ExportedMean", pooling=POOL_MEAN, **base))
    a, b = _embed_numpy(cls_spec), _embed_numpy(mean_spec)
    assert a.shape == (len(DOCS), 48)
    np.testing.assert_array_equal(a, b)
    # embeddings are unit-norm and content-dependent
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)
    assert not np.allclose(a[0], a[1])


def test_gemma_prepooled_stub_through_spark(spark):
    """The registry's real pre-pooled export (Gemma family) end to end
    through embed_text: right dim, deterministic, 2-D path exercised."""
    from pyspark.sql import functions as F

    from fastembed_rs_spark.operators.embed import embed_text

    df = spark.createDataFrame([(i, d) for i, d in enumerate(DOCS)], ["doc_id", "text"])
    out = embed_text(df, "text", model="EmbeddingGemma300M")
    rows = {r["doc_id"]: r["embedding"] for r in out.collect()}
    assert all(len(v) == 768 for v in rows.values())
    again = {
        r["doc_id"]: r["embedding"]
        for r in embed_text(df.repartition(3), "text", model="EmbeddingGemma300M")
        .collect()
    }
    for k in rows:
        np.testing.assert_array_equal(rows[k], again[k])
    # distinct texts embed distinctly
    assert not np.allclose(rows[0], rows[1])
    norms = out.select(
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x).alias("n2")
    ).collect()
    for r in norms:
        assert abs(r["n2"] - 1.0) < 1e-4
