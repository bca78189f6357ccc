"""The public API facade (fastembed_rs_spark.api) mirrors the reference's
handle classes: names, init options, call shapes, and result semantics
(src/lib.rs:2-12, src/init.rs:9-80). Each facade method must produce
bit-identical results to the underlying operator it delegates to."""

from __future__ import annotations

import numpy as np
import pytest

from fastembed_rs_spark import (
    Bgem3Embedding,
    ImageEmbedding,
    InitOptions,
    SparseTextEmbedding,
    TextEmbedding,
    TextRerank,
)

DOCS = ["hello world", "spark engine", "fast embeddings", "hello spark"]


@pytest.fixture(autouse=True)
def _registry_isolation():
    """Handles may register derived/BYO specs; restore the global registry
    so registry-inventory tests in other modules see the pristine state."""
    from fastembed_rs_spark.models import registry as R

    snap = (dict(R._REGISTRY), dict(R._ALIASES), dict(R._KIND_ALIASES))
    yield
    R._REGISTRY.clear(); R._REGISTRY.update(snap[0])
    R._ALIASES.clear(); R._ALIASES.update(snap[1])
    R._KIND_ALIASES.clear(); R._KIND_ALIASES.update(snap[2])


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS)], ["doc_id", "text"]
    )


def test_init_options_builder_mirrors_reference():
    o = InitOptions.new("BGESmallENV15").with_max_length(128).with_intra_threads(2)
    assert o.model_name == "BGESmallENV15"
    assert o.max_length == 128 and o.intra_threads == 2
    o2 = InitOptions.new("X").with_execution_providers(["CPUExecutionProvider"])
    assert o2.execution_providers == ["CPUExecutionProvider"]


def test_init_options_are_per_handle_not_env():
    """r6 (VERDICT r5 wart #1): InitOptions knobs are per-handle
    ``SessionOptions`` shipped in the UDF closure — constructing a handle
    must NOT touch the process environment, and two handles with
    different options must map to DIFFERENT session cache keys (no more
    retargeting every earlier handle's future sessions)."""
    import os

    keys = (
        "FASTEMBED_CACHE_DIR",
        "FASTEMBED_INTRA_THREADS",
        "FASTEMBED_EXECUTION_PROVIDERS",
    )
    before = {k: os.environ.get(k) for k in keys}
    h1 = TextEmbedding.try_new(
        InitOptions.new("stub-dense-mean")
        .with_cache_dir("/tmp/fe-cache")
        .with_intra_threads(2)
        .with_execution_providers(["CUDAExecutionProvider", "CPUExecutionProvider"])
    )
    h2 = TextEmbedding.try_new(
        InitOptions.new("stub-dense-mean").with_cache_dir("/tmp/other-cache")
    )
    # environment untouched by handle construction
    assert {k: os.environ.get(k) for k in keys} == before
    # the options landed on the handle...
    assert h1.session_options.cache_dir == "/tmp/fe-cache"
    assert h1.session_options.intra_threads == 2
    assert h1.session_options.execution_providers == (
        "CUDAExecutionProvider", "CPUExecutionProvider",
    )
    # ...and distinct options resolve to distinct session cache keys
    assert h1.session_options.key() != h2.session_options.key()


def test_text_embedding_matches_operator(spark, docs_df):
    from fastembed_rs_spark.operators.embed import embed_text

    h = TextEmbedding.try_new("stub-dense-mean")
    got = {r["doc_id"]: r["embedding"] for r in h.embed(docs_df).collect()}
    want = {
        r["doc_id"]: r["embedding"]
        for r in embed_text(docs_df, "text", model="stub-dense-mean").collect()
    }
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_list_methods_accept_empty_input(spark):
    # reference: embed(vec![]) -> Ok(vec![]) — no schema-inference crash
    assert TextEmbedding.try_new("stub-dense-mean").embed_list(spark, []) == []
    assert SparseTextEmbedding.try_new("stub-sparse").embed_list(spark, []) == []
    assert Bgem3Embedding.try_new("stub-bgem3").embed_list(spark, []) == []
    assert TextRerank.try_new("stub-rerank").rerank_list(spark, "q", []) == []


def test_embed_list_preserves_order(spark):
    h = TextEmbedding.try_new("stub-dense-mean")
    out = h.embed_list(spark, DOCS)
    assert len(out) == len(DOCS)
    # same text → same embedding regardless of position; distinct → distinct
    again = h.embed_list(spark, list(reversed(DOCS)))
    np.testing.assert_array_equal(out[0], again[-1])
    assert not np.allclose(out[0], out[1])


def test_max_length_override_derives_spec(spark):
    h = TextEmbedding.try_new(InitOptions.new("stub-dense-mean").with_max_length(16))
    assert h.spec.max_length == 16
    assert h.spec.name.endswith("#len16")
    # the derived spec truncates: long doc == its 16-token prefix
    long_doc = " ".join(["tok"] * 200) + " tail-marker-short"
    prefix_only = " ".join(["tok"] * 200)
    a = h.embed_list(spark, [long_doc])
    b = h.embed_list(spark, [prefix_only])
    np.testing.assert_array_equal(a[0], b[0])
    # while the default-length handle distinguishes them
    full = TextEmbedding.try_new("stub-dense-mean")
    c = full.embed_list(spark, [long_doc])
    d = full.embed_list(spark, [prefix_only])
    assert not np.allclose(c[0], d[0])


def test_sparse_and_bgem3_shapes(spark, docs_df):
    s = SparseTextEmbedding.try_new("stub-sparse").embed(docs_df).collect()
    for r in s:
        se = r["sparse_embedding"]
        assert list(se.indices) == sorted(se.indices)
        assert all(v > 0 for v in se.values)
    j = Bgem3Embedding.try_new("stub-bgem3").embed(docs_df).collect()
    for r in j:
        assert r["bgem3"].dense is not None and r["bgem3"].colbert is not None


def test_sparse_and_bgem3_embed_list(spark):
    s = SparseTextEmbedding.try_new("stub-sparse").embed_list(spark, DOCS[:2])
    assert len(s) == 2 and all(isinstance(m, dict) and m for m in s)
    assert all(v > 0 for m in s for v in m.values())
    j = Bgem3Embedding.try_new("stub-bgem3").embed_list(spark, DOCS[:2])
    assert len(j) == 2
    assert set(j[0]) == {"dense", "sparse", "colbert"}
    assert len(j[0]["dense"]) == len(j[1]["dense"])
    # order preserved: reversing inputs reverses outputs
    rev = Bgem3Embedding.try_new("stub-bgem3").embed_list(spark, DOCS[:2][::-1])
    assert rev[1]["dense"] == j[0]["dense"]


def test_sparse_resolves_shared_bgem3_code():
    # SparseTextEmbedding("BAAI/bge-m3") must find the SPARSE entry even
    # though the dense registry shares the code (src/models/sparse.rs:31)
    h = SparseTextEmbedding.try_new("BAAI/bge-m3")
    assert h.spec.name == "SparseBGEM3"


def test_image_embedding_runs(spark):
    df = spark.createDataFrame(
        [(i, bytes([i] * 64)) for i in range(4)], ["doc_id", "content"]
    )
    out = ImageEmbedding.try_new("stub-image").embed(df).collect()
    assert len(out) == 4
    dims = {len(r["embedding"]) for r in out}
    assert len(dims) == 1


def test_rerank_list_matches_reference_shape(spark):
    h = TextRerank.try_new("stub-rerank")
    docs = ["the cat sat", "dogs bark loudly", "cats purr and sit"]
    res = h.rerank_list(spark, "cat sat", docs, return_documents=True)
    assert [set(r) for r in res] == [{"index", "score", "document"}] * 3
    assert [r["score"] for r in res] == sorted((r["score"] for r in res), reverse=True)
    assert {r["index"] for r in res} == {0, 1, 2}
    res2 = h.rerank_list(spark, "cat sat", docs, return_documents=False)
    assert all("document" not in r for r in res2)
    assert [r["index"] for r in res2] == [r["index"] for r in res]


def test_quantization_and_pooling_introspection():
    assert TextEmbedding.get_quantization_mode("AllMiniLML6V2Q") == "dynamic"
    assert TextEmbedding.get_quantization_mode("BGESmallENV15") == "none"
    assert TextEmbedding.get_default_pooling_method("BGESmallENV15") == "cls"


def test_list_supported_models_covers_registry():
    assert {s.name for s in TextEmbedding.list_supported_models()} >= {
        "BGESmallENV15", "AllMiniLML6V2", "BGEM3",
    }
    assert any(s.name == "SparseBGEM3" for s in SparseTextEmbedding.list_supported_models())
    assert TextRerank.get_model_info("stub-rerank").kind == "rerank"


def test_embed_stream_delegates(spark, tmp_path):
    import pyspark.sql.types as T

    src_dir = str(tmp_path / "stream_src")
    spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS)], ["doc_id", "text"]
    ).write.parquet(src_dir)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType()),
    ])
    stream = spark.readStream.schema(schema).parquet(src_dir)
    out = TextEmbedding.try_new("stub-dense-mean").embed_stream(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("api_embed_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM api_embed_stream").collect()
    q.stop()
    # streaming output == batch output, row for row
    batch = {
        r["doc_id"]: r["embedding"]
        for r in TextEmbedding.try_new("stub-dense-mean")
        .embed(spark.read.parquet(src_dir)).collect()
    }
    assert len(rows) == len(DOCS)
    for r in rows:
        np.testing.assert_array_equal(r["embedding"], batch[r["doc_id"]])


def test_user_defined_registration(spark):
    h = TextEmbedding.try_new_from_user_defined(
        "local/my-export", dim=32, pooling="cls", output_key="sentence_embedding"
    )
    out = h.embed_list(spark, ["a doc", "another doc"])
    assert len(out[0]) == 32
    assert not np.allclose(out[0], out[1])


def test_intra_threads_zero_rejected():
    with pytest.raises(ValueError, match="intra_threads"):
        TextEmbedding.try_new(
            InitOptions(model_name="stub-dense-mean", intra_threads=0)
        )


def test_env_still_serves_as_default(monkeypatch):
    """Unset SessionOptions fields resolve from the environment at
    session-build time; explicit fields override it without writing it."""
    import os

    monkeypatch.setenv("FASTEMBED_INTRA_THREADS", "2")
    h_env = TextEmbedding.try_new("stub-dense-mean")
    h_own = TextEmbedding.try_new(
        InitOptions(model_name="stub-dense-mean", intra_threads=4)
    )
    assert h_env.session_options.resolved_intra() == 2
    assert h_own.session_options.resolved_intra() == 4
    assert os.environ["FASTEMBED_INTRA_THREADS"] == "2"  # untouched
