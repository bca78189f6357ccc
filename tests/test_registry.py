"""Registry parity with the reference model tables."""

from __future__ import annotations

import pytest

from fastembed_rs_spark.models.registry import (
    POOL_CLS,
    POOL_LAST_TOKEN,
    POOL_MEAN,
    QUANT_DYNAMIC,
    QUANT_STATIC,
    get_model_spec,
    list_models,
)


def test_dense_registry_size():
    # reference registers 46 ONNX text models (src/models/text_embedding.rs)
    # + 2 candle families; stubs add 4
    dense = [m for m in list_models("dense") if not m.name.startswith("stub-")]
    assert len(dense) == 48


def test_reference_defaults():
    # the reference's default model (src/models/text_embedding.rs:29-30)
    spec = get_model_spec("BGESmallENV15")
    assert spec.dim == 384 and spec.pooling == POOL_CLS

    assert get_model_spec("AllMiniLML6V2").pooling == POOL_MEAN
    assert get_model_spec("Qwen3Embedding06B").pooling == POOL_LAST_TOKEN


def test_quantization_modes():
    # impl.rs:233-283: MiniLM-Q dynamic, BGE-Q static, Gemma Q4 exempt
    assert get_model_spec("AllMiniLML6V2Q").quantization == QUANT_DYNAMIC
    assert get_model_spec("BGESmallENV15Q").quantization == QUANT_STATIC
    assert get_model_spec("EmbeddingGemma300MQ4").quantization == "none"


def test_output_key_overrides():
    # Gemma family selects by name (text_embedding.rs:423-443)
    assert get_model_spec("EmbeddingGemma300M").output_key == "sentence_embedding"
    assert get_model_spec("BGESmallENV15").output_key is None


def test_lookup_by_model_code_and_alias():
    assert get_model_spec("Qdrant/all-MiniLM-L6-v2-onnx").name == "AllMiniLML6V2"
    assert get_model_spec("BAAI/bge-small-en-v1.5").name == "BGESmallENV15"
    assert get_model_spec("prithivida/Splade_PP_en_v1").name == "SPLADEPPV1"


def test_bgem3_code_is_kind_scoped():
    # src/models/sparse.rs:31 registers the SPARSE model under the upstream
    # code "BAAI/bge-m3" — the same code the dense registry uses. The
    # reference resolves by-code within the family, so: bare lookup → dense
    # (first registration), kind="sparse" → the sparse head.
    assert get_model_spec("BAAI/bge-m3").name == "BGEM3"
    assert get_model_spec("BAAI/bge-m3", kind="sparse").name == "SparseBGEM3"
    assert get_model_spec("SparseBGEM3").model_code == "BAAI/bge-m3"
    # legacy repo-local alias keeps resolving
    assert get_model_spec("BAAI/bge-m3-sparse").name == "SparseBGEM3"
    # kind scoping is STRICT like the reference's per-family from_str:
    # resolving into a different family errors instead of silently
    # returning a wrong-kind spec (Bgem3Model::from_str("BAAI/bge-m3")
    # is "Unknown BGEM3 model" in the reference, never the dense entry)
    with pytest.raises(KeyError, match="unknown sparse model"):
        get_model_spec("BGEM3", kind="sparse")
    with pytest.raises(KeyError, match="unknown bgem3 model"):
        get_model_spec("BAAI/bge-m3", kind="bgem3")
    with pytest.raises(KeyError, match="unknown rerank model"):
        get_model_spec("SparseBGEM3", kind="rerank")
    # exact names and kind-matching aliases still resolve
    assert get_model_spec("SparseBGEM3", kind="sparse").name == "SparseBGEM3"
    assert get_model_spec("gpahal/bge-m3-onnx-int8", kind="bgem3").name == "Bgem3Joint"


def test_kind_inventories():
    assert len(list_models("image")) == 6   # 5 reference + stub
    assert len(list_models("rerank")) == 5  # 4 reference + stub
    assert len(list_models("sparse")) == 4  # 2 reference + 2 stubs (splade/bgem3)
    assert len(list_models("bgem3")) == 2   # 1 reference + stub


def test_unknown_model_error_lists_known():
    with pytest.raises(KeyError, match="unknown model"):
        get_model_spec("not-a-model")


def test_embed_operators_fail_fast_on_wrong_family():
    """ADVICE r4: embed_bgem3 / embed_image / embed_qwen_vl resolve
    kind-scoped (like the reference's per-family from_str), so a
    wrong-family name is a driver-side KeyError naming the family —
    never an executor-side KeyError inside the UDF."""
    import pytest

    from fastembed_rs_spark.operators.embed import (
        embed_bgem3, embed_image, embed_qwen_vl, embed_text,
    )

    class _NeverDF:  # resolution must fail before any DataFrame use
        def __getattr__(self, name):
            raise AssertionError("model resolution should fail first")

    df = _NeverDF()
    with pytest.raises(KeyError, match="bgem3"):
        embed_bgem3(df, model="BAAI/bge-m3")  # global alias → dense entry
    with pytest.raises(KeyError, match="image"):
        embed_image(df, model="stub-dense-mean")
    with pytest.raises(KeyError, match="vl"):
        embed_qwen_vl(df, model="stub-image")
    with pytest.raises(KeyError, match="dense"):
        embed_text(df, model="stub-rerank")
