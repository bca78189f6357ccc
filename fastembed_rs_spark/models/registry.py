"""Model registry — the Spark translation of the reference's ``ModelInfo``
tables (src/models/model_info.rs:6-14; text src/models/text_embedding.rs:106-575;
sparse src/models/sparse.rs; image src/models/image_embedding.rs; rerank
src/models/reranking.rs), with the reference's per-model pooling defaults
(src/text_embedding/impl.rs:158-218) and quantization modes
(src/text_embedding/impl.rs:233-283).

Each entry records everything an executor needs to build its local session:
artifact location (HF repo + file), output selection, pooling and
quantization mode. Real ONNX entries require ``onnxruntime``+``tokenizers``
at runtime (not present in CI — the ``stub-*`` models are deterministic
NumPy models with the same interface, used by tests; see
``fastembed_rs_spark.models.stub``).

Models are addressable by their reference enum name (``AllMiniLML6V2``) or
their HF model code (``Qdrant/all-MiniLM-L6-v2-onnx``) — mirroring the
reference's ``from_str`` by model_code (src/models/text_embedding.rs:585-592).
"""

from __future__ import annotations

from dataclasses import dataclass

# Pooling strategies (reference: src/pooling.rs; last-token: src/models/qwen3.rs:158-174)
POOL_CLS = "cls"
POOL_MEAN = "mean"
POOL_LAST_TOKEN = "last_token"

# Quantization modes (reference: src/models/quantization.rs:1-8)
QUANT_NONE = "none"
QUANT_STATIC = "static"
QUANT_DYNAMIC = "dynamic"  # carries the single-batch constraint (impl.rs:330-349)


@dataclass(frozen=True)
class ModelSpec:
    """Mirrors ModelInfo { model, dim, description, model_code, model_file,
    additional_files, output_key } plus the runtime knobs the reference keeps
    on the embedding handle (pooling, quantization, needs token_type_ids)."""

    name: str
    dim: int
    pooling: str = POOL_MEAN
    #: None → precedence order (src/text_embedding/output.rs:13-20);
    #: str → by-name; int → positional OutputKey::ByOrder
    #: (src/output/output_precedence.rs:11-16)
    output_key: str | int | None = None
    quantization: str = QUANT_NONE
    max_length: int = 512
    model_code: str = ""
    model_file: str = "model.onnx"
    description: str = ""
    additional_files: tuple[str, ...] = ()
    kind: str = "dense"  # dense | sparse | bgem3 | image | rerank
    vocab_size: int = 30000  # used by sparse heads / stub tokenizer
    #: sparse post-processing: "splade" (log1p∘relu of vocab logits,
    #: impl.rs:225-254) or "bgem3" (linear head on hidden states +
    #: max-by-token-id, impl.rs:256-304)
    sparse_method: str = "splade"
    backend: str = "onnx"  # onnx | candle (qwen3 / nomic-moe families)


_REGISTRY: dict[str, ModelSpec] = {}
_ALIASES: dict[str, str] = {}
# (kind, alias) -> name: the reference resolves codes WITHIN a model family
# (SparseTextEmbedding::try_from("BAAI/bge-m3") finds the sparse entry even
# though the dense registry carries the same code — src/models/sparse.rs:31
# vs src/models/text_embedding.rs BGEM3), so by-code lookup is kind-scoped
# when the caller knows the family.
_KIND_ALIASES: dict[tuple[str, str], str] = {}


def register(spec: ModelSpec, *aliases: str) -> ModelSpec:
    _REGISTRY[spec.name] = spec
    for a in (spec.model_code, *aliases):
        if a and a != spec.name:
            # first registration wins: several codes cover both a plain and a
            # quantized variant (differing only in model_file) — the reference
            # resolves by-code to the FIRST registry match (models/*.rs
            # from_str uses .find()), i.e. the non-quantized entry
            _ALIASES.setdefault(a, spec.name)
            _KIND_ALIASES.setdefault((spec.kind, a), spec.name)
    return spec


def get_model_spec(name: str, kind: str | None = None) -> ModelSpec:
    if kind is None:
        key = name if name in _REGISTRY else _ALIASES.get(name, name)
        try:
            return _REGISTRY[key]
        except KeyError:
            raise KeyError(
                f"unknown model {name!r}; known: {sorted(_REGISTRY)}"
            ) from None
    # kind-scoped resolution mirrors the reference's per-family from_str
    # (models/*.rs: resolve within the family, error on anything else —
    # e.g. Bgem3Model::from_str("BAAI/bge-m3") is "Unknown BGEM3 model",
    # never the dense entry). Precedence: family-scoped code alias, exact
    # registry name OF that kind, then a global alias that lands in the
    # kind; a resolution into a DIFFERENT kind is an error, not a silent
    # wrong-family handle.
    key = _KIND_ALIASES.get((kind, name))
    if key is None and name in _REGISTRY and _REGISTRY[name].kind == kind:
        key = name
    if key is None:
        cand = _ALIASES.get(name)
        if cand is not None and _REGISTRY[cand].kind == kind:
            key = cand
    if key is None:
        known = sorted(s.name for s in _REGISTRY.values() if s.kind == kind)
        raise KeyError(f"unknown {kind} model {name!r}; known {kind} models: {known}")
    return _REGISTRY[key]


def list_models(kind: str | None = None) -> list[ModelSpec]:
    specs = list(_REGISTRY.values())
    return [s for s in specs if kind is None or s.kind == kind]


# ---------------------------------------------------------------------------
# Dense text models — full parity with the reference registry
# (name, dim, pooling, quantization, model_code, model_file[, output_key])
# Rows transcribed from src/models/text_embedding.rs:106-553 (codes/dims),
# src/text_embedding/impl.rs:158-218 (pooling), :233-283 (quantization).
# ---------------------------------------------------------------------------
_TEXT_MODELS = [
    ("AllMiniLML6V2", 384, POOL_MEAN, QUANT_NONE, "Qdrant/all-MiniLM-L6-v2-onnx", "model.onnx", None),
    ("AllMiniLML6V2Q", 384, POOL_MEAN, QUANT_DYNAMIC, "Xenova/all-MiniLM-L6-v2", "onnx/model_quantized.onnx", None),
    ("AllMiniLML12V2", 384, POOL_MEAN, QUANT_NONE, "Xenova/all-MiniLM-L12-v2", "onnx/model.onnx", None),
    ("AllMiniLML12V2Q", 384, POOL_MEAN, QUANT_DYNAMIC, "Xenova/all-MiniLM-L12-v2", "onnx/model_quantized.onnx", None),
    ("AllMpnetBaseV2", 768, POOL_MEAN, QUANT_NONE, "Xenova/all-mpnet-base-v2", "onnx/model.onnx", None),
    ("BGEBaseENV15", 768, POOL_CLS, QUANT_NONE, "Xenova/bge-base-en-v1.5", "onnx/model.onnx", None),
    ("BGEBaseENV15Q", 768, POOL_CLS, QUANT_STATIC, "Qdrant/bge-base-en-v1.5-onnx-Q", "model_optimized.onnx", None),
    ("BGELargeENV15", 1024, POOL_CLS, QUANT_NONE, "Xenova/bge-large-en-v1.5", "onnx/model.onnx", None),
    ("BGELargeENV15Q", 1024, POOL_CLS, QUANT_STATIC, "Qdrant/bge-large-en-v1.5-onnx-Q", "model_optimized.onnx", None),
    ("BGESmallENV15", 384, POOL_CLS, QUANT_NONE, "Xenova/bge-small-en-v1.5", "onnx/model.onnx", None),
    ("BGESmallENV15Q", 384, POOL_CLS, QUANT_STATIC, "Qdrant/bge-small-en-v1.5-onnx-Q", "model_optimized.onnx", None),
    ("NomicEmbedTextV1", 768, POOL_MEAN, QUANT_NONE, "nomic-ai/nomic-embed-text-v1", "onnx/model.onnx", None),
    ("NomicEmbedTextV15", 768, POOL_MEAN, QUANT_NONE, "nomic-ai/nomic-embed-text-v1.5", "onnx/model.onnx", None),
    ("NomicEmbedTextV15Q", 768, POOL_MEAN, QUANT_DYNAMIC, "nomic-ai/nomic-embed-text-v1.5", "onnx/model_quantized.onnx", None),
    ("ParaphraseMLMiniLML12V2Q", 384, POOL_MEAN, QUANT_STATIC, "Qdrant/paraphrase-multilingual-MiniLM-L12-v2-onnx-Q", "model_optimized.onnx", None),
    ("ParaphraseMLMiniLML12V2", 384, POOL_MEAN, QUANT_NONE, "Xenova/paraphrase-multilingual-MiniLM-L12-v2", "onnx/model.onnx", None),
    ("ParaphraseMLMpnetBaseV2", 768, POOL_MEAN, QUANT_NONE, "Xenova/paraphrase-multilingual-mpnet-base-v2", "onnx/model.onnx", None),
    ("BGESmallZHV15", 512, POOL_CLS, QUANT_NONE, "Xenova/bge-small-zh-v1.5", "onnx/model.onnx", None),
    ("BGELargeZHV15", 1024, POOL_CLS, QUANT_NONE, "Xenova/bge-large-zh-v1.5", "onnx/model.onnx", None),
    ("BGEM3", 1024, POOL_CLS, QUANT_NONE, "BAAI/bge-m3", "onnx/model.onnx", None),
    ("ModernBertEmbedLarge", 1024, POOL_MEAN, QUANT_NONE, "lightonai/modernbert-embed-large", "onnx/model.onnx", None),
    ("MultilingualE5Small", 384, POOL_MEAN, QUANT_NONE, "intfloat/multilingual-e5-small", "onnx/model.onnx", None),
    ("MultilingualE5Base", 768, POOL_MEAN, QUANT_NONE, "intfloat/multilingual-e5-base", "onnx/model.onnx", None),
    ("MultilingualE5Large", 1024, POOL_MEAN, QUANT_NONE, "Qdrant/multilingual-e5-large-onnx", "model.onnx", None),
    ("MxbaiEmbedLargeV1", 1024, POOL_CLS, QUANT_NONE, "mixedbread-ai/mxbai-embed-large-v1", "onnx/model.onnx", None),
    ("MxbaiEmbedLargeV1Q", 1024, POOL_CLS, QUANT_DYNAMIC, "mixedbread-ai/mxbai-embed-large-v1", "onnx/model_quantized.onnx", None),
    ("GTEBaseENV15", 768, POOL_CLS, QUANT_NONE, "Alibaba-NLP/gte-base-en-v1.5", "onnx/model.onnx", None),
    ("GTEBaseENV15Q", 768, POOL_CLS, QUANT_DYNAMIC, "Alibaba-NLP/gte-base-en-v1.5", "onnx/model_quantized.onnx", None),
    ("GTELargeENV15", 1024, POOL_CLS, QUANT_NONE, "Alibaba-NLP/gte-large-en-v1.5", "onnx/model.onnx", None),
    ("GTELargeENV15Q", 1024, POOL_CLS, QUANT_DYNAMIC, "Alibaba-NLP/gte-large-en-v1.5", "onnx/model_quantized.onnx", None),
    ("ClipVitB32", 512, POOL_MEAN, QUANT_NONE, "Qdrant/clip-ViT-B-32-text", "model.onnx", None),
    ("JinaEmbeddingsV2BaseCode", 768, POOL_MEAN, QUANT_NONE, "jinaai/jina-embeddings-v2-base-code", "onnx/model.onnx", None),
    ("JinaEmbeddingsV2BaseEN", 768, POOL_MEAN, QUANT_NONE, "jinaai/jina-embeddings-v2-base-en", "model.onnx", None),
    ("EmbeddingGemma300M", 768, POOL_MEAN, QUANT_NONE, "onnx-community/embeddinggemma-300m-ONNX", "onnx/model.onnx", "sentence_embedding"),
    ("EmbeddingGemma300MQ4", 768, POOL_MEAN, QUANT_NONE, "onnx-community/embeddinggemma-300m-ONNX", "onnx/model_q4.onnx", "sentence_embedding"),
    ("EmbeddingGemma300MQ", 768, POOL_MEAN, QUANT_DYNAMIC, "onnx-community/embeddinggemma-300m-ONNX", "onnx/model_quantized.onnx", "sentence_embedding"),
    ("SnowflakeArcticEmbedXS", 384, POOL_CLS, QUANT_NONE, "snowflake/snowflake-arctic-embed-xs", "onnx/model.onnx", None),
    ("SnowflakeArcticEmbedXSQ", 384, POOL_CLS, QUANT_DYNAMIC, "snowflake/snowflake-arctic-embed-xs", "onnx/model_quantized.onnx", None),
    ("SnowflakeArcticEmbedS", 384, POOL_CLS, QUANT_NONE, "snowflake/snowflake-arctic-embed-s", "onnx/model.onnx", None),
    ("SnowflakeArcticEmbedSQ", 384, POOL_CLS, QUANT_DYNAMIC, "snowflake/snowflake-arctic-embed-s", "onnx/model_quantized.onnx", None),
    ("SnowflakeArcticEmbedM", 768, POOL_CLS, QUANT_NONE, "Snowflake/snowflake-arctic-embed-m", "onnx/model.onnx", None),
    ("SnowflakeArcticEmbedMQ", 768, POOL_CLS, QUANT_DYNAMIC, "Snowflake/snowflake-arctic-embed-m", "onnx/model_quantized.onnx", None),
    ("SnowflakeArcticEmbedMLong", 768, POOL_CLS, QUANT_NONE, "snowflake/snowflake-arctic-embed-m-long", "onnx/model.onnx", None),
    ("SnowflakeArcticEmbedMLongQ", 768, POOL_CLS, QUANT_DYNAMIC, "snowflake/snowflake-arctic-embed-m-long", "onnx/model_quantized.onnx", None),
    ("SnowflakeArcticEmbedL", 1024, POOL_CLS, QUANT_NONE, "snowflake/snowflake-arctic-embed-l", "onnx/model.onnx", None),
    ("SnowflakeArcticEmbedLQ", 1024, POOL_CLS, QUANT_DYNAMIC, "snowflake/snowflake-arctic-embed-l", "onnx/model_quantized.onnx", None),
]

for _name, _dim, _pool, _quant, _code, _file, _okey in _TEXT_MODELS:
    register(ModelSpec(
        name=_name, dim=_dim, pooling=_pool, quantization=_quant,
        model_code=_code, model_file=_file, output_key=_okey, kind="dense",
    ))

# candle-backend families (SURVEY §2.3): same operator shape, different
# pooling/padding; inference runs via torch/onnx export inside the UDF
register(ModelSpec(
    name="Qwen3Embedding06B", dim=1024, pooling=POOL_LAST_TOKEN,
    model_code="Qwen/Qwen3-Embedding-0.6B", backend="candle",
    description="last-token pooling, LEFT padding (src/models/qwen3.rs:990-1140)",
))
register(ModelSpec(
    name="NomicEmbedTextV2Moe", dim=768, pooling=POOL_MEAN,
    model_code="nomic-ai/nomic-embed-text-v2-moe", backend="candle",
    description="MoE encoder, mean pool (src/models/nomic_v2_moe.rs:647-653)",
))
register(ModelSpec(
    name="Qwen3VLEmbedding", dim=2048, kind="vl", vocab_size=0,
    model_code="Qwen/Qwen3-VL-2B-Instruct", backend="candle",
    description="Qwen3-VL vision tower: smart-resize -> merge-block patch "
                "tokens -> visual forward (src/models/qwen3.rs:1146-1420); "
                "loaded by repo id like the reference's from_hf",
))

# sparse models (src/models/sparse.rs)
register(ModelSpec(
    name="SPLADEPPV1", dim=30522, pooling=POOL_MEAN, kind="sparse",
    vocab_size=30522, model_code="Qdrant/Splade_PP_en_v1", model_file="model.onnx",
    description="SPLADE post-processing (src/sparse_text_embedding/impl.rs:225-254)",
), "prithivida/Splade_PP_en_v1")
register(ModelSpec(
    name="SparseBGEM3", dim=1024, kind="sparse", vocab_size=250002,
    sparse_method="bgem3",
    # upstream code matches the reference registry (src/models/sparse.rs:31);
    # the dense BGEM3 shares this code, so sparse call sites resolve it via
    # the kind-scoped alias (get_model_spec(..., kind="sparse"))
    model_code="BAAI/bge-m3", model_file="onnx/model.onnx",
    description="BGE-M3 sparse head: embedded linear weights, max-by-token-id "
                "(src/sparse_text_embedding/impl.rs:256-304)",
), "BAAI/bge-m3-sparse")

# joint bge-m3 triple (src/bgem3_embedding/)
register(ModelSpec(
    name="Bgem3Joint", dim=1024, kind="bgem3", vocab_size=250002,
    model_code="gpahal/bge-m3-onnx-int8", model_file="model.onnx",
    description="dense+sparse+colbert triple (src/bgem3_embedding/impl.rs:149-303)",
))

# image models (src/models/image_embedding.rs)
for _name, _dim, _code, _file in [
    ("ImageClipVitB32", 512, "Qdrant/clip-ViT-B-32-vision", "model.onnx"),
    ("Resnet50", 2048, "Qdrant/resnet50-onnx", "model.onnx"),
    ("UnicomVitB16", 768, "Qdrant/Unicom-ViT-B-16", "model.onnx"),
    ("UnicomVitB32", 512, "Qdrant/Unicom-ViT-B-32", "model.onnx"),
    ("NomicEmbedVisionV15", 768, "nomic-ai/nomic-embed-vision-v1.5", "onnx/model.onnx"),
]:
    register(ModelSpec(name=_name, dim=_dim, kind="image", vocab_size=0,
                       model_code=_code, model_file=_file))

# rerankers (src/models/reranking.rs)
for _name, _code, _file in [
    ("BGERerankerBase", "BAAI/bge-reranker-base", "onnx/model.onnx"),
    ("BGERerankerV2M3", "rozgo/bge-reranker-v2-m3", "model.onnx"),
    ("JINARerankerV1TurboEn", "jinaai/jina-reranker-v1-turbo-en", "onnx/model.onnx"),
    ("JINARerankerV2BaseMultiligual", "jinaai/jina-reranker-v2-base-multilingual", "onnx/model.onnx"),
]:
    register(ModelSpec(name=_name, dim=1, kind="rerank", model_code=_code,
                       model_file=_file))

# legacy friendly aliases kept for callers addressing by upstream HF name
_ALIASES.setdefault("BAAI/bge-small-en-v1.5", "BGESmallENV15")
_ALIASES.setdefault("sentence-transformers/all-MiniLM-L6-v2", "AllMiniLML6V2")

# --- deterministic stub models (CI / no-network path) ---
register(ModelSpec(name="stub-dense-mean", dim=32, pooling=POOL_MEAN, kind="dense",
                   vocab_size=997, description="NumPy stub, mean pooling"))
register(ModelSpec(name="stub-dense-cls", dim=32, pooling=POOL_CLS, kind="dense",
                   vocab_size=997, description="NumPy stub, CLS pooling"))
register(ModelSpec(name="stub-dense-last", dim=32, pooling=POOL_LAST_TOKEN, kind="dense",
                   vocab_size=997, description="NumPy stub, last-token pooling (qwen3-style)"))
register(ModelSpec(name="stub-dense-dynamic", dim=32, pooling=POOL_MEAN, kind="dense",
                   quantization=QUANT_DYNAMIC, vocab_size=997,
                   description="stub carrying the dynamic-quantization single-batch constraint"))
register(ModelSpec(name="stub-sparse", dim=256, pooling=POOL_MEAN, kind="sparse",
                   vocab_size=256, description="NumPy stub SPLADE-shaped sparse head"))
register(ModelSpec(name="stub-sparse-bgem3", dim=32, kind="sparse", vocab_size=997,
                   sparse_method="bgem3",
                   description="NumPy stub: bgem3-style linear sparse head over hidden states"))
register(ModelSpec(name="stub-bgem3", dim=32, kind="bgem3", vocab_size=997,
                   description="NumPy stub emitting (dense, sparse, colbert) triple"))
register(ModelSpec(name="stub-image", dim=32, kind="image", vocab_size=0,
                   description="NumPy stub image tower (deterministic fake decode)"))
register(ModelSpec(name="stub-qwen-vl", dim=32, kind="vl", vocab_size=0,
                   description="NumPy stub Qwen3-VL vision tower consuming the "
                               "real merge-block patch pipeline"))
register(ModelSpec(name="stub-rerank", dim=1, kind="rerank", vocab_size=997,
                   description="NumPy stub cross-encoder pair scorer"))
