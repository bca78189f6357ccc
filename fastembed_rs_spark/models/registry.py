"""Model registry — the Spark translation of the reference's ``ModelInfo``
table (src/models/model_info.rs:6-14, src/models/text_embedding.rs:106-575).

Each entry records everything an executor needs to build its local session:
artifact location (HF repo or local path), output selection, pooling and
quantization mode. Real ONNX entries require ``onnxruntime``+``tokenizers``
at runtime (not present in CI — the ``stub-*`` models are deterministic
NumPy models with the same interface, used by tests; see
``fastembed_rs_spark.models.stub``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

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
    output_key: str | None = None  # None → precedence order (src/text_embedding/output.rs:13-20)
    quantization: str = QUANT_NONE
    max_length: int = 512
    model_code: str = ""
    model_file: str = "model.onnx"
    description: str = ""
    additional_files: tuple[str, ...] = ()
    kind: str = "dense"  # dense | sparse | bgem3 | image | rerank
    vocab_size: int = 30000  # used by sparse heads / stub tokenizer


_REGISTRY: dict[str, ModelSpec] = {}


def register(spec: ModelSpec) -> ModelSpec:
    _REGISTRY[spec.name] = spec
    return spec


def get_model_spec(name: str) -> ModelSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}") from None


def list_models() -> list[ModelSpec]:
    return list(_REGISTRY.values())


# --- real model entries (a representative slice of the reference registry;
#     artifact download happens lazily per executor, mirroring pull_from_hf,
#     src/common.rs:171-192) ---
register(ModelSpec(
    name="BAAI/bge-small-en-v1.5", dim=384, pooling=POOL_CLS,
    model_code="Qdrant/bge-small-en-v1.5-onnx-q", quantization=QUANT_NONE,
    description="default dense model of the reference (src/models/text_embedding.rs:190-197)",
))
register(ModelSpec(
    name="sentence-transformers/all-MiniLM-L6-v2", dim=384, pooling=POOL_MEAN,
    model_code="Qdrant/all-MiniLM-L6-v2-onnx",
    description="mean-pooled MiniLM (registry row, src/models/text_embedding.rs)",
))
register(ModelSpec(
    name="prithivida/Splade_PP_en_v1", dim=30522, pooling=POOL_MEAN, kind="sparse",
    vocab_size=30522, model_code="Qdrant/Splade_PP_en_v1",
    description="SPLADE sparse (src/sparse_text_embedding/impl.rs:225-254)",
))
register(ModelSpec(
    name="BAAI/bge-m3", dim=1024, kind="bgem3", vocab_size=250002,
    model_code="gpahal/bge-m3-onnx-int8",
    description="joint dense+sparse+colbert (src/bgem3_embedding/impl.rs:149-303)",
))

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
register(ModelSpec(name="stub-bgem3", dim=32, kind="bgem3", vocab_size=997,
                   description="NumPy stub emitting (dense, sparse, colbert) triple"))
register(ModelSpec(name="stub-image", dim=32, kind="image", vocab_size=0,
                   description="NumPy stub image tower (deterministic fake decode)"))
register(ModelSpec(name="stub-rerank", dim=1, kind="rerank", vocab_size=997,
                   description="NumPy stub cross-encoder pair scorer"))
