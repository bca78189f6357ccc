"""Per-executor model session management — the Spark translation of the
reference's stateful embedding handles (src/text_embedding/init.rs:141-148).

The reference builds a (tokenizer, ONNX session, config) struct once and
reuses it across ``embed`` calls. On Spark the equivalent is a lazily
initialized **per-Python-worker singleton**: the first Arrow batch a worker
sees builds the session, subsequent batches (and subsequent tasks, with
``spark.python.worker.reuse=true``) reuse it. Model artifacts resolve via the
same env vars the reference uses: ``FASTEMBED_CACHE_DIR`` / ``HF_HOME``
(src/common.rs:12-16,176-182). NOTE: executors capture the environment at
launch — set these BEFORE creating the SparkSession (or via
``spark.executorEnv.*``); setting them mid-session silently falls back.

If ``onnxruntime`` + ``tokenizers`` are importable and the model artifacts are
cached locally, real inference runs; otherwise the deterministic NumPy stubs
(models.stub) serve the same interface, keeping the whole pipeline testable
offline.
"""

from __future__ import annotations

import os
from typing import Any

from fastembed_rs_spark.models.registry import ModelSpec, get_model_spec
from fastembed_rs_spark.models.stub import StubTokenizer, build_stub_session

_SESSIONS: dict[str, tuple[Any, Any]] = {}


def cache_dir() -> str:
    """FASTEMBED_CACHE_DIR > HF_HOME > .fastembed_cache (src/common.rs:12-16)."""
    return (
        os.environ.get("FASTEMBED_CACHE_DIR")
        or os.environ.get("HF_HOME")
        or os.path.join(os.getcwd(), ".fastembed_cache")
    )


def _try_build_onnx(spec: ModelSpec):
    """Real path: load tokenizer.json + model.onnx from the local cache dir.
    Returns None when the runtime or artifacts are unavailable (CI)."""
    try:
        import onnxruntime as ort  # noqa: F401
        from tokenizers import Tokenizer  # noqa: F401
    except ImportError:
        return None
    model_dir = os.path.join(cache_dir(), spec.model_code.replace("/", "--"))
    onnx_path = os.path.join(model_dir, spec.model_file)
    tok_path = os.path.join(model_dir, "tokenizer.json")
    if not (os.path.exists(onnx_path) and os.path.exists(tok_path)):
        return None
    so = ort.SessionOptions()
    # mirror reference session build: max graph optimization, all-core
    # intra-op threads capped by the task's cpu budget (src/common.rs:194-229)
    so.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_ALL
    intra = int(os.environ.get("FASTEMBED_INTRA_THREADS", "0")) or (os.cpu_count() or 1)
    so.intra_op_num_threads = intra
    # execution providers (reference with_execution_providers,
    # src/init.rs:43-49 / common.rs:207-213): comma-separated names, e.g.
    # "CUDAExecutionProvider,CPUExecutionProvider"; default CPU
    eps = [
        p.strip()
        for p in os.environ.get("FASTEMBED_EXECUTION_PROVIDERS", "").split(",")
        if p.strip()
    ] or ["CPUExecutionProvider"]
    session = ort.InferenceSession(onnx_path, sess_options=so, providers=eps)
    tokenizer = Tokenizer.from_file(tok_path)
    return tokenizer, session


def get_session(model: str | ModelSpec):
    """(tokenizer, session) singleton for this Python worker process.

    Accepts the resolved ``ModelSpec`` itself (preferred — operators resolve
    on the driver and ship the picklable spec in the UDF closure, so
    driver-side registrations like BYO / max_length-derived specs work even
    though workers never saw the ``register()`` call) or a registry name."""
    spec = model if isinstance(model, ModelSpec) else get_model_spec(model)
    if spec.name not in _SESSIONS:
        built = _try_build_onnx(spec)
        if built is None:
            padding = "left" if spec.pooling == "last_token" else "right"
            built = (
                StubTokenizer(spec.vocab_size, spec.max_length, padding_side=padding),
                build_stub_session(spec),
            )
        _SESSIONS[spec.name] = built
    return _SESSIONS[spec.name]


_SPARSE_LINEAR: dict[str, tuple] = {}


def get_sparse_linear(model: str | ModelSpec):
    """(weight (H,), bias) of the bgem3 sparse head — per-worker cached.

    Real path: the safetensors blob shipped as package data / broadcast
    (models.safetensors_io.bgem3_sparse_linear, mirroring the reference's
    embedded weights, bgem3_weights.rs:16-27). Offline fallback: a
    deterministic pseudo-random head so the full pipeline stays testable."""
    spec = model if isinstance(model, ModelSpec) else get_model_spec(model)
    model_name = spec.name
    if model_name not in _SPARSE_LINEAR:
        import numpy as np
        blob_path = os.path.join(
            cache_dir(), spec.model_code.replace("/", "--"), "sparse_linear.safetensors"
        )
        if os.path.exists(blob_path):
            from fastembed_rs_spark.models.safetensors_io import bgem3_sparse_linear

            with open(blob_path, "rb") as f:
                _SPARSE_LINEAR[model_name] = bgem3_sparse_linear(f.read())
        else:
            from fastembed_rs_spark.models.stub import rolling_hash

            # NOT hash(): Python string hashing is per-process randomized,
            # which would give each worker different weights
            rng = np.random.default_rng(rolling_hash(model_name) % (2**32))
            w = rng.normal(scale=0.3, size=spec.dim).astype(np.float32)
            _SPARSE_LINEAR[model_name] = (w, np.float32(0.05))
    return _SPARSE_LINEAR[model_name]


def clear_sessions() -> None:
    _SESSIONS.clear()
    _SPARSE_LINEAR.clear()
