"""Per-executor model session management — the Spark translation of the
reference's stateful embedding handles (src/text_embedding/init.rs:141-148).

The reference builds a (tokenizer, ONNX session, config) struct once and
reuses it across ``embed`` calls. On Spark the equivalent is a lazily
initialized **per-Python-worker singleton**: the first Arrow batch a worker
sees builds the session, subsequent batches (and subsequent tasks, with
``spark.python.worker.reuse=true``) reuse it.

Session state is keyed by (model, cache_dir, intra_threads, execution
providers) — two handles constructed with different ``InitOptions`` get
independent sessions, like two reference handles do. Options travel to the
workers inside the UDF closure (``SessionOptions`` is picklable); the
``FASTEMBED_*`` / ``HF_HOME`` env vars remain the zero-plumbing default for
callers that configure the environment before launching executors.

Artifact resolution mirrors the reference's ``retrieve_model`` →
``pull_from_hf`` path (src/common.rs:171-192): cache first, then download
from ``HF_ENDPOINT`` — and like the reference, a real model whose artifacts
cannot be resolved is a HARD error when the ONNX runtime is installed
(``models.artifacts.ModelArtifactError``), not a silent stub. The
deterministic NumPy stubs (models.stub) serve:

* the ``stub-*`` registry entries (no ``model_code`` — stub by design);
* real model names only when ``onnxruntime``/``tokenizers`` are not
  importable at all (the documented offline-CI mode: nothing real could
  run anyway) or behind the explicit ``FASTEMBED_ALLOW_STUB=1`` opt-in.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

from fastembed_rs_spark.models.registry import ModelSpec, get_model_spec
from fastembed_rs_spark.models.stub import StubTokenizer, build_stub_session

_SESSIONS: dict[tuple, tuple[Any, Any]] = {}


def cache_dir() -> str:
    """FASTEMBED_CACHE_DIR > HF_HOME > .fastembed_cache (src/common.rs:12-16)."""
    return (
        os.environ.get("FASTEMBED_CACHE_DIR")
        or os.environ.get("HF_HOME")
        or os.path.join(os.getcwd(), ".fastembed_cache")
    )


@dataclass(frozen=True)
class SessionOptions:
    """Per-handle runtime knobs (reference InitOptions fields that affect
    the session build — src/init.rs:9-34). ``None``/empty fields defer to
    the environment at session-build time, so env-only configuration keeps
    working; explicit fields override it per handle. Frozen + hashable:
    it is part of the session cache key and ships in UDF closures."""

    cache_dir: str | None = None
    intra_threads: int | None = None
    execution_providers: tuple[str, ...] = ()
    #: model/tokenizer bytes overrides (reference OnnxSource::Memory +
    #: TokenizerFiles — src/reranking/init.rs:94-128: "The onnx_file and
    #: tokenizer_files are expecting the files' bytes"): when set, that
    #: artifact loads from bytes instead of the cache dir. Accepts raw
    #: ``bytes`` or a ``pyspark.Broadcast`` of bytes — a broadcast is the
    #: Spark-native way to ship one model copy per executor instead of
    #: one per task closure.
    model_bytes: object = None
    tokenizer_bytes: object = None
    #: forwarded to artifact resolution (reference show_download_progress,
    #: src/init.rs); presentation-only, so NOT part of the session key
    show_download_progress: bool = False

    def resolved_cache(self) -> str:
        return self.cache_dir or cache_dir()

    def resolved_intra(self) -> int:
        if self.intra_threads:
            return self.intra_threads
        return int(os.environ.get("FASTEMBED_INTRA_THREADS", "0")) or (
            os.cpu_count() or 1
        )

    def resolved_eps(self) -> tuple[str, ...]:
        if self.execution_providers:
            return tuple(self.execution_providers)
        eps = tuple(
            p.strip()
            for p in os.environ.get("FASTEMBED_EXECUTION_PROVIDERS", "").split(",")
            if p.strip()
        )
        return eps or ("CPUExecutionProvider",)

    def key(self) -> tuple:
        # Content digests, NOT id(): a pickled SessionOptions arrives as a
        # fresh object per task, so identity-based keys would rebuild the
        # ONNX session every task and leak every stale one into _SESSIONS
        # (and a GC-recycled address could alias two different models).
        # Hash cost lands once per get_session call — per task, not per
        # batch.
        return (
            self.resolved_cache(),
            self.resolved_intra(),
            self.resolved_eps(),
            _bytes_digest(self.model_bytes),
            _bytes_digest(self.tokenizer_bytes),
        )


_DEFAULT_OPTIONS = SessionOptions()


def _runtimes_importable() -> bool:
    try:
        import onnxruntime  # noqa: F401
        from tokenizers import Tokenizer  # noqa: F401
    except ImportError:
        return False
    return True


def _build_onnx(spec: ModelSpec, opts: SessionOptions):
    """Real path: resolve artifacts (cache-or-download, hard error on
    failure — see models.artifacts), then build tokenizer + ONNX session
    mirroring the reference session build: max graph optimization,
    all-core intra-op threads (src/common.rs:194-229), explicit execution
    providers (src/init.rs:43-49)."""
    import onnxruntime as ort
    from tokenizers import Tokenizer

    from fastembed_rs_spark.models.artifacts import (
        required_files,
        resolve_model_artifacts,
    )

    model_bytes = _unwrap_bytes(opts.model_bytes)
    tok_bytes = _unwrap_bytes(opts.tokenizer_bytes)
    # Only resolve what the bytes overrides don't supply; a fully
    # bytes-supplied model (OnnxSource::Memory + TokenizerFiles) touches
    # neither the cache nor the network.
    needed = [
        f
        for f in required_files(spec)
        if not (f == spec.model_file and model_bytes is not None)
        and not (f == "tokenizer.json" and tok_bytes is not None)
    ]
    model_dir = (
        resolve_model_artifacts(
            spec,
            opts.resolved_cache(),
            show_download_progress=opts.show_download_progress,
            files=needed,
        )
        if needed
        else None
    )
    so = ort.SessionOptions()
    so.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_ALL
    so.intra_op_num_threads = opts.resolved_intra()
    eps = list(opts.resolved_eps())
    if model_bytes is not None:
        if spec.additional_files:
            # ORT resolves a graph's external-data references relative to
            # the model FILE's directory; an in-memory graph has none, so
            # the session build would fail after the (successful) download
            # with an opaque loader error. Refuse up front with the fix.
            raise ValueError(
                f"model {spec.name!r} uses external data files "
                f"{spec.additional_files!r}; onnxruntime cannot resolve "
                "them for an in-memory graph (OnnxSource::Memory). Load "
                "this model from the cache path instead (omit model_bytes)."
            )
        # OnnxSource::Memory: graph from bytes (broadcast-friendly)
        session = ort.InferenceSession(model_bytes, sess_options=so, providers=eps)
    else:
        session = ort.InferenceSession(
            os.path.join(model_dir, spec.model_file),
            sess_options=so,
            providers=eps,
        )
    if tok_bytes is not None:
        tokenizer = Tokenizer.from_buffer(tok_bytes)
    else:
        tokenizer = Tokenizer.from_file(os.path.join(model_dir, "tokenizer.json"))
    return tokenizer, session


def _unwrap_bytes(b):
    """Accept raw bytes or a pyspark Broadcast of bytes."""
    if b is None or isinstance(b, (bytes, bytearray)):
        return b
    return b.value


#: digest memo keyed by id() of the live bytes object, with a strong
#: keepalive reference so the id can never be recycled while the entry
#: exists (and an identity re-check besides). A broadcast's .value is one
#: object per worker, so every task after the first gets the digest for
#: free instead of re-hashing hundreds of MB per task.
_DIGEST_MEMO: dict[int, tuple[object, str]] = {}


def _bytes_digest(b) -> str | None:
    if b is None:
        return None
    raw = _unwrap_bytes(b)
    hit = _DIGEST_MEMO.get(id(raw))
    if hit is not None and hit[0] is raw:
        return hit[1]
    import hashlib

    dig = hashlib.sha256(raw).hexdigest()[:16]
    _DIGEST_MEMO[id(raw)] = (raw, dig)
    return dig


def _build_stub(spec: ModelSpec):
    padding = "left" if spec.pooling == "last_token" else "right"
    return (
        StubTokenizer(spec.vocab_size, spec.max_length, padding_side=padding),
        build_stub_session(spec),
    )


def get_session(model: str | ModelSpec, options: SessionOptions | None = None):
    """(tokenizer, session) singleton for this Python worker process,
    keyed by (model, session options).

    Accepts the resolved ``ModelSpec`` itself (preferred — operators
    resolve on the driver and ship the picklable spec in the UDF closure,
    so driver-side registrations like BYO / max_length-derived specs work
    even though workers never saw the ``register()`` call) or a registry
    name. ``options=None`` resolves every knob from the environment — the
    pre-r6 behavior."""
    spec = model if isinstance(model, ModelSpec) else get_model_spec(model)
    opts = options or _DEFAULT_OPTIONS
    key = (spec.name, *opts.key())
    if key not in _SESSIONS:
        if not spec.model_code:
            # stub-* registry entries carry no artifact location: they ARE
            # the deterministic stub model, never a fallback.
            built = _build_stub(spec)
        elif _runtimes_importable():
            from fastembed_rs_spark.models.artifacts import (
                ModelArtifactError,
                allow_stub,
            )

            try:
                built = _build_onnx(spec, opts)
            except ModelArtifactError:
                if not allow_stub():
                    raise
                built = _build_stub(spec)
        else:
            # No ONNX runtime in this interpreter: real inference is
            # impossible regardless of artifacts. The deterministic stub
            # keeps the full pipeline shape testable offline (CI mode).
            built = _build_stub(spec)
        _SESSIONS[key] = built
    return _SESSIONS[key]


_SPARSE_LINEAR: dict[tuple, tuple] = {}


def get_sparse_linear(model: str | ModelSpec, options: SessionOptions | None = None):
    """(weight (H,), bias) of the bgem3 sparse head — per-worker cached,
    keyed like the session (the blob lives in the same cache dir).

    Real path: the safetensors blob shipped as package data / broadcast
    (models.safetensors_io.bgem3_sparse_linear, mirroring the reference's
    embedded weights, bgem3_weights.rs:16-27). Offline fallback: a
    deterministic pseudo-random head so the full pipeline stays testable."""
    spec = model if isinstance(model, ModelSpec) else get_model_spec(model)
    opts = options or _DEFAULT_OPTIONS
    key = (spec.name, opts.resolved_cache())
    if key not in _SPARSE_LINEAR:
        import numpy as np
        blob_path = os.path.join(
            opts.resolved_cache(),
            spec.model_code.replace("/", "--"),
            "sparse_linear.safetensors",
        )
        if os.path.exists(blob_path):
            from fastembed_rs_spark.models.safetensors_io import bgem3_sparse_linear

            with open(blob_path, "rb") as f:
                _SPARSE_LINEAR[key] = bgem3_sparse_linear(f.read())
        else:
            from fastembed_rs_spark.models.stub import rolling_hash

            # NOT hash(): Python string hashing is per-process randomized,
            # which would give each worker different weights
            rng = np.random.default_rng(rolling_hash(spec.name) % (2**32))
            w = rng.normal(scale=0.3, size=spec.dim).astype(np.float32)
            _SPARSE_LINEAR[key] = (w, np.float32(0.05))
    return _SPARSE_LINEAR[key]


def clear_sessions() -> None:
    _SESSIONS.clear()
    _SPARSE_LINEAR.clear()
