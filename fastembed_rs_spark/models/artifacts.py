"""Model artifact resolution — the Spark translation of the reference's
``pull_from_hf`` / ``retrieve_model`` path (src/common.rs:171-192;
src/text_embedding/impl.rs:46-64,147-156).

The reference resolves a model to a local directory in two steps: check the
HF cache, else download from the hub — honoring ``HF_ENDPOINT`` (mirror
URL, src/common.rs:182) and the cache-dir precedence. Missing artifacts are
a HARD error (`.context("Failed to retrieve {model_file}")`), never a
silent fallback. This module mirrors that contract:

* ``resolve_model_artifacts(spec)`` returns the local directory holding
  every file the session build needs (``model_file``, ``tokenizer.json``,
  ``additional_files`` — impl.rs:53-64 + load_tokenizer_hf_hub), pulling
  missing files from ``{HF_ENDPOINT}/{model_code}/resolve/main/{file}``
  (the hub's stable resolve URL). ``file://`` endpoints work, so the whole
  path is offline-testable against a local fixture "hub" laid out as
  ``<hub>/<model_code>/resolve/main/<file>``.
* On failure it raises ``ModelArtifactError`` naming the missing files —
  the reference's error path, not the stub. The deterministic stub only
  serves real-model names behind the explicit ``FASTEMBED_ALLOW_STUB``
  opt-in (or when the ONNX runtime itself is not installed, which is the
  documented offline-CI mode; see ``models.runtime.get_session``).

Downloads write to a temp file then ``os.replace`` so a crashed download
never leaves a truncated artifact that a later run would trust as cached.
"""

from __future__ import annotations

import os
import shutil
import urllib.error
import urllib.parse
import urllib.request

from fastembed_rs_spark.models.registry import ModelSpec

DEFAULT_HF_ENDPOINT = "https://huggingface.co"


class ModelArtifactError(RuntimeError):
    """Model artifacts could not be resolved (cache miss + download
    failure) — mirrors the reference's ``Failed to retrieve {file}``
    error (src/text_embedding/impl.rs:54-56)."""


def hf_endpoint() -> str:
    """``HF_ENDPOINT`` with the reference's default hub URL
    (src/common.rs:182)."""
    return os.environ.get("HF_ENDPOINT", DEFAULT_HF_ENDPOINT).rstrip("/")


def allow_stub() -> bool:
    """Explicit opt-in for serving a real model name with the
    deterministic stub when artifacts are unresolvable. OFF by default: a
    production user must never embed 100 TB with a toy hash model because
    a cache dir was misconfigured."""
    return os.environ.get("FASTEMBED_ALLOW_STUB", "").lower() in (
        "1", "true", "yes",
    )


def required_files(spec: ModelSpec) -> list[str]:
    """Every file the session build reads: the ONNX graph, the tokenizer,
    and the registry's additional_files (e.g. external .onnx_data weights
    — src/text_embedding/impl.rs:58-64)."""
    files = [spec.model_file, "tokenizer.json", *spec.additional_files]
    seen: list[str] = []
    for f in files:
        if f and f not in seen:
            seen.append(f)
    return seen


def model_dir(spec: ModelSpec, cache: str | None = None) -> str:
    from fastembed_rs_spark.models.runtime import cache_dir

    return os.path.join(cache or cache_dir(), spec.model_code.replace("/", "--"))


def _download(url: str, dst: str) -> None:
    import tempfile

    os.makedirs(os.path.dirname(dst), exist_ok=True)
    # Unique temp per downloader: several Python workers on one executor
    # can race to fetch the same uncached artifact into a shared cache
    # dir; a fixed '<dst>.part' would interleave their writes and publish
    # a corrupted file that the cache-first check then trusts forever.
    # mkstemp in the target dir keeps os.replace atomic (same filesystem)
    # and last-writer-wins publishes a complete file either way.
    fd, tmp = tempfile.mkstemp(
        prefix=os.path.basename(dst) + ".", suffix=".part",
        dir=os.path.dirname(dst),
    )
    try:
        # fdopen FIRST: once the fd is inside the context manager it closes
        # even when urlopen raises — the other order leaked one fd per
        # failed resolve (EMFILE on a long-lived reused worker retrying a
        # dead endpoint).
        with os.fdopen(fd, "wb") as out, urllib.request.urlopen(url) as resp:
            shutil.copyfileobj(resp, out)
        os.replace(tmp, dst)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def resolve_model_artifacts(
    spec: ModelSpec,
    cache: str | None = None,
    show_download_progress: bool = False,
    files: list[str] | None = None,
) -> str:
    """Return a local directory containing all ``required_files(spec)``
    (or the explicit ``files`` subset — used when bytes overrides supply
    some artifacts), downloading what the cache lacks — ``pull_from_hf``
    + ``repo.get`` parity (src/common.rs:171-192,
    src/text_embedding/impl.rs:53-64).

    Cache first: a file already present is never re-fetched (the hf-hub
    crate's behavior). Raises ``ModelArtifactError`` listing every file
    that is neither cached nor downloadable."""
    if not spec.model_code:
        raise ModelArtifactError(
            f"model {spec.name!r} has no model_code (it is a stub-only "
            "registry entry); nothing to resolve"
        )
    target = model_dir(spec, cache)
    endpoint = hf_endpoint()
    missing: list[tuple[str, str]] = []
    for fname in (required_files(spec) if files is None else files):
        dst = os.path.join(target, fname)
        if os.path.exists(dst):
            continue
        url = f"{endpoint}/{spec.model_code}/resolve/main/{urllib.parse.quote(fname)}"
        if show_download_progress:
            print(f"downloading {url} -> {dst}")
        try:
            _download(url, dst)
        except (urllib.error.URLError, OSError, ValueError) as e:
            missing.append((fname, f"{url}: {e}"))
    if missing:
        detail = "; ".join(f"{f} ({why})" for f, why in missing)
        raise ModelArtifactError(
            f"failed to retrieve artifacts for model {spec.name!r} "
            f"(code {spec.model_code!r}) into {target}: {detail}. "
            "Stage them with tools/stage_model.py, point HF_ENDPOINT at a "
            "reachable mirror, or set FASTEMBED_ALLOW_STUB=1 to explicitly "
            "accept the deterministic stub model."
        )
    return target
