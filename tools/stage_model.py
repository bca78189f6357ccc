#!/usr/bin/env python
"""Stage model artifacts into the local cache — the engine's counterpart of
the reference's ``pull_from_hf`` (src/common.rs:171-192).

Executors resolve artifacts from ``FASTEMBED_CACHE_DIR`` (falling back to
``HF_HOME``, see models/runtime.cache_dir) — on a real cluster a shared
volume / pre-baked image layer / per-node bootstrap. Since r6 the runtime
also auto-resolves at first session build (models/artifacts.py, honoring
``HF_ENDPOINT``), but pre-staging with this tool is still the right move on
a cluster: one download driver-side instead of one per executor node, and
air-gapped copies:

    # from the HuggingFace hub (honors HF_ENDPOINT like the reference):
    python tools/stage_model.py AllMiniLML6V2

    # air-gapped: copy from a directory that already holds the artifacts
    python tools/stage_model.py AllMiniLML6V2 --from-dir /mnt/models/minilm

    # list what a model needs / what is already staged
    python tools/stage_model.py AllMiniLML6V2 --check

Artifacts land in ``<cache>/<model_code with '/' → '--'>/`` using the same
layout models/runtime.py probes (``model_file`` + ``tokenizer.json``).
After staging, ``tests/test_golden_parity.py`` un-skips and pins the real
inference path against the reference's golden checksums.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastembed_rs_spark.models.registry import get_model_spec  # noqa: E402
from fastembed_rs_spark.models.runtime import cache_dir  # noqa: E402

#: tokenizer/config sidecars the reference's TokenizerFiles bundle carries
#: (src/common.rs:30-38); only tokenizer.json is hard-required by runtime.py
REQUIRED = ("tokenizer.json",)
OPTIONAL = ("config.json", "tokenizer_config.json", "special_tokens_map.json")


def model_dir(spec) -> str:
    return os.path.join(cache_dir(), spec.model_code.replace("/", "--"))


def wanted_files(spec) -> list[tuple[str, bool]]:
    """(relative path, required) for every artifact the model needs."""
    files = [(spec.model_file, True)]
    files += [(f, True) for f in REQUIRED]
    files += [(f, False) for f in OPTIONAL]
    files += [(f, True) for f in spec.additional_files]
    return files


def is_staged(spec) -> bool:
    d = model_dir(spec)
    return all(
        os.path.exists(os.path.join(d, rel))
        for rel, required in wanted_files(spec)
        if required
    )


def _fetch_hub(spec, rel: str, dest: str) -> bool:
    endpoint = os.environ.get("HF_ENDPOINT", "https://huggingface.co").rstrip("/")
    url = f"{endpoint}/{spec.model_code}/resolve/main/{rel}"
    tmp = dest + ".part"
    try:
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            shutil.copyfileobj(r, f, length=1 << 20)
        os.replace(tmp, dest)
        return True
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return False
        raise
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def stage(model: str, from_dir: str | None, force: bool) -> int:
    spec = get_model_spec(model)
    if not spec.model_code:
        print(f"{model}: stub model — nothing to stage", file=sys.stderr)
        return 0
    d = model_dir(spec)
    os.makedirs(d, exist_ok=True)
    missing_required = []
    for rel, required in wanted_files(spec):
        dest = os.path.join(d, rel)
        if os.path.exists(dest) and not force:
            print(f"  have {rel}")
            continue
        os.makedirs(os.path.dirname(dest) or d, exist_ok=True)
        if from_dir is not None:
            src = os.path.join(from_dir, rel)
            alt = os.path.join(from_dir, os.path.basename(rel))
            src = src if os.path.exists(src) else alt
            if os.path.exists(src):
                shutil.copyfile(src, dest)
                print(f"  copied {rel}")
            elif required:
                missing_required.append(rel)
        else:
            try:
                ok = _fetch_hub(spec, rel, dest)
            except (urllib.error.URLError, OSError) as e:
                print(f"  FAILED {rel}: {e}", file=sys.stderr)
                ok = False
            if ok:
                print(f"  fetched {rel}")
            elif required:
                missing_required.append(rel)
    if missing_required:
        print(f"{model}: missing required artifacts: {missing_required}", file=sys.stderr)
        return 1
    print(f"{model}: staged at {d}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("model", help="registry name or HF model code")
    ap.add_argument("--from-dir", default=None,
                    help="copy artifacts from this directory instead of the hub")
    ap.add_argument("--check", action="store_true",
                    help="report staging status, change nothing")
    ap.add_argument("--force", action="store_true", help="re-fetch existing files")
    args = ap.parse_args()
    spec = get_model_spec(args.model)
    if args.check:
        staged = is_staged(spec)
        print(f"{args.model}: {'staged' if staged else 'NOT staged'} at {model_dir(spec)}")
        for rel, required in wanted_files(spec):
            have = os.path.exists(os.path.join(model_dir(spec), rel))
            print(f"  [{'x' if have else ' '}] {rel}{'' if required else ' (optional)'}")
        return 0 if staged else 1
    return stage(args.model, args.from_dir, args.force)


if __name__ == "__main__":
    sys.exit(main())
