"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

Beyond-reference training-data-pipeline operators. Media bytes are an opaque
``BinaryType`` column; each operator appends typed columns computed in an
Arrow-batched ``mapInPandas`` stage. Real codec decode (PIL / libav) is not
available in this container — decode is STUBBED behind a clearly marked
deterministic fake (same physical plumbing: schema, batch shape, partition
behavior), with the real-decoder swap-in point isolated in one function per
modality.

Scale shape: all operators are stateless row-local maps — no shuffle at all;
at 100 TB they scale linearly with input splits. Frame sampling *reduces*
data volume early (sample → decode only sampled offsets), the standard
pattern for video pipelines.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from fastembed_rs_spark.operators.embed import _chunks, _with_schema

#: media metadata struct appended by probe_media
MEDIA_META_DDL = (
    "media_meta struct<kind: string, n_bytes: bigint, format: string, "
    "width: int, height: int, duration_ms: bigint, sample_rate: int>"
)

_MAGIC = [
    (b"\x89PNG", "image", "png"),
    (b"\xff\xd8\xff", "image", "jpeg"),
    (b"GIF8", "image", "gif"),
    (b"RIFF", "audio", "wav"),
    (b"ID3", "audio", "mp3"),
    (b"\x00\x00\x00", "video", "mp4"),
]


def _sniff(content: bytes) -> tuple[str, str]:
    """Magic-byte container sniff. Real decode is NOT needed for routing —
    this part is genuinely implementable without codec libs."""
    for magic, kind, fmt in _MAGIC:
        if content.startswith(magic):
            return kind, fmt
    return "unknown", "bin"


def _fake_probe(content: bytes, kind: str) -> dict:
    """STUB probe: deterministic pseudo-metadata derived from the bytes.
    Swap-in point for PIL.Image.open / soundfile / av.open — the returned
    dict shape is the real contract."""
    n = len(content)
    h = int.from_bytes(content[:4].ljust(4, b"\0"), "little")
    return {
        "width": 16 + h % 1024 if kind in ("image", "video") else None,
        "height": 16 + (h >> 10) % 1024 if kind in ("image", "video") else None,
        "duration_ms": int(n * 8) if kind in ("audio", "video") else None,
        "sample_rate": 16000 if kind == "audio" else None,
    }


def probe_media(
    df: DataFrame, content_col: str = "content", batch_size: int = 256,
) -> DataFrame:
    """Append ``media_meta``: container kind/format from magic bytes plus
    (stub-)probed dimensions — the typed-metadata half of the multimodal
    column model."""
    out_schema = _with_schema(df, MEDIA_META_DDL)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk in _chunks(pdf, batch_size):
                metas = []
                for b in chunk[content_col]:
                    content = bytes(b) if b is not None else b""
                    kind, fmt = _sniff(content)
                    p = _fake_probe(content, kind)
                    metas.append({
                        "kind": kind, "n_bytes": len(content), "format": fmt, **p,
                    })
                res = chunk.copy()
                res["media_meta"] = metas
                yield res

    return df.mapInPandas(fn, schema=out_schema)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    n_frames: int = 4,
    frame_size: int = 8,
    batch_size: int = 64,
) -> DataFrame:
    """Append ``frames array<struct<frame_idx:int, pixels:binary>>`` —
    uniformly sampled, resized frames from a video column.

    STUB decode: frames are deterministic byte-slices of the input reshaped
    to (frame_size², 3); the real implementation replaces ``_fake_frame``
    with av/ffmpeg seek+decode of the sampled timestamps ONLY (never decode
    the whole video — that is the scale-critical property this operator
    pins)."""
    out_schema = _with_schema(
        df, "frames array<struct<frame_idx: int, pixels: binary>>"
    )
    frame_bytes = frame_size * frame_size * 3

    def _fake_frame(content: bytes, idx: int) -> bytes:
        # STUB: deterministic slice; swap-in point for real frame decode
        if not content:
            return b"\x00" * frame_bytes
        buf = np.frombuffer(content, dtype=np.uint8)
        start = (idx * 7919) % max(len(buf), 1)
        reps = -(-frame_bytes // len(buf))
        return np.tile(np.roll(buf, -start), reps)[:frame_bytes].tobytes()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk in _chunks(pdf, batch_size):
                frames = []
                for b in chunk[content_col]:
                    content = bytes(b) if b is not None else b""
                    frames.append([
                        {"frame_idx": i, "pixels": _fake_frame(content, i)}
                        for i in range(n_frames)
                    ])
                res = chunk.copy()
                res["frames"] = frames
                yield res

    return df.mapInPandas(fn, schema=out_schema)


def audio_features(
    df: DataFrame,
    content_col: str = "content",
    n_mels: int = 16,
    batch_size: int = 128,
) -> DataFrame:
    """Append ``audio_features array<float>`` — a fixed-size feature vector
    per audio blob (mel-spectrogram statistics in the real path).

    STUB decode: PCM is faked as the byte stream itself; the feature math
    (windowed energy statistics) is real NumPy and runs vectorized per
    Arrow batch."""
    out_schema = _with_schema(df, "audio_features array<float>")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for chunk in _chunks(pdf, batch_size):
                feats = []
                for b in chunk[content_col]:
                    content = bytes(b) if b is not None else b"\x00"
                    # STUB: real path decodes PCM via soundfile; windowed
                    # energy statistics below are the genuine feature math
                    pcm = np.frombuffer(content, dtype=np.uint8).astype(np.float32)
                    pcm = (pcm - 127.5) / 127.5
                    win = max(len(pcm) // n_mels, 1)
                    bands = [
                        float(np.sqrt(np.mean(np.square(pcm[i * win:(i + 1) * win]))))
                        if len(pcm[i * win:(i + 1) * win]) else 0.0
                        for i in range(n_mels)
                    ]
                    feats.append(np.asarray(bands, dtype=np.float32))
                res = chunk.copy()
                res["audio_features"] = feats
                yield res

    return df.mapInPandas(fn, schema=out_schema)


def byte_hash_coords(
    df: DataFrame,
    id_col: str,
    content_col: str,
    dim: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """SQL-verifiable "image tower": L2-normalized byte-value histogram of a
    binary column in coordinate form ``(id, bucket long, weight double)`` —
    the binary-modality analogue of ``embed_hash.hash_embed_coords`` (the
    trick that made ``dense_hash_embed`` oracle-checkable). A real model
    tower (``embed.embed_image``) swaps in via the registry; this one
    exists so cross-modal compositions have an exact DuckDB oracle.

    Shuffle-free NumPy kernel: one ``np.frombuffer`` + ``bincount`` pass
    per Arrow batch; tf counts are exact integers (< 2^53), the norm is the
    float64 sqrt of their squares. Empty/null blobs vanish (no coords) —
    mirroring zero-vector guards downstream."""
    from pyspark.sql import functions as F

    from fastembed_rs_spark.operators.scale import spread_if_narrow

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, bucket long, weight double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, buckets, weights = [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                if b is None or len(b) == 0:
                    continue
                tf = np.bincount(
                    np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64) % dim,
                    minlength=dim,
                ).astype(np.float64)
                nz = np.nonzero(tf)[0]
                w = tf[nz] / np.sqrt(np.sum(tf[nz] * tf[nz]))
                ids.extend([i] * len(nz))
                buckets.extend(nz.tolist())
                weights.extend(w.tolist())
            if ids:
                yield pd.DataFrame(
                    {id_col: ids, "bucket": buckets, "weight": weights}
                )

    out = spread_if_narrow(df.select(id_col, content_col)).mapInPandas(
        gen, schema=schema
    )
    return out.withColumn("weight", F.round("weight", round_to))
