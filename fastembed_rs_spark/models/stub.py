"""Deterministic NumPy stub models with the ONNX-session interface.

The container has no onnxruntime/tokenizers/PIL, so tests exercise the real
Spark plumbing (mapInPandas schemas, batching, padding, pooling, masking,
normalization) against these stubs. They are pure functions of their input:
batch-invariant (padding never leaks into pooled outputs thanks to masking),
partition-invariant, and run-to-run deterministic — the properties the
reference pins in tests/text-embeddings.rs:494-523,604-622.

Interface mirrors ``ort``: ``session.run(None, feeds) -> dict[name, ndarray]``
feeding int64 (B,T) ``input_ids``/``attention_mask`` and reading f32 tensors
(cf. src/text_embedding/impl.rs:371-414).
"""

from __future__ import annotations

import re

import numpy as np

from fastembed_rs_spark.functions.text import HASH_BASE, HASH_MOD, TOKEN_SPLIT_RE
from fastembed_rs_spark.models.registry import ModelSpec

_TOKEN_RE = re.compile(TOKEN_SPLIT_RE)

CLS_ID = 1
PAD_ID = 0


def rolling_hash(s: str) -> int:
    """Same base-31 rolling hash as functions.text.token_hash (kept in sync
    with the Catalyst/DuckDB expressions — see tests/test_text_functions)."""
    acc = 0
    for ch in s:
        acc = (acc * HASH_BASE + ord(ch)) % HASH_MOD
    return acc


class StubTokenizer:
    """Regex word tokenizer with rolling-hash ids, CLS prefix, truncation and
    batch-longest right padding (reference PaddingStrategy::BatchLongest,
    src/common.rs:106-113). ``padding_side='left'`` mirrors the Qwen3 path
    (src/models/qwen3.rs:1072-1077)."""

    def __init__(self, vocab_size: int, max_length: int = 512, padding_side: str = "right"):
        self.vocab_size = max(vocab_size, 4)
        # floor at 1: encode_batch truncates tokens with
        # [: max_length - 1], and a non-positive max_length would make
        # that a NEGATIVE slice (all-but-last token) instead of the
        # empty sequence the old token_ids()[:max_length] semantics gave
        self.max_length = max(max_length, 1)
        self.padding_side = padding_side

    def token_ids(self, text: str) -> list[int]:
        toks = [t for t in _TOKEN_RE.split(text.lower()) if t]
        # ids 0/1 reserved for PAD/CLS
        return [CLS_ID] + [2 + rolling_hash(t) % (self.vocab_size - 2) for t in toks]

    def encode_batch(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """→ (input_ids, attention_mask), both int64 (B, T), T = batch longest
        (≤ max_length).

        The per-token hashes are computed in ONE vectorized pass over the
        whole batch's tokens (operators.fast_text._rolling_hash_many — the
        same base-31 fold as ``rolling_hash``, pinned equal by the stub
        goldens): the per-char Python loop was the tokenizer's dominant
        cost (~40% of a stub embed pass)."""
        from fastembed_rs_spark.operators.fast_text import _rolling_hash_many

        per_doc: list[int] = []
        all_toks: list[str] = []
        for t in texts:
            # [CLS] + first (max_length-1) tokens == token_ids()[:max_length]
            toks = [x for x in _TOKEN_RE.split(t.lower()) if x][
                : self.max_length - 1
            ]
            per_doc.append(len(toks))
            all_toks.extend(toks)
        B = len(texts)
        T = max((n + 1 for n in per_doc), default=1)
        input_ids = np.full((B, T), PAD_ID, dtype=np.int64)
        mask = np.zeros((B, T), dtype=np.int64)
        hashed = (
            2 + _rolling_hash_many(all_toks) % (self.vocab_size - 2)
            if all_toks else np.empty(0, dtype=np.int64)
        )
        pos = 0
        for i, n in enumerate(per_doc):
            row = hashed[pos: pos + n]
            pos += n
            if self.padding_side == "left":
                input_ids[i, T - n - 1] = CLS_ID
                input_ids[i, T - n:] = row
                mask[i, T - n - 1:] = 1
            else:
                input_ids[i, 0] = CLS_ID
                input_ids[i, 1: n + 1] = row
                mask[i, : n + 1] = 1
        return input_ids, mask


def _id_vectors(ids: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic per-token-id unit-ish vectors: sin of id × per-dim
    frequencies. (B,T) int64 → (B,T,dim) float32."""
    freqs = np.arange(1, dim + 1, dtype=np.float64) * 0.37
    angles = ids[..., None].astype(np.float64) * freqs
    return np.sin(angles).astype(np.float32)


class StubDenseSession:
    """Emits ``last_hidden_state`` (B,T,H) — pooling happens engine-side,
    exactly as with a real transformer ONNX export.

    Hidden states are per-token id vectors plus a masked-mean context mix,
    so every position (including CLS at 0) depends on the WHOLE sequence —
    without the mix, the CLS vector was a constant and cls-pooling tests
    could not detect an operator that ignored its input. The mix is a
    per-row masked mean, so batch composition and padding length still
    cannot change any row's output (the invariance tests rely on that).
    """

    def __init__(self, spec: ModelSpec):
        self.spec = spec
        # models whose export emits a pre-pooled (B,H) sentence embedding
        # (Gemma family / optimum-cli exports — text_embedding.rs:423-443,
        # pooling pass-through src/pooling.rs:22) stub that exact shape, so
        # the 2-D pass-through path is exercised end to end offline
        self._pooled = spec.output_key == "sentence_embedding"
        self.output_names = (
            ["sentence_embedding"] if self._pooled else ["last_hidden_state"]
        )

    def run(self, _out, feeds: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        tok = _id_vectors(feeds["input_ids"], self.spec.dim)  # (B,T,H)
        m = feeds["attention_mask"][..., None].astype(np.float32)
        ctx = (tok * m).sum(axis=1, keepdims=True) / np.maximum(
            m.sum(axis=1, keepdims=True), 1.0
        )
        hidden = (tok + 0.25 * ctx).astype(np.float32)
        if self._pooled:
            pooled = (hidden * m).sum(axis=1) / np.maximum(m.sum(axis=1), 1.0)
            return {"sentence_embedding": pooled.astype(np.float32)}
        return {"last_hidden_state": hidden}


class StubSparseSession:
    """Emits SPLADE-style ``logits`` (B,T,V): deterministic scores where each
    token activates a few vocab dims (possibly negative → relu matters)."""

    def __init__(self, spec: ModelSpec):
        self.spec = spec
        self.output_names = ["logits"]

    def run(self, _out, feeds: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = feeds["input_ids"]
        B, T = ids.shape
        V = self.spec.vocab_size
        logits = np.full((B, T, V), -1.0, dtype=np.float32)
        rows = np.arange(B)[:, None], np.arange(T)[None, :]
        for off, gain in ((0, 2.0), (7, 1.0), (13, -0.5)):
            logits[rows[0], rows[1], (ids + off) % V] = gain * np.cos(ids * 0.11).astype(np.float32)
        return {"logits": logits}


class StubBgem3Session:
    """Emits the ordered triple the bge-m3 export produces
    (src/bgem3_embedding/impl.rs:208-218): dense (B,H), sparse weights
    (B,T,1), colbert (B,T-1,H)."""

    def __init__(self, spec: ModelSpec):
        self.spec = spec
        self.output_names = ["dense", "sparse", "colbert"]

    def run(self, _out, feeds: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = feeds["input_ids"]
        mask = feeds["attention_mask"]
        tok = _id_vectors(ids, self.spec.dim)  # (B,T,H)
        m = mask[..., None].astype(np.float32)
        dense = (tok * m).sum(axis=1) / np.maximum(m.sum(axis=1), 1e-9)
        sparse = np.abs(np.sin(ids * 0.23))[..., None].astype(np.float32)
        colbert = tok[:, 1:, :]
        return {"dense": dense.astype(np.float32), "sparse": sparse, "colbert": colbert}


class StubImageSession:
    """Image tower: consumes preprocessed (B,3,H,W) pixels, emits
    ``image_embeds`` (B,dim) as deterministic channel statistics."""

    def __init__(self, spec: ModelSpec):
        self.spec = spec
        self.output_names = ["image_embeds"]

    def run(self, _out, feeds: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        px = feeds["pixel_values"].astype(np.float64)  # (B,3,H,W)
        B = px.shape[0]
        dim = self.spec.dim
        flat = px.reshape(B, -1)
        # moments at dim deterministic strides → (B, dim)
        idx = (np.arange(dim) * 131) % max(flat.shape[1], 1)
        out = np.sin(flat[:, idx] * 3.1 + np.arange(dim) * 0.7)
        return {"image_embeds": out.astype(np.float32)}


class StubQwenVLSession:
    """Qwen3-VL vision tower stand-in: consumes the REAL patch pipeline's
    output — (N, 3·tps·ps²) patch rows in merge-block order plus the
    (t, h, w) grid (src/models/qwen3.rs:1398: forward(pixel_values,
    image_grid_thw)) — and emits one deterministic ``image_embeds`` row per
    merge block, the token shape the real tower produces after its
    merge-size² spatial merge."""

    def __init__(self, spec: ModelSpec, merge_size: int = 2):
        self.spec = spec
        self.merge_size = merge_size
        self.output_names = ["image_embeds"]

    def run(self, _out, feeds: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        patches = feeds["pixel_patches"].astype(np.float64)  # (N, F)
        n, feat = patches.shape
        per_block = self.merge_size * self.merge_size
        m = max(n // per_block, 1)
        block_mean = patches[: m * per_block].reshape(m, per_block, feat).mean(axis=1)
        dim = self.spec.dim
        idx = (np.arange(dim) * 131) % feat
        out = np.sin(block_mean[:, idx] * 3.1 + np.arange(dim) * 0.7)
        return {"image_embeds": out.astype(np.float32)}


class StubRerankSession:
    """Cross-encoder: consumes pair encodings, emits ``logits`` (B,1); the
    deterministic score grows with query/doc token-id overlap."""

    def __init__(self, spec: ModelSpec):
        self.spec = spec
        self.output_names = ["logits"]

    def run(self, _out, feeds: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = feeds["input_ids"]
        tt = feeds["token_type_ids"]  # 0 = query segment, 1 = doc segment
        mask = feeds["attention_mask"]
        B = ids.shape[0]
        scores = np.zeros((B, 1), dtype=np.float32)
        for i in range(B):
            q = set(ids[i][(tt[i] == 0) & (mask[i] == 1)].tolist()) - {CLS_ID, PAD_ID}
            d = set(ids[i][(tt[i] == 1) & (mask[i] == 1)].tolist()) - {CLS_ID, PAD_ID}
            union = len(q | d)
            scores[i, 0] = (len(q & d) / union) if union else 0.0
        return {"logits": scores}


SESSIONS = {
    "dense": StubDenseSession,
    "sparse": StubSparseSession,
    "bgem3": StubBgem3Session,
    "image": StubImageSession,
    "vl": StubQwenVLSession,
    "rerank": StubRerankSession,
}


def build_stub_session(spec: ModelSpec):
    if spec.kind == "sparse" and spec.sparse_method == "bgem3":
        # bgem3 sparse head consumes hidden states, not vocab logits
        return StubDenseSession(spec)
    return SESSIONS[spec.kind](spec)
