"""Property-based tests (Hypothesis) for the pure-Python/NumPy kernels that
mirror the Catalyst/DuckDB expressions — fast (no Spark round-trip per
example); the cross-engine agreement of the same kernels is pinned separately
in test_text_functions / test_vector_functions."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fastembed_rs_spark.functions.text import HASH_MOD
from fastembed_rs_spark.models.stub import StubTokenizer, rolling_hash
from fastembed_rs_spark.operators.embed import l2n, pool
from fastembed_rs_spark.operators.preprocessing import smart_resize

texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)


@given(texts)
def test_rolling_hash_range_and_determinism(s):
    h = rolling_hash(s)
    assert 0 <= h < HASH_MOD
    assert h == rolling_hash(s)


@given(st.lists(texts, min_size=1, max_size=8))
def test_tokenizer_padding_invariants(batch):
    tok = StubTokenizer(vocab_size=997, max_length=64)
    ids, mask = tok.encode_batch(batch)
    assert ids.shape == mask.shape and ids.shape[0] == len(batch)
    assert ids.shape[1] <= 64
    # mask is a right-padded prefix: once 0, stays 0
    for row in mask:
        seen_zero = False
        for m in row:
            if m == 0:
                seen_zero = True
            assert not (seen_zero and m == 1)
    # padded positions carry PAD id 0
    assert ((mask == 0) <= (ids == 0)).all()


@given(
    st.integers(min_value=1, max_value=6).flatmap(
        lambda b: st.tuples(
            st.just(b),
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=1, max_value=16),
        )
    )
)
@settings(max_examples=40)
def test_mean_pool_ignores_padding(dims):
    b, t, h = dims
    rng = np.random.default_rng(b * 1000 + t * 10 + h)
    hidden = rng.normal(size=(b, t, h)).astype(np.float32)
    mask = np.zeros((b, t), dtype=np.int64)
    lens = rng.integers(1, t + 1, size=b)
    for i, ln in enumerate(lens):
        mask[i, :ln] = 1
    pooled = pool(hidden, mask, "mean")
    # corrupting padded positions must not change the pooled output
    corrupted = hidden.copy()
    corrupted[mask == 0] = 999.0
    assert np.allclose(pooled, pool(corrupted, mask, "mean"))
    # equals the plain mean over the unpadded prefix
    for i, ln in enumerate(lens):
        assert np.allclose(pooled[i], hidden[i, :ln].mean(axis=0), atol=1e-5)


@given(st.integers(min_value=1, max_value=5), st.integers(min_value=1, max_value=32))
@settings(max_examples=40)
def test_l2n_unit_norm(b, d):
    rng = np.random.default_rng(b * 100 + d)
    x = rng.normal(size=(b, d)).astype(np.float32) + 0.01
    n = np.linalg.norm(l2n(x), axis=1)
    assert np.allclose(n, 1.0, atol=1e-5)


@given(
    st.integers(min_value=1, max_value=4000),
    st.integers(min_value=1, max_value=4000),
)
@settings(max_examples=80)
def test_smart_resize_properties(h, w):
    if max(h, w) / min(h, w) > 200.0:
        return
    factor = 32
    rh, rw = smart_resize(h, w, factor, 0, 1280 * 1280)
    assert rh % factor == 0 and rw % factor == 0
    assert rh >= factor and rw >= factor
    assert rh * rw <= 1280 * 1280
