"""Property tests (hypothesis) for the sketch merge laws and the FLAC
codec — the algebraic guarantees the distributed folds rest on, checked
over generated inputs rather than fixtures.  Pure-kernel level (no Ray
session needed): the distributed wrappers are pinned in
test_sketches.py; these pin the math they rely on."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from email_address_parser_ray.stages.sketches import (
    _bit_length_u64,
    bloom_bits_for,
    bloom_maybe_mask,
    _bloom_indices,
    hash64_column,
    hll_batch_registers,
    hll_estimate,
    hll_merge,
)

_vals = st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=200)


@settings(max_examples=50, deadline=None)
@given(_vals, st.integers(min_value=0, max_value=200))
def test_hll_merge_law_any_split(vals, cut):
    """registers(A ∪ B) == max(registers(A), registers(B)) for ANY
    split point — the property that makes per-block partials exact."""
    cut = min(cut, len(vals))
    h = hash64_column(pa.array(vals, pa.int64()))
    whole = hll_batch_registers(h, p=8)
    parts = np.maximum(
        hll_batch_registers(h[:cut], p=8), hll_batch_registers(h[cut:], p=8)
    )
    assert np.array_equal(whole, parts)


@settings(max_examples=50, deadline=None)
@given(_vals)
def test_hll_duplicates_never_change_registers(vals):
    h = hash64_column(pa.array(vals + vals, pa.int64()))
    h1 = hash64_column(pa.array(vals, pa.int64()))
    assert np.array_equal(hll_batch_registers(h, 8), hll_batch_registers(h1, 8))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**30), min_size=1,
                max_size=300, unique=True))
def test_bloom_never_false_negative(keys):
    n_bits, k = bloom_bits_for(len(keys), 0.01)
    h = hash64_column(pa.array(keys, pa.int64()))
    bm = np.zeros(n_bits // 8, np.uint8)
    idx = _bloom_indices(h, n_bits, k)
    np.bitwise_or.at(
        bm,
        (idx >> np.uint64(3)).astype(np.int64),
        np.left_shift(1, (idx & np.uint64(7)).astype(np.int64)).astype(np.uint8),
    )
    assert bloom_maybe_mask(bm, h, n_bits, k).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=64))
def test_bit_length_u64_matches_python(ws):
    w = np.array(ws, np.uint64)
    got = _bit_length_u64(w)
    assert [int(x) for x in got] == [int(v).bit_length() for v in ws]


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=400),   # samples
    st.integers(min_value=0, max_value=2),     # fixed order
    st.booleans(),                             # escape residuals
    st.integers(min_value=0, max_value=2),     # partition order
    st.sampled_from([1, 2]),                   # channels
)
def test_flac_roundtrip_property(n, order, escape, po, channels):
    from email_address_parser_ray.stages.flac import encode_flac, parse_flac

    rng = np.random.RandomState(n * 7 + order)
    pcm = np.cumsum(rng.randint(-300, 301, size=(n, channels)), axis=0)
    pcm = pcm.clip(-32768, 32767)
    if n <= order:
        return  # encoder refuses degenerate fixed orders by design
    payload = encode_flac(
        pcm, 8000, block_size=128, subframe=f"fixed{order}",
        partition_order=po, escape=escape,
        channel_mode="mid_side" if channels == 2 else "independent",
    )
    rate, frames = parse_flac(payload)
    back = np.round(frames * (1 << 15)).astype(np.int64)
    assert rate == 8000
    assert np.array_equal(back, pcm)
