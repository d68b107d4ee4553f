"""Hypothesis property tests over the full config space (SURVEY.md §5.2-2):
encode∘decode = id for all four formats at every (log2m 4..20, rw 1..8),
promotion chains, union/fold algebra under random inputs. The golden
vectors pin (9,5) and (11,5); these pin everything else."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from js_hll_spark import HLL, HLLConfig, codec

configs = st.tuples(st.integers(4, 20), st.integers(1, 8))


@settings(max_examples=60, deadline=None)
@given(configs, st.integers(0, 2 ** 64 - 1), st.integers(0, 5000))
def test_full_roundtrip_bit_exact(cfg, seed, n):
    log2m, rw = cfg
    s = HLL(HLLConfig(log2m, rw), explicit_threshold=0, sparse_on=False)
    values = np.random.default_rng(seed).integers(0, 2 ** 64, n, dtype=np.uint64)
    s.add_raw64(values)
    data = codec.encode(s)
    back = codec.decode(data)
    np.testing.assert_array_equal(back.registers(), s.registers())
    assert codec.encode(back) == data
    if n:
        a, b = back.algorithm_cardinality(), s.algorithm_cardinality()
        assert a == b or (math.isnan(a) and math.isnan(b))


@settings(max_examples=40, deadline=None)
@given(configs, st.integers(0, 2 ** 32), st.integers(0, 200))
def test_promotion_chain_roundtrips(cfg, seed, n):
    """EXPLICIT -> SPARSE -> FULL as n grows; every intermediate state
    serializes and round-trips exactly, including mode."""
    log2m, rw = cfg
    s = HLL(HLLConfig(log2m, rw))
    values = np.random.default_rng(seed).integers(0, 2 ** 64, n, dtype=np.uint64)
    s.add_raw64(values)
    data = codec.encode(s)
    back = codec.decode(data)
    assert back.storage_algorithm == s.storage_algorithm
    np.testing.assert_array_equal(back.registers(), s.registers())
    assert codec.encode(back) == data


@settings(max_examples=40, deadline=None)
@given(configs, st.integers(0, 2 ** 32), st.integers(1, 2000), st.integers(2, 6))
def test_union_partition_invariance_property(cfg, seed, n, parts):
    log2m, rw = cfg
    values = np.random.default_rng(seed).integers(0, 2 ** 64, n, dtype=np.uint64)
    direct = HLL(HLLConfig(log2m, rw), explicit_threshold=0)
    direct.add_raw64(values)
    merged = HLL(HLLConfig(log2m, rw), explicit_threshold=0)
    rng = np.random.default_rng(seed ^ 0xABCDEF)
    perm = rng.permutation(n)
    for chunk in np.array_split(values[perm], parts):
        p = HLL(HLLConfig(log2m, rw), explicit_threshold=0)
        p.add_raw64(chunk)
        merged.union(p)
    assert merged.to_bytes() == direct.to_bytes()


@settings(max_examples=30, deadline=None)
@given(
    st.integers(6, 18), st.integers(1, 8), st.integers(0, 2 ** 32),
)
def test_fold_chain_equals_single_fold(big, rw, seed):
    """fold(a)->fold(b) == fold(b) directly (dense input)."""
    values = np.random.default_rng(seed).integers(
        0, 2 ** 64, 50 * (1 << big), dtype=np.uint64
    )
    s = HLL(HLLConfig(big, rw), explicit_threshold=0)
    s.add_raw64(values)
    mid = max(4, big - 1)
    low = max(4, big - 2)
    chained = s.fold(mid).fold(low)
    direct = s.fold(low)
    np.testing.assert_array_equal(chained.registers(), direct.registers())


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_decode_never_crashes_uncontrolled(data):
    """Arbitrary bytes either decode to a valid sketch or raise ValueError
    — never an uncontrolled exception."""
    try:
        s = codec.decode(data)
        s.algorithm_cardinality()
    except ValueError:
        pass


def test_pack_unpack_exhaustive_sweep():
    """Exhaustive small-space sweep of the bit packer (the reference's
    util-test regime, /root/reference/test/util-test.js:120-229): every
    word width 1..16, word counts 0..40, pseudo-random values — pack then
    unpack is the identity and the padded tail stays at the bottom of the
    last byte (all-zero bits)."""
    from js_hll_spark.codec import _pack_words, _unpack_words

    for bits in range(1, 17):
        maxval = (1 << bits) - 1
        for n in (0, 1, 2, 3, 7, 8, 9, 40):
            vals = (
                np.arange(n, dtype=np.uint64) * np.uint64(2654435761)
            ) & np.uint64(maxval)
            packed = _pack_words(vals, bits)
            assert len(packed) == (n * bits + 7) // 8
            back = _unpack_words(packed, bits, n)
            np.testing.assert_array_equal(back, vals)
            # padding bits beyond n*bits are zero
            if n and (n * bits) % 8:
                tail_bits = np.unpackbits(
                    np.frombuffer(packed[-1:], dtype=np.uint8)
                )
                pad = 8 - (n * bits) % 8
                assert not tail_bits[-pad:].any()
