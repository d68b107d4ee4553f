"""The reference's documented usage flows (USAGE.markdown), replayed
1:1 against this library — every step of every documented snippet has a
direct equivalent, so a js-hll user can port their code mechanically.
"""

from __future__ import annotations

import numpy as np

from js_hll_spark import HLL, HLLConfig
from js_hll_spark.codec import decode, to_hex
from js_hll_spark.core.hll import intersection_cardinality, intersection_error
from js_hll_spark.hashing import murmur3_x64_128


def test_basics_flow():
    """USAGE.markdown:13-31: construct, addRaw a pre-hashed value,
    cardinality, standard error, clear."""
    hashed_value = (0xABABABAB << 32) | 0xCDCDCDCD  # js [lo, hi] pair
    s = HLL(HLLConfig(7, 5), explicit_threshold=0, sparse_on=False)
    s.add_raw64(np.array([hashed_value], dtype=np.uint64))
    # faithful ceil semantics: linear counting gives m*ln(128/127)=1.004,
    # and the reference's cardinality() ceils it — js-hll reports 2 here
    assert s.algorithm_cardinality() < 1.01
    assert s.cardinality() == 2
    std_err = s.cardinality_error() * s.cardinality()
    assert abs(std_err - (1.04 / np.sqrt(2**7)) * s.cardinality()) < 1e-12
    s.clear()
    assert s.cardinality() == 0


def test_murmur3_flow():
    """USAGE.markdown:33-48: hash a raw 8-byte key with murmur3 x64-128
    and addRaw the result (seeded, as documented)."""
    raw_key = bytes([0xDE, 0xAD, 0xBE, 0xEF, 0xFE, 0xED, 0xFA, 0xCE])
    h1, _h2 = murmur3_x64_128(raw_key, seed=0x123456)
    s = HLL(HLLConfig(13, 5))
    s.add_raw64(np.array([h1], dtype=np.uint64))
    assert s.cardinality() == 1


def test_state_clone_fold_flow():
    """USAGE.markdown:50-75: registers/log2m/registerWidth state access,
    clone, fold-to-smaller-log2m identical to having built there."""
    s = HLL(HLLConfig(11, 5), explicit_threshold=0, sparse_on=False)
    # enough values that every low register has a low-index occupant:
    # fold == direct-build requires the folded registers to dominate the
    # contributions of dropped high-index values (rho <= diff), which
    # holds once registers 0..2^5-1 are all occupied at the source grain
    vals = np.random.default_rng(7).integers(0, 2**63, 200_000, dtype=np.uint64)
    s.add_raw64(vals)
    assert s.config.log2m == 11 and s.config.regwidth == 5
    assert len(s.registers()) == 2**11
    c = s.clone()
    assert bytes(c.to_bytes()) == bytes(s.to_bytes())
    folded = s.fold(5)
    direct = HLL(HLLConfig(5, 5), explicit_threshold=0, sparse_on=False)
    direct.add_raw64(vals)
    assert np.array_equal(folded.registers(), direct.registers())


def test_encode_decode_union_intersection_flow():
    """USAGE.markdown:77-124: hex round-trip, clone-then-union leaving
    operands untouched, inclusion-exclusion intersection whose error is
    governed by the union (quantified by intersection_error)."""
    rng = np.random.default_rng(3)
    a = HLL(HLLConfig(12, 5), explicit_threshold=0, sparse_on=False)
    b = HLL(HLLConfig(12, 5), explicit_threshold=0, sparse_on=False)
    shared = rng.integers(0, 2**63, 2000, dtype=np.uint64)
    a.add_raw64(np.concatenate([shared, rng.integers(0, 2**63, 3000, dtype=np.uint64)]))
    b.add_raw64(np.concatenate([shared, rng.integers(0, 2**63, 1000, dtype=np.uint64)]))
    # hex round-trip (schema 1 FULL)
    back = decode(bytes.fromhex(to_hex(a.to_bytes())[2:]))
    assert np.array_equal(back.registers(), a.registers())
    # union via clone: operands untouched
    before = bytes(a.to_bytes())
    u = a.clone().union(b)
    assert bytes(a.to_bytes()) == before
    assert u.cardinality() >= max(a.cardinality(), b.cardinality())
    # inclusion-exclusion
    inter = intersection_cardinality(a, b)
    err = intersection_error(a, b)
    assert abs(inter - 2000) < 3 * err
    assert err >= a.cardinality_error() * u.algorithm_cardinality()
