"""modmath: int32-safe modular primitives vs exact int64 arithmetic."""

import numpy as np

from oece_tpu.fhe import modmath as mm
from oece_tpu.fhe.params import Q27


def test_limb_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.integers(0, Q27, 10000)
    limbs = mm.to_limbs_i8(v)
    assert limbs.dtype == np.int8
    assert np.array_equal(mm.from_limbs(limbs), v)


def test_red31_mod_q():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**31, 100000).astype(np.int64)
    got = mm.red31(x.astype(np.int64))
    assert np.array_equal(got, x % Q27)
    xs = rng.integers(-(2**30), 2**30, 100000).astype(np.int64)
    assert np.array_equal(mm.mod_q(xs), xs % Q27)


def test_mul_pow8():
    rng = np.random.default_rng(2)
    x = rng.integers(0, Q27, 100000).astype(np.int64)
    assert np.array_equal(mm.mul_pow8_mod(x), (x * 256) % Q27)


def test_combine_limbs():
    rng = np.random.default_rng(3)
    r = rng.integers(-(2**27), 2**27 + 1, (50000, 4)).astype(np.int64)
    want = sum(r[:, l] * (1 << (8 * l)) for l in range(4)) % Q27
    got = mm.combine_limbs_mod_q(r)
    assert np.array_equal(got, want)


def test_combine_limbs_int32_safe():
    """Same computation carried out in int32 must not overflow."""
    rng = np.random.default_rng(4)
    r = rng.integers(-(2**27), 2**27 + 1, (50000, 4)).astype(np.int64)
    want = mm.combine_limbs_mod_q(r)
    got32 = mm.combine_limbs_mod_q(r.astype(np.int32))
    assert np.array_equal(got32.astype(np.int64), want)


def test_mod_switch():
    rng = np.random.default_rng(5)
    x = rng.integers(0, Q27, 200000).astype(np.int64)
    for M_log2 in (9, 10, 11, 15):
        want = (x * (1 << M_log2) + Q27 // 2) // Q27
        got = mm.mod_switch_from_q27(x, M_log2)
        assert np.array_equal(got, want), M_log2
        got32 = mm.mod_switch_from_q27(x.astype(np.int32), M_log2)
        assert np.array_equal(got32.astype(np.int64), want)
