"""Negacyclic NTT vs the exact schoolbook product."""

import numpy as np
import pytest

from oece_tpu.fhe import golden as g, ntt
from oece_tpu.fhe.params import Q27


@pytest.mark.parametrize("N", [128, 512, 1024])
def test_ntt_roundtrip(N):
    rng = np.random.default_rng(0)
    a = rng.integers(0, Q27, (4, N))
    fa = ntt.ntt_forward(a)
    back = ntt.ntt_inverse(fa)
    assert np.array_equal(back, a)


@pytest.mark.parametrize("N", [128, 1024])
def test_ntt_negacyclic_mul(N):
    rng = np.random.default_rng(1)
    a = rng.integers(0, Q27, (3, N))
    b = rng.integers(0, Q27, N)
    want = g.negacyclic_mul(a, b, Q27)
    got = ntt.negacyclic_mul_ntt(a, np.broadcast_to(b, a.shape))
    assert np.array_equal(got, want)


def test_psi_is_2nth_root():
    for N in (128, 1024):
        psi = ntt.find_psi(N)
        assert pow(psi, N, Q27) == Q27 - 1
        assert pow(psi, 2 * N, Q27) == 1


def test_ntt_dev_matches_host():
    """Device (jnp int32) NTT == host reference, bit-exact, fwd/inv/mul."""
    import jax.numpy as jnp

    from oece_tpu.fhe import golden, ntt_dev

    rng = np.random.default_rng(7)
    for N in (64, 256, 1024):
        a = rng.integers(0, Q27, (3, N), dtype=np.int64)
        b = rng.integers(0, Q27, (3, N), dtype=np.int64)
        fa_host = ntt.ntt_forward(a)
        fa_dev = np.asarray(ntt_dev.ntt_forward_dev(jnp.asarray(a, jnp.int32)))
        np.testing.assert_array_equal(fa_dev, fa_host)
        ia_host = ntt.ntt_inverse(fa_host)
        ia_dev = np.asarray(ntt_dev.ntt_inverse_dev(jnp.asarray(fa_dev)))
        np.testing.assert_array_equal(ia_dev, ia_host)
        want = np.stack([golden.negacyclic_mul(x, y, Q27) for x, y in zip(a, b)])
        got = np.asarray(
            ntt_dev.negacyclic_mul_ntt_dev(
                jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32)
            )
        )
        np.testing.assert_array_equal(got, want)
