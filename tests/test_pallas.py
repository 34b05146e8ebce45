"""Pallas negacyclic kernel vs the jnp gather reference (interpret mode).

On real TPU the same comparison runs compiled (scripts/bench); here the
kernel logic itself is validated CPU-side via the Pallas interpreter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oece_tpu.fhe import pallas_kernels as pk


@pytest.mark.parametrize("B,N", [(8, 128), (4, 256)])
def test_kernel_matches_reference_interpret(B, N):
    R, M = 8, 16
    rng = np.random.default_rng(0)
    digs = rng.integers(-64, 67, (R, B, N)).astype(np.int8)
    kx = rng.integers(-128, 128, (R * M, 2 * N)).astype(np.int8)
    ref = np.asarray(pk.negacyclic_matmul_reference(jnp.asarray(digs), jnp.asarray(kx)))
    dt = pk.pack_digits_for_pallas(jnp.asarray(digs))
    kw = jnp.asarray(pk.pack_keys_for_pallas(kx))
    got = np.asarray(pk.negacyclic_matmul_pallas(dt, kw, R, interpret=True))
    assert np.array_equal(got, ref)


def test_pack_digits_roundtrip():
    rng = np.random.default_rng(1)
    digs = rng.integers(-64, 67, (8, 4, 256)).astype(np.int8)
    dt = np.asarray(pk.pack_digits_for_pallas(jnp.asarray(digs)))
    # [nt, B, R*TILE]: element (r, b, i) lives at [i//128, b, r*128 + i%128]
    for r in (0, 3, 7):
        for b in (0, 3):
            for i in (0, 127, 128, 255):
                assert dt[i // 128, b, r * 128 + i % 128] == digs[r, b, i]
