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


@pytest.mark.parametrize("B,N", [(8, 128), (4, 256)])
def test_combine_kernel_matches_reference_interpret(B, N):
    """negacyclic_matmul_combine == reference contraction + host limb
    combine (m order (part, out, limb), limb minor)."""
    from oece_tpu.fhe import modmath

    R, M = 8, 16
    Q = modmath.Q27
    rng = np.random.default_rng(2)
    digs = rng.integers(-64, 67, (R, B, N)).astype(np.int8)
    kx = rng.integers(-128, 128, (R * M, 2 * N)).astype(np.int8)
    ref = np.asarray(
        pk.negacyclic_matmul_reference(jnp.asarray(digs), jnp.asarray(kx))
    )  # [B, M, N] int32 raw
    want = modmath.combine_limbs_mod_q(
        np.moveaxis(ref.reshape(B, 4, 4, N), 2, -1).astype(np.int64), Q
    )
    dt = pk.pack_digits_for_pallas(jnp.asarray(digs))
    kw = jnp.asarray(pk.pack_keys_for_pallas(kx))
    got = np.asarray(
        pk.negacyclic_matmul_combine(dt, kw, R, Q, max_b=4, interpret=True)
    )
    assert np.array_equal(got, want)


@pytest.mark.parametrize("B,N", [(8, 128), (4, 256)])
def test_cmux_epilogue_matches_jnp(B, N):
    from oece_tpu.fhe import boot, modmath

    Q = modmath.Q27
    rng = np.random.default_rng(3)
    P = jnp.asarray(rng.integers(0, Q, (B, 2, 2, N)).astype(np.int32))
    acc = jnp.asarray(rng.integers(0, Q, (B, 2, N)).astype(np.int32))
    a_col = jnp.asarray(rng.integers(0, 2 * N, (B,)).astype(np.int32))
    c_pos = (2 * N - a_col) & (2 * N - 1)
    rot_pos = boot.monomial_rotate(P[:, 0], c_pos, N, Q)
    rot_neg = boot.monomial_rotate(P[:, 1], a_col, N, Q)
    want = np.asarray(
        modmath.red31(acc + rot_pos + rot_neg + (2 * Q - P[:, 0] - P[:, 1]), Q)
    )
    amt = jnp.stack([c_pos, a_col], axis=1)
    got = np.asarray(
        pk.cmux_epilogue_pallas(P, acc, amt, Q, block_b=4, interpret=True)
    )
    assert np.array_equal(got, want)


def test_pack_digits_roundtrip():
    rng = np.random.default_rng(1)
    digs = rng.integers(-64, 67, (8, 4, 256)).astype(np.int8)
    dt = np.asarray(pk.pack_digits_for_pallas(jnp.asarray(digs)))
    # [nt, B, R*TILE]: element (r, b, i) lives at [i//128, b, r*128 + i%128]
    for r in (0, 3, 7):
        for b in (0, 3):
            for i in (0, 127, 128, 255):
                assert dt[i // 128, b, r * 128 + i % 128] == digs[r, b, i]
