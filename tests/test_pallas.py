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


@pytest.mark.parametrize("B,N", [(8, 128), (4, 256), (12, 128)])
def test_window_kernel_matches_reference_interpret(B, N):
    """negacyclic_matmul_window (pack_digits_rows + reversed-diagonal window
    matmul, limb combine fused) == reference contraction + host limb combine.
    B=12 with max_b=8 exercises the ragged-batch chunking."""
    from oece_tpu.fhe import modmath

    R, M = 8, 16
    Q = modmath.Q27
    rng = np.random.default_rng(4)
    digs = rng.integers(-64, 67, (R, B, N)).astype(np.int8)
    kx = rng.integers(-128, 128, (R * M, 2 * N)).astype(np.int8)
    ref = np.asarray(
        pk.negacyclic_matmul_reference(jnp.asarray(digs), jnp.asarray(kx))
    )  # [B, M, N] int32 raw
    want = modmath.combine_limbs_mod_q(
        np.moveaxis(ref.reshape(B, 4, 4, N), 2, -1).astype(np.int64), Q
    )
    dr = pk.pack_digits_rows(jnp.asarray(digs))
    kw = jnp.asarray(pk.pack_keys_for_pallas(kx))
    got = np.asarray(
        pk.negacyclic_matmul_window(dr, kw, R, Q, max_b=8, interpret=True)
    )
    assert np.array_equal(got, want)


def test_build_diagonals_reverse_order():
    """build_diagonals_pallas(reverse=True)[d] == forward[ndiag-1-d]."""
    R, M, N = 8, 16, 128
    rng = np.random.default_rng(5)
    kx = rng.integers(-128, 128, (R * M, 2 * N)).astype(np.int8)
    kw = jnp.asarray(pk.pack_keys_for_pallas(kx))
    fwd = np.asarray(pk.build_diagonals_pallas(kw, R, interpret=True))
    rev = np.asarray(pk.build_diagonals_pallas(kw, R, interpret=True, reverse=True))
    assert np.array_equal(rev, fwd[::-1])


def test_window_matmul_vmem_guard():
    """Oversized resident operands fail loudly (ADVICE r1), not with an
    opaque Mosaic allocation error."""
    R, N = 8, 128
    nt = N // pk.TILE
    MT = 16 * pk.TILE
    digs_rows = jnp.zeros((8, nt * R * pk.TILE), jnp.int8)
    # fake a rev_flat whose resident footprint exceeds the budget by lying
    # about nothing: just check the guard formula directly with a tiny budget
    rev_flat = jnp.zeros(((2 * nt - 1) * R * pk.TILE, MT), jnp.int8)
    resident = (2 * nt - 1) * R * pk.TILE * MT
    assert resident < pk.VMEM_PARAMS.vmem_limit_bytes  # sane at test shapes
    with pytest.raises(AssertionError):
        pk.window_matmul_pallas(
            jnp.zeros((2**15, nt * R * pk.TILE), jnp.int8),
            jnp.zeros(((2 * nt - 1) * R * pk.TILE, 2**12 * pk.TILE), jnp.int8),
            nt, R, 17, block_b=2**15, interpret=True,
        )


def test_permute_lanes_roundtrip():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(0, 1000, (3, 2, 256)).astype(np.int32))
    assert np.array_equal(np.asarray(pk.unpermute_lanes(pk.permute_lanes(x))), np.asarray(x))
    # spot-check the mapping: true t = 128k + 4w + j -> lane 128k + 32j + w
    y = np.asarray(pk.permute_lanes(x))
    assert y[0, 0, 32 * 2 + 5] == np.asarray(x)[0, 0, 4 * 5 + 2]
    assert y[1, 1, 128 + 32 * 3 + 31] == np.asarray(x)[1, 1, 128 + 4 * 31 + 3]


def test_ap_megakernel_matches_golden_interpret():
    """Binary-base AP megakernel == golden AP bootstrap, bit-exact."""
    import dataclasses

    from oece_tpu.fhe import boot, golden, lwe
    from oece_tpu.fhe.params import MICRO_A, BinFHEMethod, BinGate

    p = dataclasses.replace(MICRO_A, name="MICRO_A2", B_r=2)
    rng = np.random.default_rng(11)
    sk = golden.lwe_keygen(p, rng)
    bk = golden.bootstrap_keygen(p, sk, rng, BinFHEMethod.AP)
    dk = boot.pack_bootstrap_key(bk, use_pallas=True)
    assert dk.ap_pallas is not None and dk.ap_pallas.shape[0] == p.n * p.d_r
    B = 4
    bits1 = rng.integers(0, 2, B)
    bits2 = rng.integers(0, 2, B)
    c1 = lwe.encrypt_bits(sk, bits1, rng)
    c2 = lwe.encrypt_bits(sk, bits2, rng)
    gids = rng.integers(0, len(boot.GATE_ORDER), B).astype(np.int32)
    import oece_tpu.fhe.boot as bootmod

    old = bootmod.PALLAS_INTERPRET
    bootmod.PALLAS_INTERPRET = True
    try:
        got = np.asarray(
            boot.eval_bin_gate_batch(
                dk, jnp.asarray(gids), jnp.asarray(c1), jnp.asarray(c2)
            )
        )
    finally:
        bootmod.PALLAS_INTERPRET = old
    for b in range(B):
        gate = boot.GATE_ORDER[int(gids[b])]
        want = golden.eval_bin_gate(p, bk, gate, c1[b], c2[b])
        assert np.array_equal(got[b] % p.q, want % p.q), (b, gate)
