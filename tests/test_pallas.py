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


@pytest.mark.parametrize("params_name", ["MICRO", "MICRO_A"])
def test_fused_step_matches_jnp_interpret(params_name):
    """fused_step_pallas == _external_cmux_ginx (jnp gather path), bit-exact,
    for both the exact (MICRO) and approximate (MICRO_A) gadget."""
    from oece_tpu.fhe import boot, golden
    from oece_tpu.fhe.params import PARAM_SETS, BinFHEMethod

    p = PARAM_SETS[params_name]
    rng = np.random.default_rng(7)
    sk = golden.lwe_keygen(p, rng)
    bk = golden.bootstrap_keygen(p, sk, rng, BinFHEMethod.GINX)
    dk_jnp = boot.pack_bootstrap_key(bk, use_pallas=False)
    dk_pal = boot.pack_bootstrap_key(bk, use_pallas=True)
    N, Q = p.N, p.Q
    B = 8
    acc = jnp.asarray(rng.integers(0, Q, (B, 2, N)).astype(np.int32))
    a_col = jnp.asarray(rng.integers(0, 2 * N, (B,)).astype(np.int32))
    i = jnp.arange(N, dtype=jnp.int32)
    idx2n = (i[None, :] - i[:, None]) & (2 * N - 1)
    for step in (0, 3):
        want = np.asarray(
            boot._external_cmux_ginx(acc, a_col, dk_jnp.ginx_kext[step], idx2n, p)
        )
        accp = pk.permute_lanes(acc)
        c_pos = (2 * N - a_col) & (2 * N - 1)
        amt = jnp.broadcast_to(
            jnp.stack([c_pos, a_col], axis=1)[:, :, None], (B, 2, pk.TILE)
        )
        got = pk.fused_step_pallas(
            accp, dk_pal.ginx_pallas[step], amt,
            R=2 * p.d_g_used, Q=Q, B_g=p.B_g, d_used=p.d_g_used,
            g_shift=p.g_shift, block_b=4, interpret=True,
        )
        got = np.asarray(pk.unpermute_lanes(got))
        assert np.array_equal(got, want), (params_name, step)


def test_fused_blind_rotate_matches_jnp_interpret():
    """Whole fused scan (permute once, n fused steps, unpermute) == the jnp
    scan, at MICRO_A."""
    from oece_tpu.fhe import boot, golden
    from oece_tpu.fhe.params import MICRO_A, BinFHEMethod

    p = MICRO_A
    rng = np.random.default_rng(8)
    sk = golden.lwe_keygen(p, rng)
    bk = golden.bootstrap_keygen(p, sk, rng, BinFHEMethod.GINX)
    dk_jnp = boot.pack_bootstrap_key(bk, use_pallas=False)
    dk_pal = boot.pack_bootstrap_key(bk, use_pallas=True)
    B = 4
    acc = jnp.asarray(rng.integers(0, p.Q, (B, 2, p.N)).astype(np.int32))
    a2N = jnp.asarray(rng.integers(0, 2 * p.N, (B, p.n)).astype(np.int32))
    want = np.asarray(boot.blind_rotate_ginx_dev(acc, a2N, dk_jnp))
    got = np.asarray(boot._blind_rotate_fused(acc, a2N, dk_pal, interpret=True))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("params_name", ["MICRO", "MICRO_A"])
def test_rotation_megakernel_matches_jnp_interpret(params_name):
    """blind_rotate_megakernel (whole rotation, one pallas_call) == the jnp
    gather scan, bit-exact, exact and approximate gadgets."""
    from oece_tpu.fhe import boot, golden
    from oece_tpu.fhe.params import PARAM_SETS, BinFHEMethod

    p = PARAM_SETS[params_name]
    rng = np.random.default_rng(9)
    sk = golden.lwe_keygen(p, rng)
    bk = golden.bootstrap_keygen(p, sk, rng, BinFHEMethod.GINX)
    dk_jnp = boot.pack_bootstrap_key(bk, use_pallas=False)
    dk_pal = boot.pack_bootstrap_key(bk, use_pallas=True)
    B = 4
    acc = jnp.asarray(rng.integers(0, p.Q, (B, 2, p.N)).astype(np.int32))
    a2N = jnp.asarray(rng.integers(0, 2 * p.N, (B, p.n)).astype(np.int32))
    want = np.asarray(boot.blind_rotate_ginx_dev(acc, a2N, dk_jnp))
    got = np.asarray(boot._blind_rotate_fused(acc, a2N, dk_pal, interpret=True))
    assert np.array_equal(got, want)


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
