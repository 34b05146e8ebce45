"""TPU-native batched gate bootstrapping.

This is the replacement for OpenFHE's ``EvalBinGate`` (reference call sites
src/gate.cpp:133,171) — the operation that accounts for ~99% of the
reference's encrypted runtime (SURVEY.md §3.5).  Instead of the reference's
one-gate-per-OpenMP-task model (circuit.cpp:698-710), gates are evaluated in
large batches: a whole circuit level (plus test-case batching) bootstraps as
one ``lax.scan`` whose body is a single int8 MXU matmul.

Design (GINX / CGGI blind rotation, ternary secret split into +/- parts):

  * The accumulator RLWE ciphertext ACC lives as int32 [B, 2, N] in [0, Q).
  * Each of the n scan steps gadget-decomposes ACC into signed int8 digits
    [B, 2*d_g*N] and multiplies by the step's RGSW key, materialized as a
    dense block-negacyclic int8 matrix [2*d_g*N, 2*2*L*N] (L = 4 key limbs).
    The contraction is exact: |sum| <= 2*d_g*N * 128 * 128 = 2**27 < 2**31.
  * Limb accumulators are recombined mod Q with int32-only arithmetic
    (fhe/modmath.py), per-gate monomial rotations are applied with gathers,
    and the CMUX add closes the step.
  * Sample-extract, Q->Q_ks mod switch, a key-switch int8 matmul, and the
    final Q_ks->q mod switch produce fresh gate ciphertexts.

Bit-exactness: every step is exact integer arithmetic, so the whole pipeline
matches fhe/golden.py bit-for-bit given identical keys (tests/test_boot.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import golden, modmath
from . import pallas_kernels as pk
from .params import BinFHEParams, BinFHEMethod, BinGate, Q27

# Largest per-kernel-call batch (VMEM bound); bigger batches are chunked.
PALLAS_MAX_B = 512

# Per-step kernel batch chunk (VMEM-bound).  The r2/r3 GINX "megakernel"
# (all n steps in one pallas_call, permuted-lane accumulator) is DELETED
# (VERDICT r3 #6): it never produced hardware evidence, and the prebuilt
# rev/rev2 layouts made both its premise (per-step dense build) and its
# lane-permute machinery obsolete.  The AP megakernel remains — it is the
# binary-base AP TPU vehicle (blind_rotate_ap_megakernel).
FUSED_MAX_B = 1024

# Run Pallas kernels in interpreter mode (tests on the virtual CPU mesh can
# then exercise the exact production kernel path without a TPU).
PALLAS_INTERPRET = os.environ.get("OECE_PALLAS_INTERPRET") == "1"

# rev2 rotation as one whole-rotation megakernel (steps = grid dim) vs a
# lax.scan of per-step kernels.  DEFAULT ON (VERDICT r4 #2: the megakernel
# is the fastest measured pipeline — 2,259 boots/s at B=2048 vs 2,136 for
# the scan — and also cuts circuit-level walls; ROOFLINE §4).
# OECE_ROT_MEGA=0 restores the per-step scan.
ROT_MEGA = os.environ.get("OECE_ROT_MEGA", "1") == "1"

# H-way VPU/MXU software pipelining inside the rot megakernel (chunk h+1's
# rotate-diff/decompose overlaps chunk h's MXU dots — pk._rot_megakernel_pipe).
# 0/1 = single-chunk kernel.
ROT_PIPE = int(os.environ.get("OECE_ROT_PIPE", "0"))

# Fixed gate enumeration for per-gate test-vector / prep-weight tables.
GATE_ORDER = [
    BinGate.AND,
    BinGate.OR,
    BinGate.NAND,
    BinGate.NOR,
    BinGate.XOR,
    BinGate.XNOR,
]
GATE_INDEX = {g: i for i, g in enumerate(GATE_ORDER)}

# gate_prepare weights (golden.gate_prepare): prep = w1*c1 + w2*c2 mod q.
PREP_WEIGHTS = np.array(
    [[1, 1], [1, 1], [1, 1], [1, 1], [2, -2], [2, -2]], dtype=np.int32
)


# ---------------------------------------------------------------------------
# Key packing (host side, NumPy): golden.BootstrapKey -> device arrays.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DeviceBootKeys:
    """Device-resident bootstrap key material.

    ginx_kext : int8 [n, parts=2, rows=2*d_g, out=2, L, 2N]
                limb decomposition of each RGSW key polynomial followed by the
                limbs of its negation mod Q (for the negacyclic wrap).
                (jnp gather path; None when packed for the Pallas kernel)
    ginx_pallas : int32 [n, 2*nt-1, 4, R*M, SPANW] per-step diagonal key
                windows for the Pallas negacyclic kernel (TPU path)
    ap_kext   : int8 [n, d_r, B_r, rows, out, L, 2N] (AP, jnp gather path)
    ap_pallas : int32 [n*d_r, 2*nt-1, 4, R*Ma*SPANW] windows of the v=1
                rotation keys (binary-base AP, B_r=2: each step is one
                shared-key external product + a public-bit select)
    ksk       : int8 [N*d_ks, n+1, 2]  centered base-256 limbs mod Q_ks
    tv_table  : int32 [len(GATE_ORDER), N] test vectors mod Q
    """

    params: BinFHEParams
    method: BinFHEMethod
    ginx_kext: Optional[jnp.ndarray]
    ap_kext: Optional[jnp.ndarray]
    ksk: jnp.ndarray
    tv_table: jnp.ndarray
    ginx_pallas: Optional[jnp.ndarray] = None
    ap_pallas: Optional[jnp.ndarray] = None
    # Prebuilt TRUE-layout reversed-diagonal dense blocks, int8
    # [n, (2*nt-1)*R*128, M*128] (fhe/devkeygen.py; the round-3 hot path —
    # kills the per-step dense build and the lane permutation entirely).
    ginx_rev: Optional[jnp.ndarray] = None
    # Part-INTERLEAVED prebuilt diagonals int8
    # [n, (2*nt-1)*2*R*128, 8*128] — row (d', part, r, u) at
    # d'*2RT + part*RT + r*128 + u — for the fused rotated-difference step
    # (pk.rot_step_true / pk.blind_rotate_rot_megakernel; ROOFLINE §4
    # lever 2: rotation moves before decomposition, the epilogue kernel
    # and its [B, 4, N] HBM round-trip disappear).  Golden twin:
    # golden.blind_rotate_ginx_rot.
    ginx_rev2: Optional[jnp.ndarray] = None


def _dbk_flatten(k: DeviceBootKeys):
    return (
        (k.ginx_kext, k.ap_kext, k.ksk, k.tv_table, k.ginx_pallas,
         k.ap_pallas, k.ginx_rev, k.ginx_rev2),
        (k.params, k.method),
    )


def _dbk_unflatten(aux, children):
    params, method = aux
    (ginx_kext, ap_kext, ksk, tv_table, ginx_pallas, ap_pallas,
     ginx_rev, ginx_rev2) = children
    return DeviceBootKeys(
        params=params, method=method, ginx_kext=ginx_kext, ap_kext=ap_kext,
        ksk=ksk, tv_table=tv_table, ginx_pallas=ginx_pallas,
        ap_pallas=ap_pallas, ginx_rev=ginx_rev, ginx_rev2=ginx_rev2,
    )


jax.tree_util.register_pytree_node(DeviceBootKeys, _dbk_flatten, _dbk_unflatten)


def _poly_ext_limbs(polys: np.ndarray, Q: int) -> np.ndarray:
    """[..., N] int64 mod Q -> [..., L, 2N] int8: limbs of v and of (-v mod Q).

    Used to materialize negacyclic matrices on device by gathering along the
    last (2N) axis.
    """
    v = np.asarray(polys, dtype=np.int64) % Q
    neg = (Q - v) % Q
    ext = np.concatenate([v, neg], axis=-1)  # [..., 2N]
    limbs = modmath.to_limbs_i8(ext)  # [..., 2N, L]
    return np.moveaxis(limbs, -1, -2)  # [..., L, 2N]


def pack_bootstrap_key(
    bk: golden.BootstrapKey, use_pallas: Optional[bool] = None
) -> DeviceBootKeys:
    """Pack keys for the device.  use_pallas defaults to True on TPU (the
    barrel-shift MXU kernel) and False elsewhere (jnp gather path)."""
    p = bk.params
    Q = p.Q
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() not in ("cpu",) or PALLAS_INTERPRET
        ) and p.N % pk.TILE == 0
    ginx_kext = ap_kext = ginx_pallas = ap_pallas = None
    if bk.method == BinFHEMethod.GINX:
        # [n, parts, rows, out, N]
        brk = np.stack([bk.brk_pos, bk.brk_neg], axis=1)
        kext_np = _poly_ext_limbs(brk, Q)  # [n, parts, rows, out, L, 2N]
        if use_pallas:
            # kernel row order: r-major with m = (part, out, limb)
            n = kext_np.shape[0]
            R = kext_np.shape[2]
            M = kext_np.shape[1] * kext_np.shape[3] * kext_np.shape[4]
            perm = np.transpose(kext_np, (0, 2, 1, 3, 4, 5)).reshape(
                n, R * M, 2 * p.N
            )
            wins = np.stack(
                [pk.pack_keys_for_pallas(perm[i]) for i in range(n)]
            )
            ginx_pallas = jnp.asarray(wins)
        else:
            ginx_kext = jnp.asarray(kext_np)
    else:
        if use_pallas and p.B_r == 2:
            # binary-base AP: pack only the v=1 keys; v=0 is the identity
            # and becomes a public-bit select on device.
            n_, d_r = bk.ak.shape[0], bk.ak.shape[1]
            rows, out = bk.ak.shape[3], bk.ak.shape[4]
            Ma = out * modmath.N_LIMBS
            nt = p.N // pk.TILE
            wins = np.empty(
                (n_ * d_r, 2 * nt - 1, 4, rows * Ma * pk.SPANW), np.int32
            )
            for i in range(n_):
                for j in range(d_r):
                    kext = _poly_ext_limbs(bk.ak[i, j, 1], Q)  # [rows,out,L,2N]
                    perm = kext.reshape(rows * Ma, 2 * p.N)
                    wins[i * d_r + j] = pk.pack_keys_for_pallas(perm).reshape(
                        2 * nt - 1, 4, rows * Ma * pk.SPANW
                    )
            ap_pallas = jnp.asarray(wins)
        else:
            ap_kext = jnp.asarray(_poly_ext_limbs(bk.ak, Q))

    # Key-switch key: center mod Q_ks then 2 signed base-256 limbs.
    Qks = p.Q_ks
    ksk = np.asarray(bk.ksk, dtype=np.int64).reshape(p.N * p.d_ks, p.n + 1) % Qks
    ksk_c = np.where(ksk >= Qks // 2, ksk - Qks, ksk)
    l0 = ksk_c - ((ksk_c + 128) >> 8 << 8)  # centered low limb in [-128, 127]
    l1 = (ksk_c - l0) >> 8  # in [-64, 64]
    assert np.all(l0 >= -128) and np.all(l0 <= 127)
    assert np.all(l1 >= -128) and np.all(l1 <= 127)
    assert np.array_equal(l0 + (l1.astype(np.int64) << 8), ksk_c)
    ksk_limbs = np.stack([l0, l1], axis=-1).astype(np.int8)

    tv = np.stack([golden.make_test_vector(p, g) for g in GATE_ORDER]).astype(np.int64)
    return DeviceBootKeys(
        params=p,
        method=bk.method,
        ginx_kext=ginx_kext,
        ap_kext=ap_kext,
        ksk=jnp.asarray(ksk_limbs),
        tv_table=jnp.asarray(tv, dtype=jnp.int32),
        ginx_pallas=ginx_pallas,
        ap_pallas=ap_pallas,
    )


# ---------------------------------------------------------------------------
# Device primitives (all int32-safe, jit-compatible).
# ---------------------------------------------------------------------------


def gadget_digits_dev(x: jnp.ndarray, B: int, d: int) -> jnp.ndarray:
    """x int32 [...,] in [0, Q) -> int8 [..., d]; matches golden.gadget_digits."""
    log_b = int(np.log2(B))
    half = B // 2
    digs = []
    cur = x
    for _ in range(d - 1):
        r = cur & (B - 1)
        r = r - (B * (r >= half)).astype(jnp.int32)
        digs.append(r.astype(jnp.int8))
        cur = (cur - r) >> log_b
    digs.append(cur.astype(jnp.int8))
    return jnp.stack(digs, axis=-1)


def gadget_digits_approx_dev(
    x: jnp.ndarray, Q: int, B: int, d_eff: int, shift: int
) -> jnp.ndarray:
    """Approximate gadget digits (golden.gadget_digits_approx, bit-exact):
    center mod Q, round away ``shift`` low bits, d_eff signed base-B digits."""
    c = x - Q * (x >= (Q + 1) // 2).astype(jnp.int32)
    cur = (c + (1 << (shift - 1))) >> shift  # arithmetic shift = floor div
    half = B // 2
    log_b = int(np.log2(B))
    digs = []
    for _ in range(d_eff - 1):
        r = ((cur + half) & (B - 1)) - half
        digs.append(r.astype(jnp.int8))
        cur = (cur - r) >> log_b
    digs.append(cur.astype(jnp.int8))
    return jnp.stack(digs, axis=-1)


def acc_gadget_digits_dev(acc: jnp.ndarray, p: BinFHEParams) -> jnp.ndarray:
    """Dispatch exact/approximate gadget digits: [..., d_g_used] int8."""
    if p.d_g_eff:
        return gadget_digits_approx_dev(acc, p.Q, p.B_g, p.d_g_eff, p.g_shift)
    return gadget_digits_dev(acc, p.B_g, p.d_g)


def signed_digits_dev(x: jnp.ndarray, B: int, d: int) -> jnp.ndarray:
    """All-signed digits (key switching); matches golden.signed_digits."""
    log_b = int(np.log2(B))
    half = B // 2
    digs = []
    cur = x
    for _ in range(d):
        r = cur & (B - 1)
        r = r - (B * (r >= half)).astype(jnp.int32)
        digs.append(r.astype(jnp.int8))
        cur = (cur - r) >> log_b
    return jnp.stack(digs, axis=-1)


def monomial_rotate(P: jnp.ndarray, c: jnp.ndarray, N: int, Q: int) -> jnp.ndarray:
    """P [B, ..., N] * X^{c[B]} in Z_Q[X]/(X^N+1); c in [0, 2N).

    Gather-free (XLA gathers lower catastrophically on TPU): a CYCLIC
    per-row barrel over length N (log2(N) masked static rolls) followed by
    a sign fix-up.  With c = q*N + c', X^c * P cyclically rotated by c'
    wraps coefficient k past X^N exactly when (k < c') XOR q, where it
    picks up the negacyclic minus sign.  Half the lanes and one fewer
    round than the naive barrel over the [P, -P] 2N extension.
    """
    cshape = (P.shape[0],) + (1,) * (P.ndim - 1)
    cb = c.reshape(cshape)
    cp = cb & (N - 1)  # c mod N
    x = P
    # cyclic right-rotate row b by cp[b]: X'[k] = X[(k - cp) mod N]
    for b in range(int(np.log2(N))):
        sh = 1 << b
        rolled = jnp.roll(x, sh, axis=-1)
        x = jnp.where((cp & sh) != 0, rolled, x)
    k = jnp.arange(N, dtype=c.dtype)
    wrap = (k < cp) ^ (cb >= N)  # negate where wrapped past X^N
    return jnp.where(wrap, jnp.where(x == 0, 0, Q - x), x)


def _acc_init(tv_sel: jnp.ndarray, b2N: jnp.ndarray, N: int, Q: int) -> jnp.ndarray:
    """ACC = (0, tv * X^{b~}) as int32 [B, 2, N]."""
    rot = monomial_rotate(tv_sel, b2N, N, Q)  # [B, N]
    return jnp.stack([jnp.zeros_like(rot), rot], axis=1)


def _digits_rbn(acc, p: BinFHEParams):
    """acc [B, 2, N] -> gadget digits [R=2*d_g_used, B, N] int8,
    r = (poly, dig)."""
    digs = acc_gadget_digits_dev(acc, p)  # [B, 2, N, d_g_used]
    return jnp.transpose(digs, (1, 3, 0, 2)).reshape(
        2 * p.d_g_used, acc.shape[0], p.N
    )


def _external_cmux_pallas(acc, a_col, kwin_i, p: BinFHEParams):
    """Pallas-kernel version of one GINX step (TPU hot path).

    kwin_i : int32 [2*nt-1, 4, R*M, SPANW] packed key windows for this step.

    The limb combine runs inside the matmul kernel (the raw [B, M, N] limb
    accumulators never reach HBM — 4x less output traffic); the per-gate
    monomial rotations use the half-barrel jnp path (measured faster than
    a VMEM-resident Pallas barrel, which is VPU-bound either way).
    """
    Q, N = p.Q, p.N
    B = acc.shape[0]
    digs = _digits_rbn(acc, p)  # [R, B, N]
    dt = pk.pack_digits_for_pallas(digs)  # [nt, B, R*128]
    P4 = pk.negacyclic_matmul_combine(
        dt, kwin_i, 2 * p.d_g_used, Q, max_b=PALLAS_MAX_B,
        interpret=PALLAS_INTERPRET,
    )
    P = P4.reshape(B, 2, 2, N)  # [B, part, out, N] mod Q
    c_pos = (2 * N - a_col) & (2 * N - 1)
    rot_pos = monomial_rotate(P[:, 0], c_pos, N, Q)
    rot_neg = monomial_rotate(P[:, 1], a_col, N, Q)
    y = acc + rot_pos + rot_neg + (2 * Q - P[:, 0] - P[:, 1])
    return modmath.red31(y, Q)


def _external_cmux_ginx(acc, a_col, kext_i, idx2n, p: BinFHEParams, tp_axis=None):
    """One GINX step: parallel CMUX pair against RGSW(s+_i), RGSW(s-_i).

    acc    : int32 [B, 2, N] in [0, Q)
    a_col  : int32 [B] = a~_i per gate, in [0, 2N)
    kext_i : int8 [parts=2, rows, out=2, L, 2N]; under tensor parallelism
             (tp_axis set) this is the local shard of the ``rows`` axis and
             the partial products are psum-reduced over ``tp_axis``.
    idx2n  : int32 [N, N] constant gather index (k - i) mod 2N
    """
    Q, N, d_g = p.Q, p.N, p.d_g_used
    B = acc.shape[0]
    digs = acc_gadget_digits_dev(acc, p)  # [B, 2, N, d_g_used]
    digs = jnp.transpose(digs, (0, 1, 3, 2)).reshape(B, 2 * d_g, N)
    if tp_axis is not None:
        rows_local = kext_i.shape[1]
        r0 = jax.lax.axis_index(tp_axis) * rows_local
        digs = jax.lax.dynamic_slice_in_dim(digs, r0, rows_local, axis=1)
    dense = kext_i[..., idx2n]  # [parts, rows, out, L, N, N] int8
    prod = jnp.einsum(
        "bri,prolik->bpokl",
        digs,
        dense,
        preferred_element_type=jnp.int32,
    )  # [B, parts, out, N, L]
    if tp_axis is not None:
        prod = jax.lax.psum(prod, tp_axis)
    P = modmath.combine_limbs_mod_q(prod, Q)  # [B, parts, 2, N]
    c_pos = (2 * N - a_col) & (2 * N - 1)
    rot_pos = monomial_rotate(P[:, 0], c_pos, N, Q)
    rot_neg = monomial_rotate(P[:, 1], a_col, N, Q)
    y = acc + rot_pos + rot_neg + (2 * Q - P[:, 0] - P[:, 1])
    return modmath.red31(y, Q)


def _external_cmux_prebuilt(acc, a_col, rev_i, p: BinFHEParams, interpret=None):
    """One GINX step against a PREBUILT true-layout dense block (the round-3
    hot path): decompose (jnp) -> one window-span MXU dot per output tile
    with the limb combine fused -> in-VMEM rotation/CMUX epilogue.
    Bit-exact equal to _external_cmux_ginx given equivalent key material."""
    if interpret is None:
        interpret = PALLAS_INTERPRET
    Q, N = p.Q, p.N
    B = acc.shape[0]
    P4 = pk.window_matmul_dec_true(
        acc, rev_i, 2 * p.d_g_used, Q, p.B_g, p.d_g_used, p.g_shift,
        block_b=FUSED_MAX_B, interpret=interpret,
    )  # [B, 4, N] mod Q, (part, out) planes
    c_pos = (2 * N - a_col) & (2 * N - 1)
    amt = jnp.stack([c_pos, a_col], axis=1)  # [B, 2]
    # rotation amounts are multiples of 2N/q (the q->2N mod switch):
    # those low barrel rounds are statically dead.
    zlb = max(0, int(np.log2(2 * N // p.q)))
    return pk.cmux_epilogue_true(
        P4.reshape(B, 2, 2, N), acc, amt, Q, block_b=FUSED_MAX_B,
        interpret=interpret, zero_low_bits=zlb,
    )


def _external_cmux_rot(acc, a_col, rev2_i, p: BinFHEParams, interpret=None):
    """One GINX step, CGGI rotated-difference form, as ONE fused kernel
    (pk.rot_step_true).  Bit-exact equal to golden.blind_rotate_ginx_rot's
    step given equivalent key material (tests/test_rot_form.py)."""
    if interpret is None:
        interpret = PALLAS_INTERPRET
    Q, N = p.Q, p.N
    c_pos = (2 * N - a_col) & (2 * N - 1)
    amt = jnp.stack([c_pos, a_col], axis=1)  # [B, 2]
    zlb = max(0, int(np.log2(2 * N // p.q)))
    return pk.rot_step_true(
        acc, rev2_i, amt, Q, p.B_g, p.d_g_used, p.g_shift,
        block_b=FUSED_MAX_B, interpret=interpret, zero_low_bits=zlb,
    )


def blind_rotate_ginx_dev(
    acc: jnp.ndarray, a2N: jnp.ndarray, keys: DeviceBootKeys, tp_axis=None
) -> jnp.ndarray:
    """Scan the n CMUX steps.  a2N: int32 [B, n] in [0, 2N)."""
    p = keys.params
    N = p.N
    if keys.ginx_rev2 is not None:
        assert tp_axis is None, "tensor parallelism uses the jnp key layout"
        if ROT_MEGA:
            # all n steps as ONE pallas_call (step = grid dim, accumulator
            # VMEM-resident): removes the per-step launch overhead that
            # dominates small-batch circuit levels
            zlb = max(0, int(np.log2(2 * N // p.q)))
            pipe = ROT_PIPE
            if pipe > 1 and min(FUSED_MAX_B, acc.shape[0]) % pipe:
                pipe = 0  # batch block not divisible; fall back
            return pk.blind_rotate_rot_megakernel(
                acc, keys.ginx_rev2, a2N, p.Q, p.B_g, p.d_g_used,
                p.g_shift, block_b=FUSED_MAX_B,
                interpret=PALLAS_INTERPRET, zero_low_bits=zlb,
                pipeline=pipe,
            )

        def body_rot(carry, xs):
            a_col, rev2_i = xs
            return _external_cmux_rot(carry, a_col, rev2_i, p), None

        acc, _ = jax.lax.scan(body_rot, acc, (a2N.T, keys.ginx_rev2))
        return acc
    if keys.ginx_rev is not None:
        assert tp_axis is None, "tensor parallelism uses the jnp key layout"

        def body_prebuilt(carry, xs):
            a_col, rev_i = xs
            return _external_cmux_prebuilt(carry, a_col, rev_i, p), None

        acc, _ = jax.lax.scan(body_prebuilt, acc, (a2N.T, keys.ginx_rev))
        return acc
    if keys.ginx_pallas is not None:
        assert tp_axis is None, "tensor parallelism uses the jnp key layout"

        def body_pallas(carry, xs):
            a_col, kwin_i = xs
            return _external_cmux_pallas(carry, a_col, kwin_i, p), None

        acc, _ = jax.lax.scan(body_pallas, acc, (a2N.T, keys.ginx_pallas))
        return acc

    i = jnp.arange(N, dtype=jnp.int32)
    idx2n = (i[None, :] - i[:, None]) & (2 * N - 1)  # [N(i), N(k)] -> (k-i)

    def body(carry, xs):
        a_col, kext_i = xs
        return _external_cmux_ginx(carry, a_col, kext_i, idx2n, p, tp_axis), None

    acc, _ = jax.lax.scan(body, acc, (a2N.T, keys.ginx_kext))
    return acc


def _blind_rotate_ap_fused(
    acc: jnp.ndarray, a2N: jnp.ndarray, keys: DeviceBootKeys,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Binary-base AP rotation (B_r=2) as one Pallas megakernel: each of the
    n*d_r steps is a shared-key external product + public-bit select —
    MXU-shaped, unlike the per-gate-gather jnp path below."""
    if interpret is None:
        interpret = PALLAS_INTERPRET
    p = keys.params
    N, two_n = p.N, 2 * p.N
    d_r = p.d_r
    neg_a = (two_n - a2N) & (two_n - 1)  # [B, n]; rotate by -a_i*s_i total
    j = jnp.arange(d_r, dtype=jnp.int32)
    bits = (neg_a[:, :, None] >> j) & 1  # [B, n, d_r]
    bits = jnp.transpose(bits, (1, 2, 0)).reshape(p.n * d_r, acc.shape[0], 1)
    accp = pk.permute_lanes(acc)
    accp = pk.blind_rotate_ap_megakernel(
        accp, keys.ap_pallas, bits,
        R=2 * p.d_g_used, Q=p.Q, B_g=p.B_g, d_used=p.d_g_used,
        g_shift=p.g_shift, block_b=FUSED_MAX_B, interpret=interpret,
    )
    return pk.unpermute_lanes(accp)


def blind_rotate_ap_dev(
    acc: jnp.ndarray, a2N: jnp.ndarray, keys: DeviceBootKeys
) -> jnp.ndarray:
    """AP/DM blind rotation: per (i, digit j), per-gate key row gathered by
    digit value and applied as a batched external product.

    Batched-GEMV shaped (per-gate matrices), so it is the parity/compat path
    for generic bases; binary-base AP keys route to the Pallas megakernel
    (_blind_rotate_ap_fused).
    """
    if keys.ap_pallas is not None:
        return _blind_rotate_ap_fused(acc, a2N, keys)
    p = keys.params
    Q, N, d_g, B_r, d_r = p.Q, p.N, p.d_g_used, p.B_r, p.d_r
    B = a2N.shape[0]
    i = jnp.arange(N, dtype=jnp.int32)
    idx2n = (i[None, :] - i[:, None]) & (2 * N - 1)

    neg_a = (2 * N - a2N) & (2 * N - 1)  # rotate by -a_i * s_i total

    def body(carry, xs):
        na_col, ak_i = xs  # na_col [B]; ak_i [d_r, B_r, rows, out, L, 2N]
        acc = carry
        for j in range(d_r):
            v = (na_col >> (j * int(np.log2(B_r)))) & (B_r - 1)  # [B]
            k_sel = jnp.take(ak_i[j], v, axis=0)  # [B, rows, out, L, 2N]
            digs = acc_gadget_digits_dev(acc, p)
            digs = jnp.transpose(digs, (0, 1, 3, 2)).reshape(B, 2 * d_g, N)
            dense = k_sel[..., idx2n]  # [B, rows, out, L, N, N]
            prod = jnp.einsum(
                "bri,brolik->bokl", digs, dense, preferred_element_type=jnp.int32
            )
            new = modmath.combine_limbs_mod_q(prod, Q)
            # v == 0 is the identity rotation: keep acc (golden parity)
            acc = jnp.where((v == 0)[:, None, None], acc, new)
        return acc, None

    acc, _ = jax.lax.scan(body, acc, (neg_a.T, keys.ap_kext))
    return acc


def sample_extract(acc: jnp.ndarray, Q: int) -> jnp.ndarray:
    """RLWE [B, 2, N] -> LWE [B, N+1] mod Q (coefficient 0)."""
    a = acc[:, 0]
    rest = a[:, 1:][:, ::-1]
    neg = jnp.where(rest == 0, 0, Q - rest)
    a_ext = jnp.concatenate([a[:, :1], neg], axis=1)
    return jnp.concatenate([a_ext, acc[:, 1, :1]], axis=1)


def key_switch_dev(ct_N: jnp.ndarray, keys: DeviceBootKeys, tp_axis=None) -> jnp.ndarray:
    """LWE [B, N+1] mod Q_ks -> [B, n+1] mod Q_ks via one int8 matmul.

    Under tensor parallelism keys.ksk is a shard of the contraction axis
    (N*d_ks) and the partial sums are psum-reduced over tp_axis."""
    p = keys.params
    Qks, N, n = p.Q_ks, p.N, p.n
    B = ct_N.shape[0]
    digs = signed_digits_dev(ct_N[:, :N], p.B_ks, p.d_ks)  # [B, N, d_ks]
    digs = digs.reshape(B, N * p.d_ks)
    if tp_axis is not None:
        k_local = keys.ksk.shape[0]
        k0 = jax.lax.axis_index(tp_axis) * k_local
        digs = jax.lax.dynamic_slice_in_dim(digs, k0, k_local, axis=1)
    prod = jnp.einsum(
        "bk,kml->bml", digs, keys.ksk, preferred_element_type=jnp.int32
    )  # [B, n+1, 2]
    if tp_axis is not None:
        prod = jax.lax.psum(prod, tp_axis)
    val = prod[..., 0] + (prod[..., 1] << 8)
    out = -val
    out = out.at[:, n].add(ct_N[:, N])
    return out & (Qks - 1)


def _mod_switch_pow2(x: jnp.ndarray, from_log2: int, to_log2: int) -> jnp.ndarray:
    if to_log2 >= from_log2:
        return (x << (to_log2 - from_log2)) & ((1 << to_log2) - 1)
    sh = from_log2 - to_log2
    return ((x + (1 << (sh - 1))) >> sh) & ((1 << to_log2) - 1)


def bootstrap_batch(
    prep: jnp.ndarray, gate_ids: jnp.ndarray, keys: DeviceBootKeys, tp_axis=None
) -> jnp.ndarray:
    """Bootstrap a batch of prepared LWE cts [B, n+1] mod q -> fresh cts.

    ``prep`` is the gate linear combination (golden.gate_prepare);
    ``gate_ids`` indexes GATE_ORDER and selects each gate's test vector.
    """
    p = keys.params
    Q, N, q, Qks = p.Q, p.N, p.q, p.Q_ks
    log_q = int(np.log2(q))
    log_qks = int(np.log2(Qks))
    # q -> 2N (exact: q <= 2N, power-of-two ratio)
    ct2N = _mod_switch_pow2(prep, log_q, int(np.log2(2 * N)))
    a2N, b2N = ct2N[:, :-1], ct2N[:, -1]
    tv_sel = jnp.take(keys.tv_table, gate_ids, axis=0)  # [B, N]
    acc = _acc_init(tv_sel, b2N, N, Q)
    if keys.method == BinFHEMethod.GINX:
        acc = blind_rotate_ginx_dev(acc, a2N, keys, tp_axis)
    else:
        assert tp_axis is None, "AP method supports data parallelism only"
        acc = blind_rotate_ap_dev(acc, a2N, keys)
    ct_N = sample_extract(acc, Q)
    ct_N = ct_N.at[:, -1].set(
        jax.lax.rem(ct_N[:, -1] + Q // 8, jnp.int32(Q))
    )
    ct_ks = modmath.mod_switch_from_q27(ct_N, log_qks, Q)
    ct_n = key_switch_dev(ct_ks, keys, tp_axis)
    return _mod_switch_pow2(ct_n, log_qks, log_q)


def prepare_gates(
    ct1: jnp.ndarray, ct2: jnp.ndarray, gate_ids: jnp.ndarray, q: int
) -> jnp.ndarray:
    """Per-gate linear combination w1*c1 + w2*c2 mod q (golden.gate_prepare)."""
    w = jnp.take(jnp.asarray(PREP_WEIGHTS), gate_ids, axis=0)  # [B, 2]
    y = w[:, :1] * ct1 + w[:, 1:] * ct2  # |y| <= 4q
    return (y + 4 * q) & (q - 1)


def eval_bin_gate_batch(
    keys: DeviceBootKeys,
    gate_ids: jnp.ndarray,
    ct1: jnp.ndarray,
    ct2: jnp.ndarray,
    tp_axis=None,
) -> jnp.ndarray:
    """Batched EvalBinGate (gate.cpp:133,171 parity): one bootstrap per gate,
    all gates in the batch fused into one device program."""
    prep = prepare_gates(ct1, ct2, gate_ids, keys.params.q)
    return bootstrap_batch(prep, gate_ids, keys, tp_axis)
