"""Profile the fused bootstrap step phase-by-phase at STD128 shapes.

Each phase runs as its own Pallas kernel so costs can be attributed without
recompiling the (slow-to-compile) full fused kernel:
  build     : packed windows -> conjugated reversed-diagonal dense blocks
  matmul    : digs x rev window spans + limb combine -> pacc
  epilogue  : permuted-space rotations + CMUX add
  decompose : gadget digits of the accumulator
"""

import functools
import sys
import time

sys.path.insert(0, ".")

from oece_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oece_tpu.fhe import pallas_kernels as pk
from oece_tpu.fhe.params import STD128_OPT

p = STD128_OPT
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N, Q = p.N, p.Q
R = 2 * p.d_g_used
M = 16
nt = N // pk.TILE
ndiag = 2 * nt - 1
RT = R * pk.TILE
RMW = R * M * pk.SPANW
TB = min(512, B)

rng = np.random.default_rng(0)
win = jnp.asarray(rng.integers(-(2**31), 2**31, (ndiag, 4, RMW), dtype=np.int64).astype(np.int32))
accp = jnp.asarray(rng.integers(0, Q, (B, 2, N)).astype(np.int32))
digs_rows = jnp.asarray(rng.integers(-64, 65, (B, nt * RT)).astype(np.int8))
rev_flat = jnp.asarray(rng.integers(-128, 128, (ndiag * RT, M * pk.TILE)).astype(np.int8))
pacc = jnp.asarray(rng.integers(0, Q, (B, M // 4, N)).astype(np.int32))
amt = jnp.asarray(rng.integers(0, 2 * N, (B, 2, 1)).astype(np.int32))
amt = jnp.broadcast_to(amt, (B, 2, pk.TILE))

VP = pk.VMEM_PARAMS


def timeit(label, f, *args, reps=20):
    out = f(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{label:12s}: {dt*1e6:8.0f} us/step  ({dt*p.n*1e3:6.0f} ms per {p.n}-step rotation)", flush=True)
    return dt


# ---- build phase -----------------------------------------------------------
def _build_kernel(win_ref, rev_ref):
    TI = pk.TILE
    roww = jax.lax.broadcasted_iota(jnp.int32, (TI, RMW), 0)
    trueidx = 4 * (roww & 31) + (roww >> 5)
    amount = TI - trueidx
    v = amount & 3
    wsh = amount >> 2
    for d in range(ndiag):
        x = jnp.broadcast_to(win_ref[d, 0, :], (TI, RMW)).astype(jnp.uint32)
        for ph in (1, 2, 3):
            xp = jnp.broadcast_to(win_ref[d, ph, :], (TI, RMW)).astype(jnp.uint32)
            x = jnp.where(v == ph, xp, x)
        for b in range(6):
            shw = 1 << b
            rolled = pltpu.roll(x, RMW - shw, 1)
            x = jnp.where((wsh & shw) != 0, rolled, x)
        row0 = (ndiag - 1 - d) * RT
        for r in range(R):
            for m in range(M):
                x32 = x[:, (r * M + m) * pk.SPANW : (r * M + m) * pk.SPANW + pk.TKW]
                planes = [
                    ((x32 >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
                    for j in range(4)
                ]
                rev_ref[row0 + r * TI : row0 + (r + 1) * TI, m * pk.TILE : (m + 1) * pk.TILE] = (
                    jnp.concatenate(planes, axis=1).astype(jnp.int8)
                )


@jax.jit
def build_only(win):
    return pl.pallas_call(
        _build_kernel,
        out_shape=jax.ShapeDtypeStruct((ndiag * RT, M * pk.TILE), jnp.int8),
        compiler_params=VP,
    )(win)


# ---- matmul phase ----------------------------------------------------------
def _mm_kernel(digs_ref, rev_ref, out_ref):
    k = pl.program_id(1)
    wrows = rev_ref[pl.ds((nt - 1 - k) * RT, nt * RT), :]
    res = jax.lax.dot_general(
        digs_ref[...], wrows, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:, :, pl.ds(k * pk.TILE, pk.TILE)] = pk._combine_limbs_tile(
        res.reshape(TB, M // 4, 4, pk.TILE), Q
    )


@jax.jit
def mm_only(digs_rows, rev_flat):
    return pl.pallas_call(
        _mm_kernel,
        grid=(B // TB, nt),
        in_specs=[
            pl.BlockSpec((TB, nt * RT), lambda c, k: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ndiag * RT, M * pk.TILE), lambda c, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, M // 4, N), lambda c, k: (c, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M // 4, N), jnp.int32),
        compiler_params=VP,
    )(digs_rows, rev_flat)


# ---- epilogue phase --------------------------------------------------------
def _epi_kernel(pacc_ref, acc_ref, amt_ref, out_ref):
    EB = min(TB, 64)
    lane = jax.lax.broadcasted_iota(jnp.int32, (EB, 2, N), 2)
    for s0 in range(0, TB, EB):
        P0 = pacc_ref[s0 : s0 + EB, 0:2, :]
        P1 = pacc_ref[s0 : s0 + EB, 2:4, :]
        amt_c = jnp.concatenate([amt_ref[s0 : s0 + EB]] * (N // pk.TILE), axis=-1)
        rot0 = pk._monomial_rotate_perm(P0, amt_c[:, 0:1, :], N, Q, lane)
        rot1 = pk._monomial_rotate_perm(P1, amt_c[:, 1:2, :], N, Q, lane)
        y = acc_ref[s0 : s0 + EB] + rot0 + rot1 + (2 * Q - P0 - P1)
        from oece_tpu.fhe import modmath

        out_ref[s0 : s0 + EB] = modmath.red31(y, Q)


@jax.jit
def epi_only(pacc, accp, amt):
    return pl.pallas_call(
        _epi_kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, M // 4, N), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 2, N), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 2, pk.TILE), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 2, N), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.int32),
        compiler_params=VP,
    )(pacc, accp, amt)


# ---- decompose phase -------------------------------------------------------
def _dec_kernel(acc_ref, digs_ref):
    for pp in range(2):
        col = acc_ref[:, pp, :]
        planes = pk._decompose_lanes(col, Q, p.B_g, p.d_g_used, p.g_shift)
        for dgt, plane in enumerate(planes):
            rr = pp * p.d_g_used + dgt
            for j in range(nt):
                digs_ref[:, j * RT + rr * pk.TILE : j * RT + (rr + 1) * pk.TILE] = (
                    plane[:, j * pk.TILE : (j + 1) * pk.TILE]
                )


@jax.jit
def dec_only(accp):
    return pl.pallas_call(
        _dec_kernel,
        grid=(B // TB,),
        in_specs=[pl.BlockSpec((TB, 2, N), lambda c: (c, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TB, nt * RT), lambda c: (c, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nt * RT), jnp.int8),
        compiler_params=VP,
    )(accp)


if __name__ == "__main__":
    print(f"B={B} TB={TB} R={R} N={N} nt={nt}", flush=True)
    ts = {}
    ts["decompose"] = timeit("decompose", dec_only, accp)
    ts["matmul"] = timeit("matmul", mm_only, digs_rows, rev_flat)
    ts["epilogue"] = timeit("epilogue", epi_only, pacc, accp, amt)
    ts["build"] = timeit("build", build_only, win)
    tot = sum(ts.values())
    print(f"sum of phases: {tot*1e6:.0f} us/step -> {p.n*tot*1e3:.0f} ms/rotation "
          f"-> {B/(p.n*tot):.0f} boots/s ceiling", flush=True)
