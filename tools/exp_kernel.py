"""Dev experiment: negacyclic matmul variants under the REAL v5e VMEM budget
(128 MB — probed; the production kernel was designed for 16 MB).

Variants (fake 502-step scan, B=1024):
  v1: current structure, reshape write, TB=512 x2 chunks, raised vmem limit
  v4: grid (k,): digs + dense whole-VMEM-resident, inner unrolled i-loop into
      a scratch accumulator, fused limb-combine epilogue -> [B, 4, N]
  v5: v4 + in-kernel diagonal build at k==0 (no dense HBM round trip at all;
      input = packed key windows, 2 MB)
  build: standalone diagonal-build kernel cost
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oece_tpu.fhe import pallas_kernels as pk
from oece_tpu.fhe import modmath

TILE = 128
N = 1024
nt = N // TILE
R = 8
M = 16
B = 1024
NSTEP = 502
Q = modmath.Q27
SPANW = pk.SPANW
VLIM = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

rng = np.random.default_rng(0)
digs = jnp.asarray(rng.integers(-64, 64, (nt, B, R * TILE), dtype=np.int64).astype(np.int8))
keys_raw = rng.integers(-128, 128, (R * M, 2 * N), dtype=np.int64).astype(np.int8)
kw = jnp.asarray(pk.pack_keys_for_pallas(keys_raw))
dense = pk.build_diagonals_pallas(kw, R)
jax.block_until_ready(dense)


def timeit(name, fn, *args, reps=2):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.1f} ms total  {dt/NSTEP*1e6:8.1f} us/step "
          f"({B*NSTEP/dt:7.1f} boots/s-equiv)", flush=True)
    return dt


def scanner(step, *xs):
    # The first operand is perturbed by the carry so XLA cannot hoist the
    # step out of the scan (the perturbation is a no-op at runtime).
    @jax.jit
    def fn(x0, *rest):
        def body(carry, _):
            x = jnp.where(carry < 0, x0[..., ::-1], x0)
            out = step(x, *rest)
            return jnp.minimum(carry + out.reshape(-1)[:1].sum(), jnp.int32(0)), None

        return jax.lax.scan(body, jnp.int32(0), None, length=NSTEP)[0]

    return fn


# --- v1: current two-phase structure, reshape write, TB=512 ---------------
TB = 512


def _k_v1(digs_ref, dense_ref, out_ref):
    i_idx = pl.program_id(1)
    res = jax.lax.dot_general(
        digs_ref[0], dense_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    r3 = res.reshape(TB, M, TILE)

    @pl.when(i_idx == 0)
    def _():
        out_ref[...] = r3

    @pl.when(i_idx != 0)
    def _():
        out_ref[...] = out_ref[...] + r3


def v1_call(d, dn):
    return pl.pallas_call(
        _k_v1,
        grid=(nt, nt),
        in_specs=[
            pl.BlockSpec((1, TB, R * TILE), lambda k, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R * TILE, M * TILE), lambda k, i: (k - i + nt - 1, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, M, TILE), lambda k, i: (0, 0, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TB, M, N), jnp.int32),
        compiler_params=VLIM,
    )(d, dn)


def v1(digs, dense):
    return jnp.concatenate([v1_call(digs[:, c0 : c0 + TB], dense) for c0 in range(0, B, TB)])


# --- v4: whole-resident dense+digs, grid (k,), fused combine ---------------
def _combine(a):
    # a [B, 4(part*out), 4(limb), TILE] int32 -> combined mod Q
    acc = modmath.mod_q(a[:, :, 3, :], Q)
    for l in (2, 1, 0):
        acc = modmath.mul_pow8_mod(acc, Q)
        acc = acc + modmath.mod_q(a[:, :, l, :], Q)
        acc = acc - Q * (acc >= Q).astype(jnp.int32)
    return acc


def _k_v4(digs_ref, dense_ref, out_ref, acc_ref):
    k = pl.program_id(0)
    for i in range(nt):
        d = k - i + nt - 1
        dn = dense_ref[d]  # dynamic leading-dim index into resident VMEM
        res = jax.lax.dot_general(
            digs_ref[i], dn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if i == 0:
            acc_ref[...] = res
        else:
            acc_ref[...] = acc_ref[...] + res
    out_ref[...] = _combine(acc_ref[...].reshape(B, 4, 4, TILE))


def v4(digs, dense):
    return pl.pallas_call(
        _k_v4,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((nt, B, R * TILE), lambda k: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * nt - 1, R * TILE, M * TILE), lambda k: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 4, TILE), lambda k: (0, 0, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, M * TILE), jnp.int32)],
        compiler_params=VLIM,
    )(digs, dense)


# --- v5: + in-kernel diagonal build at k==0 --------------------------------
def _build_dense(keys_ref, dense_scr):
    TI = TILE
    RMW = R * M * SPANW
    roww = jax.lax.broadcasted_iota(jnp.int32, (TI, RMW), 0)
    amount = TI - roww
    v = amount & 3
    wsh = amount >> 2
    for d in range(2 * nt - 1):
        x = jnp.broadcast_to(keys_ref[d, 0, :], (TI, RMW)).astype(jnp.uint32)
        for ph in (1, 2, 3):
            xp = jnp.broadcast_to(keys_ref[d, ph, :], (TI, RMW)).astype(jnp.uint32)
            x = jnp.where(v == ph, xp, x)
        for bb in range(6):
            shw = 1 << bb
            rolled = pltpu.roll(x, RMW - shw, 1)
            x = jnp.where((wsh & shw) != 0, rolled, x)
        for r in range(R):
            for m in range(M):
                x32 = x[:, (r * M + m) * SPANW : (r * M + m) * SPANW + TILE // 4]
                planes = [
                    ((x32 >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
                    for j in range(4)
                ]
                tile8 = jnp.concatenate(planes, axis=1).astype(jnp.int8)
                dense_scr[d, r * TI : (r + 1) * TI, m * TILE : (m + 1) * TILE] = tile8


def _k_v5(keys_ref, digs_ref, out_ref, acc_ref, dense_scr):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        _build_dense(keys_ref, dense_scr)

    for i in range(nt):
        d = k - i + nt - 1
        res = jax.lax.dot_general(
            digs_ref[i], dense_scr[d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if i == 0:
            acc_ref[...] = res
        else:
            acc_ref[...] = acc_ref[...] + res
    out_ref[...] = _combine(acc_ref[...].reshape(B, 4, 4, TILE))


def v5(digs, kw):
    return pl.pallas_call(
        _k_v5,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((2 * nt - 1, 4, R * M * SPANW), lambda k: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, B, R * TILE), lambda k: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 4, TILE), lambda k: (0, 0, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4, N), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, M * TILE), jnp.int32),
            pltpu.VMEM((2 * nt - 1, R * TILE, M * TILE), jnp.int8),
        ],
        compiler_params=VLIM,
    )(kw, digs)


# --- correctness: v4/v5 vs v1 + host combine -------------------------------
import time as _t; print('compiling v1', _t.strftime('%H:%M:%S'), flush=True)
o1 = np.asarray(v1(digs, dense))
print('v1 done', _t.strftime('%H:%M:%S'), flush=True)  # [B, M, N] raw accum (plane-permuted cols)
want = modmath.combine_limbs_mod_q(
    np.moveaxis(o1.reshape(B, 4, 4, N), 2, -1).astype(np.int64), Q
)
print('compiling v4', _t.strftime('%H:%M:%S'), flush=True)
o4 = np.asarray(v4(digs, dense))
assert np.array_equal(o4, want), "v4 mismatch"
print("v4 exact vs v1+combine ✓", flush=True)

timeit("v1 2-phase TB=512 (reshape)", scanner(v1, digs, dense), digs, dense)
timeit("v4 resident dense, fused comb", scanner(v4, digs, dense), digs, dense)
timeit("diag build alone", scanner(lambda kw: pk.build_diagonals_pallas(kw, R), kw), kw)
