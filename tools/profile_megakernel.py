"""Phase breakdown of the rot megakernel, measured IN-KERNEL (round 5).

The H-way pipelined megakernel (pk._rot_megakernel_pipe) measured the same
~2,230 boots/s as the single-chunk kernel, so either Mosaic does not
overlap the VPU rotate/decompose with the MXU dots, or the dots themselves
are the wall.  This tool answers which, by timing three *diagnostic*
variants of the same kernel (not crypto-correct — the skipped phase is
replaced by a trivial fill):

  full   : the production kernel (_rot_megakernel body)
  mxu    : decompose replaced by a constant digit fill — dots + combine +
           rev2 stream only
  vpu    : dot loop removed — rotate-diff + decompose + carry only

Chained executions with one final fetch (ROOFLINE §1 rules).  Writes
artifacts/megakernel_phases.json.

Usage: python tools/profile_megakernel.py [B] [iters]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oece_tpu.utils import apply_platform_env

apply_platform_env()

from oece_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oece_tpu.fhe import modmath
from oece_tpu.fhe import pallas_kernels as pk
from oece_tpu.fhe.params import STD128_OPT

TILE = pk.TILE


def _diag_kernel(
    rev2_ref, amt_ref, accin_ref, out_ref, digs_ref,
    *, nt, R, TB, Q, B_g, d_used, g_shift, N, b_lo, mode,
):
    RT2 = 2 * R * TILE

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = accin_ref[...]

    def get_amt(s0, EB, part):
        return jnp.broadcast_to(
            amt_ref[0, pl.ds(s0, EB), part : part + 1], (EB, N)
        )[:, None, :]

    if mode in ("full", "vpu"):
        pk._rot_diff_decompose(
            out_ref, get_amt, digs_ref, nt=nt, R=R, TB=TB, Q=Q, B_g=B_g,
            d_used=d_used, g_shift=g_shift, N=N, b_lo=b_lo,
        )
    else:  # mxu: constant digit fill, same scratch writes
        digs_ref[...] = jnp.ones((TB, nt * RT2), jnp.int8)

    if mode in ("full", "mxu"):
        for k in range(nt):
            res = jax.lax.dot_general(
                digs_ref[...],
                rev2_ref[0, pl.ds((nt - 1 - k) * RT2, nt * RT2), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            comb = pk._combine_limbs_tile(res.reshape(TB, 2, 4, TILE), Q)
            y = out_ref[:, :, pl.ds(k * TILE, TILE)] + comb
            out_ref[:, :, pl.ds(k * TILE, TILE)] = modmath.red31(y, Q)
    else:  # vpu: fold the digit scratch back into the carry, no dots
        for k in range(nt):
            d8 = digs_ref[:, pl.ds(k * RT2, 2 * TILE)].astype(jnp.int32)
            y = out_ref[:, :, pl.ds(k * TILE, TILE)] + d8.reshape(TB, 2, TILE)
            out_ref[:, :, pl.ds(k * TILE, TILE)] = modmath.red31(
                jnp.where(y < 0, y + Q, y), Q
            )


def run_mode(mode, B, iters, rev2, p):
    N = p.N
    nt = N // TILE
    R = 2 * p.d_g_used
    RT2 = 2 * R * TILE
    MT = rev2.shape[2]
    nsteps = rev2.shape[0]
    TB = min(1024, B)
    zlb = max(0, int(np.log2(2 * N // p.q)))
    kernel = functools.partial(
        _diag_kernel, nt=nt, R=R, TB=TB, Q=p.Q, B_g=p.B_g,
        d_used=p.d_g_used, g_shift=p.g_shift, N=N, b_lo=zlb, mode=mode,
    )

    def call(rev2, acc, amt):
        # rev2 passes as a jit ARGUMENT: closure capture would bake the
        # 7.9 GB key into the lowered program (ROOFLINE §1 trap)
        return pl.pallas_call(
            kernel,
            grid=(B // TB, nsteps),
            in_specs=[
                pl.BlockSpec(
                    (1, rev2.shape[1], MT), lambda c, i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TB, 2), lambda c, i: (i, c, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (TB, 2, N), lambda c, i: (c, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (TB, 2, N), lambda c, i: (c, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.int32),
            scratch_shapes=[pltpu.VMEM((TB, nt * RT2), jnp.int8)],
            compiler_params=pk.VMEM_PARAMS,
        )(rev2, amt, acc)

    fn = jax.jit(call)
    key = jax.random.PRNGKey(0)
    acc = jax.random.randint(key, (B, 2, N), 0, p.Q, jnp.int32)
    amt = jax.random.randint(key, (nsteps, B, 2), 0, 2 * N, jnp.int32)
    np.asarray(fn(rev2, acc, amt)[0, 0, :1])  # compile + warmup barrier
    t0 = time.time()
    x = acc
    for _ in range(iters):
        x = fn(rev2, x, amt)  # chained: each run consumes the previous output
    np.asarray(x[0, 0, :1])
    dt = (time.time() - t0) / iters
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    p = STD128_OPT
    from oece_tpu.fhe import devkeygen

    _sk, _z, dkeys = devkeygen.device_keygen(p, seed=0, layout="rev2")
    rev2 = dkeys.ginx_rev2
    res = {"B": B, "iters": iters, "set": p.name}
    for mode in ("full", "mxu", "vpu"):
        dt = run_mode(mode, B, iters, rev2, p)
        res[mode] = {
            "s_per_rotation_batch": round(dt, 4),
            "us_per_step_per_1024gates": round(
                dt / rev2.shape[0] / (B / 1024) * 1e6, 1
            ),
            "boots_per_sec_equivalent": round(B / dt, 1),
        }
        print(f"# {mode}: {dt*1e3:.1f} ms / {B}-gate rotation "
              f"({res[mode]['us_per_step_per_1024gates']} us/step/1024g)",
              flush=True)
    os.makedirs("artifacts", exist_ok=True)
    with open(f"artifacts/megakernel_phases_B{B}.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
