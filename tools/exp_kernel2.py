"""Dev experiment: fused CMUX epilogue Pallas kernel.

Replaces the jnp glue between the matmul kernel and the next scan step
(boot._external_cmux_pallas tail):

    rot_pos = monomial_rotate(P[:, 0], c_pos)   # 11-round jnp barrel
    rot_neg = monomial_rotate(P[:, 1], a_col)
    y = acc + rot_pos + rot_neg + (2Q - P0 - P1); red31(y)

with ONE kernel blocked over gates: barrel in VMEM, add, reduce.
Measured vs the existing jnp path (B3 of profile_boot3: ~212 ms / 502 steps).
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

from oece_tpu.fhe import boot, modmath

N = 1024
B = 1024
NSTEP = 502
Q = modmath.Q27
BG = 256  # gates per block


def _cmux_epilogue_kernel(P_ref, acc_ref, amt_ref, out_ref):
    """P_ref [BG, 2, 2, N] int32 (part, out); acc [BG, 2, N]; amt [BG, 2]
    (per-part rotation amounts in [0, 2N)); out [BG, 2, N]."""
    P = P_ref[...]
    neg = jnp.where(P == 0, 0, Q - P)
    x = jnp.concatenate([P, neg], axis=-1)  # [BG, 2, 2, 2N]
    amt = amt_ref[...].reshape(BG, 2, 1, 1)
    for bbit in range(11):
        sh = 1 << bbit
        rolled = pltpu.roll(x, sh, 3)
        x = jnp.where((amt & sh) != 0, rolled, x)
    rot = x[..., :N]  # [BG, 2, 2, N]
    y = acc_ref[...] + rot[:, 0] + rot[:, 1] + (2 * Q - P[:, 0] - P[:, 1])
    out_ref[...] = modmath.red31(y, Q)


def cmux_epilogue_pallas(P, acc, amt):
    Bn = P.shape[0]
    return pl.pallas_call(
        _cmux_epilogue_kernel,
        grid=(Bn // BG,),
        in_specs=[
            pl.BlockSpec((BG, 2, 2, N), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, 2, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, 2), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BG, 2, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn, 2, N), jnp.int32),
    )(P, acc, amt)


def jnp_ref(P, acc, a_col):
    c_pos = (2 * N - a_col) & (2 * N - 1)
    rot_pos = boot.monomial_rotate(P[:, 0], c_pos, N, Q)
    rot_neg = boot.monomial_rotate(P[:, 1], a_col, N, Q)
    y = acc + rot_pos + rot_neg + (2 * Q - P[:, 0] - P[:, 1])
    return modmath.red31(y, Q)


rng = np.random.default_rng(0)
P = jnp.asarray(rng.integers(0, Q, (B, 2, 2, N), dtype=np.int64).astype(np.int32))
acc = jnp.asarray(rng.integers(0, Q, (B, 2, N), dtype=np.int64).astype(np.int32))
a_col = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.int64).astype(np.int32))
c_pos = (2 * N - a_col) & (2 * N - 1)
amt = jnp.stack([c_pos, a_col], axis=1)

want = np.asarray(jax.jit(jnp_ref)(P, acc, a_col))
got = np.asarray(jax.jit(cmux_epilogue_pallas)(P, acc, amt))
assert np.array_equal(want, got), "epilogue mismatch"
print("cmux epilogue exact ✓", flush=True)


def scanner(step):
    @jax.jit
    def fn(P, acc, amt):
        def body(carry, _):
            out = step(P, carry, amt)
            return out, None

        return jax.lax.scan(body, acc, None, length=NSTEP)[0]

    return fn


def timeit(name, fn, *args, reps=2):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:30s} {dt*1e3:8.1f} ms total  {dt/NSTEP*1e6:8.1f} us/step", flush=True)


timeit("jnp barrel (current B3-ish)", scanner(lambda P, a, m: jnp_ref(P, a, a_col)), P, acc, amt)
timeit("pallas cmux epilogue", scanner(cmux_epilogue_pallas), P, acc, amt)

# also try BG=128 and BG=512
for bg in (128, 512):
    BG = bg  # noqa: redefinition read by kernel closure at trace time

    def _k(P_ref, acc_ref, amt_ref, out_ref, bg=bg):
        P = P_ref[...]
        neg = jnp.where(P == 0, 0, Q - P)
        x = jnp.concatenate([P, neg], axis=-1)
        amt = amt_ref[...].reshape(bg, 2, 1, 1)
        for bbit in range(11):
            sh = 1 << bbit
            rolled = pltpu.roll(x, sh, 3)
            x = jnp.where((amt & sh) != 0, rolled, x)
        rot = x[..., :N]
        y = acc_ref[...] + rot[:, 0] + rot[:, 1] + (2 * Q - P[:, 0] - P[:, 1])
        out_ref[...] = modmath.red31(y, Q)

    def call(P, acc, amt, bg=bg, _k=_k):
        return pl.pallas_call(
            _k,
            grid=(B // bg,),
            in_specs=[
                pl.BlockSpec((bg, 2, 2, N), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bg, 2, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bg, 2), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bg, 2, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.int32),
        )(P, acc, amt)

    got = np.asarray(jax.jit(call)(P, acc, amt))
    assert np.array_equal(want, got)
    timeit(f"pallas epilogue BG={bg}", scanner(call), P, acc, amt)
