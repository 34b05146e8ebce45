"""Dev tool: isolate the Pallas pipeline stages inside a 502-step scan.

All timings use a host transfer as the barrier (axon tunnel semantics).
"""

import sys
import time

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from oece_tpu.fhe import boot, keycache, modmath
from oece_tpu.fhe import pallas_kernels as pk
from oece_tpu.fhe.params import STD128_OPT, BinFHEMethod

p = STD128_OPT
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
R = 2 * p.d_g

sk, bk = keycache.load_or_generate(p, BinFHEMethod.GINX, 0)
dkeys = boot.pack_bootstrap_key(bk)
kw = dkeys.ginx_pallas  # [n, 15, 4, R*M*SPANW]
print("keys ready", kw.shape, flush=True)


def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def timeit(name, fn, *args, reps=3):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.1f} ms  ({B/dt:8.1f} boots/s-equiv)", flush=True)
    return dt


digs0 = jnp.zeros((R, B, p.N), jnp.int8)
dt0 = pk.pack_digits_for_pallas(digs0)  # [nt, B, R*128]
nt = dt0.shape[0]


# 1. build-only scan
@jax.jit
def scan_build(kw):
    def body(carry, kwin_i):
        d = pk.build_diagonals_pallas(kwin_i, R)
        return carry + d[0, 0, 0].astype(jnp.int32), None

    return jax.lax.scan(body, jnp.int32(0), kw)[0]


timeit("scan: diagonal build only", scan_build, kw)

# 2. matmul-only scan with a FIXED prebuilt dense (both chunks)
dense0 = pk.build_diagonals_pallas(kw[0], R)
M = dense0.shape[2] // pk.TILE


@jax.jit
def scan_mm_fixed(dense0, dt0):
    def body(carry, _):
        outs = []
        for c0 in range(0, B, 512):
            outs.append(pk.diag_matmul_pallas(carry[:, c0 : c0 + 512], dense0, R))
        o = jnp.concatenate(outs, axis=0)
        return dt0, o[0, 0, :1]

    return jax.lax.scan(body, dt0, jnp.arange(p.n))[1]


pass  # OOMs scoped VMEM at B=512 with this structure


# 3. matmul-only, single chunk of 512 (is chunk concat hurting?)
dt512 = dt0[:, :512]


@jax.jit
def scan_mm_512(dense0, dt512):
    def body(carry, _):
        o = pk.diag_matmul_pallas(carry, dense0, R)
        return dt512, o[0, 0, :1]

    return jax.lax.scan(body, dt512, jnp.arange(p.n))[1]


d = timeit("scan: matmul only B=512 x1", scan_mm_512, dense0, dt512)

# 4. plain int8 MXU matmul of the same total shape, no BlockSpec tricks:
#    [512, R*1024] x [R*1024, M*1024] per step == all 64 cells at once per
#    diagonal? No -- reference point: one big dense matmul of equal FLOPs.
A0 = jnp.zeros((512, R * 1024), jnp.int8)
W0 = jnp.zeros((R * 1024, M * 1024), jnp.int8)


@jax.jit
def scan_xla_mm(A0, W0):
    def body(carry, _):
        o = jax.lax.dot_general(
            carry, W0, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return A0, o[0, :1]

    return jax.lax.scan(body, A0, jnp.arange(p.n))[1]


d4 = timeit("scan: XLA int8 matmul same FLOPs", scan_xla_mm, A0, W0)
flops = 2.0 * 512 * (R * 1024) * (M * 1024) * p.n
print(f"   XLA matmul sustained: {flops/d4/1e12:.1f} TOPS", flush=True)

# 5. the un-permute transpose after the matmul (out5 transpose), per full B
out0 = jnp.zeros((B, M, nt * pk.TILE), jnp.int32)


@jax.jit
def scan_unperm(out0):
    def body(carry, _):
        out5 = carry.reshape(B, M, nt, 4, pk.TKW)
        o = jnp.transpose(out5, (0, 1, 2, 4, 3)).reshape(B, M, nt * pk.TILE)
        return carry, o[0, 0, :1]

    return jax.lax.scan(body, out0, jnp.arange(p.n))[1]


timeit("scan: output un-permute only", scan_unperm, out0)

# 6. limb combine + red31 per step
prod0 = jnp.zeros((B, 2, 2, p.N, modmath.N_LIMBS), jnp.int32)


@jax.jit
def scan_combine(prod0):
    def body(carry, _):
        P = modmath.combine_limbs_mod_q(carry, p.Q)
        return carry, P[0, 0, 0, :1]

    return jax.lax.scan(body, prod0, jnp.arange(p.n))[1]


timeit("scan: limb combine only", scan_combine, prod0)
