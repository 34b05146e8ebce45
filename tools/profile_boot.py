"""Dev tool: isolate production _external_cmux_pallas step costs on TPU."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from oece_tpu.fhe import boot, keycache, modmath
from oece_tpu.fhe import pallas_kernels as pk
from oece_tpu.fhe.params import STD128_OPT, BinFHEMethod

p = STD128_OPT
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N, Q = p.N, p.Q
nt = N // pk.TILE
R = 2 * p.d_g
NSTEP = p.n

sk, bk = keycache.load_or_generate(p, BinFHEMethod.GINX, 0)
dkeys = boot.pack_bootstrap_key(bk)
kw = dkeys.ginx_pallas  # [n, ndiag, 4, RM*SPANW]

rng = np.random.default_rng(0)
acc0 = jnp.asarray(rng.integers(0, Q, (B, 2, N)).astype(np.int32))
a2N = jnp.asarray(rng.integers(0, 2 * N, (B, NSTEP)).astype(np.int32))


def _sync(out):
    # axon tunnel: block_until_ready does NOT wait for remote execution;
    # a device->host copy is the only reliable sync.
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def timeit(name, fn, *args, reps=2):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name:36s} {dt*1e3:8.1f} ms  {dt/NSTEP*1e6:8.1f} us/step", flush=True)
    return dt


# A. full production step scan
@jax.jit
def scan_full(acc0, a2N, kw):
    def body(carry, xs):
        a_col, kwin = xs
        return boot._external_cmux_pallas(carry, a_col, kwin, p), None

    return jax.lax.scan(body, acc0, (a2N.T, kw))[0]


timeit("A: full cmux step scan", scan_full, acc0, a2N, kw)


# B. digits+pack+matmul_combine+reshape only (carry-coupled via P sum)
@jax.jit
def scan_mm(acc0, kw):
    def body(carry, kwin):
        digs = boot._digits_rbn(carry, p)
        dt = pk.pack_digits_for_pallas(digs)
        P4 = pk.negacyclic_matmul_combine(dt, kwin, R, Q, max_b=boot.PALLAS_MAX_B)
        P = P4.reshape(B, 2, 2, N)
        return modmath.red31(carry + P[:, 0], Q), None

    return jax.lax.scan(body, acc0, kw)[0]


timeit("B: digits+pack+matmul+combine", scan_mm, acc0, kw)


# C. rotations + add + red only
@jax.jit
def scan_rot(acc0, a2N):
    P = jnp.stack([acc0, acc0], axis=1)

    def body(carry, a_col):
        c_pos = (2 * N - a_col) & (2 * N - 1)
        rot_pos = boot.monomial_rotate(P[:, 0], c_pos, N, Q)
        rot_neg = boot.monomial_rotate(carry, a_col, N, Q)
        y = carry + rot_pos + rot_neg + (2 * Q - P[:, 0] - P[:, 1])
        return modmath.red31(y, Q), None

    return jax.lax.scan(body, acc0, a2N.T)[0]


timeit("C: rotations+add+red", scan_rot, acc0, a2N)


# D. matmul_combine kernel alone (static digits, carry-perturbed)
digs0 = pk.pack_digits_for_pallas(boot._digits_rbn(acc0, p))


@jax.jit
def scan_mm_only(digs0, kw):
    def body(carry, kwin):
        d = jnp.where(carry < 0, -digs0, digs0)
        P4 = pk.negacyclic_matmul_combine(d, kwin, R, Q, max_b=boot.PALLAS_MAX_B)
        return jnp.minimum(carry + P4[0, 0, :1].sum(), jnp.int32(0)), None

    return jax.lax.scan(body, jnp.int32(0), kw)[0]


timeit("D: matmul_combine only", scan_mm_only, digs0, kw)


# E. unpermute cost check: combine WITHOUT the final transpose
@jax.jit
def scan_mm_noperm(digs0, kw):
    def body(carry, kwin):
        d = jnp.where(carry < 0, -digs0, digs0)
        dense_all = pk.build_diagonals_pallas(kwin, R)
        out = pk.diag_matmul_combine_pallas(d[:, :512], dense_all, R, Q)
        out2 = pk.diag_matmul_combine_pallas(d[:, 512:], dense_all, R, Q)
        return jnp.minimum(carry + out[0, 0, :1].sum() + out2[0, 0, :1].sum(), jnp.int32(0)), None

    return jax.lax.scan(body, jnp.int32(0), kw)[0]


if B == 1024:
    timeit("E: build+matmul+combine, no perm", scan_mm_noperm, digs0, kw)


# F. build alone
@jax.jit
def scan_build(kw):
    def body(carry, kwin):
        dense = pk.build_diagonals_pallas(kwin, R)
        return carry + dense[0, 0, :1].astype(jnp.int32).sum(), None

    return jax.lax.scan(body, jnp.int32(0), kw)[0]


timeit("F: diag build only", scan_build, kw)


# G. plain v1-style matmul (no combine) for comparison
@jax.jit
def scan_mm_plain(digs0, kw):
    def body(carry, kwin):
        d = jnp.where(carry < 0, -digs0, digs0)
        out = pk.negacyclic_matmul_split(d, kwin, R, max_b=boot.PALLAS_MAX_B)
        return jnp.minimum(carry + out[0, 0, :1].sum(), jnp.int32(0)), None

    return jax.lax.scan(body, jnp.int32(0), kw)[0]


timeit("G: matmul plain (split, no comb)", scan_mm_plain, digs0, kw)
