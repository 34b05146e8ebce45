"""Dev tool: per-component timing of the STD128_OPT GINX bootstrap on TPU.

Times (a) the full gate bootstrap, (b) the blind-rotate scan alone,
(c) the Pallas matmul alone at exact shapes, (d) a scan without the
monomial rotations, (e) a scan without digit extraction — isolating the
MXU matmul from the VPU glue.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from oece_tpu.fhe import boot, keycache, lwe, modmath
from oece_tpu.fhe import pallas_kernels as pk
from oece_tpu.fhe.params import STD128_OPT, BinFHEMethod

p = STD128_OPT
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

sk, bk = keycache.load_or_generate(p, BinFHEMethod.GINX, 0)
dkeys = boot.pack_bootstrap_key(bk)
print("keys ready", flush=True)

rng = np.random.default_rng(0)
m1 = rng.integers(0, 2, B)
m2 = rng.integers(0, 2, B)
c1 = jnp.asarray(lwe.encrypt_bits(sk, m1, rng))
c2 = jnp.asarray(lwe.encrypt_bits(sk, m2, rng))
gids = jnp.asarray(rng.integers(0, 6, B).astype(np.int32))


def _sync(out):
    # block_until_ready is unreliable through the axon tunnel; a host
    # transfer of one leaf is the true barrier (same as bench.py).
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)


def timeit(name, fn, *args, reps=3):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name:28s} {dt*1e3:9.1f} ms   ({B/dt:8.1f} boots/s)", flush=True)
    return dt


full = jax.jit(boot.eval_bin_gate_batch)
timeit("full gate bootstrap", full, dkeys, gids, c1, c2)


@jax.jit
def rot_only(dkeys, gids, c1, c2):
    prep = boot.prepare_gates(c1, c2, gids, p.q)
    ct2N = boot._mod_switch_pow2(prep, 10, 11)
    a2N, b2N = ct2N[:, :-1], ct2N[:, -1]
    tv_sel = jnp.take(dkeys.tv_table, gids, axis=0)
    acc = boot._acc_init(tv_sel, b2N, p.N, p.Q)
    return boot.blind_rotate_ginx_dev(acc, a2N, dkeys)


timeit("blind-rotate scan only", rot_only, dkeys, gids, c1, c2)

# scan body without monomial rotations (matmul + digits + recombine only)
def cmux_norot(acc, a_col, kwin_i):
    digs = boot._digits_rbn(acc, p)
    dt = pk.pack_digits_for_pallas(digs)
    prod = pk.negacyclic_matmul_split(dt, kwin_i, 2 * p.d_g, max_b=boot.PALLAS_MAX_B)
    prod = prod.reshape(B, 2, 2, modmath.N_LIMBS, p.N)
    prod = jnp.transpose(prod, (0, 1, 2, 4, 3))
    P = modmath.combine_limbs_mod_q(prod, p.Q)
    y = acc + P[:, 0] + P[:, 1]
    return modmath.red31(y, p.Q)


@jax.jit
def scan_norot(dkeys, gids, c1, c2):
    prep = boot.prepare_gates(c1, c2, gids, p.q)
    ct2N = boot._mod_switch_pow2(prep, 10, 11)
    a2N, b2N = ct2N[:, :-1], ct2N[:, -1]
    tv_sel = jnp.take(dkeys.tv_table, gids, axis=0)
    acc = boot._acc_init(tv_sel, b2N, p.N, p.Q)

    def body(carry, xs):
        a_col, kwin_i = xs
        return cmux_norot(carry, a_col, kwin_i), None

    acc, _ = jax.lax.scan(body, acc, (a2N.T, dkeys.ginx_pallas))
    return acc


timeit("scan w/o rotations", scan_norot, dkeys, gids, c1, c2)

# scan body: matmul only (fixed digits, no decompose / recombine / rotate)
digs0 = jnp.zeros((2 * p.d_g, B, p.N), jnp.int8)
dt0 = pk.pack_digits_for_pallas(digs0)


@jax.jit
def scan_matmul(dkeys, dt0):
    def body(carry, kwin_i):
        prod = pk.negacyclic_matmul_split(
            carry, kwin_i, 2 * p.d_g, max_b=boot.PALLAS_MAX_B
        )
        return dt0, prod[0, 0, :1]

    _, outs = jax.lax.scan(body, dt0, dkeys.ginx_pallas)
    return outs


timeit("scan matmul only", scan_matmul, dkeys, dt0)

# single-call pieces (amortized per n steps)
kwin0 = dkeys.ginx_pallas[0]


@jax.jit
def one_matmul(dt0, kwin0):
    return pk.negacyclic_matmul_split(dt0, kwin0, 2 * p.d_g, max_b=boot.PALLAS_MAX_B)


d = timeit("one matmul call", one_matmul, dt0, kwin0, reps=10)
print(f"  -> x{p.n} steps = {d*p.n*1e3:.0f} ms", flush=True)


@jax.jit
def one_build(kwin0):
    return pk.build_diagonals_pallas(kwin0, 2 * p.d_g)


d = timeit("one diagonal build", one_build, kwin0, reps=10)
print(f"  -> x{p.n} steps = {d*p.n*1e3:.0f} ms", flush=True)

acc0 = jnp.zeros((B, 2, p.N), jnp.int32)


@jax.jit
def one_digits(acc0):
    return pk.pack_digits_for_pallas(boot._digits_rbn(acc0, p))


d = timeit("digits+pack", one_digits, acc0, reps=10)
print(f"  -> x{p.n} steps = {d*p.n*1e3:.0f} ms", flush=True)

a_col = jnp.ones((B,), jnp.int32)
P0 = jnp.zeros((B, 2, p.N), jnp.int32)


@jax.jit
def one_rots(P0, a_col):
    c_pos = (2 * p.N - a_col) & (2 * p.N - 1)
    r1 = boot.monomial_rotate(P0[:, 0], c_pos, p.N, p.Q)
    r2 = boot.monomial_rotate(P0[:, 1], a_col, p.N, p.Q)
    return r1 + r2


d = timeit("2 monomial rotations", one_rots, P0, a_col, reps=10)
print(f"  -> x{p.n} steps = {d*p.n*1e3:.0f} ms", flush=True)
