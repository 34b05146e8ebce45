"""Dev tool: ceiling references + glue costs for the bootstrap scan."""

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
R = 2 * p.d_g
M = 16
N = p.N
nt = N // pk.TILE


def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def timeit(name, fn, *args, reps=3):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name:38s} {dt*1e3:9.1f} ms  ({B/dt:8.1f} boots/s-equiv)", flush=True)
    return dt


# B. glue pieces
acc0 = jnp.zeros((B, 2, N), jnp.int32)


@jax.jit
def scan_digits(acc0):
    def body(carry, _):
        d = pk.pack_digits_for_pallas(boot._digits_rbn(carry, p))
        return carry, d[0, 0, :1]

    return jax.lax.scan(body, acc0, jnp.arange(p.n))[1]


timeit("B1: digits+pack", scan_digits, acc0)

out0 = jnp.zeros((B, M, N), jnp.int32)


@jax.jit
def scan_unperm_combine(out0):
    def body(carry, _):
        out5 = carry.reshape(B, M, nt, 4, pk.TKW)
        o = jnp.transpose(out5, (0, 1, 2, 4, 3)).reshape(B, M, N)
        prod = o.reshape(B, 2, 2, modmath.N_LIMBS, N)
        prod = jnp.transpose(prod, (0, 1, 2, 4, 3))
        P = modmath.combine_limbs_mod_q(prod, p.Q)
        return carry, P[0, 0, 0, :1]

    return jax.lax.scan(body, out0, jnp.arange(p.n))[1]


timeit("B2: unpermute+combine", scan_unperm_combine, out0)

a0 = jnp.ones((B,), jnp.int32)
P0 = jnp.zeros((B, 2, N), jnp.int32)


@jax.jit
def scan_rot(P0, a0):
    def body(carry, _):
        c_pos = (2 * N - a0) & (2 * N - 1)
        r1 = boot.monomial_rotate(carry[:, 0], c_pos, N, p.Q)
        r2 = boot.monomial_rotate(carry[:, 1], a0, N, p.Q)
        y = carry + jnp.stack([r1, r2], 1)
        return modmath.red31(y, p.Q), None

    return jax.lax.scan(body, P0, jnp.arange(p.n))[0]


timeit("B3: rotations+red31", scan_rot, P0, a0)

# C. full bootstrap with unrolled scan
sk, bk = keycache.load_or_generate(p, BinFHEMethod.GINX, 0)
dkeys = boot.pack_bootstrap_key(bk)
rng = np.random.default_rng(0)
c1 = jnp.asarray(lwe.encrypt_bits(sk, rng.integers(0, 2, B), rng))
c2 = jnp.asarray(lwe.encrypt_bits(sk, rng.integers(0, 2, B), rng))
gids = jnp.asarray(rng.integers(0, 6, B).astype(np.int32))

timeit("C0: full bootstrap (baseline)", jax.jit(boot.eval_bin_gate_batch), dkeys, gids, c1, c2)


def full_unroll(u):
    @jax.jit
    def fn(dkeys, gids, c1, c2):
        prep = boot.prepare_gates(c1, c2, gids, p.q)
        ct2N = boot._mod_switch_pow2(prep, 10, 11)
        a2N, b2N = ct2N[:, :-1], ct2N[:, -1]
        tv_sel = jnp.take(dkeys.tv_table, gids, axis=0)
        acc = boot._acc_init(tv_sel, b2N, N, p.Q)

        def body(carry, xs):
            a_col, kwin_i = xs
            return boot._external_cmux_pallas(carry, a_col, kwin_i, p), None

        acc, _ = jax.lax.scan(
            body, acc, (a2N.T, dkeys.ginx_pallas), unroll=u
        )
        ct_N = boot.sample_extract(acc, p.Q)
        ct_N = ct_N.at[:, -1].set(jax.lax.rem(ct_N[:, -1] + p.Q // 8, jnp.int32(p.Q)))
        ct_ks = modmath.mod_switch_from_q27(ct_N, 15, p.Q)
        ct_n = boot.key_switch_dev(ct_ks, dkeys)
        return boot._mod_switch_pow2(ct_n, 15, 10)

    return fn


timeit("C2: full bootstrap unroll=2", full_unroll(2), dkeys, gids, c1, c2)
