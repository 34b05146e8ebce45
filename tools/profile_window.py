"""Dev tool: window matmul kernel vs diag matmul_combine on TPU."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
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
kw = dkeys.ginx_pallas

rng = np.random.default_rng(0)
acc0 = jnp.asarray(rng.integers(0, Q, (B, 2, N)).astype(np.int32))

def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0])

def timeit(name, fn, *args, reps=2):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.1f} ms  {dt/NSTEP*1e6:8.1f} us/step", flush=True)
    return dt

# correctness single step on TPU
digs = boot._digits_rbn(acc0[:64], p)
old = np.asarray(pk.negacyclic_matmul_combine(pk.pack_digits_for_pallas(digs), kw[0], R, Q, max_b=64))
new = np.asarray(pk.negacyclic_matmul_window(pk.pack_digits_rows(digs), kw[0], R, Q, max_b=64))
assert np.array_equal(old, new), np.abs(old.astype(np.int64)-new).max()
print("TPU correctness OK")

@jax.jit
def scan_old(acc0, kw):
    def body(carry, kwin):
        digs = boot._digits_rbn(carry, p)
        dt = pk.pack_digits_for_pallas(digs)
        P4 = pk.negacyclic_matmul_combine(dt, kwin, R, Q, max_b=boot.PALLAS_MAX_B)
        P = P4.reshape(B, 2, 2, N)
        return modmath.red31(carry + P[:, 0], Q), None
    return jax.lax.scan(body, acc0, kw)[0]

@jax.jit
def scan_new(acc0, kw):
    def body(carry, kwin):
        digs = boot._digits_rbn(carry, p)
        dr = pk.pack_digits_rows(digs)
        P4 = pk.negacyclic_matmul_window(dr, kwin, R, Q, max_b=1024)
        P = P4.reshape(B, 2, 2, N)
        return modmath.red31(carry + P[:, 0], Q), None
    return jax.lax.scan(body, acc0, kw)[0]

@jax.jit
def scan_new512(acc0, kw):
    def body(carry, kwin):
        digs = boot._digits_rbn(carry, p)
        dr = pk.pack_digits_rows(digs)
        P4 = pk.negacyclic_matmul_window(dr, kwin, R, Q, max_b=512)
        P = P4.reshape(B, 2, 2, N)
        return modmath.red31(carry + P[:, 0], Q), None
    return jax.lax.scan(body, acc0, kw)[0]

timeit("old: digits+pack+diag matmul+combine", scan_old, acc0, kw)
timeit("new: digits+pack+window matmul", scan_new, acc0, kw)
timeit("new: window matmul max_b=512", scan_new512, acc0, kw)

# pieces
digs0 = pk.pack_digits_rows(boot._digits_rbn(acc0, p))
rev0 = pk.build_diagonals_pallas(kw[0], R, reverse=True)
rev_flat0 = rev0.reshape(rev0.shape[0] * R * pk.TILE, rev0.shape[2])

@jax.jit
def scan_digits(acc0, kw):
    def body(carry, kwin):
        digs = boot._digits_rbn(carry, p)
        dr = pk.pack_digits_rows(digs)
        return modmath.red31(carry + dr[:, :1].astype(jnp.int32)[:, :, None], Q), None
    return jax.lax.scan(body, acc0, kw)[0]

@jax.jit
def scan_wm_only(digs0, kw):
    def body(carry, kwin):
        d = jnp.where(carry < 0, -digs0, digs0)
        P4 = pk.window_matmul_pallas(d, rev_flat0, nt, R, Q, block_b=1024)
        return jnp.minimum(carry + P4[0, 0, :1].sum(), jnp.int32(0)), None
    return jax.lax.scan(body, jnp.int32(0), kw)[0]

@jax.jit
def scan_wm_build(digs0, kw):
    def body(carry, kwin):
        d = jnp.where(carry < 0, -digs0, digs0)
        P4 = pk.negacyclic_matmul_window(d, kwin, R, Q, max_b=1024)
        return jnp.minimum(carry + P4[0, 0, :1].sum(), jnp.int32(0)), None
    return jax.lax.scan(body, jnp.int32(0), kw)[0]

timeit("digits+pack only", scan_digits, acc0, kw)
timeit("window matmul only (no build)", scan_wm_only, digs0, kw)
timeit("build+window matmul+unperm", scan_wm_build, digs0, kw)
