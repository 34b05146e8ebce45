"""Dev probe: fused-step kernel on real TPU — correctness + timing."""

import sys
import time

sys.path.insert(0, ".")

from oece_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from oece_tpu.fhe import boot, golden, keycache, lwe
from oece_tpu.fhe.params import PARAM_SETS, BinFHEMethod

name = sys.argv[1] if len(sys.argv) > 1 else "MICRO_A"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
p = PARAM_SETS[name]
rng = np.random.default_rng(0)
t0 = time.time()
sk, bk = keycache.load_or_generate(p, BinFHEMethod.GINX, 0)
print(f"keys {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
dkeys = boot.pack_bootstrap_key(bk, use_pallas=True)
print(f"packed {time.time()-t0:.1f}s", flush=True)

m1 = rng.integers(0, 2, B)
m2 = rng.integers(0, 2, B)
c1 = jnp.asarray(lwe.encrypt_bits(sk, m1, rng))
c2 = jnp.asarray(lwe.encrypt_bits(sk, m2, rng))
gids = jnp.asarray(rng.integers(0, 6, B).astype(np.int32))

fn = jax.jit(boot.eval_bin_gate_batch)
t0 = time.time()
out = np.asarray(fn(dkeys, gids, c1, c2))
print(f"compile+first {time.time()-t0:.1f}s", flush=True)
reps = 5
t0 = time.time()
for _ in range(reps):
    o = fn(dkeys, gids, c1, c2)
o.block_until_ready()
dt = (time.time() - t0) / reps
truth = [
    lambda a, b: a & b, lambda a, b: a | b, lambda a, b: 1 - (a & b),
    lambda a, b: 1 - (a | b), lambda a, b: a ^ b, lambda a, b: 1 - (a ^ b),
]
got = lwe.decrypt_bits(sk, np.asarray(o))
want = np.array([truth[int(i)](int(a), int(b)) for i, a, b in zip(np.asarray(gids), m1, m2)])
ok = int((got == want).sum())
print(f"{p.name} B={B}: {dt*1e3:.1f} ms/batch = {B/dt:.0f} boots/s; correct {ok}/{B}")
