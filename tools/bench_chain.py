"""Dedup-proof TPU benchmark: chain K gate-batches through the production
eval_bin_gate_batch (batch i+1's inputs are batch i's outputs, like a real
circuit), so no two device executions ever see identical inputs (the axon
tunnel memoizes identical (executable, inputs) runs — measured).

Reports boots/s over the whole chain and verifies the final batch by
decryption against the plaintext-simulated chain.

Usage: python tools/bench_chain.py [SET] [B] [K]
"""

import sys
import time

sys.path.insert(0, ".")

from oece_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from oece_tpu.fhe import boot, keycache, lwe
from oece_tpu.fhe.params import PARAM_SETS, BinFHEMethod

TRUTH = [
    lambda a, b: a & b, lambda a, b: a | b, lambda a, b: 1 - (a & b),
    lambda a, b: 1 - (a | b), lambda a, b: a ^ b, lambda a, b: 1 - (a ^ b),
]


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "STD128_OPT"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    p = PARAM_SETS[name]
    rng = np.random.default_rng(7)
    t0 = time.time()
    sk, bk = keycache.load_or_generate(p, BinFHEMethod.GINX, 0)
    dkeys = boot.pack_bootstrap_key(bk)
    print(f"# keys {time.time()-t0:.0f}s", flush=True)

    m1 = rng.integers(0, 2, B)
    m2 = rng.integers(0, 2, B)
    c1 = jnp.asarray(lwe.encrypt_bits(sk, m1, rng))
    c2 = jnp.asarray(lwe.encrypt_bits(sk, m2, rng))
    gids_np = [rng.integers(0, 6, B).astype(np.int32) for _ in range(K)]
    gids = [jnp.asarray(g) for g in gids_np]
    fn = jax.jit(boot.eval_bin_gate_batch)
    t0 = time.time()
    fn(dkeys, gids[0], c1, c2).block_until_ready()
    print(f"# compile+first {time.time()-t0:.0f}s", flush=True)

    # plaintext-simulated chain: b1' = gate(b1, b2); b2' = roll(b1, 1)
    b1, b2 = m1.copy(), m2.copy()
    x1, x2 = c1, c2
    t0 = time.time()
    for it in range(K):
        out = fn(dkeys, gids[it], x1, x2)
        x1, x2 = out, jnp.roll(x1, 1, axis=0)
    out_np = np.asarray(x1)  # device->host sync ends the timing
    dt = time.time() - t0
    for it in range(K):
        nb1 = np.array([TRUTH[g](int(a), int(c)) for g, a, c in zip(gids_np[it], b1, b2)])
        b1, b2 = nb1, np.roll(b1, 1)
    got = lwe.decrypt_bits(sk, out_np)
    ok = int((got == b1).sum())
    bps = K * B / dt
    print(
        f"{p.name} chained {K}x{B}: {dt:.2f}s total, {dt/K*1e3:.0f} ms/batch "
        f"-> {bps:.0f} boots/s; correct {ok}/{B}", flush=True,
    )


if __name__ == "__main__":
    main()
