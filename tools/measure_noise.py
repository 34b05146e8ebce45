"""Measure the bootstrap noise distribution and failure rate (NOISE.md).

Runs many batches of gate bootstraps at the given parameter set on the
current backend, decrypts every output with its phase error, and reports:
  * decrypt-noise histogram vs the +-q/8 decision margin,
  * measured failure count / rate,
  * sigma-equivalent of the empirical distribution.

Usage: python tools/measure_noise.py [STD128_OPT] [n_batches] [batch]
Writes a JSON summary to artifacts/noise_<set>.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oece_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from oece_tpu.fhe import boot, keycache, lwe
from oece_tpu.fhe.params import PARAM_SETS, BinFHEMethod


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "STD128_OPT"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    p = PARAM_SETS[name]
    q = p.q
    rng = np.random.default_rng(123)
    sk, bk = keycache.load_or_generate(p, BinFHEMethod.GINX, 0)
    dkeys = boot.pack_bootstrap_key(bk)
    fn = jax.jit(boot.eval_bin_gate_batch)

    truth = [
        lambda a, b: a & b, lambda a, b: a | b, lambda a, b: 1 - (a & b),
        lambda a, b: 1 - (a | b), lambda a, b: a ^ b, lambda a, b: 1 - (a ^ b),
    ]
    hist = np.zeros(q, dtype=np.int64)  # histogram of centered noise + q/2
    n_fail = 0
    n_tot = 0
    max_abs = 0
    t0 = time.time()
    for it in range(n_batches):
        m1 = rng.integers(0, 2, B)
        m2 = rng.integers(0, 2, B)
        gids_np = rng.integers(0, 6, B).astype(np.int32)
        c1 = jnp.asarray(lwe.encrypt_bits(sk, m1, rng))
        c2 = jnp.asarray(lwe.encrypt_bits(sk, m2, rng))
        out = np.asarray(fn(dkeys, jnp.asarray(gids_np), c1, c2))
        want = np.array(
            [truth[g](int(a), int(b)) for g, a, b in zip(gids_np, m1, m2)]
        )
        got = lwe.decrypt_bits(sk, out)
        n_fail += int((got != want).sum())
        noise = lwe.decrypt_noise(sk, out, want)  # centered phase error
        hist += np.bincount((noise + q // 2).astype(np.int64) % q, minlength=q)
        max_abs = max(max_abs, int(np.max(np.abs(noise))))
        n_tot += B
        if (it + 1) % 20 == 0:
            print(
                f"# {n_tot} bootstraps, {n_fail} failures, max|e| {max_abs} "
                f"({time.time()-t0:.0f}s)", flush=True,
            )
    centers = np.arange(q) - q // 2
    mean = float((hist * centers).sum() / n_tot)
    std = float(np.sqrt((hist * (centers - mean) ** 2).sum() / n_tot))
    margin = q // 8
    res = {
        "set": name,
        "method": "GINX",
        "d_g_eff": p.d_g_eff,
        "bootstraps": n_tot,
        "failures": n_fail,
        "failure_rate": n_fail / n_tot,
        "noise_mean": mean,
        "noise_std": std,
        "noise_max_abs": max_abs,
        "margin_q8": margin,
        "margin_sigmas": margin / std if std else None,
        "hist_nonzero": {int(c): int(h) for c, h in zip(centers, hist) if h},
    }
    os.makedirs("artifacts", exist_ok=True)
    path = f"artifacts/noise_{name}.json"
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "hist_nonzero"}))
    print(f"# written {path}")


if __name__ == "__main__":
    main()
