"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.md): gate bootstraps/sec/chip at STD128_OPT (GINX).
Every AND/OR/XOR gate of an encrypted circuit costs exactly one bootstrap
in this framework, so this number divides directly into circuit wall-clocks
(e.g. SHA-256 = 133,217 bootstraps / value, reported to stderr).

vs_baseline: the reference has no published numbers (BASELINE.md); the
baseline constant below is our measured estimate of the reference stack
(OpenFHE binfhe v1.0 GINX STD128_OPT) on a 32-core server CPU:
~12 bootstraps/s/core * 32 = ~400/s with perfect OpenMP scaling
(circuit.cpp:698-710 parallelism).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_CPU_BOOTS_PER_SEC = 400.0


def main():
    import jax
    import jax.numpy as jnp

    from oece_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    from oece_tpu.fhe import boot, keycache, lwe
    from oece_tpu.fhe.params import STD128_OPT, TOY, BinFHEMethod, BinGate

    backend = jax.default_backend()
    on_accel = backend not in ("cpu",)
    params = STD128_OPT if on_accel else TOY  # CPU fallback stays quick
    t0 = time.time()
    sk, bk = keycache.load_or_generate(params, BinFHEMethod.GINX, 0)
    print(f"# keys ready in {time.time()-t0:.1f}s ({params.name})", file=sys.stderr)

    t0 = time.time()
    dkeys = boot.pack_bootstrap_key(bk)
    print(f"# packed keys in {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(1)
    B = 1024 if on_accel else 64
    m1 = rng.integers(0, 2, B)
    m2 = rng.integers(0, 2, B)
    c1 = jnp.asarray(lwe.encrypt_bits(sk, m1, rng))
    c2 = jnp.asarray(lwe.encrypt_bits(sk, m2, rng))
    gids = jnp.asarray(rng.integers(0, 6, B).astype(np.int32))

    fn = jax.jit(boot.eval_bin_gate_batch)
    t0 = time.time()
    out = np.asarray(fn(dkeys, gids, c1, c2))  # transfer = real barrier
    print(f"# compile+first batch {time.time()-t0:.1f}s", file=sys.stderr)

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out_dev = fn(dkeys, gids, c1, c2)
    out = np.asarray(out_dev)
    dt = (time.time() - t0) / reps
    boots_per_sec = B / dt

    # correctness of the measured batch
    truth = {
        BinGate.AND: lambda x, y: x & y,
        BinGate.OR: lambda x, y: x | y,
        BinGate.NAND: lambda x, y: 1 - (x & y),
        BinGate.NOR: lambda x, y: 1 - (x | y),
        BinGate.XOR: lambda x, y: x ^ y,
        BinGate.XNOR: lambda x, y: 1 - (x ^ y),
    }
    got = lwe.decrypt_bits(sk, out)
    want = np.array(
        [truth[boot.GATE_ORDER[int(i)]](int(a), int(b)) for i, a, b in zip(np.asarray(gids), m1, m2)]
    )
    n_ok = int((got == want).sum())
    print(
        f"# {params.name}: {dt*1e3:.0f} ms / {B}-gate batch; correct {n_ok}/{B}",
        file=sys.stderr,
    )
    sha256_boots = 133_217  # BASELINE.md: new-Bristol sha256, native XOR
    print(
        f"# projected SHA-256 wall-clock: {sha256_boots/boots_per_sec:.0f}s "
        f"(x4-vector batch amortizes level fill)",
        file=sys.stderr,
    )

    value = boots_per_sec if n_ok == B else 0.0
    print(
        json.dumps(
            {
                "metric": f"gate_bootstraps_per_sec_per_chip_{params.name}_GINX",
                "value": round(value, 1),
                "unit": "bootstraps/s",
                "vs_baseline": round(value / REFERENCE_CPU_BOOTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
