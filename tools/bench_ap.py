"""AP-method bootstrap benchmark on the real TPU (VERDICT r3 #5).

The reference treats AP as a co-equal blind-rotation method
(src/utils.cpp:183-185, README.md:171).  This runs the binary-base AP
pipeline end to end on the current backend at STD128_OPT: device keygen
(~2.7 GB ap_pallas windows generated on device — fhe/devkeygen.py), the
AP megakernel (n*d_r = 5,522 shared-key external products + public-bit
selects per bootstrap), chained batches with a decrypt check, same
methodology as bench.py.  Writes artifacts/ap_<set>.json.

Usage: python tools/bench_ap.py [STD128_OPT] [batch] [chains]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oece_tpu.utils import apply_platform_env

apply_platform_env()

from oece_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from oece_tpu.fhe import boot, devkeygen, keycache, lwe
from oece_tpu.fhe.params import PARAM_SETS, BinFHEMethod


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "STD128_OPT"
    on_accel = jax.default_backend() not in ("cpu",)
    B = int(sys.argv[2]) if len(sys.argv) > 2 else (1024 if on_accel else 16)
    K = int(sys.argv[3]) if len(sys.argv) > 3 else (5 if on_accel else 2)
    p = PARAM_SETS[name]
    if p.B_r != 2:  # MICRO/TOY keep large B_r for the generic golden path
        import dataclasses

        p = dataclasses.replace(p, name=f"{name}_AP2", B_r=2)
        print(f"# {name} uses B_r={PARAM_SETS[name].B_r}; benching the "
              f"binary-base twin {p.name}", file=sys.stderr)
    if not on_accel:
        boot.PALLAS_INTERPRET = True

    t0 = time.time()
    sk, _z, dkeys = devkeygen.device_keygen_ap(p, seed=0)
    print(f"# AP keys ready in {time.time()-t0:.1f}s ({name}; "
          f"{dkeys.ap_pallas.size * 4 / 2**30:.2f} GB windows)",
          file=sys.stderr)

    truth = [
        lambda a, b: a & b, lambda a, b: a | b, lambda a, b: 1 - (a & b),
        lambda a, b: 1 - (a | b), lambda a, b: a ^ b, lambda a, b: 1 - (a ^ b),
    ]
    rng = np.random.default_rng(1)
    m1 = rng.integers(0, 2, B)
    m2 = rng.integers(0, 2, B)
    if on_accel:
        s_dev = jnp.asarray(np.asarray(sk.s, dtype=np.int32))
        k1, k2 = jax.random.split(jax.random.PRNGKey(99))
        c1 = lwe.encrypt_bits_dev(s_dev, jnp.asarray(m1, jnp.int32), k1, p)
        c2 = lwe.encrypt_bits_dev(s_dev, jnp.asarray(m2, jnp.int32), k2, p)
    else:
        c1 = jnp.asarray(lwe.encrypt_bits(sk, m1, rng))
        c2 = jnp.asarray(lwe.encrypt_bits(sk, m2, rng))
    gids_np = [rng.integers(0, 6, B).astype(np.int32) for _ in range(K)]
    gids = [jnp.asarray(g) for g in gids_np]

    fn = jax.jit(boot.eval_bin_gate_batch)
    t0 = time.time()
    np.asarray(fn(dkeys, gids[0], c1, c2)[0, :1])
    print(f"# compile+first batch {time.time()-t0:.1f}s", file=sys.stderr)

    x1, x2 = c1, c2
    t0 = time.time()
    for it in range(K):
        out = fn(dkeys, gids[it], x1, x2)
        x1, x2 = out, jnp.roll(x1, 1, axis=0)
    out_np = np.asarray(x1)  # fetch = the real barrier
    dt = (time.time() - t0) / K
    b1, b2 = m1.copy(), m2.copy()
    for it in range(K):
        nb1 = np.array(
            [truth[g](int(a), int(c)) for g, a, c in zip(gids_np[it], b1, b2)]
        )
        b1, b2 = nb1, np.roll(b1, 1)
    got = lwe.decrypt_bits(sk, out_np)
    n_ok = int((got == b1).sum())
    res = {
        "metric": f"gate_bootstraps_per_sec_per_chip_{name}_AP",
        "value": round(B / dt, 1) if n_ok == B else 0.0,
        "unit": "bootstraps/s",
        "backend": jax.default_backend(),
        "batch": B,
        "chains": K,
        "ms_per_batch": round(dt * 1e3, 1),
        "correct": f"{n_ok}/{B}",
        "steps_per_bootstrap": p.n * p.d_r,
    }
    os.makedirs("artifacts", exist_ok=True)
    path = f"artifacts/ap_{name.lower()}.json"
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    print(f"# written {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
