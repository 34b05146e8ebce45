"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.md): gate bootstraps/sec/chip at STD128_OPT (GINX).
Every AND/OR/XOR gate of an encrypted circuit costs exactly one bootstrap
in this framework, so this number divides directly into circuit wall-clocks
(e.g. SHA-256 = 133,217 bootstraps / value, reported to stderr).

Structure (VERDICT r2 #1: a benchmark that can output *nothing* is worse
than a slower benchmark):

  * The parent process is a tiny orchestrator.  It runs each measurement
    TIER in a subprocess with a wall-clock budget; a tier whose XLA/Mosaic
    compile hangs is killed without taking the benchmark down.
  * Tier "split" = the r3 prebuilt-diagonal pipeline (devkeygen layout
    "rev": window_matmul_dec_true + cmux_epilogue_true).  Tier "rot" = the
    rotated-difference WHOLE-ROTATION MEGAKERNEL (layout "rev2",
    pk.blind_rotate_rot_megakernel — default-on since round 5; ROOFLINE
    §4-6), i.e. the exact default pipeline a Circuit run executes.  The
    two tiers run genuinely different kernels (VERDICT r3 #6); the best
    verified number wins.
  * SIGTERM/SIGALRM print the best-so-far JSON before exiting, so even an
    external `timeout` on the parent still yields a parsable line.
  * Both tiers share the on-disk key cache (fhe/keycache.py) and the
    persistent XLA compilation cache (utils/compcache.py), so a warm rerun
    measures in ~2 min.

Measurement methodology: batches are CHAINED — batch i+1's input
ciphertexts are batch i's outputs (exactly how a real circuit evaluates) —
because the TPU tunnel used for driver runs memoizes executions with
identical (executable, inputs), which silently inflates repeat-the-same-
batch timings.  The final batch is decrypted and checked against the
plaintext-simulated chain, so the number also certifies correctness.

vs_baseline: the reference has no published numbers (BASELINE.md); the
baseline constant below is our *estimate* of the reference stack (OpenFHE
binfhe v1.0 GINX STD128_OPT) on a 32-core server CPU: ~12 bootstraps/s/core
x 32 threads with perfect OpenMP scaling (circuit.cpp:698-710).  The
"baseline_basis" field marks it as an estimate, not a measurement.
"""

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_CPU_BOOTS_PER_SEC = 400.0
BASELINE_BASIS = (
    "estimate: OpenFHE binfhe GINX ~12 boots/s/core x 32 cores "
    "(no published reference numbers)"
)

# Parent wall-clock budget (s).  The driver's own timeout killed BENCH_r02
# with nothing printed; this budget keeps the final print inside it.
TOTAL_BUDGET_S = float(os.environ.get("OECE_BENCH_BUDGET_S", "2400"))
# Reserve at the end for JSON assembly + interpreter teardown.
MARGIN_S = 20.0
# Don't start a tier with less than this left (keygen+pack+measure floor).
TIER_MIN_S = 240.0


def _result_json(value, params_name, extra=None):
    d = {
        "metric": f"gate_bootstraps_per_sec_per_chip_{params_name}_GINX",
        "value": round(float(value), 1),
        "unit": "bootstraps/s",
        "vs_baseline": round(float(value) / REFERENCE_CPU_BOOTS_PER_SEC, 3),
        "baseline_basis": BASELINE_BASIS,
    }
    if extra:
        d.update(extra)
    return d


def run_tier(tier: str) -> None:
    """Measure one pipeline configuration in-process; print ONE JSON line."""
    layout = "rev2" if tier == "rot" else "rev"
    from oece_tpu.utils import apply_platform_env

    apply_platform_env()  # dev: OECE_PLATFORM=cpu forces the CPU backend
    import jax
    import jax.numpy as jnp

    from oece_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    from oece_tpu.fhe import boot, keycache, lwe
    from oece_tpu.fhe.params import STD128_OPT, TOY, BinFHEMethod

    backend = jax.default_backend()
    on_accel = backend not in ("cpu",)
    params = STD128_OPT if on_accel else TOY  # CPU fallback stays quick
    t0 = time.time()
    if on_accel:
        # Keys are generated ON DEVICE from a seed (fhe/devkeygen.py): the
        # tunnel's host->device path moves ~1 MB/s, so uploading the ~500 MB
        # host-packed key poisoned every earlier BENCH attempt.  Only the
        # 2 KB LWE secret comes back for host encrypt/decrypt.
        from oece_tpu.fhe import devkeygen

        sk, _z, dkeys = devkeygen.device_keygen(params, seed=0, layout=layout)
    else:
        sk, bk = keycache.load_or_generate(params, BinFHEMethod.GINX, 0)
        dkeys = boot.pack_bootstrap_key(bk)
    print(f"# keys ready in {time.time()-t0:.1f}s ({params.name})", file=sys.stderr)

    truth = [
        lambda a, b: a & b, lambda a, b: a | b, lambda a, b: 1 - (a & b),
        lambda a, b: 1 - (a | b), lambda a, b: a ^ b, lambda a, b: 1 - (a ^ b),
    ]
    rng = np.random.default_rng(1)
    # rot tier sweet spot is B=2048 (measured: 2,259 boots/s vs 2,142 at
    # 1024 and 2,180 at 4096); split stays at its cached 1024 shape
    default_b = ("2048" if tier == "rot" else "1024") if on_accel else "64"
    B = int(os.environ.get("OECE_BENCH_B", default_b))
    K = 10 if on_accel else 3  # chained batches
    m1 = rng.integers(0, 2, B)
    m2 = rng.integers(0, 2, B)
    if on_accel:
        # encrypt ON DEVICE: only the plaintext bits cross the relay
        s_dev = jnp.asarray(np.asarray(sk.s, dtype=np.int32))
        kk = jax.random.PRNGKey(99)
        k1, k2 = jax.random.split(kk)
        c1 = lwe.encrypt_bits_dev(s_dev, jnp.asarray(m1, jnp.int32), k1, params)
        c2 = lwe.encrypt_bits_dev(s_dev, jnp.asarray(m2, jnp.int32), k2, params)
    else:
        c1 = jnp.asarray(lwe.encrypt_bits(sk, m1, rng))
        c2 = jnp.asarray(lwe.encrypt_bits(sk, m2, rng))
    gids_np = [rng.integers(0, 6, B).astype(np.int32) for _ in range(K)]
    gids = [jnp.asarray(g) for g in gids_np]

    # Keys pass as jit ARGUMENTS — but they are DEVICE-GENERATED
    # (devkeygen), which matters through the tunnel: device-resident args
    # cost ~5 ms/call, while host-uploaded arg buffers are re-processed
    # every call (~15 s/call for 494 MB) and closure-captured arrays get
    # embedded in the remote-compile request (HTTP 413 at key size).
    fn = jax.jit(boot.eval_bin_gate_batch)
    t0 = time.time()
    np.asarray(fn(dkeys, gids[0], c1, c2)[0, :1])  # fetch = the real barrier
    print(f"# compile+first batch {time.time()-t0:.1f}s", file=sys.stderr)

    # chained measurement (see module docstring)
    x1, x2 = c1, c2
    t0 = time.time()
    for it in range(K):
        out = fn(dkeys, gids[it], x1, x2)
        x1, x2 = out, jnp.roll(x1, 1, axis=0)
    out_np = np.asarray(x1)  # host transfer = real barrier
    dt = (time.time() - t0) / K
    boots_per_sec = B / dt

    # correctness: plaintext-simulate the same chain, decrypt final batch
    b1, b2 = m1.copy(), m2.copy()
    for it in range(K):
        nb1 = np.array(
            [truth[g](int(a), int(c)) for g, a, c in zip(gids_np[it], b1, b2)]
        )
        b1, b2 = nb1, np.roll(b1, 1)
    got = lwe.decrypt_bits(sk, out_np)
    n_ok = int((got == b1).sum())
    print(
        f"# {params.name} [{tier}]: {dt*1e3:.0f} ms / {B}-gate batch "
        f"(chained x{K}); correct {n_ok}/{B}",
        file=sys.stderr,
    )
    sha256_boots = 133_217  # BASELINE.md: new-Bristol sha256, native XOR
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "sha256_std128_opt.json")
    if os.path.exists(art):
        try:
            with open(art) as f:
                rec = json.load(f)
            prov = rec.get("provenance", {})
            prov_s = (
                f" [rev {prov.get('git_rev')}, layout {prov.get('layout')}, "
                f"rot_mega {prov.get('rot_mega')}]"
                if prov
                else " [no provenance recorded — may predate this revision]"
            )
            print(
                f"# measured SHA-256 run (tools/run_circuit_std128.py): "
                f"{rec['encrypted_trace']['summary']['total_s']:.0f}s encrypted "
                f"wall, {rec['harness']['enc_passed']}/{rec['harness']['n_cases']}"
                f" KATs passed — {art}{prov_s}",
                file=sys.stderr,
            )
        except Exception:  # informational only; never kill a measured tier
            print(f"# note: {art} exists but is unreadable", file=sys.stderr)
    else:
        print(
            f"# projected SHA-256 wall-clock: {sha256_boots/boots_per_sec:.0f}s "
            f"(projection only — no measured artifact on disk yet)",
            file=sys.stderr,
        )

    value = boots_per_sec if n_ok == B else 0.0
    print(json.dumps(_result_json(value, params.name, {"tier": tier})))


def _parse_tier_output(stdout: str):
    """Last JSON-looking line of a tier subprocess, or None."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main() -> None:
    tier = os.environ.get("OECE_BENCH_TIER")
    if tier:
        run_tier(tier)
        return

    start = time.time()
    deadline = start + TOTAL_BUDGET_S - MARGIN_S
    best = None
    n_completed_wrong = 0  # tiers that finished but failed correctness
    done = False

    def flush_best(signum=None, frame=None):
        nonlocal done
        if done:
            return
        done = True
        if best is not None:
            print(json.dumps(best), flush=True)
        else:
            err = (
                "tiers completed but failed correctness"
                if n_completed_wrong
                else "no tier finished in budget"
            )
            print(
                json.dumps(_result_json(0.0, "STD128_OPT", {"error": err})),
                flush=True,
            )
        if signum is not None:
            sys.exit(0)

    signal.signal(signal.SIGTERM, flush_best)
    signal.signal(signal.SIGALRM, flush_best)
    signal.alarm(int(TOTAL_BUDGET_S))

    # Tier order: hardware-proven pipeline first (guarantees a number),
    # then the rotated-difference upgrade with whatever budget remains.
    for tier_name in ("split", "rot"):
        remaining = deadline - time.time()
        if remaining < TIER_MIN_S and best is not None:
            print(
                f"# skipping tier {tier_name}: {remaining:.0f}s left",
                file=sys.stderr,
            )
            continue
        env = dict(os.environ, OECE_BENCH_TIER=tier_name)
        print(
            f"# tier {tier_name}: budget {remaining:.0f}s", file=sys.stderr
        )
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                timeout=max(remaining, 30.0),
                text=True,
            )
        except subprocess.TimeoutExpired:
            print(f"# tier {tier_name}: TIMED OUT", file=sys.stderr)
            continue
        res = _parse_tier_output(proc.stdout or "")
        if res is None or proc.returncode != 0:
            print(
                f"# tier {tier_name}: failed rc={proc.returncode}",
                file=sys.stderr,
            )
            continue
        if res.get("value", 0.0) > 0.0:
            if best is None or res["value"] > best["value"]:
                best = res
        else:
            n_completed_wrong += 1

    flush_best()


if __name__ == "__main__":
    main()
