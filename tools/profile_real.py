"""Trustworthy phase profiling on the REAL TPU through the axon tunnel.

The tunnel executes lazily: ``block_until_ready`` returns immediately and
repeat-same-input calls are memoized, so naive timing loops measure fiction
(this is how r2's phase numbers went wrong).  Rules here:

  * every measured program runs as a lax.scan over NSTEPS steps with a data
    dependency through the carry (nothing can be elided),
  * calls are chained (output feeds the next call's input),
  * the only barrier is a small host fetch at the end,
  * all operands are generated ON DEVICE (host->device through the relay is
    ~MB/s; a single big upload poisons every later measurement).

Usage: python tools/profile_real.py [B] [NSTEPS]
"""

import sys
import time

sys.path.insert(0, ".")

from oece_tpu.utils import apply_platform_env

apply_platform_env()

from oece_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from oece_tpu.fhe import boot, modmath
from oece_tpu.fhe import pallas_kernels as pk
from oece_tpu.fhe.params import STD128_OPT

p = STD128_OPT
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
NSTEPS = int(sys.argv[2]) if len(sys.argv) > 2 else p.n
N, Q = p.N, p.Q
R = 2 * p.d_g_used
M = 16
nt = N // pk.TILE
ndiag = 2 * nt - 1
RMW = R * M * pk.SPANW

key0 = jax.random.PRNGKey(42)


def dev_randint(key, shape, lo, hi, dtype=jnp.int32):
    return jax.random.randint(key, shape, lo, hi, dtype)


# device-side operands
k1, k2, k3, k4 = jax.random.split(key0, 4)
acc0 = dev_randint(k1, (B, 2, N), 0, Q)
wins = dev_randint(k2, (NSTEPS, ndiag, 4, RMW), -(2**31), 2**31 - 1)
a2N = dev_randint(k3, (B, NSTEPS), 0, 2 * N)
idx_fetch = jnp.zeros((4,), jnp.int32)


def timeit(label, make_scan, reps=3):
    """make_scan() -> (jitted fn (acc, *ops) -> acc, ops); chained reps,
    fetch barrier.  Operands pass as jit args: closure-captured device
    arrays are embedded in the remote-compile request (HTTP 413)."""
    made = make_scan()
    fn, ops = made if isinstance(made, tuple) else (made, ())
    acc = fn(acc0, *ops)
    _ = np.asarray(acc[0, 0, :4])  # compile + first run barrier
    t0 = time.time()
    a = acc
    for _ in range(reps):
        a = fn(a, *ops)
    _ = np.asarray(a[0, 0, :4])
    dt = (time.time() - t0) / reps / NSTEPS
    print(
        f"{label:26s}: {dt*1e6:8.0f} us/step  "
        f"({dt*p.n*1e3:7.0f} ms per {p.n}-step rotation, "
        f"{B/(dt*p.n):6.0f} boots/s-equiv)",
        flush=True,
    )
    return dt


def scan_full_split():
    """The production split step (digits+pack+build+matmul+rot+cmux)."""

    def body(carry, xs):
        a_col, kwin_i = xs
        return boot._external_cmux_pallas(carry, a_col, kwin_i, p), None

    @jax.jit
    def fn(acc, wins_, a_):
        out, _ = jax.lax.scan(body, acc, (a_, wins_))
        return out

    return fn, (wins, a2N.T[:NSTEPS])


def scan_digits():
    """Gadget decompose + digit packing only."""

    def body(carry, a_col):
        digs = boot._digits_rbn(carry, p)  # [R, B, N] int8
        dt = pk.pack_digits_for_pallas(digs)  # [nt, B, R*128]
        # fold back (cheap) to keep the dependency
        upd = jnp.tile(dt[0].astype(jnp.int32), (1, N // (R * 128)))  # [B, N]
        return modmath.red31(carry + upd[:, None, :] + a_col[:, None, None], Q), None

    @jax.jit
    def fn(acc, a_):
        out, _ = jax.lax.scan(body, acc, a_)
        return out

    return fn, (a2N.T[:NSTEPS],)


def scan_build():
    """Key-window dense build only (per-step diagonal materialization)."""

    def body(carry, kwin_i):
        dense = pk.build_diagonals_pallas(kwin_i, R)
        upd = dense[0, 0:2, :N].astype(jnp.int32)
        return modmath.red31(carry + upd[None, :, :], Q), None

    @jax.jit
    def fn(acc, wins_):
        out, _ = jax.lax.scan(body, acc, wins_)
        return out

    return fn, (wins,)


def scan_matmul():
    """Digits+build+matmul+limb-combine (no rotations/cmux)."""

    def body(carry, kwin_i):
        digs = boot._digits_rbn(carry, p)
        dt = pk.pack_digits_for_pallas(digs)
        P4 = pk.negacyclic_matmul_combine(
            dt, kwin_i, R, Q, max_b=boot.PALLAS_MAX_B
        )  # [B, 4, N]
        Pr = P4.reshape(B, 2, 2, N)
        y = carry + Pr[:, 0] + Pr[:, 1]
        return modmath.red31(y, Q), None

    @jax.jit
    def fn(acc, wins_):
        out, _ = jax.lax.scan(body, acc, wins_)
        return out

    return fn, (wins,)


def scan_rotations():
    """Per-gate monomial rotations + CMUX combine only (jnp half-barrel)."""

    def body(carry, a_col):
        P = jnp.stack([carry, carry], axis=1)  # [B, 2, 2, N] stand-in for P4
        c_pos = (2 * N - a_col) & (2 * N - 1)
        rot_pos = boot.monomial_rotate(P[:, 0], c_pos, N, Q)
        rot_neg = boot.monomial_rotate(P[:, 1], a_col, N, Q)
        y = carry + rot_pos + rot_neg + (2 * Q - P[:, 0] - P[:, 1])
        return modmath.red31(y, Q), None

    @jax.jit
    def fn(acc, a_):
        out, _ = jax.lax.scan(body, acc, a_)
        return out

    return fn, (a2N.T[:NSTEPS],)


def scan_prebuilt_full():
    """The round-3 production step: prebuilt rev + window matmul + in-VMEM
    epilogue (boot._external_cmux_prebuilt)."""
    MT = 16 * pk.TILE
    rev = (
        jax.random.randint(k4, (NSTEPS, ndiag * R * pk.TILE, MT), -128, 128)
        .astype(jnp.int8)
    )

    def body(carry, xs):
        a_col, rev_i = xs
        return boot._external_cmux_prebuilt(carry, a_col, rev_i, p), None

    @jax.jit
    def fn(acc, rev_, a_):
        out, _ = jax.lax.scan(body, acc, (a_, rev_))
        return out

    return fn, (rev, a2N.T[:NSTEPS])


def scan_prebuilt_matmul():
    """decompose + pack + window_matmul_true (no epilogue)."""
    MT = 16 * pk.TILE
    rev = (
        jax.random.randint(k4, (NSTEPS, ndiag * R * pk.TILE, MT), -128, 128)
        .astype(jnp.int8)
    )

    def body(carry, rev_i):
        digs = boot._digits_rbn(carry, p)
        dr = pk.pack_digits_rows(digs)
        P4 = pk.window_matmul_true(dr, rev_i, R, Q, block_b=boot.FUSED_MAX_B)
        Pr = P4.reshape(B, 2, 2, N)
        return modmath.red31(carry + Pr[:, 0] + Pr[:, 1], Q), None

    @jax.jit
    def fn(acc, rev_):
        out, _ = jax.lax.scan(body, acc, rev_)
        return out

    return fn, (rev,)


def scan_epilogue_true():
    """cmux_epilogue_true kernel only."""

    def body(carry, a_col):
        P = jnp.stack([carry, carry], axis=1)  # [B, 2, 2, N]
        c_pos = (2 * N - a_col) & (2 * N - 1)
        amt = jnp.stack([c_pos, a_col], axis=1)
        return pk.cmux_epilogue_true(P, carry, amt, Q, block_b=boot.FUSED_MAX_B), None

    @jax.jit
    def fn(acc, a_):
        out, _ = jax.lax.scan(body, acc, a_)
        return out

    return fn, (a2N.T[:NSTEPS],)


def scan_noop():
    """Scan overhead floor: one elementwise op per step."""

    def body(carry, a_col):
        return modmath.red31(carry + a_col[:, None, None], Q), None

    @jax.jit
    def fn(acc):
        out, _ = jax.lax.scan(body, acc, a2N.T[:NSTEPS])
        return out

    return fn


if __name__ == "__main__":
    import os

    print(f"B={B} NSTEPS={NSTEPS} R={R} N={N} backend={jax.default_backend()}")
    which = os.environ.get("OECE_PROFILE", "prebuilt")
    if which in ("all", "legacy"):
        timeit("noop (scan floor)", scan_noop)
        timeit("digits+pack", scan_digits)
        timeit("build", scan_build)
        timeit("digits+build+matmul", scan_matmul)
        timeit("rotations+cmux", scan_rotations)
        timeit("FULL split step", scan_full_split)
    if which in ("all", "prebuilt"):
        timeit("noop (scan floor)", scan_noop)
        timeit("prebuilt matmul", scan_prebuilt_matmul)
        timeit("epilogue kernel", scan_epilogue_true)
        timeit("PREBUILT full step", scan_prebuilt_full)
