"""Persistent XLA compilation cache (VERDICT r1 item 6).

The blind-rotation scan (n≈500 fused CMUX steps) costs minutes of XLA/Mosaic
compile time per distinct padded batch shape.  The reference amortizes its
analogous setup cost by caching the compiled ``.out`` artifact on disk
(README.md:29-30); here the compiled *device program* itself is cached, so a
second process run of bench.py / a TB skips the compile entirely.

Enabled automatically by ``fhe.context.BinFHEContext``, ``harness.tb`` and
``bench.py``; opt out with OECE_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "OECE_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "oece_tpu", "xla"),
)

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Idempotently turn on JAX's persistent compilation cache.

    Returns True when the cache is active.  Safe to call before or after
    backend initialization (the config knobs are read at compile time).
    """
    global _enabled
    if os.environ.get("OECE_NO_COMPILE_CACHE") == "1":
        return False
    if _enabled:
        return True
    import jax

    if jax.default_backend() == "cpu":
        # CPU compiles are fast and XLA:CPU AOT cache entries carry
        # machine-feature assumptions (SIGILL risk on mismatch) — skip.
        return False

    path = cache_dir or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    _strip_mosaic_locations()
    # cache every program that takes >=1s to compile (the scan programs take
    # minutes; tiny eager helpers stay uncached to keep the dir small)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax
        pass
    _enabled = True
    return True


def _strip_mosaic_locations() -> None:
    """Make Pallas-program cache keys survive source edits (round-5 root
    cause of the VERDICT r4 "per-run warmup tax").

    jax strips debug locations from the StableHLO module before hashing the
    cache key, but a Pallas kernel's Mosaic module is serialized INTO the
    tpu_custom_call payload with ``enable_debug_info=True``
    (jax._src.tpu_custom_call.lowered_as_tpu_kernel), so the file:line of
    every kernel statement lands in the key: ANY edit that shifts a line in
    (or above) a kernel invalidates every cached Pallas executable —
    measured here as a fresh 400-600 s remote compile per bench/circuit run
    after each commit.  This shim re-parses the Mosaic module without debug
    info before serialization; kernels lose file:line in Mosaic error
    messages (set OECE_KEEP_MOSAIC_LOCS=1 to restore while debugging a
    kernel), and identical kernel code hashes identically regardless of
    where it sits in the file.
    """
    if os.environ.get("OECE_KEEP_MOSAIC_LOCS") == "1":
        return
    try:
        import jax._src.tpu_custom_call as tcc
        from jax._src.lib.mlir import ir
        from jax._src.lib.mlir import passmanager as pm
    except ImportError:  # pragma: no cover
        return
    orig = tcc._lower_mosaic_module_to_asm
    if getattr(orig, "_oece_locstrip", False):
        return

    def stripped(module, **kw):
        try:
            with module.context:
                clone = ir.Module.parse(
                    module.operation.get_asm(enable_debug_info=False)
                )
            module = clone
        except Exception:  # never break lowering over the optimization
            pass
        return orig(module, **kw)

    stripped._oece_locstrip = True
    tcc._lower_mosaic_module_to_asm = stripped
