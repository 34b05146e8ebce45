"""Shared utilities (tracing, compile cache, CLI, platform selection)."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS / OECE_PLATFORM even under the axon TPU plugin.

    The axon sitecustomize registers its PJRT backend at interpreter startup
    and overrides the JAX_PLATFORMS environment variable, so scripts that
    want the CPU backend (tests, dev smoke runs on a busy chip) must flip
    ``jax_platforms`` through jax.config BEFORE first device use — exactly
    what tests/conftest.py does.  Call this before importing anything that
    touches a backend.
    """
    want = os.environ.get("OECE_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)
