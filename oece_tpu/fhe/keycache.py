"""Disk cache for bootstrap keys (BTKeyGen is expensive at STD128).

Parity note: the reference regenerates keys every run (circuit.cpp:45-98);
caching is purely a developer/bench convenience and is keyed by parameter
set, method and seed.  Secret keys on disk are NOT for production use.
"""

from __future__ import annotations

import os

import numpy as np

from . import golden
from .params import BinFHEMethod, BinFHEParams

CACHE_DIR = os.environ.get(
    "OECE_KEY_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".keycache")
)


def load_or_generate(
    params: BinFHEParams,
    method: BinFHEMethod,
    seed: int,
    rng: np.random.Generator | None = None,
):
    """Returns (sk, bk), reading from / writing to the cache directory."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    tag = f"{params.name}_{method.value}_{seed}"
    if params.d_g_eff:  # approx-gadget keys have different rows/scales
        tag += f"_a{params.d_g_eff}"
    path = os.path.join(CACHE_DIR, f"bk_{tag}.npz")
    if os.path.exists(path):
        z = np.load(path)
        sk = golden.LWESecretKey(s=z["s"], params=params)
        bk = golden.BootstrapKey(
            brk_pos=z["brk_pos"] if "brk_pos" in z else None,
            brk_neg=z["brk_neg"] if "brk_neg" in z else None,
            ak=z["ak"] if "ak" in z else None,
            ksk=z["ksk"],
            z=z["z"],
            params=params,
            method=method,
        )
        return sk, bk
    rng = rng or np.random.default_rng(seed)
    sk = golden.lwe_keygen(params, rng)
    bk = golden.bootstrap_keygen(params, sk, rng, method)
    payload = dict(s=sk.s, ksk=bk.ksk, z=bk.z)
    if bk.brk_pos is not None:
        payload["brk_pos"] = bk.brk_pos
        payload["brk_neg"] = bk.brk_neg
    if bk.ak is not None:
        payload["ak"] = bk.ak
    np.savez_compressed(path, **payload)
    return sk, bk
