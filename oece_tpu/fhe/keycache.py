"""Disk cache for bootstrap keys (BTKeyGen is expensive at STD128).

Parity note: the reference regenerates keys every run (circuit.cpp:45-98);
caching is purely a developer/bench convenience and is keyed by parameter
set, method and seed.  Secret keys on disk are NOT for production use.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from . import golden
from .params import BinFHEMethod, BinFHEParams


def _check_shapes(
    bk: "golden.BootstrapKey", p: BinFHEParams, method: BinFHEMethod, path: str
) -> None:
    """Assert a loaded key matches the params-derived shapes (ADVICE r2)."""
    want_ksk = (p.N, p.d_ks, p.n + 1)
    assert bk.ksk.shape == want_ksk, (path, bk.ksk.shape, want_ksk)
    if method == BinFHEMethod.GINX:
        want = (p.n, 2 * p.d_g_used, 2, p.N)
        assert bk.brk_pos.shape == want, (path, bk.brk_pos.shape, want)
        assert bk.brk_neg.shape == want, (path, bk.brk_neg.shape, want)
    else:
        want = (p.n, p.d_r, p.B_r, 2 * p.d_g_used, 2, p.N)
        assert bk.ak.shape == want, (path, bk.ak.shape, want)

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
    # The tag hashes EVERY parameter field (ADVICE r2: a stale cached key
    # from an older B_r/d_g definition must miss, not silently corrupt).
    import hashlib

    pdesc = repr(dataclasses.astuple(params)).encode()
    phash = hashlib.sha256(pdesc).hexdigest()[:12]
    tag = f"{params.name}_{method.value}_{seed}_{phash}"
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
        _check_shapes(bk, params, method, path)
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
