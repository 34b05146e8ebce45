"""Counted-bytes dp-scaling model (VERDICT r4 #6 / BASELINE.md goal 3).

Replaces the qualitative "KB/level allgather vs ICI — sub-1%" claim with
exact numbers.  Two dp axes exist:

  * CASE-dp (throughput mode): each chip evaluates its own test-case shard
    of the arena.  Cases never interact, the keys are replicated, and the
    compiled per-level program has ZERO cross-device operands
    (artifacts/scaling_virtual.json) — efficiency is 1.0 by construction
    and needs no model.
  * GATE-dp (latency mode): each chip bootstraps a shard of a level's
    gates; the produced wire ciphertexts must be all-gathered so every
    chip's (replicated) arena sees them before the next level.  That
    allgather is the ONLY cross-chip traffic, and its bytes are exactly
    computable from the level plan: per level, W * T * (n+1) * 4 bytes.

This tool counts those bytes per level for the big circuits (exact, from
the same levelizer the evaluator runs), folds in the MEASURED per-level
walls from the committed artifacts (artifacts/<bench>_std128_opt.json),
and models gate-dp efficiency for 2..16 chips:

    eff(D) = sum(compute_lv / D) / sum(max(compute_lv / D, t_ag(bytes_lv)))

with t_ag(bytes) = latency + bytes * (D-1)/D / ICI_BW — the standard ring
all-gather cost.  Uses v5e ICI ~45 GB/s/link x 2 directions (the
"How to Scale Your Model" planning number ~90 GB/s/chip aggregate) plus a
1 us/level latency floor; a DCN row (25 GB/s, 10 us) bounds the multi-host
case.  Writes artifacts/scaling_bytes.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oece_tpu.circuits import bristol
from oece_tpu.circuits.netlist import levelize
from oece_tpu.fhe.params import STD128_OPT

R = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")

BENCHES = {
    "sha256": "new_bristol_ckts/crypto/sha256.txt",
    "md5": "old_bristol_ckts/crypto/md5.txt",
    "sha1": "old_bristol_ckts/crypto/sha-1.txt",
    "aes_128": "new_bristol_ckts/crypto/aes_128.txt",
}

ICI_BW = 90e9  # B/s aggregate per chip (v5e: 2 directions x ~45 GB/s)
ICI_LAT = 1e-6
DCN_BW = 25e9 / 8  # 25 Gbit/s per host NIC, conservative
DCN_LAT = 10e-6


def ring_allgather_s(nbytes, D, bw, lat):
    if D <= 1:
        return 0.0
    return lat * (D - 1) + nbytes * (D - 1) / D / bw


def main():
    p = STD128_OPT
    ct_bytes = (p.n + 1) * 4
    out = {"ct_bytes_per_wire": ct_bytes, "model": {}, "benches": {}}
    for bench, rel in BENCHES.items():
        nl = bristol.parse_bristol(os.path.join(R, rel))
        plan = levelize(nl)
        widths = np.array([len(l["boot_op"]) for l in plan.levels])
        art_path = os.path.join(ART, f"{bench}_std128_opt.json")
        walls = None
        T = 4
        if os.path.exists(art_path):
            with open(art_path) as f:
                rec = json.load(f)
            lv = rec["encrypted_trace"]["levels"]
            T = rec["loops"]
            walls = np.array([r["wall_s"] for r in lv])
            # wall_s is host-side dispatch time (async through the relay);
            # the periodic sync levels carry the real accumulated device
            # time.  For the per-level COMPUTE model use the bootstrap-
            # proportional share of the steady total (excluding the
            # compile walls, which a warm cache removes).
            total_boots = sum(r["bootstraps"] for r in lv)
            steady_s = float(walls.sum() - np.sort(walls)[-3:].sum())
            per_boot_s = steady_s / total_boots
        else:
            per_boot_s = 1.0 / 2200.0  # headline megakernel rate
        bytes_lv = widths * T * ct_bytes
        compute_lv = widths * T * per_boot_s
        rows = {}
        for D in (2, 4, 8, 16):
            for net, bw, lat in (("ici", ICI_BW, ICI_LAT), ("dcn", DCN_BW, DCN_LAT)):
                ag = np.array(
                    [ring_allgather_s(b, D, bw, lat) for b in bytes_lv]
                )
                ideal = compute_lv.sum() / D
                actual = np.maximum(compute_lv / D, ag).sum()
                rows[f"dp{D}_{net}"] = round(float(ideal / actual), 4)
        out["benches"][bench] = {
            "levels": int(len(widths)),
            "boot_gates": int(widths.sum()),
            "T": T,
            "bytes_per_level_mean": int(bytes_lv.mean()),
            "bytes_per_level_p50": int(np.percentile(bytes_lv, 50)),
            "bytes_per_level_p99": int(np.percentile(bytes_lv, 99)),
            "bytes_per_level_max": int(bytes_lv.max()),
            "total_allgather_bytes": int(bytes_lv.sum()),
            "per_boot_s_measured": per_boot_s,
            "gate_dp_efficiency": rows,
            "case_dp_efficiency": 1.0,
        }
        print(
            f"{bench}: {len(widths)} levels, mean {bytes_lv.mean()/1024:.0f} "
            f"KB/level, max {bytes_lv.max()/2**20:.1f} MB; gate-dp8 ici "
            f"eff {rows['dp8_ici']:.3f}, dcn {rows['dp8_dcn']:.3f}"
        )
    out["model"] = {
        "allgather": "ring: lat*(D-1) + bytes*(D-1)/D/bw per level",
        "ici_bw_Bps": ICI_BW,
        "ici_lat_s": ICI_LAT,
        "dcn_bw_Bps": DCN_BW,
        "dcn_lat_s": DCN_LAT,
        "compute": (
            "bootstrap-proportional share of the measured steady per-level "
            "walls (compile walls excluded; artifacts/<bench>_std128_opt.json)"
        ),
        "falsifiable": (
            "a future multi-chip run measures eff directly; this table is "
            "the prediction it would falsify"
        ),
    }
    os.makedirs(ART, exist_ok=True)
    path = os.path.join(ART, "scaling_bytes.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# written {path}")


if __name__ == "__main__":
    main()
