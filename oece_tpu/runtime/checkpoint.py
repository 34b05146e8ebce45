"""Mid-circuit checkpoint / resume.

Aux-subsystem parity+: the reference's only persistence is the compiled
``.out`` artifact cache (README.md:29-30); an interrupted encrypted run of a
100k-gate circuit loses everything.  Here the full evaluation state — both
arenas, DFF state, counters, and the verify-mode RNG stream — is saved every
N levels and restored transparently (Circuit.Clock(checkpoint_path=...,
checkpoint_every=N)).

Format: a single ``.npz`` with a JSON header; the netlist is fingerprinted
so a checkpoint is only resumed against the identical circuit, batch, and
mode flags.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np


def _fingerprint(circ) -> str:
    nl = circ.netlist
    h = hashlib.sha256()
    h.update(nl.name.encode())
    for a in (nl.op, nl.in0, nl.in1, nl.out, nl.dff_d, nl.dff_q):
        h.update(np.ascontiguousarray(a).tobytes())
    for w in nl.inputs + nl.outputs:
        h.update(np.ascontiguousarray(w).tobytes())
    h.update(
        json.dumps(
            [
                circ.params.name,
                circ.method.value,
                circ.plaintext_flag,
                circ.encrypted_flag,
                circ.verify_flag,
                circ._batch,
            ]
        ).encode()
    )
    return h.hexdigest()


def save(circ, path: str, next_level: int) -> None:
    """Write the evaluation state reached *before* ``next_level``."""
    arrays = {
        "next_level": np.int64(next_level),
        "bootstraps_run": np.int64(circ._bootstraps_run),
    }
    if circ._plain_arena is not None:
        arrays["plain_arena"] = circ._plain_arena
    if circ._ct_arena is not None:
        arrays["ct_arena"] = np.asarray(circ._ct_arena)
    if circ._state_plain is not None:
        arrays["state_plain"] = circ._state_plain
    if circ._state_ct is not None:
        arrays["state_ct"] = np.asarray(circ._state_ct)
    meta = {
        "fingerprint": _fingerprint(circ),
        "gate_counts": circ.gate_counts,
        "bad_gate_counts": circ.bad_gate_counts,
        "rng_state": circ._rng.bit_generator.state,  # plain ints: JSON-safe
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, meta=np.frombuffer(json.dumps(meta).encode(), np.uint8), **arrays)
    os.replace(tmp, path)  # atomic: a torn write never clobbers a checkpoint


def maybe_resume(circ, path: str) -> int:
    """If ``path`` holds a checkpoint matching this circuit+mode, restore the
    state and return the level to resume from; else return 0."""
    if not os.path.exists(path):
        return 0
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta["fingerprint"] != _fingerprint(circ):
            return 0
        if "ct_arena" in z and z["ct_arena"].shape[0] != circ._n_ct_slots + 1:
            # saved under a different arena slot map (OECE_WIRE_SLOTS
            # toggled between save and resume) — not resumable
            return 0
        if "plain_arena" in z:
            circ._plain_arena = z["plain_arena"]
        if "ct_arena" in z:
            import jax.numpy as jnp

            circ._ct_arena = jnp.asarray(z["ct_arena"])
        if "state_plain" in z:
            circ._state_plain = z["state_plain"]
        if "state_ct" in z:
            import jax.numpy as jnp

            circ._state_ct = jnp.asarray(z["state_ct"])
        circ.gate_counts = dict(meta["gate_counts"])
        circ.bad_gate_counts = dict(meta["bad_gate_counts"])
        circ._rng.bit_generator.state = meta["rng_state"]
        circ._bootstraps_run = int(z["bootstraps_run"])
        return int(z["next_level"])
