"""Mid-circuit checkpoint/resume and structured tracing."""

import json

import numpy as np
import pytest

from oece_tpu.circuits.gen import gen_adder
from oece_tpu.runtime.evaluator import Circuit


class Boom(RuntimeError):
    pass


def _mk(seed=3):
    c = Circuit(set="MICRO", method="GINX", seed=seed)
    c.LoadNetlist(gen_adder(4))
    c.setVerify(True)
    return c


def _inputs():
    return [np.array([[1, 0, 1, 0]]), np.array([[1, 1, 0, 0]])]


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    ck = str(tmp_path / "state.npz")

    ref = _mk()
    ref.SetInput(_inputs())
    ref.Clock()
    want = [o.copy() for o in ref.GetOutput()]

    c = _mk()
    c.SetInput(_inputs())
    real_run = c._run_level
    calls = {"n": 0}

    def failing(level):
        if calls["n"] == 2:
            raise Boom()
        calls["n"] += 1
        real_run(level)

    c._run_level = failing
    with pytest.raises(Boom):
        c.Clock(checkpoint_path=ck, checkpoint_every=1)
    c._run_level = real_run

    # resume: restores arenas + counters at level 2 and finishes
    c.Clock(checkpoint_path=ck, checkpoint_every=1)
    got = c.GetOutput()
    assert all(np.array_equal(a, b) for a, b in zip(got, want))
    # resumed trace only covers the remaining levels
    assert c.trace.records[0].level == 2


def test_checkpoint_fingerprint_mismatch_ignored(tmp_path):
    ck = str(tmp_path / "state.npz")
    c = _mk()
    c.SetInput(_inputs())
    c.Clock(checkpoint_path=ck, checkpoint_every=1)
    # different inputs -> same fingerprint (inputs aren't part of it), but a
    # different circuit must NOT resume from this checkpoint
    c2 = Circuit(set="MICRO", method="GINX", seed=3)
    c2.LoadNetlist(gen_adder(5))
    c2.setVerify(True)
    c2.SetInput([np.array([[1, 0, 1, 0, 1]]), np.array([[1, 1, 0, 0, 1]])])
    from oece_tpu.runtime import checkpoint as ck_mod

    assert ck_mod.maybe_resume(c2, ck) == 0


def test_trace_records_and_json(tmp_path):
    c = _mk()
    c.SetInput(_inputs())
    c.Clock()
    tr = c.trace
    assert tr.mode == "verify"
    assert len(tr.records) == len(c.plan.levels)
    assert tr.total_bootstraps == c._bootstraps_run > 0
    doc = json.loads(tr.dump_json(str(tmp_path / "trace.json")))
    assert doc["summary"]["total_bootstraps"] == tr.total_bootstraps
    assert len(doc["levels"]) == len(tr.records)
