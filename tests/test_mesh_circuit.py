"""Multi-device circuit evaluation (VERDICT r1 item 2): Clock() a real
circuit with the level batches sharded over a dp[xtp] mesh on the virtual
8-device CPU backend, for both key layouts.

Reference analogue: the whole-runtime OpenMP gate parallelism of
circuit.cpp:698-710 — here the parallelism covers the full Circuit engine,
not just a raw gate batch.
"""

import os

import numpy as np
import pytest

import jax

from oece_tpu.parallel.mesh import make_mesh
from oece_tpu.runtime.evaluator import Circuit

ADDER = os.path.join(
    os.path.dirname(__file__), "..", "examples", "simple_ckts",
    "adder_2bit", "adder_2bit.out",
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _run_adder(mesh, use_pallas_interpret=False, monkeypatch=None):
    if use_pallas_interpret:
        from oece_tpu.fhe import boot

        monkeypatch.setattr(boot, "PALLAS_INTERPRET", True)
    circ = Circuit(set="MICRO", method="GINX", seed=0, mesh=mesh)
    circ.ReadFile(ADDER)
    circ.setVerify(True)
    T = 4
    rng = np.random.default_rng(5)
    in1 = rng.integers(0, 2, (T, 2))
    in2 = rng.integers(0, 2, (T, 2))
    circ.SetInput([in1, in2])
    circ.Clock()
    (out,) = circ.GetOutput()
    # LSB-first bit words: check the 2-bit + 2-bit = 3-bit sum
    v1 = in1 @ (1 << np.arange(2))
    v2 = in2 @ (1 << np.arange(2))
    want = v1 + v2
    got = out @ (1 << np.arange(out.shape[1]))
    assert np.array_equal(got, want), (got, want)
    assert circ.bad_gate_counts == {}, circ.bad_gate_counts


def test_circuit_dp_tp_jnp_layout():
    mesh = make_mesh(8, tp=2)  # dp=4 x tp=2, jnp key layout
    _run_adder(mesh)


def test_circuit_dp_pallas_layout(monkeypatch):
    """dp-only mesh with the Pallas key layout — the exact production TPU
    path (fused kernel under shard_map), run via the Pallas interpreter."""
    mesh = make_mesh(8, tp=1)  # dp=8
    _run_adder(mesh, use_pallas_interpret=True, monkeypatch=monkeypatch)


def test_circuit_dp_device_keygen_rev_layout(monkeypatch):
    """Device keygen x dp mesh — the PRODUCTION TPU combination (VERDICT r3
    #2: `Circuit(set=..., mesh=...)` after device keygen used to crash
    because shard_bootstrap_keys silently dropped the ginx_rev layout).
    Forces the device-keygen path on the CPU mesh via the interpret-mode
    Pallas kernels and checks end-to-end correctness + bit-parity with the
    unsharded device-keygen evaluation."""
    from oece_tpu.fhe import boot

    monkeypatch.setattr(boot, "PALLAS_INTERPRET", True)
    monkeypatch.setenv("OECE_FORCE_DEVICE_KEYGEN", "1")

    rng_in = np.random.default_rng(7)
    in1 = rng_in.integers(0, 2, (4, 2))
    in2 = rng_in.integers(0, 2, (4, 2))

    def run(mesh):
        c = Circuit(set="MICRO", method="GINX", seed=3, mesh=mesh)
        assert (
            c.dkeys.ginx_rev is not None or c.dkeys.ginx_rev2 is not None
        ), "device keygen must be in force"
        c.ReadFile(ADDER)
        c.setVerify(True)
        c.SetInput([in1, in2])
        c.Clock()
        assert c.bad_gate_counts == {}, c.bad_gate_counts
        return c.GetOutput()[0]

    got = run(make_mesh(8, tp=1))
    v1 = in1 @ (1 << np.arange(2))
    v2 = in2 @ (1 << np.arange(2))
    want = v1 + v2
    assert np.array_equal(got @ (1 << np.arange(got.shape[1])), want)
    # bit-parity with the unsharded path under the same seed
    assert np.array_equal(got, run(None))


def test_circuit_mesh_matches_single_device():
    """Sharded evaluation is bit-identical on outputs to the unsharded one
    (same keys/seed)."""
    rng_in = np.random.default_rng(6)
    in1 = rng_in.integers(0, 2, (2, 2))
    in2 = rng_in.integers(0, 2, (2, 2))

    def run(mesh):
        c = Circuit(set="MICRO", method="GINX", seed=1, mesh=mesh)
        c.ReadFile(ADDER)
        c.setPlaintext(False)
        c.setEncrypted(True)
        c.SetInput([in1, in2])
        c.Clock()
        return c.GetOutput()[0]

    a = run(None)
    b = run(make_mesh(8, tp=2))
    assert np.array_equal(a, b)


def test_circuit_dp_ap_device_keygen(monkeypatch):
    """AP method x dp mesh x device keygen (the combination the r4 review
    found crashing in shard_bootstrap_keys): end-to-end correct on the
    virtual mesh via the AP megakernel."""
    import dataclasses

    from oece_tpu.fhe import boot
    from oece_tpu.fhe.params import MICRO_A

    monkeypatch.setattr(boot, "PALLAS_INTERPRET", True)
    monkeypatch.setenv("OECE_FORCE_DEVICE_KEYGEN", "1")

    p = dataclasses.replace(MICRO_A, name="MICRO_AP2", B_r=2)
    mesh = make_mesh(8, tp=1)
    c = Circuit(set=p, method="AP", seed=5, mesh=mesh)
    assert c.dkeys.ap_pallas is not None and c.dkeys.method.name == "AP"
    c.ReadFile(ADDER)
    c.setVerify(True)
    in1 = np.array([[1, 0], [0, 1]])
    in2 = np.array([[1, 1], [1, 0]])
    c.SetInput([in1, in2])
    c.Clock()
    (out,) = c.GetOutput()
    want = in1 @ (1 << np.arange(2)) + in2 @ (1 << np.arange(2))
    assert np.array_equal(out @ (1 << np.arange(out.shape[1])), want)
    assert c.bad_gate_counts == {}, c.bad_gate_counts
