"""Pure-encrypted-mode failure recovery (VERDICT r3 #7).

Reference analogue: the AND-gate try/catch -> decrypt-reencrypt-retry of
gate.cpp:131-152 (a secret-key repair that runs WITHOUT the plaintext
model).  Here: per-level phase-margin measurement + re-encryption of
suspect outputs (evaluator.setRecovery), with bad-gate statistics that do
not require verify mode.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oece_tpu.circuits.asm import parse_asm
from oece_tpu.fhe import lwe
from oece_tpu.runtime.evaluator import Circuit

import os

ADDER = os.path.join(
    os.path.dirname(__file__), "..", "examples", "simple_ckts",
    "adder_2bit", "adder_2bit.out",
)


def test_phase_margin_dev_decodes_and_centers():
    q = 256
    s = jnp.zeros((4,), jnp.int32)  # zero secret: phase == b
    def ct(b):
        return jnp.asarray([[0, 0, 0, 0, b]], jnp.int32)
    for phase, want_bit, want_err in [
        (0, 0, 0), (5, 0, 5), (q - 3, 0, -3),
        (q // 4, 1, 0), (q // 4 + 7, 1, 7),
        (q // 2 - 10, 1, q // 4 - 10),   # drifted far above the 1-encoding
        (3 * q // 4 + 2, 0, -(q // 4) + 2),  # below the 0-encoding (wrap)
    ]:
        bit, err = lwe.phase_margin_dev(s, ct(phase), q)
        assert int(bit[0]) == want_bit, (phase, int(bit[0]))
        assert int(err[0]) == want_err, (phase, int(err[0]))


def test_recover_fix_repairs_drifted_ciphertexts():
    c = Circuit(set="MICRO", method="GINX", seed=41)
    q = c.params.q  # 256; threshold q//16 = 16, decision boundary q//8 = 32
    rng = np.random.default_rng(1)
    B = 8
    bits = rng.integers(0, 2, B)
    # noiseless crafted ciphertexts with EXACT phase error = drift
    drift = 28  # above threshold, below the q/8 flip boundary
    a = rng.integers(0, q, (B, c.params.n))
    b = (a @ c.sk.s + bits * (q // 4) + drift) % q
    cts = np.concatenate([a, b[:, None]], axis=1).astype(np.int64)
    c._batch = 1
    out = c._recover_fix(np.zeros(B, np.int64), jnp.asarray(cts)[:, None, :])
    got = lwe.decrypt_bits(c.sk, np.asarray(out).reshape(B, -1))
    assert np.array_equal(got, bits)  # repaired to the SAME bits
    assert sum(v for k, v in c.recover_counts.items() if k != "HARD") == B
    assert c.recover_counts.get("HARD", 0) == 0
    assert c.max_phase_err == drift
    # and the repaired ciphertexts are fresh: phase error back to noise level
    cts2 = np.asarray(out).reshape(B, -1)
    phase = (cts2[:, -1] - cts2[:, :-1] @ c.sk.s) % q
    err = np.abs((phase - bits * (q // 4) + q // 2) % q - q // 2)
    assert err.max() < drift, err.max()


def test_recover_fix_counts_hard_failures():
    c = Circuit(set="MICRO", method="GINX", seed=42)
    q = c.params.q
    rng = np.random.default_rng(2)
    B = 4
    bits = np.zeros(B, np.int64)
    cts = lwe.encrypt_bits(c.sk, bits, rng).astype(np.int64)
    cts[:, -1] = (cts[:, -1] + q // 2) % q  # phase ~ q/2: provably invalid
    c._batch = 1
    c._recover_fix(np.zeros(B, np.int64), jnp.asarray(cts)[:, None, :])
    assert c.recover_counts.get("HARD", 0) == B, c.recover_counts


@pytest.mark.parametrize("level_jit", ["0", "1"])
def test_circuit_recovery_mode_end_to_end(level_jit, monkeypatch):
    """Encrypted-only evaluation with setRecovery: correct outputs, margin
    stats populated, no plaintext model consulted."""
    monkeypatch.setenv("OECE_LEVEL_JIT", level_jit)
    c = Circuit(set="MICRO", method="GINX", seed=43)
    c.LoadNetlist(parse_asm(ADDER))
    c.setPlaintext(False)
    c.setEncrypted(True)
    c.setRecovery(True)
    in1 = np.array([[1, 1], [0, 1]])
    in2 = np.array([[1, 0], [1, 1]])
    c.SetInput([in1, in2])
    c.Clock()
    (out,) = c.GetOutput()
    want = in1 @ (1 << np.arange(2)) + in2 @ (1 << np.arange(2))
    assert np.array_equal(out @ (1 << np.arange(out.shape[1])), want)
    assert c.recover_counts.get("HARD", 0) == 0, c.recover_counts
    assert c.max_phase_err > 0  # margins were actually measured


def test_input_prep_recovery_fused(monkeypatch):
    """Round-5 input-side recovery: a drifting-but-unflipped input
    ciphertext is caught by the PREP margin check in the fused path and
    re-encrypted before its gate bootstraps; outputs stay correct and
    IN_* counts surface in recover_counts."""
    monkeypatch.setenv("OECE_LEVEL_JIT", "1")
    c = Circuit(set="MICRO", method="GINX", seed=41)
    c.LoadNetlist(parse_asm(ADDER))
    c.setPlaintext(False)
    c.setEncrypted(True)
    c.setRecovery(True)
    in1 = np.array([[1, 0]])
    in2 = np.array([[1, 1]])
    c.SetInput([in1, in2])
    q = c.params.q
    w = int(c.netlist.inputs[0][0])
    slot = int(c._slot[w])
    # drift just past the input threshold (q/16) but well under the flip
    # boundary: the decoded value is still correct, so recovery must fix
    # it rather than verify-style compare
    c._ct_arena = c._ct_arena.at[slot, 0, -1].add(q // 12)
    c.Clock()
    (out,) = c.GetOutput()
    assert (out @ (1 << np.arange(out.shape[1])))[0] == 1 + 3
    in_keys = [k for k in c.recover_counts if k.startswith("IN_")]
    assert in_keys, c.recover_counts


def test_auto_recovery_default_on_pure_encrypted():
    """Pure-encrypted Clock() runs enable margin recovery by default
    (VERDICT r4 #5: safe-by-default); explicit setRecovery(False) and
    verify mode keep it off."""
    c = Circuit(set="MICRO", method="GINX", seed=42)
    c.LoadNetlist(parse_asm(ADDER))
    c.setPlaintext(False)
    c.setEncrypted(True)
    c.SetInput([np.array([[0, 1]]), np.array([[1, 0]])])
    assert not c.recover_flag
    c.Clock()
    assert c.recover_flag  # auto-enabled at Clock
    (out,) = c.GetOutput()
    assert (out @ (1 << np.arange(out.shape[1])))[0] == 2 + 1

    c2 = Circuit(set="MICRO", method="GINX", seed=42)
    c2.LoadNetlist(parse_asm(ADDER))
    c2.setPlaintext(False)
    c2.setEncrypted(True)
    c2.setRecovery(False)
    c2.SetInput([np.array([[0, 1]]), np.array([[1, 0]])])
    c2.Clock()
    assert not c2.recover_flag  # explicit opt-out respected
