"""LUT3/LUT4 synthesis and DFF sequential evaluation.

The reference declares these gate types but stubs their evaluation
(src/gate.h:51, src/gate.cpp:217-225; README.md:55 lists "Add FF and
clocked circuits" as future work).  Here they are functional: LUTs lower
to native gates (circuits/lut.py) and DFFs make Clock() cycle-accurate.
"""

import numpy as np
import pytest

from oece_tpu.circuits import asm as asm_mod
from oece_tpu.circuits.gen import Builder
from oece_tpu.circuits.lut import lut_reference
from oece_tpu.runtime.evaluator import Circuit


def _plain_eval(nl, inputs):
    c = Circuit(set="MICRO", generate_keys=False)
    c.LoadNetlist(nl)
    c.setPlaintext(True)
    c.setEncrypted(False)
    c.SetInput(inputs)
    c.Clock()
    return c.GetOutput()


@pytest.mark.parametrize("mask", list(range(256)))
def test_lut3_exhaustive_masks(mask):
    b = Builder(f"lut3_{mask:02x}")
    ins = b.input_word(3)
    b.output_word([b.LUT3(mask, *ins)])
    nl = b.build()
    nl.validate()
    cases = np.array([[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)])
    out = _plain_eval(nl, [cases])[0]
    want = np.array([[lut_reference(mask, row)] for row in cases])
    assert np.array_equal(out, want), f"mask {mask:#x}"


@pytest.mark.parametrize("mask", [0x0000, 0xFFFF, 0x8000, 0x0001, 0x6996,
                                  0x1EE1, 0xCAFE, 0xBEEF, 0x1234, 0xFEDC])
def test_lut4_masks(mask):
    b = Builder(f"lut4_{mask:04x}")
    ins = b.input_word(4)
    b.output_word([b.LUT4(mask, *ins)])
    nl = b.build()
    nl.validate()
    cases = np.array([[(i >> j) & 1 for j in range(4)] for i in range(16)])
    out = _plain_eval(nl, [cases])[0]
    want = np.array([[lut_reference(mask, row)] for row in cases])
    assert np.array_equal(out, want), f"mask {mask:#x}"


def test_lut3_asm_roundtrip():
    """LUT3 in the .out format (our extension) parses and evaluates."""
    text = """\
# number input1 bits 3
# number input2 bits 0
# number output1 bits 1
R0 = LOAD(In1,0)
R1 = LOAD(In1,1)
R2 = LOAD(In1,2)
R3 = LUT3(0xE8, R0, R1, R2)
Out0 = STORE(R3)
"""
    nl = asm_mod.parse_asm(text, name="maj3")
    nl.validate()
    cases = np.array([[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)])
    out = _plain_eval(nl, [cases])[0]
    want = np.array([[lut_reference(0xE8, row)] for row in cases])  # majority
    assert np.array_equal(out, want)


def test_lut3_bootstrap_cost_is_small():
    """Common masks should lower to few bootstraps (majority = 0xE8)."""
    from oece_tpu.circuits.netlist import BOOTSTRAP_OPS

    b = Builder("maj")
    ins = b.input_word(3)
    b.output_word([b.LUT3(0xE8, *ins)])
    nl = b.build()
    n_boot = int(np.isin(nl.op, [int(o) for o in BOOTSTRAP_OPS]).sum())
    assert n_boot <= 4, n_boot  # MUX(c, OR, AND) = 4; reference would need 9+


def _counter_netlist(width=3):
    """width-bit synchronous counter with enable: q += en each cycle."""
    b = Builder(f"counter{width}")
    (en,) = b.input_word(1)
    qs = [b.DFF() for _ in range(width)]
    carry = en
    for q in qs:
        d = b.XOR(q, carry)
        carry = b.AND(q, carry)
        b.dff_bind(q, d)
    b.output_word(qs)
    return b.build()


def test_dff_counter_plaintext():
    nl = _counter_netlist(3)
    nl.validate()
    c = Circuit(set="MICRO", generate_keys=False)
    c.LoadNetlist(nl)
    c.setPlaintext(True)
    c.setEncrypted(False)
    seen = []
    for cyc in range(10):
        c.SetInput([np.array([[1]])])
        c.Clock()
        seen.append(int(sum(b << i for i, b in enumerate(c.GetOutput()[0][0]))))
    # output shows the PRE-clock state: 0, then 1, 2, ... (mod 8)
    assert seen == [0, 1, 2, 3, 4, 5, 6, 7, 0, 1]


def test_dff_counter_enable_and_reset():
    nl = _counter_netlist(2)
    c = Circuit(set="MICRO", generate_keys=False)
    c.LoadNetlist(nl)
    c.setPlaintext(True)
    c.setEncrypted(False)
    vals = []
    for en in [1, 0, 1, 1]:
        c.SetInput([np.array([[en]])])
        c.Clock()
        vals.append(int(sum(b << i for i, b in enumerate(c.GetOutput()[0][0]))))
    assert vals == [0, 1, 1, 2]
    c.Reset()  # state clears
    c.SetInput([np.array([[1]])])
    c.Clock()
    assert int(sum(b << i for i, b in enumerate(c.GetOutput()[0][0]))) == 0


def test_dff_counter_encrypted_micro():
    nl = _counter_netlist(2)
    c = Circuit(set="MICRO", method="GINX", seed=7)
    c.LoadNetlist(nl)
    c.setVerify(True)  # plaintext + encrypted + per-level compare
    vals = []
    for _ in range(4):
        c.SetInput([np.array([[1]])])
        c.Clock()
        vals.append(int(sum(b << i for i, b in enumerate(c.GetOutput()[0][0]))))
    assert vals == [0, 1, 2, 3]
    assert not c.bad_gate_counts, c.bad_gate_counts


def test_mand_bristol_decomposition(tmp_path):
    """New-fashion MAND decomposes into native ANDs in both parsers."""
    txt = """\
3 8
2 2 2
1 4

1 1 0 4 EQW
1 1 1 5 EQW
4 2 4 5 2 3 6 7 MAND
"""
    f = tmp_path / "mand.txt"
    f.write_text(txt)
    from oece_tpu.circuits.bristol import parse_bristol

    for force_py in (True, False):
        import os

        os.environ["OECE_NO_NATIVE"] = "1" if force_py else "0"
        try:
            nl = parse_bristol(str(f))
        finally:
            os.environ.pop("OECE_NO_NATIVE", None)
        nl.validate()
        # output word = wires 4..7 = [a, b, a AND x, b AND y]
        cases = np.array(
            [[a, b, x, y] for a in (0, 1) for b in (0, 1) for x in (0, 1) for y in (0, 1)]
        )
        out = _plain_eval(nl, [cases[:, :2], cases[:, 2:]])[0]
        want = np.stack(
            [
                cases[:, 0],
                cases[:, 1],
                cases[:, 0] & cases[:, 2],
                cases[:, 1] & cases[:, 3],
            ],
            axis=1,
        )
        assert np.array_equal(out, want)
