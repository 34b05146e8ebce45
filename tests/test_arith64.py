"""New-Bristol 64-bit arith suite: generators + golden harness
(reference corpus examples/new_bristol_ckts/arith/, SURVEY.md §2.9 —
data-only there; generated and TB-covered here)."""

import numpy as np
import pytest

from oece_tpu.circuits import gen
from oece_tpu.circuits.bristol import emit_bristol, parse_bristol
from oece_tpu.harness import models
from oece_tpu.harness.testlib import test_arith64 as run_arith64
from oece_tpu.runtime.evaluator import Circuit

CORPUS = "examples/new_bristol_ckts/arith"

ALL = [
    "adder64.txt",
    "sub64.txt",
    "neg64.txt",
    "zero_equal.txt",
    "mult64.txt",
    "mult2_64.txt",
    "udivide64.txt",
    "divide64.txt",
]


@pytest.mark.parametrize("fname", ALL)
def test_arith64_plaintext(fname):
    r = run_arith64(f"{CORPUS}/{fname}", num_loops=8, encrypted=False)
    assert r.passed, r.summary()


def test_div_models_edges():
    m = (1 << 64) - 1
    assert models.udiv(5, 0) == m
    assert models.sdiv(5, 0) == m  # -1
    assert models.sdiv(-5 & m, 0) == 1
    assert models.sdiv(1 << 63, m) == 1 << 63  # INT_MIN / -1 wraps
    assert models.sdiv(-7 & m, 2) == -3 & m
    assert models.sdiv(7, -2 & m) == -3 & m


def _plain(nl, inputs):
    c = Circuit(set="TOY", generate_keys=False)
    c.LoadNetlist(nl)
    c.setPlaintext(True)
    c.setEncrypted(False)
    c.SetInput(inputs)
    c.Clock()
    return c.GetOutput()


def bits(v, n):
    v = np.atleast_1d(np.asarray(v, dtype=np.uint64))
    return ((v[:, None] >> np.arange(n, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )


def unbits(b):
    b = np.asarray(b).astype(np.uint64)
    return (b << np.arange(b.shape[1], dtype=np.uint64)).sum(1)


@pytest.mark.parametrize("w", [4, 8])
def test_divider_exhaustive_small(w):
    """Every (a, b) pair at small width, signed and unsigned."""
    nlu = gen.gen_udivide(w)
    nls = gen.gen_divide(w)
    aa, bb = np.meshgrid(np.arange(1 << w), np.arange(1 << w))
    a = aa.ravel().astype(np.uint64)
    b = bb.ravel().astype(np.uint64)
    qu = unbits(_plain(nlu, [bits(a, w), bits(b, w)])[0])
    want_u = np.array([models.udiv(int(x), int(y), w) for x, y in zip(a, b)], dtype=np.uint64)
    assert np.array_equal(qu, want_u)
    qs = unbits(_plain(nls, [bits(a, w), bits(b, w)])[0])
    want_s = np.array([models.sdiv(int(x), int(y), w) for x, y in zip(a, b)], dtype=np.uint64)
    assert np.array_equal(qs, want_s)


def test_arith64_bristol_roundtrip():
    """Generated suite survives new-fashion emit + reparse bit-identically."""
    nl = gen.gen_divide(6)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "divide64_rt.txt")
        with open(p, "w") as f:
            f.write(emit_bristol(nl, "new"))
        nl2 = parse_bristol(p)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 64, 32, dtype=np.uint64)
    b = rng.integers(0, 64, 32, dtype=np.uint64)
    o1 = unbits(_plain(nl, [bits(a, 6), bits(b, 6)])[0])
    o2 = unbits(_plain(nl2, [bits(a, 6), bits(b, 6)])[0])
    assert np.array_equal(o1, o2)


def test_divide_encrypted_micro():
    """End-to-end encrypted signed divide at MICRO params (verify off —
    exercises the real bootstrap path on a small width)."""
    nl = gen.gen_divide(3)
    c = Circuit(set="MICRO", method="GINX", seed=0)
    c.LoadNetlist(nl)
    c.setPlaintext(False)
    c.setEncrypted(True)
    c.setVerify(True)
    a = np.array([5, 7, 3, 4], dtype=np.uint64)  # 3-bit signed: -3, -1, 3, -4
    b = np.array([2, 3, 0, 7], dtype=np.uint64)
    c.SetInput([bits(a, 3), bits(b, 3)])
    c.Clock()
    got = unbits(c.GetOutput()[0])
    want = np.array(
        [models.sdiv(int(x), int(y), 3) for x, y in zip(a, b)], dtype=np.uint64
    )
    assert np.array_equal(got, want)


def test_emit_asm_consts_and_reuse():
    """.out emission of const-bearing netlists (EQ0/EQ1 lowered to
    XOR(r,r)/NOT), with and without the register-reuse allocator."""
    import os
    import tempfile

    from oece_tpu.circuits.asm import emit_asm, parse_asm

    nl = gen.gen_divide(4)  # uses consts + wide mux structure
    rng = np.random.default_rng(9)
    a = rng.integers(0, 16, 64, dtype=np.uint64)
    b = rng.integers(0, 16, 64, dtype=np.uint64)
    want = unbits(_plain(nl, [bits(a, 4), bits(b, 4)])[0])
    for reuse in (False, True):
        text = emit_asm(nl, reuse_registers=reuse)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "div4.out")
            open(p, "w").write(text)
            nl2 = parse_asm(p)
        got = unbits(_plain(nl2, [bits(a, 4), bits(b, 4)])[0])
        assert np.array_equal(got, want), f"reuse={reuse}"
    # reuse allocator must use strictly fewer registers
    import re

    regs = lambda t: len(set(re.findall(r"R(\d+) =", t)))
    assert regs(emit_asm(nl, reuse_registers=True)) < regs(emit_asm(nl))
