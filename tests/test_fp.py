"""IEEE-754 binary64 family: golden models fuzz-checked against the host
FPU, circuits fuzz-checked against the golden models (reference ships
FP-{add,eq,f2i,mul}.txt as data only; FP-div/FP-sqrt are missing blobs)."""

import math
import struct

import numpy as np
import pytest

from oece_tpu.circuits import fp
from oece_tpu.harness import models
from oece_tpu.runtime.evaluator import Circuit

QNAN = 0x7FF8000000000000
M64 = (1 << 64) - 1


def f2b(f):
    return struct.unpack("<Q", struct.pack("<d", f))[0]


def b2f(b):
    return struct.unpack("<d", struct.pack("<Q", int(b)))[0]


def canon(b):
    return QNAN if (b >> 52) & 0x7FF == 0x7FF and b & ((1 << 52) - 1) else b


def _operands(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    specials = [0.0, -0.0, 1.0, -1.0, float("inf"), -float("inf"), float("nan"),
                5e-324, -5e-324, 1e-310, 2.2250738585072014e-308,
                1.7976931348623157e308, -1.7976931348623157e308, 0.5, 2.0]
    vals = [f2b(v) for v in specials]
    vals += [int(x) for x in rng.integers(0, 1 << 64, n, dtype=np.uint64)]
    vals += [f2b(float(x)) for x in rng.normal(0, 1e3, n // 4)]
    vals += [(int(x) & 0x800FFFFFFFFFFFFF) | (int(e) << 52) for x, e in
             zip(rng.integers(0, 1 << 64, n // 2, dtype=np.uint64),
                 rng.integers(0, 40, n // 2))]
    return vals


def test_models_vs_host_fpu():
    vals = _operands()
    for a, b in zip(vals[:-1], vals[1:]):
        fa, fb = b2f(a), b2f(b)
        assert models.fp_add(a, b) == canon(f2b(fa + fb))
        assert models.fp_mul(a, b) == canon(f2b(fa * fb))
        assert models.fp_eq(a, b) == int(fa == fb)
        if fb == fb and fb != 0.0:
            assert models.fp_div(a, b) == canon(f2b(fa / fb))
        if fa == fa and fa >= 0 and fa != float("inf"):
            assert models.fp_sqrt(a) == canon(f2b(math.sqrt(fa)))


def test_model_f2i():
    for v in [0.0, -0.0, 0.9, -0.9, 1.5, -1.5, 2.0**62, -(2.0**63),
              2.0**63, 1e300, float("nan"), float("inf"), 123456.789]:
        want = (0x8000000000000000 if (v != v or abs(v) >= 2**63)
                else int(v) & M64)
        assert models.fp_f2i(f2b(v)) == want


def bits(v, n=64):
    v = np.atleast_1d(np.asarray(v, dtype=np.uint64))
    return ((v[:, None] >> np.arange(n, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )


def unbits(b):
    b = np.asarray(b).astype(np.uint64)
    return (b << np.arange(b.shape[1], dtype=np.uint64)).sum(1)


def _plain(nl, inputs):
    c = Circuit(set="TOY", generate_keys=False)
    c.LoadNetlist(nl)
    c.setPlaintext(True)
    c.setEncrypted(False)
    c.SetInput(inputs)
    c.Clock()
    return c.GetOutput()


@pytest.mark.parametrize(
    "genf,golden,nin",
    [
        (fp.gen_fp_add, models.fp_add, 2),
        (fp.gen_fp_mul, models.fp_mul, 2),
        (fp.gen_fp_div, models.fp_div, 2),
        (fp.gen_fp_sqrt, models.fp_sqrt, 1),
        (fp.gen_fp_eq, models.fp_eq, 2),
        (fp.gen_fp_f2i, models.fp_f2i, 1),
    ],
    ids=["add", "mul", "div", "sqrt", "eq", "f2i"],
)
def test_fp_circuit_vs_model(genf, golden, nin):
    vals = _operands(400, seed=3)
    a = np.array(vals[:-1], dtype=np.uint64)
    b = np.array(vals[1:], dtype=np.uint64)
    nl = genf()
    ins = [bits(a)] + ([bits(b)] if nin == 2 else [])
    got = unbits(_plain(nl, ins)[0])
    want = np.array(
        [golden(int(x), int(y)) & M64 if nin == 2 else golden(int(x)) & M64
         for x, y in zip(a, b)],
        dtype=np.uint64,
    )
    nbad = int((got != want).sum())
    assert nbad == 0, (
        f"{nl.name}: {nbad} mismatches; first at "
        f"{[(hex(int(a[i])), hex(int(b[i])), hex(int(got[i])), hex(int(want[i])))
            for i in np.nonzero(got != want)[0][:3]]}"
    )


def test_fp_harness_corpus():
    from oece_tpu.harness.testlib import test_fp as run_fp

    for f in ("FP-add.txt", "FP-eq.txt", "FP-f2i.txt"):
        r = run_fp(f"examples/new_bristol_ckts/fp/{f}", 6, encrypted=False)
        assert r.passed, r.summary()
