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
INVALID = 0x7FFFFFFFFFFFFFFF
M64 = (1 << 64) - 1


def f2b(f):
    return struct.unpack("<Q", struct.pack("<d", f))[0]


def b2f(b):
    return struct.unpack("<d", struct.pack("<Q", int(b)))[0]


def isnan_bits(b):
    return (b >> 52) & 0x7FF == 0x7FF and b & ((1 << 52) - 1)


def expect(a, b, host_result, invalid):
    """The reference circuits' special-value conventions
    (tools/probe_conventions.py): NaN inputs propagate payload+sign with the
    quiet bit forced (second operand wins); invalid ops -> 0x7FFF...F;
    otherwise the host FPU result is exact."""
    if isnan_bits(a) or isnan_bits(b):
        return (b if isnan_bits(b) else a) | (1 << 51)
    if invalid:
        return INVALID
    return f2b(host_result)


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
    inf = float("inf")
    vals = _operands()
    for a, b in zip(vals[:-1], vals[1:]):
        fa, fb = b2f(a), b2f(b)
        add_invalid = abs(fa) == inf and abs(fb) == inf and (fa > 0) != (fb > 0)
        mul_invalid = (abs(fa) == inf and fb == 0.0) or (abs(fb) == inf and fa == 0.0)
        assert models.fp_add(a, b) == expect(a, b, (fa + fb) if not add_invalid else 0.0, add_invalid)
        assert models.fp_mul(a, b) == expect(a, b, (fa * fb) if not mul_invalid else 0.0, mul_invalid)
        assert models.fp_eq(a, b) == int(fa == fb)
        if fb == fb and fb != 0.0:
            div_invalid = abs(fa) == inf and abs(fb) == inf
            assert models.fp_div(a, b) == expect(a, b, (fa / fb) if not div_invalid else 0.0, div_invalid)
        if fa == fa and fa >= 0 and fa != inf:
            assert models.fp_sqrt(a) == expect(a, a, math.sqrt(fa), False)


def test_model_f2i():
    """Saturating round-to-nearest-even (the reference FP-f2i.txt's pinned
    semantics): NaN/+overflow -> INT64_MAX, -overflow -> INT64_MIN."""
    imax, imin = (1 << 63) - 1, 1 << 63
    for v in [0.0, -0.0, 0.9, -0.9, 0.5, -0.5, 1.5, 2.5, -2.5, 1.9, -1.9,
              2.0**62, -(2.0**63), 2.0**63, 1e300, -1e300,
              float("nan"), float("inf"), -float("inf"), 123456.789]:
        if v != v or v >= 2.0**63:
            want = imax
        elif v <= -(2.0**63) - 1:  # -2^63 itself is representable
            want = imin
        else:
            r = math.floor(v + 0.5)
            if r - v == 0.5 and r % 2:  # ties to even
                r -= 1
            want = imin if r <= -(2**63) else min(r, imax) & M64
        assert models.fp_f2i(f2b(v)) == want, hex(f2b(v))


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
