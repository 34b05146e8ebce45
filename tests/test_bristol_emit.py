"""Bristol emitter round-trip: emit -> parse -> identical evaluation."""

import numpy as np
import pytest

from oece_tpu.circuits.bristol import emit_bristol, parse_bristol
from oece_tpu.circuits.gen import Builder, gen_adder, gen_comparator, gen_parity
from oece_tpu.runtime.evaluator import Circuit


def _run(nl, ins):
    c = Circuit(set="MICRO", generate_keys=False)
    c.LoadNetlist(nl)
    c.setPlaintext(True)
    c.setEncrypted(False)
    c.SetInput(ins)
    c.Clock()
    return c.GetOutput()


@pytest.mark.parametrize("fmt", ["new", "old"])
@pytest.mark.parametrize(
    "nl_fn,n_ins",
    [(lambda: gen_adder(8), 2), (lambda: gen_comparator(8), 2), (lambda: gen_parity(8), 1)],
)
def test_roundtrip(tmp_path, fmt, nl_fn, n_ins):
    nl = nl_fn()
    rng = np.random.default_rng(0)
    ins = [rng.integers(0, 2, (4, len(w))) for w in nl.inputs]
    path = tmp_path / "c.txt"
    path.write_text(emit_bristol(nl, fmt))
    nl2 = parse_bristol(str(path))
    nl2.validate()
    a, b = _run(nl, ins), _run(nl2, ins)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_output_alias_and_duplicate(tmp_path):
    """Output words aliasing an input wire / repeating a wire get EQW copies."""
    b = Builder("alias")
    (x, y) = b.input_word(2)
    s = b.XOR(x, y)
    b.output_word([x, s, s])  # input alias + duplicate
    nl = b.build()
    path = tmp_path / "c.txt"
    path.write_text(emit_bristol(nl, "new"))
    nl2 = parse_bristol(str(path))
    nl2.validate()
    cases = np.array([[0, 0], [0, 1], [1, 0], [1, 1]])
    out = _run(nl2, [cases])[0]
    want = np.stack([cases[:, 0], cases[:, 0] ^ cases[:, 1], cases[:, 0] ^ cases[:, 1]], 1)
    assert np.array_equal(out, want)


def test_dff_netlist_rejected():
    b = Builder("seq")
    q = b.DFF()
    (x,) = b.input_word(1)
    b.dff_bind(q, b.XOR(q, x))
    b.output_word([q])
    with pytest.raises(ValueError):
        emit_bristol(b.build())
