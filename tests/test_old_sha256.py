"""Old-format sha-256.txt — the reference TB_sha256's actual target
(TB_sha256.cpp:102-104; the upstream blob is a missing file).  Generated
from the same netlist as the new-Bristol sha256.txt (tools/gen_corpus.py);
this pins FIPS-model correctness and old/new equivalence."""

import numpy as np

from oece_tpu.circuits.bristol import parse_bristol
from oece_tpu.harness.testlib import test_sha256 as run_sha256

OLD = "examples/old_bristol_ckts/crypto/sha-256.txt"
NEW = "examples/new_bristol_ckts/crypto/sha256.txt"


def test_old_sha256_plaintext_kats():
    r = run_sha256(OLD, num_loops=4, encrypted=False)
    assert r.passed, r.summary()


def test_old_new_same_netlist_shape():
    a, b = parse_bristol(OLD), parse_bristol(NEW)
    assert a.n_gates == b.n_gates and a.n_wires == b.n_wires
    assert a.input_bits == b.input_bits and a.output_bits == b.output_bits
    assert np.array_equal(a.op, b.op)
