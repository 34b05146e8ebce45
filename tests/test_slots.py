"""Liveness-based ciphertext-arena slot assignment (netlist.assign_ct_slots).

Safety invariants, checked structurally (the end-to-end correctness of the
slot-indexed arena is exercised by every encrypted circuit test, which now
runs through the map by default):

  * every materialized wire gets a slot in [0, n_slots);
  * a level's output slots are pairwise distinct (the fused scatter writes
    them in one ``at[].set``);
  * an output written at level L never reuses the slot of a wire that is
    still read at any level >= L (chunked dispatches write level-L outputs
    before later chunks read level-L inputs);
  * circuit outputs and DFF wires keep their slots to the end.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oece_tpu.circuits import bristol
from oece_tpu.circuits.netlist import Netlist, Op, assign_ct_slots, levelize

R = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")

NO_READ = (int(Op.EQ0), int(Op.EQ1))


def check_invariants(nl: Netlist, plan, slot, n_slots):
    # 1. all wires that are written or read have slots in range
    used = set()
    for word in nl.inputs:
        used.update(int(w) for w in word)
    used.update(int(w) for w in nl.dff_q)
    for level in plan.levels:
        used.update(int(w) for w in level["boot_out"])
        used.update(int(w) for w in level["lin_out"])
    for w in used:
        assert 0 <= slot[w] < n_slots, (w, slot[w], n_slots)

    # last read level per wire
    last_read = np.full(nl.n_wires, -1, np.int64)
    for lv, level in enumerate(plan.levels):
        np.maximum.at(last_read, level["boot_in0"], lv)
        np.maximum.at(last_read, level["boot_in1"], lv)
        rd = level["lin_in0"][~np.isin(level["lin_op"], NO_READ)]
        np.maximum.at(last_read, rd, lv)
    BIG = np.iinfo(np.int64).max
    for word in nl.outputs:
        last_read[word] = BIG
    last_read[nl.dff_d] = BIG
    last_read[nl.dff_q] = BIG

    # 2 + 3: walk levels tracking which wire owns each slot
    owner_last_read = {}  # slot -> last_read of the wire occupying it

    def write(w, lv):
        s = int(slot[w])
        prev = owner_last_read.get(s)
        if prev is not None:
            assert prev < lv, (
                f"slot {s} reused at level {lv} while its previous wire "
                f"is still read at level {prev}"
            )
        owner_last_read[s] = int(last_read[w])

    for word in nl.inputs:
        for w in word:
            owner_last_read[int(slot[w])] = int(last_read[w])
    for w in nl.dff_q:
        owner_last_read[int(slot[w])] = int(last_read[w])
    for lv, level in enumerate(plan.levels):
        outs = np.concatenate([level["boot_out"], level["lin_out"]])
        ss = slot[outs]
        # in-level rewrites of the same wire don't occur (single assignment)
        assert len(set(ss.tolist())) == len(ss), f"level {lv} slot collision"
        for w in outs:
            write(int(w), lv)

    # 4. pinned wires keep distinct slots
    pinned = [int(w) for word in nl.outputs for w in word]
    pinned += [int(w) for w in nl.dff_d] + [int(w) for w in nl.dff_q]
    ps = [int(slot[w]) for w in set(pinned)]
    assert len(set(ps)) == len(ps)


@pytest.mark.parametrize(
    "fname",
    [
        "old_bristol_ckts/arith/adder_32bit.txt",
        "old_bristol_ckts/crypto/md5.txt",
        "new_bristol_ckts/crypto/sha256.txt",
    ],
)
def test_slot_invariants_corpus(fname):
    nl = bristol.parse_bristol(os.path.join(R, fname))
    plan = levelize(nl)
    slot, n_slots = assign_ct_slots(nl, plan)
    assert n_slots < nl.n_wires  # it must actually compress
    check_invariants(nl, plan, slot, n_slots)


def test_slot_invariants_random_dag():
    rng = np.random.default_rng(7)
    n_in = 16
    G = 400
    ops, in0, in1, out = [], [], [], []
    wires = list(range(n_in))
    for k in range(G):
        o = int(rng.choice([int(Op.AND), int(Op.XOR), int(Op.NOT), int(Op.EQW)]))
        a = int(rng.choice(wires))
        b = int(rng.choice(wires))
        w = n_in + k
        ops.append(o)
        in0.append(a)
        in1.append(b if o in (int(Op.AND), int(Op.XOR)) else a)
        out.append(w)
        wires.append(w)
    outputs = [np.asarray(wires[-8:], np.int32)]
    nl = Netlist(
        name="rand",
        n_wires=n_in + G,
        inputs=[np.arange(n_in, dtype=np.int32)],
        outputs=outputs,
        op=np.asarray(ops, np.int32),
        in0=np.asarray(in0, np.int32),
        in1=np.asarray(in1, np.int32),
        out=np.asarray(out, np.int32),
    )
    nl.validate()
    plan = levelize(nl)
    slot, n_slots = assign_ct_slots(nl, plan)
    check_invariants(nl, plan, slot, n_slots)
