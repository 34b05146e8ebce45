"""External correctness anchor for the crypto layer (VERDICT r3 #8 /
SURVEY §7.1).

This rig has zero network egress and no OpenFHE checkout on disk, so
literature known-answer *files* cannot be fetched.  The strongest available
independent anchor is therefore verification AGAINST THE DEFINING EQUATIONS
of FHEW/TFHE, evaluated by a from-scratch schoolbook implementation written
directly from the papers:

  * Ducas & Micciancio, "FHEW: Bootstrapping Homomorphic Encryption in
    less than a second" (EUROCRYPT 2015): LWE/RLWE phases, gadget, the
    accumulator/test-vector construction.
  * Chillotti, Gama, Georgieva & Izabachene, "Faster Fully Homomorphic
    Encryption" (ASIACRYPT 2016): CGGI/GINX CMUX blind rotation.
  * Micciancio & Polyakov, "Bootstrapping in FHEW-like Cryptosystems"
    (WAHC 2021): ternary-secret two-part GINX keys (what OpenFHE binfhe
    implements; reference call sites SURVEY §2.8).

The helpers below use ONLY Python integers and explicit X^N = -1 reduction
— no code, no modular tricks, no layout shared with oece_tpu.fhe.golden or
the device kernels.  Each test checks an algebraic identity that the
defining equations force; a systematic convention error in golden.py (sign,
rotation direction, gadget order, test-vector indexing) that the device
faithfully reproduces would fail here even though golden<->device
differential tests pass.  This is precisely the failure class SURVEY §7.1's
"frozen OpenFHE KATs" demand was about.
"""

import numpy as np
import pytest

from oece_tpu.fhe import golden
from oece_tpu.fhe.params import MICRO, MICRO_A, BinFHEMethod, BinGate

# ---------------------------------------------------------------------------
# Independent schoolbook arithmetic (pure Python ints, from the definitions)
# ---------------------------------------------------------------------------


def nmul(a, b, N, Q):
    """Negacyclic product in Z_Q[X]/(X^N + 1), schoolbook: X^N == -1."""
    res = [0] * N
    for i in range(N):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(N):
            k = i + j
            s = ai * int(b[j])
            if k >= N:
                res[k - N] -= s
            else:
                res[k] += s
    return np.array([x % Q for x in res], dtype=np.int64)


def monomial_mul(p, c, N, Q):
    """p(X) * X^c with X^N == -1, c in [0, 2N)."""
    res = [0] * N
    for j in range(N):
        k = j + int(c)
        sign = 1
        while k >= N:
            k -= N
            sign = -sign
        res[k] = (res[k] + sign * int(p[j])) % Q
    return np.array(res, dtype=np.int64)


def center(v, Q):
    v = np.asarray(v, dtype=np.int64) % Q
    return np.where(v > Q // 2, v - Q, v)


def rlwe_phase(ct, z, N, Q):
    """phase(a, b) = b - a*z  (RLWE decryption equation)."""
    return (np.asarray(ct[1], dtype=np.int64) - nmul(ct[0], z, N, Q)) % Q


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def keys():
    rng = np.random.default_rng(31)
    sk = golden.lwe_keygen(MICRO, rng)
    bk = golden.bootstrap_keygen(MICRO, sk, rng, BinFHEMethod.GINX)
    return sk, bk


def test_negacyclic_mul_matches_schoolbook():
    rng = np.random.default_rng(1)
    N, Q = 32, MICRO.Q
    for _ in range(3):
        a = rng.integers(0, Q, N)
        b = rng.integers(0, Q, N)
        want = nmul(a, b, N, Q)
        got = golden.negacyclic_mul(a, b, Q)
        np.testing.assert_array_equal(got % Q, want)


def test_monomial_mul_matches_schoolbook():
    rng = np.random.default_rng(2)
    N, Q = 32, MICRO.Q
    p = rng.integers(0, Q, N)
    for c in (0, 1, 5, N - 1, N, N + 3, 2 * N - 1):
        want = monomial_mul(p, c, N, Q)
        got = golden.negacyclic_monomial_mul(p, c, N, Q)
        np.testing.assert_array_equal(got % Q, want)


def test_rgsw_key_rows_satisfy_definition(keys):
    """Every GINX refresh-key row must satisfy the RGSW equations:
      b-part row j:  b - a*z  = m * g_j + e        (small e)
      a-part row j:  b - (a + m*g_j)*z = e - m*g_j*z, i.e.
                     (b - a2*z) + m*g_j*z = e
    with m = (s_i == +1) for brk_pos and m = (s_i == -1) for brk_neg.
    Checked with schoolbook ring arithmetic against the ring secret."""
    sk, bk = keys
    p = MICRO
    N, Q, d = p.N, p.Q, p.d_g_used
    z = bk.z
    bound = 8 * p.sigma  # e is a rounded Gaussian, sigma=3.19
    for i in range(0, p.n, 5):  # subsample steps (schoolbook is O(N^2))
        for part, brk in (("pos", bk.brk_pos), ("neg", bk.brk_neg)):
            m = int(sk.s[i] == (1 if part == "pos" else -1))
            for j in range(d):
                g = (pow(p.B_g, j, Q) << p.g_shift) % Q
                # b-part row (index d + j): m*g sits on coefficient 0
                ph = rlwe_phase(brk[i][d + j], z, N, Q)
                delta = np.zeros(N, dtype=np.int64)
                delta[0] = (m * g) % Q
                e = center((ph - delta) % Q, Q)
                assert np.all(np.abs(e) <= bound), (i, part, j, np.abs(e).max())
                # a-part row (index j): phase + m*g*z must be small
                ph = rlwe_phase(brk[i][j], z, N, Q)
                gz = nmul(delta, z, N, Q)
                e = center((ph + gz) % Q, Q)
                assert np.all(np.abs(e) <= bound), (i, part, j, np.abs(e).max())


def test_external_product_identity(keys):
    """phase(RGSW(m) box_prod RLWE(mu)) == m * phase(RLWE(mu)) + small error
    — the defining property of the external product, with the error bound
    implied by the gadget equations (d rows, digit magnitude <= B_g/2,
    row noise <= 8*sigma, N-dim convolution)."""
    sk, bk = keys
    p = MICRO
    N, Q = p.N, p.Q
    rng = np.random.default_rng(3)
    ct = np.stack([
        rng.integers(0, Q, N),
        rng.integers(0, Q, N),
    ]).astype(np.int64)
    phi = center(rlwe_phase(ct, bk.z, N, Q), Q)
    # find a key row with m=1 and one with m=0 (s_i = +1 / s_i = 0)
    i_one = int(np.where(sk.s == 1)[0][0])
    i_zero = int(np.where(sk.s == 0)[0][0])
    err_bound = 2 * p.d_g_used * N * (p.B_g // 2) * 8 * p.sigma
    assert err_bound < Q // 8, "parameters must leave decryption margin"
    out1 = golden.external_product(p, ct, bk.brk_pos[i_one])
    e1 = center((rlwe_phase(out1, bk.z, N, Q) - phi) % Q, Q)
    assert np.all(np.abs(e1) <= err_bound), np.abs(e1).max()
    out0 = golden.external_product(p, ct, bk.brk_pos[i_zero])
    e0 = center(rlwe_phase(out0, bk.z, N, Q), Q)
    assert np.all(np.abs(e0) <= err_bound), np.abs(e0).max()


def test_blind_rotation_phase_identity(keys):
    """After GINX blind rotation of ACC = (0, tv * X^{b}) by LWE ct (a, b)
    mod 2N, the result's phase must be tv * X^{b - <a, s>} (the blind
    rotation contract: homomorphic exponent accumulation), up to bootstrap
    noise.  The expected polynomial is computed entirely with Python-int
    monomial arithmetic and the plain integer inner product <a, s>."""
    sk, bk = keys
    p = MICRO
    N, Q = p.N, p.Q
    rng = np.random.default_rng(4)
    tv = golden.make_test_vector(p, BinGate.AND)
    ct2N = np.concatenate([
        rng.integers(0, 2 * N, p.n), rng.integers(0, 2 * N, 1)
    ]).astype(np.int64)
    acc = golden.blind_rotate_ginx(p, bk, ct2N, tv)
    got_phase = rlwe_phase(acc, bk.z, N, Q)
    rot = (int(ct2N[-1]) - int(np.dot(ct2N[:-1], sk.s))) % (2 * N)
    want = monomial_mul(tv, rot, N, Q)
    err = np.abs(center((got_phase - want) % Q, Q))
    # Statistical bound from the gadget equations: each external product
    # adds error <digits, e-rows> with 2*d*N terms of variance
    # (B_g^2/12) * sigma^2; each CMUX step contributes two products through
    # an (X^c - 1) factor (amplitude <= 2).  8-sigma tail over n steps.
    var_ep = 2 * p.d_g_used * N * (p.B_g**2 / 12) * p.sigma**2
    bound = 8 * np.sqrt(p.n * 8 * var_ep)
    assert np.all(err <= bound), (err.max(), bound)
    # a wrong rotation/sign convention flips tv coefficients by Q/4 —
    # the bound must sit far below that to have discriminating power
    assert bound < Q // 16


def test_gate_bootstrap_decrypts_by_definition(keys):
    """eval_bin_gate outputs decrypt correctly under the raw LWE decryption
    equation round(4 * ((b - <a,s>) mod q) / q) mod 4 in {0, 1} — evaluated
    with plain Python integers, for every gate and input combination."""
    sk, bk = keys
    p = MICRO
    q = p.q
    rng = np.random.default_rng(5)
    truth = {
        BinGate.AND: lambda x, y: x & y,
        BinGate.OR: lambda x, y: x | y,
        BinGate.NAND: lambda x, y: 1 - (x & y),
        BinGate.NOR: lambda x, y: 1 - (x | y),
        BinGate.XOR: lambda x, y: x ^ y,
        BinGate.XNOR: lambda x, y: 1 - (x ^ y),
    }
    for gate, fn in truth.items():
        for m1 in (0, 1):
            for m2 in (0, 1):
                c1 = golden.lwe_encrypt(sk, m1, rng)
                c2 = golden.lwe_encrypt(sk, m2, rng)
                out = golden.eval_bin_gate(p, bk, gate, c1, c2)
                phase = (int(out[-1]) - int(np.dot(out[:-1], sk.s))) % q
                bit = round(4 * phase / q) % 4
                assert bit in (0, 1), (gate, m1, m2, phase)
                assert bit == fn(m1, m2), (gate, m1, m2, phase)
