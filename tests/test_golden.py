"""Golden-model self-consistency: the exact NumPy FHEW/TFHE implementation.

These tests anchor correctness before any device code exists: LWE round
trips, external products, and full gate bootstraps (GINX and AP) at MICRO
parameters, mirroring the reference's gate semantics (src/gate.cpp:49-229).
"""

import numpy as np
import pytest

from oece_tpu.fhe import golden as g
from oece_tpu.fhe.params import MICRO, TOY, BinFHEMethod, BinGate, get_params


RNG = lambda seed=0: np.random.default_rng(seed)


def test_negacyclic_mul_matches_schoolbook():
    rng = RNG(1)
    Q = MICRO.Q
    N = 32
    a = rng.integers(0, Q, N)
    b = rng.integers(0, Q, N)
    # direct schoolbook with python ints
    ref = [0] * N
    for i in range(N):
        for j in range(N):
            k = i + j
            s = 1
            if k >= N:
                k -= N
                s = -1
            ref[k] = (ref[k] + s * int(a[i]) * int(b[j])) % Q
    got = g.negacyclic_mul(a, b, Q)
    assert np.array_equal(got, np.array(ref, dtype=np.int64))


def test_negacyclic_monomial_mul():
    rng = RNG(2)
    Q, N = MICRO.Q, MICRO.N
    p = rng.integers(0, Q, N)
    for c in [0, 1, 5, N - 1, N, N + 3, 2 * N - 1]:
        mono = np.zeros(N, dtype=np.int64)
        cc, s = (c, 1) if (c % (2 * N)) < N else (c % (2 * N) - N, -1)
        if c % (2 * N) < N:
            mono[c % N] = 1
        else:
            mono[(c % (2 * N)) - N] = (-1) % Q
        ref = g.negacyclic_mul(p, mono, Q)
        got = g.negacyclic_monomial_mul(p, c, N, Q)
        assert np.array_equal(got, ref), c


@pytest.mark.parametrize("d, B", [(4, 128), (8, 4)])
def test_digits(d, B):
    rng = RNG(3)
    v = rng.integers(0, min(B**d, MICRO.Q), 1000)
    gd = g.gadget_digits(v, B, d)
    recon = sum(gd[:, j] * B**j for j in range(d))
    assert np.array_equal(recon, v)
    assert np.all(np.abs(gd[:, : d - 1]) <= B // 2)
    assert np.all(gd[:, d - 1] >= 0) and np.all(gd[:, d - 1] <= 66 if d == 4 else True)
    sd = g.signed_digits(v % (B**d), B, d)
    recon2 = sum(sd[:, j] * B**j for j in range(d)) % (B**d)
    assert np.array_equal(recon2, v % (B**d))


def test_lwe_roundtrip_and_not():
    p = MICRO
    rng = RNG(4)
    sk = g.lwe_keygen(p, rng)
    for m in (0, 1):
        for _ in range(50):
            ct = g.lwe_encrypt(sk, m, rng)
            assert g.lwe_decrypt(sk, ct) == m
            assert g.lwe_decrypt(sk, g.eval_not(ct, p.q)) == 1 - m


def test_rlwe_rgsw_external_product():
    p = MICRO
    rng = RNG(5)
    z = g.ternary(rng, (p.N,))
    # RLWE(m1) ⊡ RGSW(m2-scalar) decrypts to m1*m2 with small noise
    msg = np.zeros(p.N, dtype=np.int64)
    msg[0] = p.Q // 8
    msg[3] = p.Q // 4
    ct = g.rlwe_encrypt(p, z, msg, rng)
    for m2 in (0, 1):
        rgsw = g.rgsw_encrypt(p, z, m2, rng)
        out = g.external_product(p, ct, rgsw)
        phase = (out[1] - g.negacyclic_mul(out[0], z, p.Q)) % p.Q
        centered = np.where(phase > p.Q // 2, phase - p.Q, phase)
        err = centered - m2 * np.where(msg > p.Q // 2, msg - p.Q, msg)
        assert np.max(np.abs(err)) < 2**14, np.max(np.abs(err))


def test_keyswitch_preserves_phase():
    p = MICRO
    rng = RNG(6)
    sk = g.lwe_keygen(p, rng)
    z = g.ternary(rng, (p.N,))
    ksk = g.keyswitch_keygen(p, z, sk, rng)
    # make an LWE ct under key z at modulus Q_ks encoding m*Qks/4
    m = 1
    a = rng.integers(0, p.Q_ks, (p.N,), dtype=np.int64)
    b = (int(a @ z) + m * (p.Q_ks // 4)) % p.Q_ks
    ct_N = np.concatenate([a, [b]])
    ct_n = g.key_switch(p, ksk, ct_N)
    phase = g.lwe_phase(sk.s, ct_n, p.Q_ks)
    centered = (phase - m * (p.Q_ks // 4) + p.Q_ks // 2) % p.Q_ks - p.Q_ks // 2
    assert abs(centered) < p.Q_ks // 16


@pytest.mark.parametrize("method", [BinFHEMethod.GINX, BinFHEMethod.AP])
def test_gate_bootstrap_all_gates(method):
    p = MICRO
    rng = RNG(7)
    sk = g.lwe_keygen(p, rng)
    bk = g.bootstrap_keygen(p, sk, rng, method)
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
                c1 = g.lwe_encrypt(sk, m1, rng)
                c2 = g.lwe_encrypt(sk, m2, rng)
                out = g.eval_bin_gate(p, bk, gate, c1, c2)
                got = g.lwe_decrypt(sk, out)
                assert got == fn(m1, m2), (gate, m1, m2, got)


def test_bootstrap_output_is_fresh():
    """Output of a gate must itself feed further gates (composability)."""
    p = MICRO
    rng = RNG(8)
    sk = g.lwe_keygen(p, rng)
    bk = g.bootstrap_keygen(p, sk, rng, BinFHEMethod.GINX)
    c1 = g.lwe_encrypt(sk, 1, rng)
    c2 = g.lwe_encrypt(sk, 1, rng)
    c3 = g.eval_bin_gate(p, bk, BinGate.AND, c1, c2)  # 1
    c4 = g.eval_bin_gate(p, bk, BinGate.XOR, c3, c1)  # 0
    c5 = g.eval_bin_gate(p, bk, BinGate.OR, c4, c3)  # 1
    assert g.lwe_decrypt(sk, c5) == 1


def test_param_registry():
    assert get_params("toy") is TOY
    assert TOY.d_g == 4 and TOY.d_ks == 8
    with pytest.raises(ValueError):
        get_params("nope")


def test_sha1_golden_vs_hashlib():
    import hashlib

    from oece_tpu.harness import models

    for msg in (b"", b"abc", b"The quick brown fox jumps over the lazy dog"):
        pad = msg + b"\x80" + b"\x00" * (55 - len(msg)) + (8 * len(msg)).to_bytes(8, "big")
        assert models.sha1_compress(pad) == hashlib.sha1(msg).digest()


def test_sha1_circuit_plaintext():
    from oece_tpu.harness.testlib import test_sha1 as run_sha1

    r = run_sha1("examples/old_bristol_ckts/crypto/sha-1.txt", 4, encrypted=False)
    assert r.passed, r.summary()


def test_aes_fips197_all_sizes():
    from oece_tpu.harness import models

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert models.aes_encrypt(pt, bytes(range(16))).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert models.aes_encrypt(pt, bytes(range(24))).hex() == "dda97ca4864cdfe06eaf70a0ec0d7191"
    assert models.aes_encrypt(pt, bytes(range(32))).hex() == "8ea2b7ca516745bfeafc49904b496089"


@pytest.mark.parametrize("kb", [128, 192, 256])
def test_aes_new_circuit_plaintext(kb):
    from oece_tpu.harness.testlib import test_aes_new as run_aes_new

    r = run_aes_new(
        f"examples/new_bristol_ckts/crypto/aes_{kb}.txt", 2, encrypted=False
    )
    assert r.passed, r.summary()


def test_sha512_golden_vs_hashlib():
    import hashlib

    from oece_tpu.harness import models

    for msg in (b"", b"abc", b"x" * 100):
        pad = (
            msg + b"\x80" + b"\x00" * (111 - len(msg))
            + (8 * len(msg)).to_bytes(16, "big")
        )
        assert models.sha512_compress(pad) == hashlib.sha512(msg).digest()


def test_keccak_golden_vs_hashlib_sha3():
    import hashlib

    from oece_tpu.harness import models

    def sha3_256(msg: bytes) -> bytes:
        rate = 136
        block = bytearray(msg + b"\x06" + b"\x00" * (rate - len(msg) - 1))
        block[rate - 1] |= 0x80
        state = bytes(block) + b"\x00" * (200 - rate)
        return models.keccak_f(state)[:32]

    for msg in (b"", b"abc", b"hello keccak", b"q" * 100):
        assert sha3_256(msg) == hashlib.sha3_256(msg).digest()


def test_sha512_keccak_circuits_plaintext():
    from oece_tpu.harness.testlib import test_keccak as run_keccak
    from oece_tpu.harness.testlib import test_sha512 as run_sha512

    r = run_sha512("examples/new_bristol_ckts/crypto/sha512.txt", 2, encrypted=False)
    assert r.passed, r.summary()
    r = run_keccak("examples/new_bristol_ckts/crypto/Keccak_f.txt", 2, encrypted=False)
    assert r.passed, r.summary()
