"""Pure-Python golden models for the harness circuits.

Parity role: the C++ golden models embedded in the reference's test harness
(ripple-carry adder test_adder.cpp:204-217, comparisons
test_comparator.cpp:235-269, 64-bit product test_multiplier.cpp:211-224,
parity test_parity.cpp:199-205) plus *computed* MD5/SHA-256/AES compression
functions — the reference hardcodes 4 vectors (test_md5.cpp:198-229,
test_sha256.cpp:201-243, test_aes.cpp:184-233); we additionally verify
against the sidecar vector files and arbitrary random blocks.
"""

from __future__ import annotations

import struct
from typing import List

import numpy as np

# ---------------------------------------------------------------------------
# bit helpers (utils parity: HexStr2UintVec src/utils.cpp:49-71 etc.)
# ---------------------------------------------------------------------------


def hex_to_bits_lsb(h: str) -> np.ndarray:
    """Hex string -> LSB-first bit vector (HexStr2UintVec parity):
    bytes in string order; within each byte, bit 0 first."""
    b = bytes.fromhex(h)
    out = np.zeros(len(b) * 8, dtype=np.int64)
    for i, byte in enumerate(b):
        for j in range(8):
            out[8 * i + j] = (byte >> j) & 1
    return out


def bits_lsb_to_hex(bits: np.ndarray) -> str:
    bits = np.asarray(bits).astype(np.int64)
    assert bits.size % 8 == 0
    by = bytearray()
    for i in range(bits.size // 8):
        v = 0
        for j in range(8):
            v |= int(bits[8 * i + j]) << j
        by.append(v)
    return by.hex()


def int_to_bits(v: int, n: int) -> np.ndarray:
    return np.array([(v >> i) & 1 for i in range(n)], dtype=np.int64)


def bits_to_int(bits) -> int:
    return sum(int(b) << i for i, b in enumerate(bits))


# ---------------------------------------------------------------------------
# MD5 compression (single 512-bit block, no padding)
# ---------------------------------------------------------------------------

_MD5_S = (
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4
)
_MD5_K = [int(abs(np.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)]
_MD5_IV = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)


def md5_compress(block: bytes, iv=_MD5_IV) -> bytes:
    assert len(block) == 64
    M = struct.unpack("<16I", block)
    A, B, C, D = iv
    a, b, c, d = A, B, C, D
    for i in range(64):
        if i < 16:
            F = (b & c) | (~b & d)
            g = i
        elif i < 32:
            F = (d & b) | (~d & c)
            g = (5 * i + 1) % 16
        elif i < 48:
            F = b ^ c ^ d
            g = (3 * i + 5) % 16
        else:
            F = c ^ (b | ~d)
            g = (7 * i) % 16
        F = (F + a + _MD5_K[i] + M[g]) & 0xFFFFFFFF
        a, d, c = d, c, b
        rot = _MD5_S[i]
        b = (b + ((F << rot | F >> (32 - rot)) & 0xFFFFFFFF)) & 0xFFFFFFFF
    out = (
        (A + a) & 0xFFFFFFFF,
        (B + b) & 0xFFFFFFFF,
        (C + c) & 0xFFFFFFFF,
        (D + d) & 0xFFFFFFFF,
    )
    return struct.pack("<4I", *out)


# ---------------------------------------------------------------------------
# SHA-256 compression (single block, no padding)
# ---------------------------------------------------------------------------

_SHA_K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]
SHA256_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)


def _rotr(x, n):
    return ((x >> n) | (x << (32 - n))) & 0xFFFFFFFF


def sha256_compress(block: bytes, iv=SHA256_IV) -> bytes:
    assert len(block) == 64
    w = list(struct.unpack(">16I", block))
    for i in range(16, 64):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & 0xFFFFFFFF)
    a, b, c, d, e, f, g, h = iv
    for i in range(64):
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = (h + S1 + ch + _SHA_K[i] + w[i]) & 0xFFFFFFFF
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + maj) & 0xFFFFFFFF
        h, g, f, e, d, c, b, a = g, f, e, (d + t1) & 0xFFFFFFFF, c, b, a, (t1 + t2) & 0xFFFFFFFF
    out = [(x + y) & 0xFFFFFFFF for x, y in zip(iv, (a, b, c, d, e, f, g, h))]
    return struct.pack(">8I", *out)


# ---------------------------------------------------------------------------
# AES-128 (encrypt one block; also expanded-key form: 11 round keys)
# ---------------------------------------------------------------------------

_SBOX = None


def _aes_sbox():
    global _SBOX
    if _SBOX is not None:
        return _SBOX
    # generate algebraically: inverse in GF(2^8) + affine transform
    p = 0x11B
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            v, a, b = 0, x, y
            # gf multiply
            r = 0
            aa, bb = a, b
            while bb:
                if bb & 1:
                    r ^= aa
                aa <<= 1
                if aa & 0x100:
                    aa ^= p
                bb >>= 1
            if r == 1:
                inv[x] = y
                break
    sbox = []
    for x in range(256):
        b = inv[x] if x else 0
        s = 0
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            s |= bit << i
        sbox.append(s)
    _SBOX = sbox
    return sbox


def _gf_mul(a, b):
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def aes128_expand_key(key: bytes) -> List[bytes]:
    sbox = _aes_sbox()
    rcon = 1
    w = [list(key[4 * i : 4 * i + 4]) for i in range(4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [sbox[x] for x in t]
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [bytes(sum(w[4 * r : 4 * r + 4], [])) for r in range(11)]


def aes128_encrypt_with_round_keys(pt: bytes, rks: List[bytes]) -> bytes:
    sbox = _aes_sbox()
    s = list(pt)  # FIPS layout: byte i fills state column-major (r + 4c = i)

    def add_rk(state, rk):
        return [a ^ b for a, b in zip(state, rk)]

    def sub(state):
        return [sbox[x] for x in state]

    def shift_rows(state):
        # state is byte-index i = r + 4c (FIPS layout: input bytes fill columns)
        out = [0] * 16
        for r in range(4):
            for c in range(4):
                out[r + 4 * c] = state[r + 4 * ((c + r) % 4)]
        return out

    def mix(state):
        out = [0] * 16
        for c in range(4):
            col = state[4 * c : 4 * c + 4]
            out[4 * c + 0] = _gf_mul(col[0], 2) ^ _gf_mul(col[1], 3) ^ col[2] ^ col[3]
            out[4 * c + 1] = col[0] ^ _gf_mul(col[1], 2) ^ _gf_mul(col[2], 3) ^ col[3]
            out[4 * c + 2] = col[0] ^ col[1] ^ _gf_mul(col[2], 2) ^ _gf_mul(col[3], 3)
            out[4 * c + 3] = _gf_mul(col[0], 3) ^ col[1] ^ col[2] ^ _gf_mul(col[3], 2)
        return out

    s = add_rk(s, rks[0])
    for rnd in range(1, 10):
        s = mix(shift_rows(sub(s)))
        s = add_rk(s, rks[rnd])
    s = shift_rows(sub(s))
    s = add_rk(s, rks[10])
    return bytes(s)


def aes128_encrypt(pt: bytes, key: bytes) -> bytes:
    return aes128_encrypt_with_round_keys(pt, aes128_expand_key(key))


# ---------------------------------------------------------------------------
# Integer division golden models (new-Bristol arith suite, circuits/gen.py
# gen_udivide / gen_divide; edge semantics documented there)
# ---------------------------------------------------------------------------


def udiv(a: int, b: int, width: int = 64) -> int:
    """Unsigned quotient; division by zero yields all-ones (the restoring
    divider's natural behavior: every compare succeeds)."""
    mask = (1 << width) - 1
    a, b = a & mask, b & mask
    return mask if b == 0 else a // b


def sdiv(a: int, b: int, width: int = 64) -> int:
    """Signed quotient truncated toward zero, via |a|/|b| with sign fix —
    exactly the gen_divide circuit: /0 -> -1 (a>=0) or +1 (a<0);
    INT_MIN / -1 wraps to INT_MIN."""
    mask = (1 << width) - 1
    sa = (a >> (width - 1)) & 1
    sb = (b >> (width - 1)) & 1
    aa = ((-a) if sa else a) & mask
    ab = ((-b) if sb else b) & mask
    q = udiv(aa, ab, width)
    return ((-q) if sa ^ sb else q) & mask


# ---------------------------------------------------------------------------
# SHA-1 compression (reference corpus old_bristol_ckts/crypto/sha-1.txt; the
# reference's sha-1-test.txt is a saved 404 page with no usable vectors —
# test_sha256.cpp:60 — so vectors here come from this hashlib-checked model)
# ---------------------------------------------------------------------------

SHA1_IV = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0)


def _rotl32(x, n):
    return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF


def sha1_compress(block: bytes, iv=SHA1_IV) -> bytes:
    assert len(block) == 64
    w = [int.from_bytes(block[4 * i : 4 * i + 4], "big") for i in range(16)]
    for i in range(16, 80):
        w.append(_rotl32(w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16], 1))
    a, b, c, d, e = iv
    for i in range(80):
        if i < 20:
            f, k = (b & c) | (~b & d), 0x5A827999
        elif i < 40:
            f, k = b ^ c ^ d, 0x6ED9EBA1
        elif i < 60:
            f, k = (b & c) | (b & d) | (c & d), 0x8F1BBCDC
        else:
            f, k = b ^ c ^ d, 0xCA62C1D6
        t = (_rotl32(a, 5) + f + e + k + w[i]) & 0xFFFFFFFF
        e, d, c, b, a = d, c, _rotl32(b, 30), a, t
    out = [(x + y) & 0xFFFFFFFF for x, y in zip(iv, (a, b, c, d, e))]
    return b"".join(int.to_bytes(x, 4, "big") for x in out)
