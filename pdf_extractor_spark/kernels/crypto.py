"""From-scratch crypto primitives for PDF standard-security decryption.

Everything here is a direct implementation of public specifications — RC4
(the widely published stream cipher) and AES-128 (FIPS-197) — on stdlib
only.  The PDF standard security handler (PDF 32000-1 §7.6.3) combines
these with md5 (hashlib) for key derivation; that logic lives in
``kernels/pdf.py``.  The fixture generator encrypts with its OWN forward
implementations (sources/synth_crypt.py) — no code is shared with this
decrypt side (generator/parser honesty rule; the table constants both sides
derive are public FIPS-197 math, like the JPEG zigzag order).

Deterministic, pure functions of their inputs.
"""

from __future__ import annotations

__all__ = ["rc4", "aes128_cbc_decrypt", "CryptoError"]


class CryptoError(ValueError):
    """Malformed ciphertext (bad length / padding)."""


# --------------------------------------------------------------------------
# RC4 (symmetric — same function encrypts and decrypts)
# --------------------------------------------------------------------------
def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------------------------
# AES-128 inverse cipher (FIPS-197 §5.3) + CBC mode
# --------------------------------------------------------------------------
def _gf_mul(a: int, b: int) -> int:
    """GF(2^8) multiply, reduction polynomial x^8+x^4+x^3+x+1 (0x11B)."""
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    """Compute the S-box from first principles: multiplicative inverse in
    GF(2^8) (brute-force search — 256 elements) then the affine transform."""
    sbox = [0] * 256
    for x in range(256):
        if x == 0:
            inv = 0
        else:
            inv = next(y for y in range(1, 256) if _gf_mul(x, y) == 1)
        b = inv
        res = 0x63
        for i in range(8):
            bit = ((b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                   ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8))) & 1
            res ^= bit << i
        sbox[x] = res
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()


def _key_expansion(key: bytes) -> list[list[int]]:
    """128-bit key -> 11 round keys of 16 bytes (FIPS-197 §5.2)."""
    if len(key) != 16:
        raise CryptoError("AES-128 needs a 16-byte key")
    words = [list(key[4 * i:4 * i + 4]) for i in range(4)]
    rcon = 1
    for i in range(4, 44):
        t = list(words[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]                      # RotWord
            t = [_SBOX[b] for b in t]              # SubWord
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        words.append([a ^ b for a, b in zip(words[i - 4], t)])
    return [sum(words[4 * r:4 * r + 4], []) for r in range(11)]


def _inv_shift_rows(s: list[int]) -> list[int]:
    # state is column-major: s[r + 4c]; row r rotates RIGHT by r
    out = [0] * 16
    for r in range(4):
        for c in range(4):
            out[r + 4 * ((c + r) % 4)] = s[r + 4 * c]
    return out


def _inv_mix_columns(s: list[int]) -> list[int]:
    out = [0] * 16
    for c in range(4):
        col = s[4 * c:4 * c + 4]
        out[4 * c + 0] = (_gf_mul(col[0], 14) ^ _gf_mul(col[1], 11)
                          ^ _gf_mul(col[2], 13) ^ _gf_mul(col[3], 9))
        out[4 * c + 1] = (_gf_mul(col[0], 9) ^ _gf_mul(col[1], 14)
                          ^ _gf_mul(col[2], 11) ^ _gf_mul(col[3], 13))
        out[4 * c + 2] = (_gf_mul(col[0], 13) ^ _gf_mul(col[1], 9)
                          ^ _gf_mul(col[2], 14) ^ _gf_mul(col[3], 11))
        out[4 * c + 3] = (_gf_mul(col[0], 11) ^ _gf_mul(col[1], 13)
                          ^ _gf_mul(col[2], 9) ^ _gf_mul(col[3], 14))
    return out


def _decrypt_block(round_keys: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, round_keys[10])]
    for rnd in range(9, 0, -1):
        s = _inv_shift_rows(s)
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, round_keys[rnd])]
        s = _inv_mix_columns(s)
    s = _inv_shift_rows(s)
    s = [_INV_SBOX[b] for b in s]
    s = [b ^ k for b, k in zip(s, round_keys[0])]
    return bytes(s)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 layout: 16-byte IV prefix + CBC ciphertext with RFC-2898
    padding (always present).  Returns the unpadded plaintext."""
    if len(data) < 32 or len(data) % 16:
        raise CryptoError(f"AES-CBC payload of {len(data)} bytes")
    rk = _key_expansion(key)
    iv, ct = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(ct), 16):
        block = ct[i:i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, block), prev))
        prev = block
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise CryptoError("bad CBC padding")
    return bytes(out[:-pad])
