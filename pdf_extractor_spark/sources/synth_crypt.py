"""Generator-side PDF standard-security ENCRYPTOR (fixture writer).

Implements the writer half of PDF 32000-1 §7.6.3 — /O and /U entry
computation (Algorithms 3/4/5), file-key derivation (Algorithm 2), and
per-object encryption (Algorithm 1) — over its own forward RC4 and AES-128
implementations.  Shares no code with the parser's decrypt side
(kernels/crypto.py + kernels/pdf.py): the forward AES here builds its S-box
from GF(2^8) log/antilog tables while the decoder brute-forces inverses,
and the handler algorithms are written independently on both sides (the PAD
constant and table math are public spec values, like the JPEG zigzag
order).

Deterministic: fixture IVs are derived from (doc label, object number).
"""

from __future__ import annotations

import functools
import hashlib

__all__ = ["StdEncryptor", "PAD"]

# Public spec constant (PDF 32000-1 Algorithm 2 step a)
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _pad_pwd(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def _rc4_xform(key: bytes, data: bytes) -> bytes:
    """Forward RC4 (KSA + PRGA), generator-side implementation."""
    state = bytearray(range(256))
    j = 0
    for i in range(256):
        j = (j + state[i] + key[i % len(key)]) % 256
        state[i], state[j] = state[j], state[i]
    x = y = 0
    out = bytearray()
    for byte in data:
        x = (x + 1) % 256
        y = (y + state[x]) % 256
        state[x], state[y] = state[y], state[x]
        out.append(byte ^ state[(state[x] + state[y]) % 256])
    return bytes(out)


# -- forward AES-128 via log/antilog tables ---------------------------------
_EXP = [0] * 512
_LOG = [0] * 256
_c = 1
for _i in range(255):
    _EXP[_i] = _c
    _LOG[_c] = _i
    # multiply by generator 0x03
    _c ^= (_c << 1) ^ (0x11B if _c & 0x80 else 0)
    _c &= 0xFF
for _i in range(255, 512):
    _EXP[_i] = _EXP[_i - 255]


def _mul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _make_sbox() -> list[int]:
    box = [0] * 256
    for v in range(256):
        inv = 0 if v == 0 else _EXP[255 - _LOG[v]]
        r, q = 0x63, inv
        for _ in range(5):
            r ^= q
            q = ((q << 1) | (q >> 7)) & 0xFF
        box[v] = r
    return box


_S = _make_sbox()


def _expand(key: bytes) -> list[bytes]:
    nk = len(key) // 4          # 4 (AES-128) or 8 (AES-256)
    rounds = {4: 10, 8: 14}[nk]
    w = [list(key[i:i + 4]) for i in range(0, len(key), 4)]
    rc = 1
    for i in range(nk, 4 * (rounds + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_S[t[1]], _S[t[2]], _S[t[3]], _S[t[0]]]
            t[0] ^= rc
            rc = _mul(rc, 2)
        elif nk == 8 and i % nk == 4:
            t = [_S[b] for b in t]
        w.append([x ^ y for x, y in zip(w[i - nk], t)])
    return [bytes(sum(w[4 * r:4 * r + 4], [])) for r in range(rounds + 1)]


def _enc_block(rks: list[bytes], block: bytes) -> bytes:
    last = len(rks) - 1
    s = [b ^ k for b, k in zip(block, rks[0])]
    for rnd in range(1, last):
        s = [_S[b] for b in s]
        # ShiftRows (column-major state): row r rotates LEFT by r
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        mixed = []
        for col in range(4):
            a = s[4 * col:4 * col + 4]
            mixed += [
                _mul(a[0], 2) ^ _mul(a[1], 3) ^ a[2] ^ a[3],
                a[0] ^ _mul(a[1], 2) ^ _mul(a[2], 3) ^ a[3],
                a[0] ^ a[1] ^ _mul(a[2], 2) ^ _mul(a[3], 3),
                _mul(a[0], 3) ^ a[1] ^ a[2] ^ _mul(a[3], 2),
            ]
        s = [b ^ k for b, k in zip(mixed, rks[rnd])]
    s = [_S[b] for b in s]
    s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
    return bytes(b ^ k for b, k in zip(s, rks[last]))


def _aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    pad_n = 16 - len(data) % 16
    data = data + bytes([pad_n]) * pad_n
    rks = _expand(key)
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _enc_block(rks, block)
        out += prev
    return bytes(out)


def _aes_cbc_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt, no padding, IV not emitted (KDF / key-wrap internal)."""
    rks = _expand(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = _enc_block(rks, bytes(a ^ b for a, b in zip(data[i:i + 16], prev)))
        out += prev
    return bytes(out)


@functools.lru_cache(maxsize=256)
def _hash_r6(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B iterated KDF (SHA-256/384/512 selected by
    the AES output)."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    count = 0
    while True:
        count += 1
        k1 = (pwd + k + udata) * 64
        e = _aes_cbc_nopad(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3](e).digest()
        if count >= 64 and e[-1] <= count - 32:
            return k[:32]


_VARIANTS = {
    # name: (V, R, key bits, CFM or None)
    "rc4-40": (1, 2, 40, None),
    "rc4-128": (2, 3, 128, None),
    "aes-128": (4, 4, 128, "AESV2"),
    "aes-256": (5, 6, 256, "AESV3"),
    # R5 = the deprecated single-SHA-256 revision: same V5/AESV3 object
    # encryption and /UE key unwrap, but a cheap password hash — used for
    # the bulk driver gate where R6's iterated KDF (~1 s/hash in pure
    # Python) would dominate; R6 itself is covered by pytest fixtures.
    "aes-256-r5": (5, 5, 256, "AESV3"),
}


class StdEncryptor:
    """Standard security handler, writer side.  Empty user password, fixed
    owner password; P allows everything (-4)."""

    def __init__(self, variant: str, doc_label: str,
                 owner_pwd: bytes = b"fixture-owner",
                 user_pwd: bytes = b"") -> None:
        if variant not in _VARIANTS:
            raise ValueError(f"unknown variant {variant}")
        self.variant = variant
        self.v, self.r, bits, self.cfm = _VARIANTS[variant]
        self.n = bits // 8
        self.p = -4
        self.doc_id = hashlib.md5(f"id:{doc_label}".encode()).digest()
        if self.v == 5:
            self._setup_v5(owner_pwd, user_pwd)
        else:
            self.o = self._compute_o(owner_pwd, user_pwd)
            self.key = self._file_key(user_pwd)
            self.u = self._compute_u()

    def _setup_v5(self, owner_pwd: bytes, user_pwd: bytes) -> None:
        """R6 (ISO 32000-2): random-in-spirit values derived deterministically
        from the doc label; /U = hash+vsalt+ksalt, /UE wraps the file key."""
        seed = hashlib.sha256(b"v5:" + self.doc_id).digest()
        self.key = hashlib.sha256(b"filekey:" + self.doc_id).digest()  # 32 B
        if self.r == 5:
            def hashf(pwd, salt, udata=b""):
                return hashlib.sha256(pwd + salt + udata).digest()
        else:
            hashf = _hash_r6
        vsalt, ksalt = seed[:8], seed[8:16]
        self.u = hashf(user_pwd, vsalt) + vsalt + ksalt                # 48 B
        self.ue = _aes_cbc_nopad(
            hashf(user_pwd, ksalt), b"\x00" * 16, self.key)
        ovsalt, oksalt = seed[16:24], seed[24:32]
        self.o = hashf(owner_pwd, ovsalt, self.u) + ovsalt + oksalt
        self.oe = _aes_cbc_nopad(
            hashf(owner_pwd, oksalt, self.u), b"\x00" * 16, self.key)
        perms_pt = (
            (self.p & 0xFFFFFFFF).to_bytes(4, "little")
            + b"\xff\xff\xff\xff" + b"T" + b"adb" + seed[:4]
        )
        # single block, IV 0 -> equivalent to the spec's AES-ECB
        self.perms = _aes_cbc_nopad(self.key, b"\x00" * 16, perms_pt)

    # Algorithm 3
    def _compute_o(self, owner_pwd: bytes, user_pwd: bytes) -> bytes:
        h = hashlib.md5(_pad_pwd(owner_pwd)).digest()
        if self.r >= 3:
            for _ in range(50):
                h = hashlib.md5(h[:self.n]).digest()
        rkey = h[:self.n]
        o = _rc4_xform(rkey, _pad_pwd(user_pwd))
        if self.r >= 3:
            for i in range(1, 20):
                o = _rc4_xform(bytes(b ^ i for b in rkey), o)
        return o

    # Algorithm 2
    def _file_key(self, user_pwd: bytes) -> bytes:
        m = hashlib.md5()
        m.update(_pad_pwd(user_pwd))
        m.update(self.o)
        m.update((self.p & 0xFFFFFFFF).to_bytes(4, "little"))
        m.update(self.doc_id)
        h = m.digest()
        if self.r >= 3:
            for _ in range(50):
                h = hashlib.md5(h[:self.n]).digest()
        return h[:self.n]

    # Algorithms 4 / 5
    def _compute_u(self) -> bytes:
        if self.r == 2:
            return _rc4_xform(self.key, PAD)
        h = hashlib.md5(PAD + self.doc_id).digest()
        u = _rc4_xform(self.key, h)
        for i in range(1, 20):
            u = _rc4_xform(bytes(b ^ i for b in self.key), u)
        return u + b"\x00" * 16

    # Algorithm 1
    def _obj_key(self, num: int, gen: int) -> bytes:
        m = hashlib.md5()
        m.update(self.key)
        m.update(num.to_bytes(3, "little"))
        m.update(gen.to_bytes(2, "little"))
        if self.cfm == "AESV2":
            m.update(b"sAlT")
        return m.digest()[:min(self.n + 5, 16)]

    def encrypt(self, num: int, gen: int, data: bytes) -> bytes:
        if self.cfm == "AESV3":
            # R6: the FILE key encrypts every object directly (no per-object
            # key derivation in V5)
            iv = hashlib.md5(b"iv:%d:%d:" % (num, gen) + self.doc_id).digest()
            return _aes_cbc_encrypt(self.key, iv, data)
        okey = self._obj_key(num, gen)
        if self.cfm == "AESV2":
            iv = hashlib.md5(b"iv:%d:%d:" % (num, gen) + self.doc_id).digest()
            return _aes_cbc_encrypt(okey, iv, data)
        return _rc4_xform(okey, data)

    def encrypt_dict(self, obj_id: int) -> bytes:
        """Serialized /Encrypt dictionary (never itself encrypted)."""
        if self.v == 5:
            return (
                b"<< /Filter /Standard /V 5 /R %d /Length 256 /P %d "
                b"/O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s> "
                b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
                b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF >>"
                % (self.r, self.p, self.o.hex().encode(),
                   self.u.hex().encode(), self.oe.hex().encode(),
                   self.ue.hex().encode(), self.perms.hex().encode())
            )
        base = (
            b"<< /Filter /Standard /V %d /R %d /Length %d /P %d "
            b"/O <%s> /U <%s>"
            % (self.v, self.r, self.n * 8, self.p,
               self.o.hex().encode(), self.u.hex().encode())
        )
        if self.cfm:
            base += (
                b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                b"/Length 16 >> >> /StmF /StdCF /StrF /StdCF"
            )
        return base + b" >>"

    def trailer_extra(self, enc_obj_id: int) -> bytes:
        idh = self.doc_id.hex().encode()
        return b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (enc_obj_id, idh, idh)

    def hex_string(self, num: int, gen: int, s: bytes) -> bytes:
        """An encrypted literal string, serialized as a hex string."""
        return b"<" + self.encrypt(num, gen, s).hex().encode() + b">"
