"""PDF standard-security decryption (round-3 item 2).

The generator encrypts with its own forward RC4/AES (sources/synth_crypt);
the parser decrypts with kernels/crypto + the Algorithm 1/2/4/5 logic in
kernels/pdf.  Encrypted fixtures must parse byte-identically to their
plaintext twins; unsupported handlers / real passwords error-route."""

import random
import re

import pytest

from pdf_extractor_spark.kernels.crypto import (
    CryptoError,
    _decrypt_block,
    _key_expansion,
    aes128_cbc_decrypt,
    rc4,
)
from pdf_extractor_spark.kernels.dispatch import extract_document
from pdf_extractor_spark.kernels.pdf import PdfError, parse_pdf
from pdf_extractor_spark.sources.synth import make_pdf

VARIANTS = ("rc4-40", "rc4-128", "aes-128")


# --------------------------------------------------------------------------
# Primitive known-answer tests (public vectors)
# --------------------------------------------------------------------------
def test_aes_fips197_kat():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert _decrypt_block(_key_expansion(key), ct) == pt


def test_rc4_kats():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    # symmetric
    assert rc4(b"k", rc4(b"k", b"round trip")) == b"round trip"


def test_generator_parser_cbc_roundtrip():
    from pdf_extractor_spark.sources.synth_crypt import _aes_cbc_encrypt

    key = bytes(range(16))
    for n in (1, 15, 16, 17, 100):
        data = bytes((i * 7) & 0xFF for i in range(n))
        assert aes128_cbc_decrypt(key, _aes_cbc_encrypt(key, b"\x05" * 16, data)) == data


def test_cbc_rejects_malformed():
    with pytest.raises(CryptoError):
        aes128_cbc_decrypt(bytes(16), b"short")
    with pytest.raises(CryptoError):
        aes128_cbc_decrypt(bytes(16), bytes(33))


# --------------------------------------------------------------------------
# Encrypted fixtures == plaintext twins
# --------------------------------------------------------------------------
@pytest.mark.parametrize("variant", VARIANTS)
@pytest.mark.parametrize("dialect", ("classic", "modern"))
def test_encrypted_twin_equals_plaintext(variant, dialect):
    for doc_id in (0, 3, 8):
        font = "cid" if doc_id % 2 else "simple"
        r0 = random.Random(f"tw:{doc_id}")
        plain, lines = make_pdf(r0, doc_id, dialect=dialect, font=font)
        r1 = random.Random(f"tw:{doc_id}")
        ct, lines2 = make_pdf(r1, doc_id, dialect=dialect, font=font,
                              encrypt=variant)
        assert lines == lines2
        assert ct != plain and b"/Encrypt" in ct
        pp, pe = parse_pdf(plain), parse_pdf(ct)
        assert [p["text"] for p in pe["pages"]] == [p["text"] for p in pp["pages"]]
        assert pe["metadata"] == pp["metadata"]
        for a, b in zip(pp["pages"], pe["pages"]):
            assert [i["payload"] for i in a["images"]] == [
                i["payload"] for i in b["images"]]
            assert a["blocks"] == b["blocks"]


def test_ciphertext_actually_scrambles_content():
    """The encrypted body must not contain the plaintext content stream —
    i.e. encryption is real, not a pass-through."""
    r0 = random.Random("scr:1")
    plain, _ = make_pdf(r0, 1, dialect="classic", font="simple")
    r1 = random.Random("scr:1")
    ct, _ = make_pdf(r1, 1, dialect="classic", font="simple", encrypt="rc4-128")
    import zlib

    # locate a plaintext Flate content stream and assert its bytes are absent
    m = re.search(rb"stream\r?\n(.*?)\nendstream", plain, re.S)
    assert m and m.group(1) not in ct
    # and Info strings are hex-encrypted, not literal
    assert b"(Synthetic Doc 1)" in plain
    assert b"(Synthetic Doc 1)" not in ct


# --------------------------------------------------------------------------
# Error-routes: unsupported handlers and real passwords
# --------------------------------------------------------------------------
def _blank(data: bytes, pattern: bytes, repl: bytes) -> bytes:
    assert len(repl) == len(pattern)
    assert pattern in data
    return data.replace(pattern, repl, 1)


def test_nonempty_user_password_error_routes():
    from pdf_extractor_spark.sources.synth_crypt import StdEncryptor

    # hand-assemble: same writer but a real user password -> /U check fails
    r1 = random.Random("pw:1")
    import pdf_extractor_spark.sources.synth as synth

    orig = synth.StdEncryptor if hasattr(synth, "StdEncryptor") else None
    import pdf_extractor_spark.sources.synth_crypt as sc

    class PwEnc(StdEncryptor):
        def __init__(self, variant, label, **kw):
            super().__init__(variant, label, user_pwd=b"real-secret")

    old = sc.StdEncryptor
    sc.StdEncryptor = PwEnc
    try:
        ct, _ = make_pdf(random.Random("pw:1"), 1, dialect="classic",
                         encrypt="rc4-128")
    finally:
        sc.StdEncryptor = old
        assert orig is None or synth.StdEncryptor is orig
    with pytest.raises(PdfError, match="password"):
        parse_pdf(ct)
    r = extract_document(ct)
    assert r["status"] == "error" and "password" in r["error"]


def test_unsupported_handler_and_version_error_route():
    r = random.Random("uh:1")
    ct, _ = make_pdf(r, 1, dialect="classic", encrypt="rc4-128")
    # foreign security handler (equal-length name swap keeps offsets valid)
    alien = _blank(ct, b"/Filter /Standard /V 2", b"/Filter /Standarf /V 2")
    with pytest.raises(PdfError, match="handler"):
        parse_pdf(alien)
    # an unknown future version errors cleanly
    v6 = _blank(ct, b"/Filter /Standard /V 2 /R 3", b"/Filter /Standard /V 6 /R 7")
    with pytest.raises(PdfError, match="V=6"):
        parse_pdf(v6)
    # V5 claimed but the AESV3 machinery absent (no /CF//UE) -> clean error
    v5 = _blank(ct, b"/Filter /Standard /V 2 /R 3", b"/Filter /Standard /V 5 /R 6")
    with pytest.raises(PdfError):
        parse_pdf(v5)
    # all must side-channel, never crash
    for b in (alien, v6, v5):
        assert extract_document(b)["status"] == "error"


def test_truncated_ciphertext_error_routes():
    r = random.Random("tc:1")
    ct, _ = make_pdf(r, 1, dialect="classic", encrypt="aes-128")
    # corrupt every AES payload's length mod 16 by shaving the final stream
    bad = ct.replace(b"\nendstream", b"X\nendstream", 1)
    r = extract_document(bad)
    assert r["status"] in ("ok", "error")  # never raises


# --------------------------------------------------------------------------
# AES-256 (V5: R6 iterated KDF and deprecated R5) — round-3 extension
# --------------------------------------------------------------------------
def test_aes256_kats():
    from pdf_extractor_spark.kernels.crypto import _encrypt_block, _key_expansion

    # FIPS-197 C.3 (AES-256), both directions
    k = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                      "101112131415161718191a1b1c1d1e1f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    assert _encrypt_block(_key_expansion(k), pt) == ct
    assert _decrypt_block(_key_expansion(k), ct) == pt


def test_r6_kdf_implementations_agree():
    from pdf_extractor_spark.kernels.crypto import hash_r6
    from pdf_extractor_spark.sources.synth_crypt import _hash_r6

    for pwd, salt, ud in [(b"", b"saltsalt", b""), (b"pw", b"12345678", b"U" * 48)]:
        assert hash_r6(pwd, salt, ud) == _hash_r6(pwd, salt, ud)


@pytest.mark.parametrize("variant", ("aes-256", "aes-256-r5"))
def test_aes256_twin_equals_plaintext(variant):
    doc_id = 4
    r0 = random.Random(f"a256t:{doc_id}")
    plain, lines = make_pdf(r0, doc_id, dialect="modern", font="cid")
    r1 = random.Random(f"a256t:{doc_id}")
    ct, lines2 = make_pdf(r1, doc_id, dialect="modern", font="cid",
                          encrypt=variant)
    assert lines == lines2 and b"/AESV3" in ct
    expected_r = b"/R 6" if variant == "aes-256" else b"/R 5"
    assert expected_r in ct
    pp, pe = parse_pdf(plain), parse_pdf(ct)
    assert [p["text"] for p in pe["pages"]] == [p["text"] for p in pp["pages"]]
    assert pe["metadata"] == pp["metadata"]


def test_aes256_wrong_password_error_routes():
    from pdf_extractor_spark.sources.synth_crypt import StdEncryptor
    import pdf_extractor_spark.sources.synth_crypt as sc

    class PwEnc(StdEncryptor):
        def __init__(self, variant, label, **kw):
            super().__init__(variant, label, user_pwd=b"real-secret")

    old = sc.StdEncryptor
    sc.StdEncryptor = PwEnc
    try:
        ct, _ = make_pdf(random.Random("a256pw"), 1, dialect="classic",
                         encrypt="aes-256-r5")
    finally:
        sc.StdEncryptor = old
    with pytest.raises(PdfError, match="password"):
        parse_pdf(ct)
    assert extract_document(ct)["status"] == "error"


def test_v5_bad_cfm_error_routes():
    ct, _ = make_pdf(random.Random("a256cfm"), 1, dialect="classic",
                     encrypt="aes-256-r5")
    bad = ct.replace(b"/CFM /AESV3", b"/CFM /AESV9", 1)
    with pytest.raises(PdfError, match="crypt filter"):
        parse_pdf(bad)
