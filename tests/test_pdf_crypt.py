"""PDF standard-security-handler tests: published cipher vectors, the
O/U/key algorithms, transparent empty-user-password extraction
(reference parity: pypdf decrypts these silently,
karanta/pipeline.py:480-505), and the typed row for real passwords."""

from __future__ import annotations

import pytest

from karanta_ocr_spark.fixtures.pdf_gen import PageSpec, TextRun, build_pdf
from karanta_ocr_spark.kernel.pdf_crypt import (
    StdSecurityHandler,
    _aes_decrypt_block,
    _aes_encrypt_block,
    _expand_key,
    _SBOX,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    compute_key,
    compute_o,
    compute_u,
    rc4,
    verify_user_password,
)
from karanta_ocr_spark.kernel.pdf_mini import (
    PdfEncryptedError,
    parse_pdf,
)
from karanta_ocr_spark.kernel.linearize import page_natural_text

PAGES = [
    PageSpec(runs=[TextRun("Hello enc P1", 72, 700), TextRun("line two", 72, 680)]),
    PageSpec(runs=[TextRun("Second page", 72, 700)]),
]


def _texts(pdf_bytes: bytes) -> list[str]:
    return [page_natural_text(r) for r in parse_pdf(pdf_bytes)]


# ------------------------------------------------------ cipher vectors
def test_aes128_fips197_vector():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _aes_encrypt_block(_expand_key(key), pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"  # FIPS-197 C.1
    assert _aes_decrypt_block(_expand_key(key), ct) == pt


def test_aes_sbox_spot_values():
    assert _SBOX[0x00] == 0x63 and _SBOX[0x53] == 0xED and _SBOX[0xFF] == 0x16


def test_rc4_known_vectors():
    # Classic public RC4 vectors.
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    # symmetric
    assert rc4(b"Key", rc4(b"Key", b"round trip")) == b"round trip"


def test_aes_cbc_roundtrip_all_lengths():
    key = bytes(range(16))
    for n in range(0, 49):
        blob = bytes((i * 7) & 0xFF for i in range(n))
        enc = aes_cbc_encrypt(key, bytes(16), blob)
        assert len(enc) % 16 == 0 and len(enc) >= 32
        assert aes_cbc_decrypt(key, enc) == blob


# ----------------------------------------------- handler algorithms
def test_user_password_verify_accepts_empty_rejects_wrong():
    for r, bits in [(2, 40), (3, 128), (4, 128)]:
        o = compute_o(b"owner", b"", r, bits)
        key = compute_key(b"", o, -44, b"fileid01", r, bits)
        u = compute_u(key, b"fileid01", r)
        assert verify_user_password(b"", o, u, -44, b"fileid01", r, bits) == key
        assert (
            verify_user_password(b"wrong", o, u, -44, b"fileid01", r, bits)
            is None
        )


def test_handler_rejects_unsupported_variants():
    with pytest.raises(ValueError, match="handler"):
        StdSecurityHandler({"/Filter": "/Custom"}, b"")
    with pytest.raises(ValueError, match="/V"):
        StdSecurityHandler(
            {"/Filter": "/Standard", "/V": 5, "/O": b"x" * 32, "/U": b"y" * 32},
            b"",
        )


# ------------------------------------------- end-to-end extraction
@pytest.mark.parametrize("mode", ["rc4-40", "rc4", "aes"])
@pytest.mark.parametrize("compress", [False, True])
def test_encrypted_pdf_extracts_same_as_plaintext(mode, compress):
    golden = _texts(build_pdf(PAGES, compress=compress))
    got = _texts(build_pdf(PAGES, compress=compress, encrypt=mode))
    assert got == golden
    assert golden[0] == "Hello enc P1\nline two"


def test_nonempty_user_password_stays_typed_row():
    locked = build_pdf(PAGES, encrypt="aes", user_pwd=b"secret")
    with pytest.raises(PdfEncryptedError, match="password"):
        parse_pdf(locked)
    # ...and the pipeline kernel converts that into the typed row.
    from karanta_ocr_spark.kernel.extract import extract_document

    rows = extract_document("https://x.example/locked.pdf", locked)
    assert len(rows) == 1 and not rows[0].ok and rows[0].error == "pdf: encrypted"


def test_trailing_cr_ciphertext_not_truncated():
    # Deterministic construction: many AES docs make ~1/256 stream
    # ciphertexts end with 0x0D; the /Length-based extraction must
    # keep that byte (the regex's trailing \r?\n used to eat it).
    hit = 0
    for i in range(40):
        pages = [PageSpec(runs=[TextRun(f"Doc {i} body text {i}", 72, 700)])]
        enc = build_pdf(pages, encrypt="aes")
        got = _texts(enc)
        assert got == _texts(build_pdf(pages)), f"doc {i} mismatched"
        hit += 1
    assert hit == 40


def test_encrypted_objstm_like_lengths_align():
    # AES payloads are iv + PKCS#7 ciphertext: always 16-aligned and
    # >= 32 bytes; the builder's /Length must reflect that exactly.
    import re

    enc = build_pdf(PAGES, compress=True, encrypt="aes")
    for m in re.finditer(rb"/Length (\d+) >>\nstream\n", enc):
        n = int(m.group(1))
        assert n % 16 == 0 and n >= 32


def test_numpy_and_scalar_aes_decrypt_agree():
    # The vectorized lockstep decrypt must be bit-identical to the
    # scalar FIPS-197 path on every block.
    import numpy as np

    from karanta_ocr_spark.kernel.pdf_crypt import _aes_decrypt_blocks_np

    key = bytes(range(16))
    rk = _expand_key(key)
    raw = bytes((i * 31 + 7) & 0xFF for i in range(16 * 33))
    blocks = np.frombuffer(raw, dtype="uint8").reshape(-1, 16)
    vec = _aes_decrypt_blocks_np(key, blocks)
    for i in range(len(blocks)):
        assert bytes(vec[i]) == _aes_decrypt_block(rk, bytes(blocks[i])), i


def test_many_cipher_parity_with_scalar():
    import random

    from karanta_ocr_spark.kernel.pdf_crypt import (
        aes_cbc_encrypt,
        aes_cbc_encrypt_many,
        rc4,
        rc4_many,
    )

    rng = random.Random(11)
    datas = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300)))
        for _ in range(23)
    ]
    rkeys = [
        bytes(rng.randrange(256) for _ in range(rng.choice([5, 10, 16])))
        for _ in range(23)
    ]
    assert rc4_many(rkeys, datas) == [rc4(k, d) for k, d in zip(rkeys, datas)]
    akeys = [bytes(rng.randrange(256) for _ in range(16)) for _ in range(23)]
    ivs = [bytes(rng.randrange(256) for _ in range(16)) for _ in range(23)]
    assert aes_cbc_encrypt_many(akeys, ivs, datas) == [
        aes_cbc_encrypt(k, iv, d) for k, iv, d in zip(akeys, ivs, datas)
    ]


def test_build_pdfs_batch_equals_per_doc():
    from karanta_ocr_spark.fixtures.pdf_gen import (
        PageSpec,
        TextRun,
        build_pdf,
        build_pdfs,
    )

    specs = [
        ([PageSpec(runs=[TextRun(f"doc {i} päge", 72, 700 - i)])],
         ["rc4", "aes", None, "rc4-40"][i % 4])
        for i in range(17)
    ]
    batch = build_pdfs(specs, compress=True)
    single = [build_pdf(p, compress=True, encrypt=e) for p, e in specs]
    assert batch == single
