"""AES-CBC io (ext/aes/): NIST SP 800-38A known-answer vectors + the
element buffer semantics (serialize-iv, per-buffer-padding, stream tail).
"""

import numpy as np
import pytest

from gstbad_tpu.io import aes

K128 = "2b7e151628aed2a6abf7158809cf4f3c"
K256 = ("603deb1015ca71be2b73aef0857d7781"
        "1f352c073b6108d72d9810a30914dff4")
IV = "000102030405060708090a0b0c0d0e0f"
PT = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a"
                   "ae2d8a571e03ac9c9eb76fac45af8e51"
                   "30c81c46a35ce411e5fbc1191a0a52ef"
                   "f69f2445df4f9b17ad2b417be66c3710")
CT128 = bytes.fromhex("7649abac8119b246cee98e9b12e9197d"
                      "5086cb9b507219ee95db113a917678b2"
                      "73bed6b8e3c1743b7116e69e22229516"
                      "3ff1caa1681fac09120eca307586e1a7")
CT256 = bytes.fromhex("f58c4c04d6e5f1ba779eabfb5f7bfbd6"
                      "9cfc4e967edb808d679f777bc6702c7d"
                      "39f23369a9d9bacfa530e26304231461"
                      "b2eb05e2c39be9fcda6c19078c6a9d1b")


def test_nist_cbc_vectors():
    for key, cipher, ct in ((K128, "aes-128-cbc", CT128),
                            (K256, "aes-256-cbc", CT256)):
        enc = aes.AesEnc(key, IV, cipher, per_buffer_padding=False)
        got = enc.push(PT)
        assert got == ct
        # full padded-stream round trip through the stream-mode tail
        enc2 = aes.AesEnc(key, IV, cipher, per_buffer_padding=False)
        stream = enc2.push(PT) + enc2.finish()
        dec2 = aes.AesDec(key, IV, cipher, per_buffer_padding=False)
        plain = dec2.push(stream) + dec2.finish()
        assert plain == PT


def test_per_buffer_padding_roundtrip():
    rng = np.random.default_rng(0)
    bufs = [rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            for n in (5, 16, 33, 0, 100)]
    enc = aes.AesEnc(K128, IV, serialize_iv=True)
    dec = aes.AesDec(K128, cipher="aes-128-cbc", serialize_iv=True)
    for b in bufs:
        ct = enc.push(b)
        assert len(ct) % 16 == 0 or ct[:16] == bytes.fromhex(IV)
        assert dec.push(ct) == b


def test_stream_mode_chunked():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    enc = aes.AesEnc(K256, IV, "aes-256-cbc", per_buffer_padding=False)
    ct = b"".join(enc.push(data[i:i + 37]) for i in range(0, 1000, 37))
    ct += enc.finish()
    assert len(ct) % 16 == 0 and len(ct) > 1000
    dec = aes.AesDec(K256, IV, "aes-256-cbc", per_buffer_padding=False)
    pt = b"".join(dec.push(ct[i:i + 160]) for i in range(0, len(ct), 160))
    pt += dec.finish()
    assert pt == data


def test_bad_padding_rejected():
    dec = aes.AesDec(K128, IV)
    enc = aes.AesEnc(K128, IV)
    ct = bytearray(enc.push(b"hello"))
    ct[-1] ^= 0xFF           # corrupt the final block -> garbage padding
    with pytest.raises(ValueError):
        # overwhelmingly likely to produce an illegal pad value; if the
        # garbage happens to be "valid" padding the content check below
        # still fails
        out = dec.push(bytes(ct))
        assert out != b"hello"
        raise ValueError("pad accepted but content corrupt (expected)")


def test_key_iv_validation():
    with pytest.raises(ValueError):
        aes.AesEnc("abcd", IV)
    with pytest.raises(ValueError):
        aes.AesEnc(K128, "00ff")
