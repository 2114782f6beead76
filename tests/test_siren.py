"""Siren7 codec (io/siren.py, elements/audio/siren.py) — transform
perfect-reconstruction, bitstream round trip, concealment, elements."""

import hashlib

import numpy as np
import pytest

from gstbad_tpu.io import siren


def _sine(n_frames, freq=440.0, amp=8000):
    t = np.arange(320 * n_frames)
    return (amp * np.sin(2 * np.pi * freq * t / 16000)
            ).astype(np.int16).reshape(n_frames, 320)


def test_rmlt_dct4_perfect_reconstruction(rng):
    """The RMLT/DCT-IV analysis-synthesis pair is a modulated lapped
    transform: without quantization it reconstructs the signal exactly
    (one 320-sample frame delay), so the transform transcription is
    self-checking to float32 precision."""
    x = (rng.standard_normal(320 * 10) * 1000).astype(np.float32)
    old_e = np.zeros(160, np.float32)
    old_d = np.zeros(160, np.float32)
    ys = []
    for f in x.reshape(10, 320):
        coefs, old_e = siren.rmlt_encode(f, old_e, 320)
        y, old_d = siren.rmlt_decode(coefs, old_d, 320)
        ys.append(y)
    y = np.concatenate(ys)
    a, b = y[320:2320].astype(np.float64), x[:2000].astype(np.float64)
    snr = 10 * np.log10((b ** 2).mean() / ((a - b) ** 2).mean())
    assert snr > 100


def test_roundtrip_sine_snr():
    enc = siren.SirenEncoder(16000)
    dec = siren.SirenDecoder(16000)
    sig = _sine(20)
    outs = []
    for f in sig:
        frame = enc.encode_frame(f)
        assert len(frame) == 40  # 16 kbit/s at 50 frames/s
        outs.append(dec.decode_frame(frame))
    out = np.concatenate(outs).astype(np.float64)
    ref = np.concatenate(sig).astype(np.float64)
    a = out[960:4960]
    b = ref[640:4640]  # one frame transform delay
    snr = 10 * np.log10((b ** 2).mean() / ((a - b) ** 2).mean())
    assert snr > 18, snr


def test_checksum_error_concealment():
    """A corrupted frame must fail the 4-bit checksum and replay the
    previous frame's coefficients (decoder.c:207-216)."""
    enc = siren.SirenEncoder(16000)
    dec = siren.SirenDecoder(16000)
    sig = _sine(4)
    frames = [enc.encode_frame(f) for f in sig]
    dec.decode_frame(frames[0])
    dec.decode_frame(frames[1])
    backup_before = dec.backup_frame.copy()
    bad = bytearray(frames[2])
    bad[10] ^= 0xFF  # flip payload bits; checksum now mismatches
    out = dec.decode_frame(bytes(bad))
    # the backup frame is consumed (zeroed) by the concealment path
    assert np.all(dec.backup_frame == 0)
    assert np.abs(out.astype(int)).max() <= 32767
    assert backup_before.any()


def test_garbage_frames_never_crash(rng):
    dec = siren.SirenDecoder(16000)
    for _ in range(8):
        raw = bytes(rng.integers(0, 256, 40, dtype=np.int64
                                 ).astype(np.uint8))
        # force the 2-bit rate code so the frame is "valid" enough to parse
        raw = bytes([(0x40 | (raw[0] & 0x3F))]) + raw[1:]
        out = dec.decode_frame(raw)
        assert out.shape == (320,)


def test_bitstream_regression_digest():
    """Encoded bytes for a fixed input are a stable regression surface."""
    enc = siren.SirenEncoder(16000)
    sig = _sine(5, freq=773.0, amp=11111)
    blob = b"".join(enc.encode_frame(f) for f in sig)
    digest = hashlib.sha256(blob).hexdigest()[:16]
    assert len(blob) == 200
    # stability check: re-encoding the same input from a fresh encoder
    enc2 = siren.SirenEncoder(16000)
    blob2 = b"".join(enc2.encode_frame(f) for f in sig)
    assert hashlib.sha256(blob2).hexdigest()[:16] == digest


def test_elements_roundtrip():
    from gstbad_tpu.core.registry import make

    sig = _sine(6)
    enc = make("sirenenc")
    enc.set_info(None)
    enc.push_samples(sig.reshape(-1))
    encoded = enc.pull_window(6)
    assert encoded.data.shape == (6, 40)

    dec = make("sirendec")
    dec.set_info(None)
    dec.push_bytes(np.asarray(encoded.data).tobytes())
    pcm = dec.pull_window(6)
    assert pcm.data.shape == (6, 320, 1)
    out = np.asarray(pcm.data).reshape(-1).astype(np.float64)
    ref = sig.reshape(-1).astype(np.float64)
    a, b = out[640:1600], ref[320:1280]
    snr = 10 * np.log10((b ** 2).mean() / ((a - b) ** 2).mean())
    assert snr > 15


def test_codec_info_matches_reference_constants():
    """GetSirenCodecInfo flag=1 @16 kHz (common.c:236-259)."""
    info = siren.codec_info(16000)
    assert info["bits_per_frame"] == 320
    assert info["number_of_regions"] == 14
    assert info["esf_adjustment"] == -2
    assert info["sample_rate_code"] == 1
    assert info["checksum_bits"] == 4
