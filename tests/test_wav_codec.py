"""Pure-stdlib WAV codec (functions/wav.py) and its multimodal operator
seams — the audio twin of test_png_codec.py."""

from __future__ import annotations

import numpy as np
import pytest

from dbt_demo_spark.functions import wav


def _tone(n=3000, rate=8000, ch=1):
    t = np.arange(n)
    x = (10_000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    return np.stack([x + 100 * c for c in range(ch)], axis=1)


def test_roundtrip_mono_and_stereo():
    for ch in (1, 2):
        s = _tone(ch=ch)
        data = wav.encode_wav(s, 8000)
        got, rate = wav.decode_wav(data)
        assert rate == 8000
        assert got.shape == s.shape
        assert (got == s).all()
        assert wav.wav_info(data) == (ch, 8000, 16, 3000)


def test_zero_sample_wav_has_zero_frames():
    """ADVICE r9: a valid zero-sample WAV decodes to [] frames, so the
    n_frames metadata (0) and len(frames) cross-check agree."""
    data = wav.encode_wav(np.zeros((0, 1), dtype=np.int16), 8000)
    assert wav.wav_metadata_decoder(data)[2] == 0
    assert wav.wav_frame_decoder(data) == []


def test_eight_bit_widens_and_malformed_raises():
    import struct

    # hand-build an 8-bit mono wav: values 0..255 -> centered int16
    pcm = bytes(range(256))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    got, _ = wav.decode_wav(data)
    assert got[0, 0] == -128 * 256 and got[255, 0] == 127 * 256

    with pytest.raises(ValueError, match="RIFF"):
        wav.wav_info(b"nonsense")
    # float PCM (format tag 3) refused, never guessed
    ffmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    fbody = (b"WAVE" + b"fmt " + struct.pack("<I", len(ffmt)) + ffmt
             + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="PCM"):
        wav.wav_info(b"RIFF" + struct.pack("<I", len(fbody)) + fbody)


def test_wav_seams_through_multimodal_operators(spark):
    """decode_metadata / sample_frames / extract_features run with the
    REAL audio codec plugged into the documented seams."""
    from dbt_demo_spark.operators import multimodal as mm

    payloads = spark.createDataFrame(
        [(1, "audio", bytearray(wav.encode_wav(_tone(2500), 8000))),
         (2, "audio", bytearray(wav.encode_wav(_tone(400, ch=2), 8000)))],
        "item_id long, modality string, payload binary")

    meta = {r.item_id: (r.width, r.height, r.n_frames)
            for r in mm.decode_metadata(
                payloads, decoder=wav.wav_metadata_decoder).collect()}
    assert meta == {1: (8000, 1, 2500), 2: (8000, 2, 400)}

    frames = mm.sample_frames(payloads, n_frames=2,
                              decoder=wav.wav_frame_decoder).collect()
    by_item = {}
    for r in frames:
        by_item.setdefault(r.item_id, []).append(r)
    # item 1: 2500 mono samples -> 3 source windows of 1024; offsets 0, 1
    offs = sorted(r.frame_offset for r in by_item[1])
    assert offs == [0, 1]
    # the sampled frame bytes are REAL decoded windows
    s1, _ = wav.decode_wav(bytes(payloads.collect()[0].payload))
    first = next(r for r in by_item[1] if r.frame_offset == 0)
    assert bytes(first.frame) == s1.reshape(-1)[:1024].tobytes()

    feats = {(r.item_id, r.feature): r.value
             for r in mm.extract_features(
                 payloads, decoder=wav.wav_sample_decoder).collect()}
    # a sine's top-byte distribution: mean near the 128 center, std well
    # above a silent signal's
    assert abs(feats[(1, "mean")] - 128) < 3
    assert feats[(1, "std")] > 10
    ref = wav.wav_sample_decoder(bytes(payloads.collect()[0].payload))
    assert feats[(1, "mean")] == pytest.approx(float(ref.mean()))
