"""Pure-stdlib WAV (RIFF/PCM) codec — the AUDIO twin of functions/png.py:
makes the multimodal operators' decode seams REAL for audio payloads in a
container with no media libraries.  Format per the public RIFF/WAVE spec
[public knowledge: Microsoft/IBM WAVE format, 1991]: little-endian RIFF
chunks, an ``fmt `` chunk (PCM format tag 1, channels, sample rate, bits)
and a ``data`` chunk of interleaved PCM frames.  Only integer PCM (8/16
bit) is supported — anything else raises, never guesses.

Seam adapters at the bottom match the operator contracts
(operators/multimodal.py):

  * ``wav_metadata_decoder`` -> (width, height, n_frames) as
    (sample_rate, n_channels, n_sample_frames) — the metadata triple is
    deliberately modality-generic, so audio maps rate/channels onto it
    (documented here rather than widening every schema).
  * ``wav_frame_decoder``   -> fixed 1024-sample windows as the "frame"
    sequence (what a spectrogram or VAD stage would consume).
  * ``wav_sample_decoder``  -> 1-D uint8 array for the feature stats:
    the TOP byte of each sample, sign-shifted to unsigned — the seam's
    contract is uint8, so 16-bit audio quantizes to its most significant
    byte (loudness structure survives; this feeds distribution stats,
    not playback).
"""

from __future__ import annotations

import struct

import numpy as np

FRAME_WINDOW = 1024  # samples per frame for the frame-sequence seam


def _chunks(data: bytes):
    """Yield (tag, payload) for each RIFF sub-chunk, validating the
    RIFF/WAVE header."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8:pos + 8 + size]
        if len(payload) < size:
            raise ValueError(f"truncated {tag!r} chunk")
        yield tag, payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def wav_info(data: bytes) -> tuple[int, int, int, int]:
    """(n_channels, sample_rate, bits_per_sample, n_sample_frames) from
    the fmt/data chunks; integer PCM only."""
    fmt = pcm = None
    for tag, payload in _chunks(data):
        if tag == b"fmt ":
            fmt = payload
        elif tag == b"data":
            pcm = payload
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    tag_, ch, rate, _brate, block, bits = struct.unpack_from("<HHIIHH", fmt)
    if tag_ != 1:
        raise ValueError(f"only integer PCM supported (format tag {tag_})")
    if bits not in (8, 16) or ch < 1 or block != ch * bits // 8:
        raise ValueError(f"unsupported PCM layout: {ch}ch {bits}bit "
                         f"block {block}")
    return ch, rate, bits, len(pcm) // block


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(samples, sample_rate): samples shaped (n_frames, n_channels),
    int16 (8-bit audio is widened: WAV 8-bit is unsigned, centered at
    128)."""
    ch, rate, bits, n = wav_info(data)
    pcm = next(p for t, p in _chunks(data) if t == b"data")
    if bits == 16:
        arr = np.frombuffer(pcm[:n * ch * 2], dtype="<i2").astype(np.int16)
    else:
        arr = ((np.frombuffer(pcm[:n * ch], dtype=np.uint8)
                .astype(np.int16) - 128) << 8)
    return arr.reshape(n, ch), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """16-bit PCM encoder (tests + fixture generation): ``samples`` is
    (n_frames, n_channels) int16 (1-D means mono)."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    pcm = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --- operator seam adapters (operators/multimodal.py contracts) ----------

def wav_metadata_decoder(data: bytes) -> tuple[int, int, int]:
    """decode_metadata seam: (sample_rate, n_channels, n_sample_frames)
    in the generic (width, height, n_frames) slots — header math only,
    no PCM decode."""
    ch, rate, _bits, n = wav_info(data)
    return rate, ch, n


def wav_frame_decoder(data: bytes) -> list[bytes]:
    """sample_frames seam: consecutive FRAME_WINDOW-sample windows of the
    channel-interleaved PCM as the frame sequence (last window ragged)."""
    samples, _rate = decode_wav(data)
    flat = samples.reshape(-1)
    # a valid zero-sample WAV has zero frames, not one empty frame —
    # n_frames metadata (0) must equal len(frames) for consumers that
    # cross-check (ADVICE r9)
    return [flat[i:i + FRAME_WINDOW * samples.shape[1]].tobytes()
            for i in range(0, flat.size,
                           FRAME_WINDOW * max(samples.shape[1], 1))]


def wav_sample_decoder(data: bytes) -> np.ndarray:
    """extract_features seam (uint8 contract): top byte of each 16-bit
    sample, sign-shifted — amplitude distribution stats over real decoded
    audio."""
    samples, _rate = decode_wav(data)
    return ((samples.reshape(-1).astype(np.int32) >> 8) + 128) \
        .astype(np.uint8)
