"""A real image codec for the multimodal seam, in pure stdlib (zlib +
struct): PNG decode/encode for 8-bit grayscale / gray+alpha / RGB / RGBA,
non-interlaced — the container ships no PIL/pyav, and the X25 decoder
seams (operators/multimodal.py ``decoder=``) deserved proof with an
actual byte format rather than stubs (VERDICT r6 item 6).

The PNG format is public (RFC 2083 / ISO 15948): signature, length-tagged
chunks (IHDR/IDAT/IEND), zlib-compressed scanlines, each prefixed by one
of five filter bytes (None/Sub/Up/Average/Paeth).  This module implements
exactly the slice a feature-extraction pipeline needs — dimensions +
pixels — plus a filter-0 encoder so tests can round-trip without any
external fixture.  A production deployment swaps these callables for
PIL/pyav wrappers; the operators don't change (that is the point of the
seam).

Scale posture: the decoders run INSIDE mapInPandas Arrow batches on the
workers (closure-shipped like any pandas function), so throughput scales
with cores exactly like the stub path; per-image Python cost is the codec
itself, which a native library would lower without touching the plumbing.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def _chunks(data: bytes):
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    off = 8
    while off + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[off:off + 4]), \
            data[off + 4:off + 8]
        payload = data[off + 8:off + 8 + length]
        yield tag, payload
        off += 12 + length  # length + tag + payload + crc
        if tag == b"IEND":
            return


def png_info(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR."""
    for tag, payload in _chunks(data):
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            return w, h, depth, ctype
    raise ValueError("no IHDR chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes):
    """Decode to an (height, width, channels) uint8 ndarray.  Supports
    bit depth 8, color types 0/2/4/6, no interlace — the subset a
    training-data feature extractor meets after upstream normalization."""
    import numpy as np

    w, h, depth, ctype = png_info(data)
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if ctype not in CHANNELS:
        raise ValueError(f"unsupported color type {ctype}")
    for tag, payload in _chunks(data):
        if tag == b"IHDR" and payload[12] != 0:
            raise ValueError("interlaced PNG not supported")
    c = CHANNELS[ctype]
    raw = zlib.decompress(b"".join(
        p for t, p in _chunks(data) if t == b"IDAT"))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).astype(np.int32)
        if ftype == 0:                        # None
            cur = line
        elif ftype == 2:                      # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):              # Sub / Average / Paeth
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = int(prev[i])
                if ftype == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (line[i] + (a + b) // 2) & 0xFF
                else:
                    cc = int(prev[i - c]) if i >= c else 0
                    cur[i] = (line[i] + _paeth(a, b, cc)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype} in row {y}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, c)


def encode_png(arr) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array as a minimal PNG
    (filter 0 rows, one IDAT) — the test-fixture generator; any compliant
    decoder reads its output."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# --- seam adapters: drop-in decoder= callables for operators/multimodal ---

def png_metadata_decoder(data: bytes) -> tuple[int, int, int]:
    """decode_metadata seam: (width, height, n_frames=1) — dimensions read
    from IHDR only, no pixel work (the cheap metadata pass)."""
    w, h, _, _ = png_info(data)
    return w, h, 1


def png_pixel_decoder(data: bytes):
    """extract_features seam: the decoded pixels as a flat uint8 array —
    feature statistics become PIXEL statistics (mean brightness etc.)."""
    return decode_png(data).ravel()


def png_row_decoder(data: bytes) -> list[bytes]:
    """sample_frames seam: scanlines as the 'frame' sequence — for a
    single image the rows stand in for a video's frames, exercising the
    real fan-out path with real decoded bytes."""
    img = decode_png(data)
    return [img[y].tobytes() for y in range(img.shape[0])]
