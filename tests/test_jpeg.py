"""Pins for the stdlib+numpy baseline JPEG codec (operators/jpeg.py):
spec-table integrity, a hand-assembled known-answer bitstream, exact
round trips on the fixed-point fixture shape, bounded error on real
lossy paths, restart markers, color, and the refusal gates."""

import struct

import numpy as np
import pytest

from dmds_spark.operators.jpeg import (
    AC_LUMA,
    DC_LUMA,
    STD_QUANT_LUMA,
    ZIGZAG,
    _canonical_codes,
    encode_jpeg,
    jpeg_encode,
    jpeg_header,
    jpeg_pixels,
)

# T.81 Figure A.6, transcribed INDEPENDENTLY of the generator in the
# module (which builds it from the diagonal walk) — a typo in either
# shows up here
_ZZ_REF = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def test_zigzag_matches_spec_transcription():
    assert ZIGZAG == _ZZ_REF


def test_canonical_code_construction():
    """Annex C: codes are consecutive within a length, prefix-free
    across lengths; counts match BITS."""
    codes = _canonical_codes(*AC_LUMA)
    assert len(codes) == sum(AC_LUMA[0]) == 162
    by_len: dict = {}
    for _sym, (code, ln) in codes.items():
        by_len.setdefault(ln, []).append(code)
    for ln, cs in by_len.items():
        cs = sorted(cs)
        assert cs == list(range(cs[0], cs[0] + len(cs)))  # consecutive
        assert cs[-1] < (1 << ln)
    # spot-check the two symbols the known-answer test hand-derives
    assert _canonical_codes(*DC_LUMA)[5] == (0b110, 3)
    assert codes[0x00] == (0b1010, 4)  # EOB


def test_hand_assembled_known_answer_block():
    """An 8x8 constant-130 grayscale block under q=1 entropy-codes to
    EXACTLY two bytes, derived by hand from the spec: DC = 8*(130-128)
    = 16 -> category 5 (DC code 110) + extra bits 10000, then EOB
    (1010), padded with 1s = 0xD0 0xAF. Pins the encoder bit-exactly
    and the decoder against a bitstream neither produced."""
    img = np.full((8, 8), 130, dtype=np.uint8)
    raw = jpeg_encode(img)
    sos_end = raw.index(b"\xff\xda") + 2
    (sos_len,) = struct.unpack_from(">H", raw, sos_end)
    entropy = raw[sos_end + sos_len : -2]  # up to EOI
    assert entropy == b"\xd0\xaf"
    assert np.array_equal(jpeg_pixels(raw)[..., 0], img)


@pytest.mark.parametrize("w,h,seed", [(16, 16, 0), (40, 24, 3),
                                      (32, 40, 77)])
def test_block_constant_fixture_is_codec_fixed_point(w, h, seed):
    """The oracle's exactness claim, pinned directly: block-constant
    rasters under the all-ones table round-trip bit-exactly."""
    px = jpeg_pixels(encode_jpeg(w, h, seed))
    assert px.shape == (h, w, 1)
    wb, hb = w // 8, h // 8
    vals = (seed * 31 + np.arange(hb * wb, dtype=np.int64) * 7) % 256
    want = np.repeat(np.repeat(vals.reshape(hb, wb), 8, 0), 8, 1)
    assert np.array_equal(px[..., 0], want)


def test_general_gray_q1_roundtrip_within_rounding():
    """q=1 keeps every DCT coefficient to the nearest integer: the
    reconstruction error of ANY image is bounded by the rounding alone
    (measured <= 1 across the random fixture)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    got = jpeg_pixels(jpeg_encode(img))[..., 0].astype(int)
    assert np.abs(got - img.astype(int)).max() <= 1


def test_std_quant_lossy_smooth_image():
    """The REAL Annex-K luminance table: a smooth gradient (energy in
    the low frequencies) survives with small error; the full pipeline
    (multi-category DC diffs, AC runs, ZRL) is exercised."""
    x = np.arange(48)[None, :] + np.arange(32)[:, None] * 2
    img = (x % 256).astype(np.uint8)
    got = jpeg_pixels(jpeg_encode(img, quant=STD_QUANT_LUMA))
    err = np.abs(got[..., 0].astype(int) - img.astype(int))
    assert err.max() <= 40  # wrap edge blocks are high-frequency
    assert np.median(err) <= 8


def test_restart_markers_roundtrip_and_equivalence():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    plain = jpeg_pixels(jpeg_encode(img))
    restarted_raw = jpeg_encode(img, restart_interval=3)
    assert b"\xff\xdd" in restarted_raw  # DRI present
    assert any(
        bytes([0xFF, 0xD0 + i]) in restarted_raw for i in range(8)
    )
    assert np.array_equal(jpeg_pixels(restarted_raw), plain)


def test_color_444_and_420():
    rng = np.random.default_rng(13)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    got = jpeg_pixels(jpeg_encode(rgb))
    assert got.shape == (16, 16, 3)
    # q=1 4:4:4 error is the YCbCr round trip alone
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 3
    # 4:2:0 with 16x16-constant tiles: chroma box-mean is lossless
    tiles = np.zeros((32, 32, 3), np.uint8)
    for i in range(2):
        for j in range(2):
            v = 40 + 70 * (2 * i + j)
            tiles[i * 16 : (i + 1) * 16, j * 16 : (j + 1) * 16] = (
                v, 255 - v, v // 2
            )
    got420 = jpeg_pixels(jpeg_encode(tiles, subsample="420"))
    assert np.abs(got420.astype(int) - tiles.astype(int)).max() <= 3
    assert jpeg_header(jpeg_encode(tiles, subsample="420")) == (32, 32, 3)


def test_progressive_and_malformed_refused():
    raw = bytearray(encode_jpeg(16, 16, 1))
    sof = raw.index(b"\xff\xc0")
    raw[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        jpeg_pixels(bytes(raw))
    with pytest.raises(ValueError, match="progressive"):
        jpeg_header(bytes(raw))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_pixels(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((10, 10), np.uint8))  # not multiple of 8


def test_decode_image_integration():
    """multimodal.decode_image routes baseline JPEG through the stdlib
    header parser — no Pillow gate for this family anymore."""
    from dmds_spark.operators.multimodal import decode_image

    meta = decode_image(encode_jpeg(40, 24, 5))
    assert meta == {"width": 40, "height": 24, "channels": 1}


def test_resize_jpeg_without_pillow(spark):
    """resize_images resamples baseline JPEG through the stdlib
    decoder (nearest-neighbor, PPM re-encode) — no Pillow gate for
    this family anymore."""
    import pandas as pd

    from dmds_spark.operators.multimodal import (
        ppm_pixels,
        resize_images,
    )

    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2],
             "content": [encode_jpeg(40, 24, 1), encode_jpeg(16, 16, 9)]}
        )
    )
    out = {r["media_id"]: r
           for r in resize_images(media, 8, 8).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert (r["width"], r["height"], r["channels"]) == (8, 8, 3)
        px = ppm_pixels(bytes(r["content"]))
        assert px.shape == (8, 8, 3)
    # nearest-neighbor of a block-constant image picks block values:
    # gray replicates across RGB
    px1 = ppm_pixels(bytes(out[1]["content"]))
    assert (px1[..., 0] == px1[..., 1]).all()


def test_truncated_and_corrupt_bytes_raise_valueerror():
    """The typed-error contract (round-15 review): truncation at ANY
    byte raises ValueError, never IndexError/struct.error — an untyped
    error would kill a whole Spark task instead of routing to the
    Pillow gate or a clean per-row error."""
    raw = encode_jpeg(16, 16, 1)
    for cut in (4, 20, len(raw) // 2):
        with pytest.raises(ValueError):
            jpeg_pixels(raw[:cut])
    # dropping only the EOI tail byte leaves the entropy data intact:
    # decode still succeeds (and must equal the full decode)
    assert np.array_equal(jpeg_pixels(raw[:-1]), jpeg_pixels(raw))
    with pytest.raises(ValueError):
        jpeg_header(raw[:4])
    # a zero-length APP segment cannot loop forever either
    with pytest.raises(ValueError):
        jpeg_header(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


def test_fill_bytes_before_markers_tolerated():
    """B.1.1.2: any number of 0xFF fill bytes may pad before a marker;
    both parsers must skip them instead of misreading the length."""
    raw = encode_jpeg(16, 16, 2)
    sof = raw.index(b"\xff\xc0")
    padded = raw[:sof] + b"\xff\xff\xff" + raw[sof:]
    assert jpeg_header(padded) == (16, 16, 1)
    assert np.array_equal(jpeg_pixels(padded), jpeg_pixels(raw))


def test_noninterleaved_multiscan_refused_typed():
    """A spec-legal baseline JPEG whose SOS lists fewer components
    than the SOF must refuse with ValueError (Pillow-gate routable),
    not die with KeyError mid-MCU."""
    rgb = np.zeros((16, 16, 3), np.uint8)
    raw = bytearray(jpeg_encode(rgb))
    sos = raw.index(b"\xff\xda")
    # rewrite the SOS to a single-component scan: ns=1, comp 1, tables
    # 0/0, spectral 0..63
    new_sos = (b"\xff\xda" + b"\x00\x08" + bytes([1, 1, 0x00])
               + b"\x00\x3f\x00")
    old_len = int.from_bytes(raw[sos + 2 : sos + 4], "big")
    raw = bytes(raw[:sos]) + new_sos + bytes(raw[sos + 2 + old_len:])
    with pytest.raises(ValueError, match="multi-scan"):
        jpeg_pixels(raw)


def test_decode_cost_scales_linearly_not_quadratically():
    """The round-15 review's accumulator fix, pinned structurally: the
    bit reader's accumulator stays byte-sized however long the stream
    (before the fix it grew with the WHOLE entropy stream and shifts
    went quadratic — minutes for one megapixel image)."""
    from dmds_spark.operators.jpeg import _BitReader

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    raw = jpeg_encode(img)
    sos_end = raw.index(b"\xff\xda") + 2
    (sos_len,) = struct.unpack_from(">H", raw, sos_end)
    br = _BitReader(raw, sos_end + sos_len)
    for _ in range(5000):
        br.bit()
    assert br.acc < (1 << 8)  # bounded, not stream-sized
