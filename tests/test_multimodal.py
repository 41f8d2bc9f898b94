"""Multimodal plumbing tests: real Arrow/mapInPandas execution over
binary columns with the codec stubbed (SURVEY.md §2b multimodal row).
"""

import pytest
from pyspark.sql import functions as F

from dmds_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    decode_images,
    extract_byte_histograms,
    media_table_from_documents,
    metadata_only_scan,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path_factory.mktemp("media")) + "/media.parquet"
    media_table_from_documents(docs).write.mode("overwrite").parquet(d)
    return spark.read.parquet(d)


def test_media_schema_and_determinism(spark, media):
    assert media.count() == 500
    r = media.filter(F.col("media_id") == 7).collect()[0]
    assert r["kind"] == "image"
    assert bytes(r["content"])[:4] == b"DMDS"
    assert r["meta"]["channels"] == 3
    # deterministic: regenerating yields identical bytes
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    again = media_table_from_documents(docs).filter(F.col("media_id") == 7).collect()[0]
    assert bytes(again["content"]) == bytes(r["content"])


def test_decode_stub_raises_without_fake():
    # fake=False forces a real codec; without Pillow that must raise
    from dmds_spark.operators.multimodal import _pil

    if _pil() is not None:
        pytest.skip("Pillow installed: real codec path active")
    with pytest.raises(NotImplementedError):
        decode_image(b"DMDS" + b"\x00" * 12, fake=False)


def test_decode_auto_sniffs_fake_bytes():
    # auto mode: DMDS magic routes to the deterministic parser even
    # when Pillow is absent
    from dmds_spark.operators.multimodal import encode_fake_media

    got = decode_image(encode_fake_media(20, 10, 3, seed=1))
    assert got == {"width": 20, "height": 10, "channels": 3}


def test_decode_real_image_roundtrip():
    # PNG (round 14) and baseline JPEG (round 15) decode with or
    # without Pillow — both codecs are stdlib+numpy now
    from dmds_spark.operators.jpeg import encode_jpeg
    from dmds_spark.operators.multimodal import _pil, encode_png

    got = decode_image(encode_png(33, 21, 9))
    assert got == {"width": 33, "height": 21, "channels": 3}
    got = decode_image(encode_jpeg(40, 24, 9))
    assert got == {"width": 40, "height": 24, "channels": 1}
    Image = _pil()
    if Image is None:
        # malformed JPEG bytes are CORRUPT (ValueError), not an
        # environment gate — mis-decoding is never an option. (With
        # Pillow installed the corrupt blob falls through to
        # Image.open, whose error type is Pillow's business.)
        with pytest.raises(ValueError):
            decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
        return
    import io

    buf = io.BytesIO()
    Image.new("RGB", (33, 21)).save(buf, "JPEG")
    got = decode_image(buf.getvalue())
    assert got == {"width": 33, "height": 21, "channels": 3}


def test_decode_images_matches_metadata(media):
    decoded = decode_images(media, fake=True)
    joined = decoded.join(media, "media_id").filter(
        (F.col("width") != F.col("meta.width"))
        | (F.col("height") != F.col("meta.height"))
    )
    assert joined.count() == 0
    assert decoded.count() == 500


def test_byte_histograms(media):
    feats = extract_byte_histograms(media, bins=16)
    rows = feats.filter(F.col("media_id").isin(1, 2, 3)).collect()
    for r in rows:
        h = r["histogram"]
        assert len(h) == 16
        assert abs(sum(h) - 1.0) < 1e-9  # L1-normalized


def test_sample_frames(media):
    frames = sample_frames(media, frame_bytes=256, stride=2)
    # every sampled frame is full-size and frame_no is even
    bad = frames.filter(
        (F.length("frame") != 256) | (F.col("frame_no") % 2 != 0)
    )
    assert bad.count() == 0
    assert frames.count() > 0


def test_metadata_scan_prunes_binary(media):
    q = metadata_only_scan(media).filter(F.col("n_bytes") > 1000)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the content column must not be read at all
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "content" not in read_schema[0]


def test_resize_images(spark, media):
    from dmds_spark.operators.multimodal import decode_images, resize_images

    media = media.limit(20)
    resized = resize_images(media, 32, 24)
    got = decode_images(resized).collect()
    assert len(got) == 20
    assert all(r["width"] == 32 and r["height"] == 24 for r in got)
    # deterministic: same input -> same bytes
    a = {r["media_id"]: bytes(r["content"]) for r in resized.collect()}
    b = {r["media_id"]: bytes(r["content"]) for r in resize_images(media, 32, 24).collect()}
    assert a == b


# --------------------------------------------------------------------------
# Real-codec branch over UNCOMPRESSED containers (PPM/BMP): pure-numpy,
# runs EVERYWHERE — no Pillow, no skips (round-12 un-gating of the
# image path). Compressed formats remain the only Pillow route, and
# the without-Pillow error for them is itself pinned below.


def test_decode_image_real_codec():
    from dmds_spark.operators.multimodal import (
        bmp_pixels,
        decode_image,
        encode_bmp,
        encode_ppm,
        ppm_pixels,
    )

    d = decode_image(encode_ppm(40, 30, 3), fake=False)
    assert d == {"width": 40, "height": 30, "channels": 3}
    # auto-sniff: non-DMDS magic routes to the real container parsers
    d2 = decode_image(encode_bmp(8, 8, 1), fake=None)
    assert d2 == {"width": 8, "height": 8, "channels": 3}
    # the two containers carry the SAME arithmetic raster
    import numpy as np

    assert np.array_equal(
        ppm_pixels(encode_ppm(21, 13, 5)), bmp_pixels(encode_bmp(21, 13, 5))
    )


def test_decode_images_real_codec_distributed(spark):
    from dmds_spark.operators.multimodal import (
        decode_images,
        encode_bmp,
        encode_ppm,
    )

    rows = [
        (
            i,
            "image",
            encode_ppm(16 + i, 12 + i, i) if i % 2 == 0
            else encode_bmp(16 + i, 12 + i, i),
            None,
        )
        for i in range(6)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_images(media, fake=False).collect()}
    assert len(got) == 6
    assert all(got[i]["width"] == 16 + i and got[i]["height"] == 12 + i for i in range(6))


def test_resize_images_real_codec(spark):
    """Numpy nearest-neighbor resample of real containers, distributed;
    exact pixel truth checked against driver-side indexing."""
    import numpy as np

    from dmds_spark.operators.multimodal import (
        decode_images,
        encode_bmp,
        encode_ppm,
        ppm_pixels,
        resize_images,
    )

    rows = [
        (
            i,
            "image",
            encode_ppm(64, 48, i) if i % 2 == 0 else encode_bmp(64, 48, i),
            None,
        )
        for i in range(4)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    resized = resize_images(media, 20, 10, fake=False)
    out = decode_images(resized, fake=False).collect()
    assert len(out) == 4
    assert all(r["width"] == 20 and r["height"] == 10 for r in out)
    # exact pixels: nearest-neighbor == integer index map on the source
    src = ppm_pixels(encode_ppm(64, 48, 0))
    ys, xs = (np.arange(10) * 48) // 10, (np.arange(20) * 64) // 20
    want = src[ys][:, xs]
    got_bytes = {
        r["media_id"]: bytes(r["content"]) for r in resized.collect()
    }
    assert np.array_equal(ppm_pixels(got_bytes[0]), want)


def test_compressed_without_pil_raises():
    """The remaining environment gate (progressive/non-baseline JPEG —
    PNG and baseline JPEG decode stdlib-side since rounds 14/15): a
    VALID progressive stream without Pillow surfaces the decoder's
    clear refusal, never a mis-decode."""
    from dmds_spark.operators.jpeg import encode_jpeg
    from dmds_spark.operators.multimodal import _pil, decode_image

    if _pil() is not None:
        pytest.skip("Pillow installed: compressed path active")
    raw = bytearray(encode_jpeg(16, 16, 1))
    raw[raw.index(b"\xff\xc0") + 1] = 0xC2  # SOF0 -> SOF2
    with pytest.raises(ValueError, match="progressive"):
        decode_image(bytes(raw), fake=False)


# --------------------------------------------------------------------------
# Compressed-codec (Pillow) branch: EXTRA coverage on Pillow-equipped
# deployments (skipped where it isn't installed). Nothing below is any
# operator's only test — the image path itself is pinned above with
# pure-numpy containers — but the Image.open/resize/save branch must
# stay validated somewhere a real cluster runs it (the r2 verdict ask).


def _jpeg_bytes(width, height, color=(7, 11, 13)):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (width, height), color).save(buf, "JPEG")
    return buf.getvalue()


def test_decode_image_compressed_codec():
    pytest.importorskip("PIL")
    from dmds_spark.operators.multimodal import decode_image

    d = decode_image(_jpeg_bytes(40, 30), fake=False)
    assert d == {"width": 40, "height": 30, "channels": 3}
    # auto-sniff: a compressed magic routes past the container parsers
    d2 = decode_image(_jpeg_bytes(8, 8), fake=None)
    assert d2["width"] == 8 and d2["height"] == 8


def test_decode_images_compressed_codec_distributed(spark):
    pytest.importorskip("PIL")
    from dmds_spark.operators.multimodal import decode_images

    rows = [(i, "image", _jpeg_bytes(16 + i, 12 + i), None) for i in range(6)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_images(media, fake=False).collect()}
    assert len(got) == 6
    assert all(got[i]["width"] == 16 + i and got[i]["height"] == 12 + i for i in range(6))


def test_resize_images_compressed_codec(spark):
    pytest.importorskip("PIL")
    from dmds_spark.operators.multimodal import decode_images, resize_images

    rows = [(i, "image", _jpeg_bytes(64, 48), None) for i in range(4)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = decode_images(resize_images(media, 20, 10, fake=False), fake=False).collect()
    assert len(out) == 4
    assert all(r["width"] == 20 and r["height"] == 10 for r in out)


def test_png_decoder_reads_pillow_written_png():
    """Cross-writer validation (Pillow boxes only): a PNG produced by
    an INDEPENDENT encoder must decode to the exact pixels through the
    stdlib codec — the round-trip tests above share our own writer."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from dmds_spark.operators.multimodal import png_pixels

    rng = np.random.default_rng(42)
    want = rng.integers(0, 256, size=(13, 29, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(want, "RGB").save(buf, "PNG")
    assert np.array_equal(png_pixels(buf.getvalue()), want)


# --------------------------------------------------------------------------
# Audio framing: real PCM math (no external libs), hand-computed truth.


def test_audio_frame_features_hand_computed(spark):
    import struct

    from dmds_spark.operators.multimodal import (
        AUDIO_FRAME_SCHEMA,
        audio_frame_features,
    )

    # 16-byte header + PCM16LE: [100, -100, 200, -200, 0, 300]
    samples = [100, -100, 200, -200, 0, 300]
    content = b"\x00" * 16 + struct.pack("<6h", *samples)
    media = spark.createDataFrame(
        [(1, bytearray(content))], "media_id long, content binary"
    )
    # frame_len = 4 samples, hop = 2  (sample_rate=4000, 1ms units)
    got = audio_frame_features(
        media, sample_rate=4000, frame_ms=1, hop_ms=1
    ).collect()
    # frame_len = hop = 4 -> frames [0:4]; 6-4+1=3 starts 0..2 step 4 -> [0]
    assert len(got) == 1
    r = got[0]
    assert r["n_samples"] == 4
    assert r["energy"] == 100**2 + 100**2 + 200**2 + 200**2
    # signs: +,-,+,- -> 3 crossings
    assert r["zero_crossings"] == 3

    got2 = {
        (r["frame_no"]): r
        for r in audio_frame_features(
            media, sample_rate=2000, frame_ms=1, hop_ms=1
        ).collect()
    }
    # frame_len = hop = 2: frames [100,-100],[200,-200],[0,300]
    assert len(got2) == 3
    assert got2[0]["energy"] == 20000 and got2[0]["zero_crossings"] == 1
    assert got2[1]["energy"] == 80000 and got2[1]["zero_crossings"] == 1
    # zeros are skipped for ZCR (sign run [0, +] has no +/- flip)
    assert got2[2]["energy"] == 90000 and got2[2]["zero_crossings"] == 0


def test_audio_frame_features_short_and_empty(spark):
    import struct

    from dmds_spark.operators.multimodal import audio_frame_features

    short = b"\x00" * 16 + struct.pack("<2h", 5, -5)
    empty = b"\x00" * 16
    media = spark.createDataFrame(
        [(1, bytearray(short)), (2, bytearray(empty))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in audio_frame_features(media).collect()}
    assert rows[1]["n_samples"] == 2  # truncated single frame
    assert rows[1]["energy"] == 50
    assert 2 not in rows  # empty payload emits nothing


def test_audio_frame_features_matches_scalar_reference(spark):
    """Differential pin for the vectorized framing: the whole-matrix
    sliding_window_view + forward-filled-sign reduction must equal the
    obvious per-frame scalar loop (the pre-round-5 implementation) on
    zero-heavy random PCM — zeros skipped, flips between consecutive
    nonzero samples only. Pure numpy, no Spark round trip needed beyond
    one representative clip at the end."""
    import struct

    import numpy as np

    from dmds_spark.operators.multimodal import audio_frame_features

    frame_len, hop_len = 8, 3

    def scalar(pcm):
        out = []
        n = len(pcm)
        starts = (
            range(0, n - frame_len + 1, hop_len)
            if n >= frame_len
            else ([0] if n else [])
        )
        for start in starts:
            fr = pcm[start : start + frame_len]
            signs = np.sign(fr)
            zc = int(np.sum(np.abs(np.diff(signs[signs != 0])) == 2))
            out.append((len(fr), int(np.sum(fr * fr)), zc))
        return out

    rng = np.random.default_rng(42)
    clips = []
    for n in (0, 1, 5, 7, 8, 9, 40, 237):
        pcm = rng.integers(-32768, 32768, size=n).astype(np.int64)
        if n:
            pcm[rng.random(n) < 0.4] = 0  # stress the skip-zeros path
        clips.append(pcm)

    media = spark.createDataFrame(
        [
            (i, bytearray(b"\x00" * 16 + struct.pack(f"<{len(p)}h", *p)))
            for i, p in enumerate(clips)
        ],
        "media_id long, content binary",
    )
    # sample_rate=1000, frame_ms=8, hop_ms=3 -> frame_len=8, hop_len=3
    got = {
        (r["media_id"], r["frame_no"]): (
            r["n_samples"], r["energy"], r["zero_crossings"]
        )
        for r in audio_frame_features(
            media, sample_rate=1000, frame_ms=8, hop_ms=3
        ).collect()
    }
    want = {
        (i, fn): feat
        for i, p in enumerate(clips)
        for fn, feat in enumerate(scalar(p))
    }
    assert got == want


def test_audio_resample_matches_numpy_reference(spark, media):
    """Downsample-by-2 == floored pairwise mean of the PCM stream,
    per clip, checked sample-for-sample against a numpy reference."""
    import numpy as np

    from dmds_spark.operators.multimodal import audio_resample

    sample = media.limit(5).collect()
    got = {
        r["media_id"]: (r["n_in"], r["n_out"], bytes(r["content"]))
        for r in audio_resample(
            spark.createDataFrame(sample, schema=media.schema), factor=2
        ).collect()
    }
    assert len(got) == 5
    for row in sample:
        payload = bytes(row["content"])[16:]
        usable = len(payload) - (len(payload) % 2)
        pcm = np.frombuffer(payload[:usable], dtype="<i2").astype(np.int64)
        n_out = len(pcm) // 2
        want = pcm[: n_out * 2].reshape(n_out, 2).sum(axis=1) // 2
        n_in_got, n_out_got, content = got[row["media_id"]]
        assert (n_in_got, n_out_got) == (len(pcm), n_out)
        res = np.frombuffer(content, dtype="<i2").astype(np.int64)
        assert np.array_equal(res, want)


def test_audio_resample_filter_semantics(spark):
    """Constant signals round-trip exactly; a Nyquist-rate alternating
    signal averages to (near) zero — the box prefilter is doing its
    anti-aliasing job. Floor division ties to -inf (floored mean)."""
    import numpy as np

    from dmds_spark.operators.multimodal import audio_resample

    def clip(mid, samples):
        pcm = np.asarray(samples, dtype="<i2").tobytes()
        return (mid, b"\x00" * 16 + pcm)

    df = spark.createDataFrame(
        [
            clip(1, [100] * 8),              # constant
            clip(2, [1000, -1000] * 4),      # alternating at Nyquist
            clip(3, [3, 4, -3, -4]),         # floored means: 3, -4
        ],
        ["media_id", "content"],
    )
    got = {
        r["media_id"]: np.frombuffer(bytes(r["content"]), dtype="<i2").tolist()
        for r in audio_resample(df, factor=2).collect()
    }
    assert got[1] == [100, 100, 100, 100]
    assert got[2] == [0, 0, 0, 0]
    assert got[3] == [3, -4]  # (3+4)//2 = 3; (-3 + -4)//2 = -4 (floor)


def test_audio_filterbank_dc_and_nyquist_bands(spark):
    """DSP invariants: a constant (DC) clip concentrates its energy in
    band 0; a +A/-A alternation (Nyquist rate) in the top band; and
    every energy is finite and non-negative."""
    import struct

    import numpy as np

    from dmds_spark.operators.multimodal import audio_filterbank_energies

    import math

    n = 64
    dc = [1000] * n
    # high tone at bin 12 of 17 (frame 32): inside the TOP triangular
    # band — exactly-Nyquist energy sits at the last bin, where every
    # triangle is zero by construction, so it would read as silence
    nyq = [round(1000 * math.cos(2 * math.pi * 12 * i / 32))
           for i in range(n)]
    def pack(samples):
        return bytearray(b"\x00" * 16 + struct.pack(f"<{len(samples)}h", *samples))

    media = spark.createDataFrame(
        [(1, pack(dc)), (2, pack(nyq))], "media_id long, content binary"
    )
    # frame_len = hop = 32 samples (sample_rate=32000, 1ms)
    out = audio_filterbank_energies(
        media, sample_rate=32_000, frame_ms=1, hop_ms=1, n_bands=4
    ).collect()
    assert out and all(np.isfinite(r["energy"]) and r["energy"] >= -1e-9
                       for r in out)
    by = {}
    for r in out:
        by.setdefault((r["media_id"], r["frame_no"]), {})[r["band"]] = (
            r["energy"]
        )
    for (mid, _), bands in by.items():
        assert set(bands) == {0, 1, 2, 3}
        top = max(bands, key=bands.get)
        assert top == (0 if mid == 1 else 3), (mid, bands)


def test_audio_filterbank_matches_numpy_reference(spark):
    """The distributed result must equal a straight numpy computation
    of the same frames/filterbank (same geometry, same payload)."""
    import struct

    import numpy as np

    from dmds_spark.operators.multimodal import (
        _triangular_filterbank,
        audio_filterbank_energies,
    )

    rng = np.random.default_rng(7)
    samples = rng.integers(-3000, 3000, size=200, dtype=np.int64)
    content = bytearray(
        b"\x00" * 16 + struct.pack(f"<{len(samples)}h", *samples)
    )
    media = spark.createDataFrame(
        [(9, content)], "media_id long, content binary"
    )
    frame_len, hop, nb = 64, 64, 6  # sample_rate=64000, 1ms frame+hop
    got = audio_filterbank_energies(
        media, sample_rate=64_000, frame_ms=1, hop_ms=1, n_bands=nb
    ).collect()
    fr = np.lib.stride_tricks.sliding_window_view(
        samples.astype(np.float64), frame_len
    )[::hop]
    spec = np.abs(np.fft.rfft(fr, axis=1)) ** 2
    want = spec @ _triangular_filterbank(frame_len // 2 + 1, nb).T
    assert len(got) == want.size
    for r in got:
        assert r["energy"] == pytest.approx(
            want[r["frame_no"], r["band"]], rel=1e-12
        )


def _media_from_payloads(spark, payloads):
    from dmds_spark.operators.multimodal import MEDIA_MAGIC

    rows = [
        (i, "image", MEDIA_MAGIC + b"\x00" * 12 + p,
         {"width": 0, "height": 0, "channels": 0, "n_bytes": len(p) + 16})
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_phash_identical_and_noised_payloads(spark):
    """Identical payloads share the hash exactly; a few flipped bytes
    flip few bits; an unrelated payload sits near hamming 32."""
    import random

    from dmds_spark.operators.multimodal import perceptual_hashes

    rnd = random.Random(11)
    base = bytes(rnd.randrange(256) for _ in range(2048))
    noised = bytearray(base)
    for pos in rnd.sample(range(2048), 8):
        noised[pos] ^= 0xFF
    other = bytes(rnd.randrange(256) for _ in range(2048))
    df = _media_from_payloads(spark, [base, base, bytes(noised), other])
    h = {r["media_id"]: r["phash"] for r in perceptual_hashes(df).collect()}
    assert h[0] == h[1]
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(h[0], h[2]) <= 6          # 8 flipped bytes of 2048
    assert 16 <= ham(h[0], h[3]) <= 48   # unrelated ~ 32 +- noise


def test_phash_deterministic_across_partitionings(spark):
    from dmds_spark.operators.multimodal import (
        media_table_from_documents,
        perceptual_hashes,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    media = media_table_from_documents(docs)
    one = {
        r["media_id"]: r["phash"]
        for r in perceptual_hashes(media.coalesce(1)).collect()
    }
    many = {
        r["media_id"]: r["phash"]
        for r in perceptual_hashes(media.repartition(13)).collect()
    }
    assert one == many and len(one) == 500


def test_phash_candidate_pairs_recall_below_band_bound(spark):
    """Pigeonhole recall: every pair with hamming < bands(=4) MUST be
    a candidate (shares an untouched 16-bit band). Construct pairs at
    hamming 1..3 by flipping bits inside one band."""
    from dmds_spark.operators.multimodal import (
        perceptual_hashes,
        phash_candidate_pairs,
    )
    import random

    rnd = random.Random(5)
    base = bytes(rnd.randrange(256) for _ in range(4096))
    variants = [base]
    for flips in (1, 2, 3):
        nb = bytearray(base)
        for pos in range(flips):  # flip bytes inside the SAME cell run
            nb[pos * 64] ^= 0x80
        variants.append(bytes(nb))
    df = _media_from_payloads(spark, variants)
    hashes = perceptual_hashes(df)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_candidate_pairs(hashes).collect()
    }
    h = {r["media_id"]: r["phash"] for r in hashes.collect()}
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    for a in range(4):
        for b in range(a + 1, 4):
            if ham(h[a], h[b]) < 4:
                assert (a, b) in got, (a, b, ham(h[a], h[b]))
    # emitted distances are the exact bit_count(xor)
    for (a, b), d in got.items():
        assert d == ham(h[a], h[b])


def test_audio_vad_segments_hand_computed(spark):
    """A clip with two loud bursts separated by silence must yield
    exactly two segments, and the island bookkeeping must match a
    hand count."""
    import numpy as np

    from dmds_spark.operators.multimodal import MEDIA_MAGIC
    from dmds_spark.queries import all_queries  # noqa: F401  (registry import)
    from dmds_spark.operators.multimodal import audio_frame_features

    sr, frame_ms, hop_ms = 16_000, 25, 10
    hop = sr * hop_ms // 1000
    flen = sr * frame_ms // 1000
    # 100 hops of samples: bursts at hops [10,20) and [50,55)
    n = hop * 100 + flen
    pcm = np.zeros(n, dtype=np.int16)
    pcm[10 * hop:20 * hop] = 8000
    pcm[50 * hop:55 * hop] = 8000
    content = MEDIA_MAGIC + b"\x00" * 12 + pcm.astype("<i2").tobytes()
    media = spark.createDataFrame(
        [(1, "audio", content,
          {"width": 0, "height": 0, "channels": 1, "n_bytes": len(content)})],
        MEDIA_SCHEMA,
    )
    frames = audio_frame_features(media)
    from pyspark.sql import Window as W

    totals = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("nf"), F.sum("energy").alias("te")
    )
    act = (
        frames.join(totals, "media_id")
        .filter(F.col("energy") * F.col("nf") > F.col("te"))
        .withColumn(
            "grp",
            F.col("frame_no")
            - F.row_number().over(
                W.partitionBy("media_id").orderBy("frame_no")
            ),
        )
    )
    segs = act.groupBy("media_id", "grp").agg(
        F.count(F.lit(1)).alias("seg_len")
    ).collect()
    assert len(segs) == 2
    lens = sorted(r["seg_len"] for r in segs)
    # burst one spans ~10 hops (+ frame bleed), burst two ~5
    assert lens[0] in range(4, 9) and lens[1] in range(9, 14)


def test_phash_banding_recall_property(spark):
    """Property sweep: for random payloads with random small
    perturbations, EVERY pair at hamming < 4 must appear in the banded
    candidates (pigeonhole over 4x16-bit bands), across several
    corpora — not just the constructed in-band flips."""
    import random

    from dmds_spark.operators.multimodal import (
        perceptual_hashes,
        phash_candidate_pairs,
    )

    for trial in range(3):
        rnd = random.Random(100 + trial)
        payloads = []
        for _ in range(6):
            base = bytes(rnd.randrange(256) for _ in range(1024))
            payloads.append(base)
            for _ in range(2):  # noised variants of each base
                nb = bytearray(base)
                for pos in rnd.sample(range(1024), rnd.randrange(1, 6)):
                    nb[pos] ^= rnd.randrange(1, 256)
                payloads.append(bytes(nb))
        df = _media_from_payloads(spark, payloads)
        hashes = perceptual_hashes(df)
        h = {r["media_id"]: r["phash"] for r in hashes.collect()}
        cands = {
            (r["id_a"], r["id_b"])
            for r in phash_candidate_pairs(hashes).collect()
        }
        ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
        n = len(payloads)
        close = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if ham(h[a], h[b]) < 4
        ]
        assert close, trial  # the regime must actually produce close pairs
        for pair in close:
            assert pair in cands, (trial, pair, ham(h[pair[0]], h[pair[1]]))


def test_phash_bits_contract(spark):
    """Non-64 widths either hash correctly (multiples of 8 up to 64,
    hash in the LOW ``bits`` bits so the band slicing still applies)
    or raise cleanly — never silently truncate to a wrong hash."""
    import random

    import numpy as np
    import pytest as _pytest

    from dmds_spark.operators.multimodal import perceptual_hashes

    rnd = random.Random(23)
    payload = bytes(rnd.randrange(256) for _ in range(512))
    df = _media_from_payloads(spark, [payload])

    for bad in (12, 0, 72, 128, -8):
        with _pytest.raises(ValueError, match="bits"):
            perceptual_hashes(df, bits=bad)

    for bits in (8, 16, 32, 64):
        got = perceptual_hashes(df, bits=bits).collect()[0]["phash"]
        arr = np.frombuffer(payload, dtype=np.uint8)
        arr = arr[: len(arr) // bits * bits]
        cells = arr.reshape(bits, -1).mean(axis=1)
        want_bits = (cells > arr.mean()).astype(int)
        want = 0
        for b in want_bits:
            want = (want << 1) | int(b)
        if bits == 64 and want >= 2**63:
            want -= 2**64  # signed int64 view
        assert got == want, bits
        if bits < 64:
            assert 0 <= got < (1 << bits)


# --------------------------------------------------------------------------
# PNG (round 14): the first COMPRESSED codec with NO environment gate —
# stdlib zlib + numpy filters. Round trips pin every filter type; the
# distributed query multimodal_png_decode_stats oracles the raster sum.
# --------------------------------------------------------------------------


def test_png_roundtrip_every_filter_type():
    import numpy as np

    from dmds_spark.operators.multimodal import encode_png, png_pixels

    for w, h, seed in [(16, 16, 3), (33, 7, 11), (1, 1, 0), (5, 23, 255)]:
        px = png_pixels(encode_png(w, h, seed))  # rows cycle filters 0-4
        want = (
            (seed * 31 + np.arange(w * h * 3, dtype=np.int64) * 7) % 256
        ).astype(np.uint8).reshape(h, w, 3)
        assert (px == want).all(), (w, h, seed)


def test_png_filters_agree_with_unfiltered_encoding():
    """The same raster encoded with cycling filters and with all-None
    filters must decode identically — the unfilter math, isolated from
    the payload."""
    from dmds_spark.operators.multimodal import encode_png, png_pixels

    a = png_pixels(encode_png(20, 9, 5, cycle_filters=True))
    b = png_pixels(encode_png(20, 9, 5, cycle_filters=False))
    assert (a == b).all()


def test_png_header_and_decode_image():
    from dmds_spark.operators.multimodal import decode_image, encode_png

    raw = encode_png(40, 12, 7)
    assert decode_image(raw) == {"width": 40, "height": 12, "channels": 3}
    assert decode_image(raw, fake=False) == {
        "width": 40, "height": 12, "channels": 3,
    }


def test_png_unsupported_shapes_raise():
    import struct as _s
    import zlib as _z

    from dmds_spark.operators.multimodal import _PNG_MAGIC, png_pixels

    def chunk(ctype, data):
        return (
            _s.pack(">I", len(data)) + ctype + data
            + _s.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def ihdr(depth, color, interlace):
        return chunk(
            b"IHDR", _s.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        )

    for depth, color, interlace, msg in [
        (16, 2, 0, "unsupported PNG"),     # 16-bit
        (8, 3, 0, "unsupported PNG"),      # palette
        (8, 2, 1, "interlaced"),           # Adam7
    ]:
        raw = _PNG_MAGIC + ihdr(depth, color, interlace) + chunk(b"IEND", b"")
        with pytest.raises(ValueError, match=msg):
            png_pixels(raw)
    with pytest.raises(ValueError, match="not a PNG"):
        png_pixels(b"JUNK" * 4)


def test_png_resize_and_raster_stats_distributed(spark):
    """PNG media flows through resize (decode -> nearest -> PPM
    re-encode, no Pillow) and raster_stats end to end."""
    import numpy as np

    from dmds_spark.operators.multimodal import (
        encode_png,
        ppm_pixels,
        png_media_table_from_documents,
        raster_stats,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(1, 100), (2, 333), (3, 77)], "doc_id long, n_chars long"
    )
    media = png_media_table_from_documents(docs)
    stats = {r["media_id"]: r for r in raster_stats(media).collect()}
    for d, n_chars in [(1, 100), (2, 333), (3, 77)]:
        w, h = 16 + n_chars % 48, 16 + (n_chars // 7) % 48
        want = int(
            ((d * 31 + np.arange(w * h * 3, dtype=np.int64) * 7) % 256).sum()
        )
        r = stats[d]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["raster_sum"] == want
    out = {r["media_id"]: r for r in
           resize_images(media, 8, 8).collect()}
    for d in (1, 2, 3):
        px = ppm_pixels(bytes(out[d]["content"]))
        assert px.shape == (8, 8, 3)
