"""Multimodal column plumbing (north star, SURVEY.md §2b):
image/audio/video as opaque ``binary`` columns with typed metadata,
processed through Arrow-batched ``mapInPandas`` stages.

Image decode/resize is REAL with no environment dependency for P6 PPM
and BI_RGB BMP (numpy), for 8-bit non-interlaced PNG (round 14:
stdlib zlib inflate + numpy row unfilters) AND — since round 15 — for
baseline sequential JPEG (operators/jpeg.py: marker parse, canonical
Huffman, zigzag/dequant, numpy DCT pair, restart markers; encoders
included, so tests and oracles synthesize real containers with
arithmetic rasters). Only progressive/arithmetic/12-bit JPEG, the
exotic PNG shapes (palette/16-bit/Adam7) and the audio/video demuxers
depend on libraries absent from this container — those routes go
through the optional Pillow import and raise ``NotImplementedError``
without it, while ``fake=True`` selects the deterministic DMDS header
parser. Everything around the codecs is
real and tested: schemas, Arrow batch shapes, partition behavior, UDF
signatures, frame explosion, and feature extraction (byte histograms
are real math on the real bytes).

Scale notes: media bytes never hit the driver; each stage is
``mapInPandas`` over Arrow record batches, so a 100 TB media table
streams through executors batch-by-batch. Metadata-only queries
(width/height/duration filters) read ONLY the metadata columns —
binary columns are pruned out of the parquet scan entirely.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dmds_spark.operators.parallel import ensure_parallelism

# our deterministic fake media header: magic(4) | width(4) | height(4)
# | channels(4) | payload...
MEDIA_MAGIC = b"DMDS"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def encode_fake_media(width: int, height: int, channels: int, seed: int) -> bytes:
    """Deterministic fake media bytes (header + pseudo-random payload)."""
    header = MEDIA_MAGIC + struct.pack(">III", width, height, channels)
    n = width * height * channels
    payload = bytes((seed * 31 + i * 7) % 256 for i in range(min(n, 4096)))
    return header + payload


def _pil():
    """Pillow is an OPTIONAL dependency: present on a real cluster,
    absent in this container. Import-gated so everything degrades to
    the deterministic fake codec (or a clear error) without it."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


# --------------------------------------------------------------------------
# Pure-numpy codecs for UNCOMPRESSED real image containers (PPM P6,
# 24-bit BI_RGB BMP): the image path works everywhere without Pillow —
# only COMPRESSED formats (PNG/JPEG) still route through the optional
# PIL dependency. Encoders exist so tests and queries can synthesize
# real-container payloads with arithmetic pixel content (the
# multimodal_byte_histogram oracle trick applied to a real format).


def _ppm_header(raw: bytes) -> tuple[int, int, int]:
    """Parse a P6 header -> (width, height, pixel offset). Handles the
    canonical whitespace forms and ``#`` comment lines; maxval must be
    255 (8-bit, the only depth we emit)."""
    if raw[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # exactly ONE whitespace byte separates maxval from data
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return width, height, pos


def encode_ppm(width: int, height: int, seed: int) -> bytes:
    """A real P6 PPM whose raster byte j is ``(seed*31 + j*7) % 256`` —
    the same arithmetic payload as the DMDS fake media, in a container
    any image tool opens. Unlike the fake header the raster is FULL
    (w*h*3 bytes): real containers carry every pixel."""
    import numpy as np

    n = width * height * 3
    raster = (
        (seed * 31 + np.arange(n, dtype=np.int64) * 7) % 256
    ).astype(np.uint8)
    return f"P6\n{width} {height}\n255\n".encode() + raster.tobytes()


def ppm_pixels(raw: bytes) -> "object":
    """Full numpy decode of a P6 PPM -> (height, width, 3) uint8."""
    import numpy as np

    width, height, off = _ppm_header(raw)
    n = width * height * 3
    return (
        np.frombuffer(raw, dtype=np.uint8, count=n, offset=off)
        .reshape(height, width, 3)
        .copy()
    )


def encode_ppm_pixels(pixels: "object") -> bytes:
    h, w, _c = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def _bmp_header(raw: bytes) -> tuple[int, int, int, int]:
    """Parse a BMP file+info header -> (width, height, channels,
    pixel offset). Only uncompressed (BI_RGB) 24/32-bit is supported —
    exactly what a pipeline's raw-dump stage writes."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", raw, 10)
    width, height = struct.unpack_from("<ii", raw, 18)
    (bpp,) = struct.unpack_from("<H", raw, 28)
    (compression,) = struct.unpack_from("<I", raw, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (compression={compression}, bpp={bpp}): "
            "only uncompressed 24/32-bit BI_RGB decodes without Pillow"
        )
    return width, height, bpp // 8, offset


def encode_bmp(width: int, height: int, seed: int) -> bytes:
    """A real 24-bit BI_RGB BMP (bottom-up rows, 4-byte row padding)
    whose pixel (y, x, c) — in RGB order, top-down coordinates — is
    ``(seed*31 + (y*width*3 + x*3 + c)*7) % 256``: the same arithmetic
    raster as :func:`encode_ppm`, so PPM and BMP round-trips can be
    pinned equal pixel for pixel."""
    import numpy as np

    n = width * height * 3
    rgb = (
        ((seed * 31 + np.arange(n, dtype=np.int64) * 7) % 256)
        .astype(np.uint8)
        .reshape(height, width, 3)
    )
    bgr = rgb[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    rows = np.zeros((height, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(height, row_bytes)
    pixel_data = rows.tobytes()
    offset = 14 + 40
    file_header = b"BM" + struct.pack(
        "<IHHI", offset + len(pixel_data), 0, 0, offset
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data),
        2835, 2835, 0, 0,
    )
    return file_header + info_header + pixel_data


def bmp_pixels(raw: bytes) -> "object":
    """Full numpy decode of an uncompressed BMP -> (height, width, c)
    uint8 in RGB(A), top-down coordinates."""
    import numpy as np

    width, height, channels, offset = _bmp_header(raw)
    top_down = height < 0
    height = abs(height)
    row_bytes = width * channels
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(
        raw, dtype=np.uint8, count=stride * height, offset=offset
    ).reshape(height, stride)[:, :row_bytes]
    img = rows.reshape(height, width, channels)
    if not top_down:
        img = img[::-1]
    return img[:, :, [2, 1, 0] + ([3] if channels == 4 else [])].copy()


# PNG — the first COMPRESSED codec with no environment gate: the
# stream is zlib (stdlib) and the five per-row filters are numpy, so
# PNG decodes everywhere Pillow does not exist. 8-bit gray/RGB/
# gray+alpha/RGBA, non-interlaced (palette, 16-bit, and Adam7 raise —
# they are re-encode concerns, not pipeline-dump formats). The encoder
# can cycle all five filter types so round-trip tests exercise every
# unfilter path. Decode cost: None/Sub/Up rows vectorize; Average and
# Paeth rows are left-dependent so they walk pixels in Python — fine
# for the synthesized fixtures here, and a production cluster with
# Pillow installed takes the PIL branch anyway (documented trade, not
# a hidden one).

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(raw: bytes):
    """Yield (type, data) for each chunk; CRCs are not verified (the
    zlib stream self-checks via adler32; header fields are validated
    semantically)."""
    if raw[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    while pos + 8 <= len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        ctype = raw[pos + 4 : pos + 8]
        yield ctype, raw[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IEND":
            return


def _png_header(raw: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from IHDR; raises on the unsupported
    shapes (palette, 16-bit, interlaced) rather than mis-decoding."""
    for ctype, data in _png_chunks(raw):
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}): "
                    "only 8-bit gray/RGB/GA/RGBA decode here"
                )
            if interlace:
                raise ValueError("Adam7-interlaced PNG unsupported")
            return w, h, _PNG_CHANNELS[color]
    raise ValueError("PNG missing IHDR")


def _paeth(left, up, ul):
    """The Paeth predictor over numpy int arrays (PNG spec §9.4)."""
    import numpy as np

    p = left + up - ul
    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
    return np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
    )


def png_pixels(raw: bytes) -> "object":
    """Full stdlib+numpy PNG decode -> (height, width, channels)
    uint8: concatenated IDAT zlib-inflates to h scanlines of
    (filter_type, stride bytes); each row unfilters against the
    reconstructed previous row."""
    import zlib

    import numpy as np

    w, h, c = _png_header(raw)
    dec = zlib.decompress(
        b"".join(d for t, d in _png_chunks(raw) if t == b"IDAT")
    )
    stride = w * c
    if len(dec) != h * (stride + 1):
        raise ValueError("PNG raster length mismatch")
    arr = np.frombuffer(dec, dtype=np.uint8).reshape(h, stride + 1)
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = int(arr[y, 0])
        row = arr[y, 1:].astype(np.int64)
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub: per-channel-phase cumulative sum
            cur = row.reshape(w, c).cumsum(axis=0).reshape(stride) % 256
        elif ft == 2:  # Up
            cur = (row + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: left-dependent walk.
            # Plain Python ints, not per-pixel numpy slices: the walk
            # is inherently sequential (each byte needs the
            # reconstructed left neighbor) and small-int arithmetic is
            # ~9x faster than allocating c-wide numpy views per pixel
            # (measured 4.8 ms -> 0.55 ms per 40x40 image).
            rl, pl = row.tolist(), prev.tolist()
            out = [0] * stride
            if ft == 3:
                for x in range(stride):
                    left = out[x - c] if x >= c else 0
                    out[x] = (rl[x] + ((left + pl[x]) >> 1)) & 255
            else:
                for x in range(stride):
                    left = out[x - c] if x >= c else 0
                    ul = pl[x - c] if x >= c else 0
                    up = pl[x]
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left if (pa <= pb and pa <= pc)
                        else (up if pb <= pc else ul)
                    )
                    out[x] = (rl[x] + pred) & 255
            cur = np.array(out, dtype=np.int64)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        recon[y] = cur.astype(np.uint8)
        prev = cur
    return recon.reshape(h, w, c).copy()


def encode_png(
    width: int, height: int, seed: int, cycle_filters: bool = True
) -> bytes:
    """A real 8-bit RGB PNG whose raster byte j is
    ``(seed*31 + j*7) % 256`` — the arithmetic payload of
    :func:`encode_ppm` in a COMPRESSED container. With
    ``cycle_filters`` row y filters with type y % 5, so a single
    image exercises every unfilter path; forward filtering uses only
    raw neighbor bytes (predictors reference reconstructed values,
    which equal the raw raster), so it vectorizes per row."""
    import zlib

    import numpy as np

    c = 3
    stride = width * c
    raster = (
        (seed * 31 + np.arange(height * stride, dtype=np.int64) * 7) % 256
    ).reshape(height, stride)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    zc = np.zeros(c, dtype=np.int64)
    for y in range(height):
        row = raster[y]
        ft = (y % 5) if cycle_filters else 0
        left = np.concatenate([zc, row[:-c]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = (row - left) % 256
        elif ft == 2:
            filt = (row - prev) % 256
        elif ft == 3:
            filt = (row - (left + prev) // 2) % 256
        else:
            ul = np.concatenate([zc, prev[:-c]])
            filt = (row - _paeth(left, prev, ul)) % 256
        lines.append(ft)
        lines.extend(filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def decode_image(content: bytes, fake: bool | None = None) -> dict:
    """Decode one image's header.

    ``fake=True`` forces the deterministic DMDS header parser;
    ``fake=False`` forces a real container parse; ``fake=None`` (auto)
    sniffs the magic. Real containers: P6 PPM, uncompressed BMP, 8-bit
    non-interlaced PNG, and baseline-sequential JPEG all parse with
    stdlib+numpy alone (no environment dependency); only the remaining
    compressed shapes (progressive/non-baseline JPEG, palette/16-bit/
    Adam7 PNG, other formats) go through Pillow when installed and
    raise NotImplementedError when not."""
    content = bytes(content)
    is_fake_bytes = content[:4] == MEDIA_MAGIC
    if fake is True or (fake is None and is_fake_bytes):
        if not is_fake_bytes:
            raise ValueError("bad magic")
        width, height, channels = struct.unpack(">III", content[4:16])
        return {"width": width, "height": height, "channels": channels}
    if content[:2] == b"P6":
        width, height, _off = _ppm_header(content)
        return {"width": width, "height": height, "channels": 3}
    if content[:2] == b"BM":
        width, height, channels, _off = _bmp_header(content)
        return {"width": width, "height": abs(height), "channels": channels}
    if content[:8] == _PNG_MAGIC:
        try:
            width, height, channels = _png_header(content)
            return {"width": width, "height": height,
                    "channels": channels}
        except ValueError:
            if _pil() is None:
                raise
            # unsupported PNG shape (palette / 16-bit / Adam7): fall
            # through to Pillow where installed — the stdlib codec
            # NARROWS the environment gate, it must never widen it
    if content[:2] == b"\xff\xd8":
        from dmds_spark.operators.jpeg import jpeg_header

        try:
            width, height, channels = jpeg_header(content)
            return {"width": width, "height": height,
                    "channels": channels}
        except ValueError:
            if _pil() is None:
                raise
            # progressive / non-baseline JPEG: Pillow where installed
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "decoding compressed formats beyond PNG and baseline JPEG "
            "requires Pillow, which is not installed; PPM/BMP/PNG/"
            "baseline-JPEG decode without it, and fake=True selects "
            "the deterministic header parser"
        )
    import io

    with Image.open(io.BytesIO(content)) as im:
        return {
            "width": im.width,
            "height": im.height,
            "channels": len(im.getbands()),
        }


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    one fake image per doc, sized from its text stats. Runs fully
    distributed (mapInPandas) — the binary is generated executor-side."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"media_id": [], "kind": [], "content": [], "meta": []}
                )
                continue
            doc_ids = pdf["doc_id"].astype("int64").to_numpy()
            n_chars = pdf["n_chars"].astype("int64").to_numpy()
            width = 16 + n_chars % 48
            height = 16 + (n_chars // 7) % 48
            # payload byte matrix for the whole batch at once:
            # byte[i, j] = (seed_i * 31 + j * 7) % 256, truncated per
            # row to min(w*h*3, 4096) — identical bytes to
            # encode_fake_media, built with two whole-matrix ops
            # instead of a Python loop per byte
            plen = np.minimum(width * height * 3, 4096)
            maxlen = int(plen.max())
            j7 = (np.arange(maxlen, dtype=np.int64) * 7)[None, :]
            mat = ((doc_ids[:, None] * 31 + j7) % 256).astype(np.uint8)
            headers = [
                MEDIA_MAGIC + struct.pack(">III", int(w), int(h), 3)
                for w, h in zip(width, height)
            ]
            contents = [
                h + mat[i, : plen[i]].tobytes()
                for i, h in enumerate(headers)
            ]
            yield pd.DataFrame(
                {
                    "media_id": doc_ids,
                    "kind": ["image"] * n,
                    "content": contents,
                    "meta": [
                        {
                            "width": int(w),
                            "height": int(h),
                            "channels": 3,
                            "n_bytes": int(pl) + 16,
                        }
                        for w, h, pl in zip(width, height, plen)
                    ],
                }
            )

    return ensure_parallelism(docs.select("doc_id", "n_chars")).mapInPandas(
        gen, MEDIA_SCHEMA
    )


def ppm_media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Like :func:`media_table_from_documents` but the content is a
    REAL image container (P6 PPM) with the same arithmetic geometry
    (w = 16 + n_chars%48, h = 16 + (n_chars//7)%48) and raster byte
    j = (doc_id*31 + j*7) % 256 — so the real-codec decode path is
    exercisable AND oracle-able everywhere (no imaging library, no
    truncation: real containers carry the full w*h*3 raster)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"media_id": [], "kind": [], "content": [], "meta": []}
                )
                continue
            doc_ids = pdf["doc_id"].astype("int64")
            n_chars = pdf["n_chars"].astype("int64")
            width = (16 + n_chars % 48).to_numpy()
            height = (16 + (n_chars // 7) % 48).to_numpy()
            contents = [
                encode_ppm(int(w), int(h), int(d))
                for w, h, d in zip(width, height, doc_ids)
            ]
            yield pd.DataFrame(
                {
                    "media_id": doc_ids.to_numpy(),
                    "kind": ["image"] * n,
                    "content": contents,
                    "meta": [
                        {
                            "width": int(w),
                            "height": int(h),
                            "channels": 3,
                            "n_bytes": len(c),
                        }
                        for w, h, c in zip(width, height, contents)
                    ],
                }
            )

    return ensure_parallelism(docs.select("doc_id", "n_chars")).mapInPandas(
        gen, MEDIA_SCHEMA
    )


def png_media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Like :func:`ppm_media_table_from_documents` but the container is
    a COMPRESSED one — a real PNG per document, same arithmetic
    geometry (w = 16 + n_chars%48, h = 16 + (n_chars//7)%48) and
    raster byte j = (doc_id*31 + j*7) % 256, rows filter-cycled so
    every unfilter path runs in the distributed query. Round 14's
    un-gating of the first compressed codec: encode AND decode are
    stdlib+numpy, so the whole zlib+filter round trip is oracle-able
    with no imaging library anywhere."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"media_id": [], "kind": [], "content": [], "meta": []}
                )
                continue
            doc_ids = pdf["doc_id"].astype("int64")
            n_chars = pdf["n_chars"].astype("int64")
            width = (16 + n_chars % 48).to_numpy()
            height = (16 + (n_chars // 7) % 48).to_numpy()
            contents = [
                encode_png(int(w), int(h), int(d))
                for w, h, d in zip(width, height, doc_ids)
            ]
            yield pd.DataFrame(
                {
                    "media_id": doc_ids.to_numpy(),
                    "kind": ["image"] * n,
                    "content": contents,
                    "meta": [
                        {
                            "width": int(w),
                            "height": int(h),
                            "channels": 3,
                            "n_bytes": len(c),
                        }
                        for w, h, c in zip(width, height, contents)
                    ],
                }
            )

    return ensure_parallelism(docs.select("doc_id", "n_chars")).mapInPandas(
        gen, MEDIA_SCHEMA
    )


def jpeg_media_table_from_documents(docs: DataFrame) -> DataFrame:
    """One real baseline JPEG per document: grayscale, 8x8-block-
    constant raster — block b (row-major) is ``(doc_id*31 + b*7) %
    256`` over a ``(16..40) x (16..40)`` geometry from n_chars, under
    the all-ones quantization table. Block-constant + q=1 makes the
    lossy codec a FIXED POINT (operators/jpeg.py module docstring), so
    the decoded raster sum has a closed form the DuckDB oracle can
    state — round 15's un-gating of the LAST compressed image codec
    family."""
    from dmds_spark.operators.jpeg import encode_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"media_id": [], "kind": [], "content": [], "meta": []}
                )
                continue
            doc_ids = pdf["doc_id"].astype("int64")
            n_chars = pdf["n_chars"].astype("int64")
            width = (8 * (2 + n_chars % 4)).to_numpy()
            height = (8 * (2 + (n_chars // 7) % 4)).to_numpy()
            contents = [
                encode_jpeg(int(w), int(h), int(d))
                for w, h, d in zip(width, height, doc_ids)
            ]
            yield pd.DataFrame(
                {
                    "media_id": doc_ids.to_numpy(),
                    "kind": ["image"] * n,
                    "content": contents,
                    "meta": [
                        {
                            "width": int(w),
                            "height": int(h),
                            "channels": 1,
                            "n_bytes": len(c),
                        }
                        for w, h, c in zip(width, height, contents)
                    ],
                }
            )

    return ensure_parallelism(docs.select("doc_id", "n_chars")).mapInPandas(
        gen, MEDIA_SCHEMA
    )


RASTER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("raster_sum", T.LongType()),
    ]
)


def raster_stats(media: DataFrame) -> DataFrame:
    """FULL pixel decode (PPM/BMP/PNG/baseline-JPEG — no environment
    gate) per image: geometry plus the exact i64 sum of every raster
    byte. The
    sum certifies the whole decompress+unfilter path end to end — a
    header parse cannot fake it. Same Arrow/mapInPandas shape as
    decode_images; bytes never leave the executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        empty = pd.DataFrame(
            {f.name: pd.Series(dtype="int64") for f in RASTER_STATS_SCHEMA}
        )
        for pdf in batches:
            if len(pdf) == 0:
                yield empty
                continue
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                if raw[:2] == b"P6":
                    px = ppm_pixels(raw)
                elif raw[:2] == b"BM":
                    px = bmp_pixels(raw)
                elif raw[:8] == _PNG_MAGIC:
                    px = png_pixels(raw)
                elif raw[:2] == b"\xff\xd8":
                    from dmds_spark.operators.jpeg import jpeg_pixels

                    px = jpeg_pixels(raw)
                else:
                    raise ValueError(
                        "raster_stats decodes PPM/BMP/PNG/JPEG containers"
                    )
                h, w, c = px.shape
                out.append(
                    {
                        "media_id": int(media_id),
                        "width": int(w),
                        "height": int(h),
                        "channels": int(c),
                        "raster_sum": int(
                            px.astype(np.int64).sum()
                        ),
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run, RASTER_STATS_SCHEMA
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("payload_bytes", T.LongType()),
    ]
)


def decode_images(media: DataFrame, fake: bool | None = None) -> DataFrame:
    """Decode stage: parse each image's header executor-side. Arrow
    streams binary batches into pandas; nothing touches the driver.
    ``fake`` as in decode_image: None = per-content auto (DMDS bytes
    via the deterministic parser, real images via Pillow if present).

    The DMDS header parse is VECTORIZED (same treatment the audio
    paths got): the fixed 16-byte headers of a batch stack into one
    (n, 16) uint8 matrix, magic check and the three big-endian uint32
    fields fold as numpy column ops — no per-row Python in the non-PIL
    path. Only rows that need a real codec (non-DMDS magic under
    fake=None, or fake=False) drop to the per-image Pillow branch,
    which is inherently per-image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        magic = np.frombuffer(MEDIA_MAGIC, dtype=np.uint8)
        empty = pd.DataFrame(
            {f.name: pd.Series(dtype="int64") for f in DECODED_SCHEMA}
        )
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield empty
                continue
            raws = [bytes(c) for c in pdf["content"]]
            lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=n)
            hdr = np.zeros((n, 16), dtype=np.uint8)
            ok16 = lens >= 16
            if ok16.any():
                hdr[ok16] = np.frombuffer(
                    b"".join(r[:16] for r, k in zip(raws, ok16) if k),
                    dtype=np.uint8,
                ).reshape(-1, 16)
            is_dmds = ok16 & (hdr[:, :4] == magic).all(axis=1)
            use_fake = (
                np.full(n, True) if fake is True
                else np.full(n, False) if fake is False
                else is_dmds.copy()
            )
            if fake is True and not is_dmds.all():
                raise ValueError("bad magic")
            h32 = hdr[:, 4:16].reshape(n, 3, 4).astype(np.int64)
            whc = (
                (h32[:, :, 0] << 24) | (h32[:, :, 1] << 16)
                | (h32[:, :, 2] << 8) | h32[:, :, 3]
            )
            width = whc[:, 0].copy()
            height = whc[:, 1].copy()
            channels = whc[:, 2].copy()
            for i in np.flatnonzero(~use_fake):  # real-codec rows only
                d = decode_image(raws[i], fake=False)
                width[i], height[i] = d["width"], d["height"]
                channels[i] = d["channels"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64").to_numpy(),
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                    "channels": channels.astype("int32"),
                    "payload_bytes": lens - 16,
                }
            )

    return media.select("media_id", "content").mapInPandas(run, DECODED_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("histogram", T.ArrayType(T.DoubleType())),
    ]
)


def extract_byte_histograms(media: DataFrame, bins: int = 16) -> DataFrame:
    """Feature extraction that is REAL math on the real bytes: an
    L1-normalized byte-value histogram per media payload — the stand-in
    for an embedding model, with the same pipeline shape (binary ->
    fixed-width float vector)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                payload = np.frombuffer(bytes(content)[16:], dtype=np.uint8)
                if len(payload) == 0:
                    hist = np.zeros(bins)
                else:
                    hist = np.bincount(payload // (256 // bins), minlength=bins)
                    hist = hist / hist.sum()
                out.append(
                    {"media_id": int(media_id), "histogram": hist.tolist()}
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 256, stride: int = 2) -> DataFrame:
    """Frame sampling for "video": split the payload into fixed-size
    frames and keep every ``stride``-th one — the demux-and-sample
    pipeline shape (real demuxers plug into the same seam)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = pd.DataFrame({"media_id": [], "frame_no": [], "frame": []})
        for pdf in batches:
            # columnar assembly (no dict-per-frame): the only per-frame
            # work left is the byte slice itself, which IS the output
            ids, nos, frames = [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)[16:]
                kept = range(0, len(payload) // frame_bytes, stride)
                ids.extend([int(media_id)] * len(kept))
                nos.extend(kept)
                frames.extend(
                    payload[i * frame_bytes:(i + 1) * frame_bytes]
                    for i in kept
                )
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame": frames}
            ) if ids else empty

    return media.select("media_id", "content").mapInPandas(run, FRAME_SCHEMA)


def metadata_only_scan(media: DataFrame) -> DataFrame:
    """Metadata queries must not read the binary column: selecting only
    ``meta.*`` lets parquet column pruning skip the content bytes
    entirely (ReadSchema shows no ``content``)."""
    return media.select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def resize_images(
    media: DataFrame, target_width: int, target_height: int,
    fake: bool | None = None,
) -> DataFrame:
    """Resize stage: binary in -> binary out with the target geometry.
    DMDS fake media re-encodes deterministically at the target size;
    real containers decodable without an imaging library (P6 PPM,
    BI_RGB BMP, 8-bit PNG, baseline JPEG) resample with a pure-numpy
    nearest-neighbor and re-encode as PPM — the pipeline-internal raw
    container; the remaining compressed shapes (progressive JPEG,
    exotic PNG) resample through Pillow when installed and raise
    NotImplementedError per task when not. The Spark-side shape is the
    production one in every branch: Arrow-batched binary columns
    through mapInPandas, output partitioning inherited from the input
    (no shuffle), constant memory per batch via the iterator
    protocol."""

    def _nearest(pixels, tw: int, th: int):
        import numpy as np

        h, w = pixels.shape[:2]
        ys = (np.arange(th, dtype=np.int64) * h) // th
        xs = (np.arange(tw, dtype=np.int64) * w) // tw
        return pixels[ys][:, xs]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        def _pil_resize(raw: bytes) -> tuple[bytes, int]:
            Image = _pil()
            if Image is None:
                raise NotImplementedError(
                    "JPEG/other compressed media bytes need Pillow to "
                    "resample (PPM/BMP/PNG resize without it)"
                )
            with Image.open(io.BytesIO(raw)) as im:
                fmt = im.format or "PNG"
                channels = len(im.getbands())
                buf = io.BytesIO()
                im.resize((target_width, target_height)).save(buf, fmt)
                return buf.getvalue(), channels

        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                use_fake = fake is True or (fake is None and raw[:4] == MEDIA_MAGIC)
                if use_fake:
                    src = decode_image(raw, fake=True)
                    # stub resample: re-encode at the target geometry
                    # with a payload derived from the source id
                    resized = encode_fake_media(
                        target_width, target_height, src["channels"], int(media_id)
                    )
                    channels = src["channels"]
                elif (raw[:2] in (b"P6", b"BM", b"\xff\xd8")
                      or raw[:8] == _PNG_MAGIC):
                    import numpy as np

                    if raw[:2] == b"P6":
                        px = ppm_pixels(raw)
                    elif raw[:2] == b"BM":
                        px = bmp_pixels(raw)[:, :, :3]
                    elif raw[:2] == b"\xff\xd8":
                        from dmds_spark.operators.jpeg import jpeg_pixels

                        try:
                            px = jpeg_pixels(raw)
                        except ValueError:
                            if _pil() is None:
                                raise
                            # progressive / non-baseline: Pillow where
                            # installed — the stdlib codec narrows the
                            # gate, never widens it
                            px = None
                    else:
                        try:
                            px = png_pixels(raw)
                        except ValueError:
                            if _pil() is None:
                                raise
                            # unsupported PNG shape (palette / 16-bit /
                            # Adam7): Pillow takes it where installed —
                            # the stdlib codec narrows the gate, never
                            # widens it
                            px = None
                    if px is not None:
                        # gray (1ch) and gray+alpha (2ch) replicate
                        # luminance to RGB for the P6 re-encode (alpha
                        # drops — P6 has no alpha); RGBA keeps RGB
                        if px.shape[2] in (1, 2):
                            px = np.repeat(px[:, :, :1], 3, axis=2)
                        else:
                            px = px[:, :, :3]
                        resized = encode_ppm_pixels(
                            _nearest(px, target_width, target_height)
                        )
                        channels = 3
                    else:
                        resized, channels = _pil_resize(raw)
                else:
                    resized, channels = _pil_resize(raw)
                out.append(
                    {
                        "media_id": int(media_id),
                        "content": resized,
                        "width": target_width,
                        "height": target_height,
                        "channels": channels,
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(run, RESIZED_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def perceptual_hashes(media: DataFrame, bits: int = 64) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per media payload:
    the payload folds into ``bits`` contiguous equal-width cells, and
    bit b is 1 iff cell b's mean exceeds the whole-payload mean. A
    re-encode, byte noise, or a small tail crop moves a few cell
    means, so near-identical payloads agree on most bits — hamming
    distance over the packed 64-bit integer is the near-dup metric
    (image dedup's answer to MinHash). A production pipeline computes
    a DCT pHash over DECODED pixels through this same seam
    (decode -> numpy -> packed int64); every downstream piece — the
    banded candidate join, the bit_count verify — is identical.

    Vectorized per clip: one reshape + two whole-array reductions +
    one packbits; Python-level work is O(clips). Output is a plain
    int64 column, so the candidate join shuffles 8-byte keys."""
    import numpy as np

    if bits % 8 != 0 or not 8 <= bits <= 64:
        # the packed hash must fit the int64 output column (and the
        # shiftrightunsigned band slicing downstream): reject instead
        # of silently truncating a wider hash to a wrong value
        raise ValueError(
            f"bits must be a multiple of 8 in [8, 64], got {bits}"
        )

    def one(payload: bytes) -> int:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) < bits:  # tiny payload: zero-pad to one byte/cell
            arr = np.pad(arr, (0, bits - len(arr)))
        arr = arr[: len(arr) // bits * bits].astype(np.int64)
        m = len(arr) // bits
        # integer-exact threshold: cell mean > whole mean compared by
        # cross-multiplication (cell_sum * T > total * m) — float means
        # round, and a rounded tie flips a bit differently than the
        # exact rational compare, which would break the SQL oracle's
        # hash parity (cell_sum*T <= 255*64*4096: far inside i64)
        cell_sums = arr.reshape(bits, -1).sum(axis=1)
        total = int(arr.sum())
        packed = np.packbits(cell_sums * len(arr) > total * m).tobytes()
        if bits == 64:  # signed view: bit 63 may be set
            return int(np.frombuffer(packed, dtype=">i8")[0])
        return int.from_bytes(packed, "big")  # < 2^63: fits unsigned

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "phash": [
                        one(bytes(c)[16:]) for c in pdf["content"]
                    ],
                }
            )

    return media.select("media_id", "content").mapInPandas(
        run, PHASH_SCHEMA
    )


def phash_candidate_pairs(
    hashes: DataFrame, bands: int = 4, bits: int = 64
) -> DataFrame:
    """Banded candidate pairs over perceptual hashes: split each
    64-bit hash into ``bands`` equal bit-slices, equi-join on
    (band_no, slice) — pigeonhole guarantees every pair with hamming
    distance < ``bands`` shares at least one untouched band, so recall
    is total below that bound (same argument as simhash_pairs, pinned
    there). Emits (id_a < id_b, phash_a, phash_b, hamming) with the
    exact ``bit_count(xor)`` distance; callers filter to their radius.
    The join carries only (id, phash, band key) — 24 bytes a row."""
    width = bits // bands
    mask = (1 << width) - 1
    b = hashes.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_no"),
                        F.shiftrightunsigned("phash", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select("media_id", "phash", "b.band_no", "b.band_key")
    left = b.select(
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("phash_a"),
        "band_no",
        "band_key",
    )
    right = b.select(
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("phash_b"),
        "band_no",
        "band_key",
    )
    pairs = (
        left.join(right, ["band_no", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "phash_a", "phash_b")
        .distinct()
    )
    return pairs.withColumn(
        "hamming",
        F.bit_count(F.col("phash_a").bitwiseXOR(F.col("phash_b"))),
    )


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_frame_features(
    media: DataFrame,
    sample_rate: int = 16_000,
    frame_ms: int = 25,
    hop_ms: int = 10,
) -> DataFrame:
    """Per-frame audio features over a PCM16 little-endian payload:
    overlapping frames of ``frame_ms`` every ``hop_ms`` (the standard
    speech-feature framing), each reduced to integer-exact sum-of-
    squares energy and zero-crossing count — the VAD / silence-trim /
    segmentation primitives a speech-corpus pipeline runs before any
    model. Unlike the image codec this needs NO external library: PCM
    framing is array slicing, so the whole operator is real, not a
    stub. Features are integers, so results are bit-identical on any
    engine or partitioning.

    Scale shape: one ``mapInPandas`` scan (Arrow batches), fan-out =
    frames per clip, no shuffle. Per clip, ALL frames are materialized
    at once as a zero-copy ``sliding_window_view`` strided matrix
    (frames x frame_len) and reduced with two whole-matrix numpy
    reductions — no per-frame Python iteration, so the Python-level
    work is O(clips), not O(samples/hop). The header (16 bytes,
    MEDIA_MAGIC layout) is skipped like every other media operator;
    trailing bytes that don't complete a sample are dropped.

    Zero-crossing semantics: zeros are skipped, a crossing is a sign
    flip between consecutive NONZERO samples (the textbook definition;
    matches np.diff over the zero-compressed sign sequence). Done
    matrix-wide by forward-filling each row's last-nonzero sign and
    counting positions whose sign differs from the filled sign one
    column earlier."""
    import numpy as np

    frame_len = sample_rate * frame_ms // 1000
    hop_len = sample_rate * hop_ms // 1000

    def clip_features(pcm: "np.ndarray") -> tuple:
        n = len(pcm)
        if n >= frame_len:
            fr = np.lib.stride_tricks.sliding_window_view(pcm, frame_len)[
                ::hop_len
            ]
        elif n:
            fr = pcm[None, :]  # short clip: one truncated frame
        else:
            return None
        energy = np.einsum("ij,ij->i", fr, fr)  # int64 sum of squares
        signs = np.sign(fr)
        nonzero = signs != 0
        # index of the last nonzero column <= j (0 where the prefix is
        # all zero — and then signs[:, 0] is itself 0, so filled = 0)
        last_nz = np.maximum.accumulate(
            np.where(nonzero, np.arange(fr.shape[1]), 0), axis=1
        )
        filled = np.take_along_axis(signs, last_nz, axis=1)
        flips = (
            nonzero[:, 1:]
            & (filled[:, :-1] != 0)
            & (signs[:, 1:] != filled[:, :-1])
        )
        return energy, flips.sum(axis=1), fr.shape[0], fr.shape[1]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, n_samples, energies, zcs = [], [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)[16:]
                usable = len(payload) - (len(payload) % 2)
                pcm = np.frombuffer(payload[:usable], dtype="<i2").astype(
                    np.int64
                )
                feats = clip_features(pcm)
                if feats is None:
                    continue
                energy, zc, n_frames, flen = feats
                ids.append(np.full(n_frames, int(media_id), dtype=np.int64))
                frame_nos.append(np.arange(n_frames, dtype=np.int64))
                n_samples.append(np.full(n_frames, flen, dtype=np.int64))
                energies.append(energy)
                zcs.append(zc)
            if not ids:
                yield pd.DataFrame({k.name: [] for k in AUDIO_FRAME_SCHEMA})
                continue
            yield pd.DataFrame(
                {
                    "media_id": np.concatenate(ids),
                    "frame_no": np.concatenate(frame_nos),
                    "n_samples": np.concatenate(n_samples),
                    "energy": np.concatenate(energies),
                    "zero_crossings": np.concatenate(zcs),
                }
            )

    return media.select("media_id", "content").mapInPandas(
        run, AUDIO_FRAME_SCHEMA
    )


AUDIO_FB_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("band", T.LongType()),
        T.StructField("energy", T.DoubleType()),
    ]
)


def _triangular_filterbank(n_bins: int, n_bands: int) -> "object":
    """Linear-spaced triangular filters over the rfft bin axis,
    band b peaking at edge b+1 of n_bands+2 evenly spaced edges —
    the standard overlapping-triangle bank (mel warping is a table
    swap on the edge positions; linear keeps the demo dependency-free
    and the assertions exact)."""
    import numpy as np

    edges = np.linspace(0, n_bins - 1, n_bands + 2)
    fb = np.zeros((n_bands, n_bins))
    bins = np.arange(n_bins, dtype=np.float64)
    for b in range(n_bands):
        lo, mid, hi = edges[b], edges[b + 1], edges[b + 2]
        up = (bins - lo) / max(mid - lo, 1e-12)
        down = (hi - bins) / max(hi - mid, 1e-12)
        fb[b] = np.clip(np.minimum(up, down), 0, None)
    return fb


def audio_filterbank_energies(
    media: DataFrame,
    sample_rate: int = 16_000,
    frame_ms: int = 25,
    hop_ms: int = 10,
    n_bands: int = 8,
) -> DataFrame:
    """Per-frame filterbank energies — the spectral feature stage after
    ``audio_frame_features``'s time-domain pass: frames (the same
    sliding-window geometry), power spectrum via rFFT, then an
    overlapping triangular filterbank collapses ~200 bins to
    ``n_bands`` energies per frame (the log/DCT steps of full MFCCs
    are per-element postprocessing on this output). Completes the
    audio pipeline decode -> frame -> time features -> spectral
    features with numpy only — no external DSP library, nothing
    stubbed.

    Scale shape: one ``mapInPandas`` scan; per clip the ENTIRE frame
    matrix transforms at once (``rfft(axis=1)`` then one matmul with
    the precomputed (bands x bins) filterbank) — Python-level work is
    O(clips), the flops are batched BLAS/pocketfft. Long format
    (media_id, frame_no, band, energy): every column scalar.

    Engine-side only (rows-only class): FFT floats are deterministic
    per platform but carry no cross-engine exactness contract, so this
    operator is pinned by DSP invariants in tests (DC concentrates in
    band 0, a Nyquist-rate alternation in the top band, total energy
    conservation within filter coverage), not by the DuckDB oracle."""
    import numpy as np

    frame_len = sample_rate * frame_ms // 1000
    hop_len = sample_rate * hop_ms // 1000
    n_bins = frame_len // 2 + 1
    fb = _triangular_filterbank(n_bins, n_bands)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, fnos, bands, energies = [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)[16:]
                usable = len(payload) - (len(payload) % 2)
                pcm = np.frombuffer(payload[:usable], dtype="<i2").astype(
                    np.float64
                )
                if len(pcm) < frame_len:
                    continue
                fr = np.lib.stride_tricks.sliding_window_view(
                    pcm, frame_len
                )[::hop_len]
                spec = np.abs(np.fft.rfft(fr, axis=1)) ** 2
                e = spec @ fb.T  # (frames, bands)
                nf = e.shape[0]
                ids.append(
                    np.repeat(np.full(nf, int(media_id), np.int64), n_bands)
                )
                fnos.append(np.repeat(np.arange(nf, dtype=np.int64), n_bands))
                bands.append(np.tile(np.arange(n_bands, dtype=np.int64), nf))
                energies.append(e.ravel())
            if not ids:
                yield pd.DataFrame({k.name: [] for k in AUDIO_FB_SCHEMA})
                continue
            yield pd.DataFrame(
                {
                    "media_id": np.concatenate(ids),
                    "frame_no": np.concatenate(fnos),
                    "band": np.concatenate(bands),
                    "energy": np.concatenate(energies),
                }
            )

    return media.select("media_id", "content").mapInPandas(
        run, AUDIO_FB_SCHEMA
    )


AUDIO_RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_in", T.LongType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def audio_resample(media: DataFrame, factor: int = 2) -> DataFrame:
    """Integer-factor PCM16 downsampling with a box anti-alias
    prefilter: ``out[i] = floor(sum(pcm[i*f : (i+1)*f]) / f)`` — each
    output sample is the floored mean of its ``factor`` input samples,
    so aliasing energy above the new Nyquist is attenuated by the
    box filter's sinc rolloff and a constant signal round-trips
    exactly. Fully real (no codec library): trim to a multiple of
    ``factor``, one reshape to (n_out, factor), one row-sum, one
    floor-divide — all integer, so results are bit-identical on any
    engine or partitioning. Output ``content`` is the raw resampled
    little-endian PCM16 payload (no media header — it is a stream
    payload, not a container).

    Scale shape: one ``mapInPandas`` scan, no shuffle; per-clip Python
    work is three whole-array numpy ops (O(clips) interpreter cost,
    like audio_frame_features)."""
    import numpy as np

    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)[16:]
                usable = len(payload) - (len(payload) % 2)
                pcm = np.frombuffer(payload[:usable], dtype="<i2").astype(
                    np.int64
                )
                n_in = len(pcm)
                n_out = n_in // factor
                trimmed = pcm[: n_out * factor]
                res = trimmed.reshape(n_out, factor).sum(axis=1) // factor
                out.append(
                    {
                        "media_id": int(media_id),
                        "n_in": n_in,
                        "n_out": n_out,
                        "content": res.astype("<i2").tobytes(),
                    }
                )
            yield pd.DataFrame(
                out
                if out
                else {k.name: [] for k in AUDIO_RESAMPLE_SCHEMA}
            )

    return media.select("media_id", "content").mapInPandas(
        run, AUDIO_RESAMPLE_SCHEMA
    )
