"""Multimodal column operators (north-star extension; SURVEY §7.2 M7).

Images/audio/video are opaque ``binary`` columns with typed metadata. The
Spark-side plumbing — schemas, Arrow-batched mapInPandas, partitioning — is
real and tested. Decode depth, honestly labeled per format:

- REAL PIXEL/SAMPLE DECODE (round 4, no codec library): ``image_pixels``
  fully decodes 8-bit non-interlaced PNG (stdlib zlib inflate + scanline
  filter inversion, all 5 filter types) AND non-interlaced GIF87a/89a
  (pure-Python LZW expansion + palette lookup); ``audio_samples`` decodes
  PCM16 WAV data chunks. PNG/WAV are oracle-verified end-to-end against
  arithmetic expectations on synthesized payloads; GIF round-trips against
  an independent encoder in pytest.
- REAL HEADER DECODE: PNG/JPEG/GIF dimensions+mode, WAV fmt, MP4 boxes are
  parsed from actual bytes (``_parse_image_header`` etc.).
- If a codec import (PIL/cv2/soundfile) succeeds it is used for the rest;
  otherwise ``fake='deterministic'`` substitutes an arithmetic fake (so
  oracles still verify the plumbing) and ``fake='error'`` raises
  NotImplementedError, clearly marking the boundary. ``frame_sample``
  (video keyframes) remains an honest stub — no video codec in stdlib.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..errors import ParameterException
from ..operators._util import resolve_col
from ..registry import renderer, spark_transform

try:  # pragma: no cover - codec libs absent in this environment
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


@spark_transform("attach_binary", category="multimodal")
def attach_binary(df: DataFrame, source_col: str, name: str = "CONTENT") -> DataFrame:
    """Materialize a binary payload column (UTF-8 bytes of a string column —
    the demo stand-in for reading real media blobs)."""
    return df.withColumn(name, F.to_binary(F.col(resolve_col(df, source_col)), F.lit("utf-8")))


@renderer("attach_binary")
def _r_attach_binary(source, source_col, name="CONTENT") -> str:
    return f"SELECT *, to_binary({source_col}, 'utf-8') AS {name} FROM {source}"


@spark_transform("binary_meta", category="multimodal")
def binary_meta(df: DataFrame, binary_col: str) -> DataFrame:
    """Typed metadata for an opaque binary column: BYTE_LENGTH, CONTENT_MD5,
    MAGIC_PREFIX (first 4 bytes, hex). Pure JVM expressions — this is the
    planning/pruning layer a 100 TB media pipeline filters on before any
    decode happens."""
    c = F.col(resolve_col(df, binary_col))
    return df.withColumns(
        {
            "BYTE_LENGTH": F.octet_length(c).cast("bigint"),
            "CONTENT_MD5": F.md5(c),
            "MAGIC_PREFIX": F.lower(F.hex(F.substring(c, 1, 4))),
        }
    )


@renderer("binary_meta")
def _r_binary_meta(source, binary_col) -> str:
    c = binary_col
    return (
        f"SELECT *, CAST(octet_length({c}) AS BIGINT) AS BYTE_LENGTH, "
        f"md5({c}) AS CONTENT_MD5, lower(hex(substring({c}, 1, 4))) AS MAGIC_PREFIX "
        f"FROM {source}"
    )


_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_JPEG_MODES = {1: "L", 3: "RGB", 4: "CMYK"}


def _parse_image_header(data: bytes):
    """Real header-level decode for PNG / JPEG / GIF — pure Python, no codec
    library. Returns (width, height, mode) or None if the bytes are not a
    recognized image format. This makes ``image_meta`` genuinely functional
    for the formats whose dimensions live in the header; full pixel decode
    still needs PIL/cv2."""
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        mode = _PNG_MODES.get(data[25], "PNG") if len(data) > 25 else "PNG"
        return w, h, mode
    if data[:2] == b"\xff\xd8":  # JPEG SOI; walk segments to a SOF marker
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker == 0xFF:  # fill/padding byte — legal before any marker
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-payload
                i += 2
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return w, h, _JPEG_MODES.get(data[i + 9], "JPEG")
            i += 2 + int.from_bytes(data[i + 2 : i + 4], "big")
        return None
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        return (
            int.from_bytes(data[6:8], "little"),
            int.from_bytes(data[8:10], "little"),
            "P",
        )
    return None


_IMAGE_META_SCHEMA = StructType(
    [
        StructField("DOC_ID", LongType()),
        StructField("WIDTH", LongType()),
        StructField("HEIGHT", LongType()),
        StructField("MODE", StringType()),
        StructField("DECODER", StringType()),
    ]
)


@spark_transform("image_meta", category="multimodal", streaming_ok=False)
def image_meta(
    df: DataFrame, binary_col: str, id_col: str, fake: str = "deterministic"
) -> DataFrame:
    """Decode image dimensions via Arrow-batched mapInPandas.

    Decode ladder: PIL when importable → real PNG/JPEG/GIF header parse
    (pure Python, always available) → fake. fake='deterministic' derives
    WIDTH/HEIGHT arithmetically from byte length for unrecognized bytes
    (plumbing stays testable + oracle-checkable); fake='error' raises
    NotImplementedError. Batch shape: one pandas frame per Arrow batch;
    embarrassingly parallel, no shuffle.
    """
    b, i = resolve_col(df, binary_col), resolve_col(df, id_col)
    if fake not in ("deterministic", "error"):
        raise ParameterException("fake must be 'deterministic' or 'error'")
    narrow = df.select(F.col(i).alias("DOC_ID"), F.col(b).alias("__bin"))
    use_pil = _HAS_PIL
    fake_mode = fake

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["DOC_ID"], pdf["__bin"]):
                data = bytes(blob) if blob is not None else b""
                if use_pil:
                    try:
                        img = Image.open(io.BytesIO(data))
                        rows.append((doc_id, img.width, img.height, img.mode, "pil"))
                        continue
                    except Exception:
                        pass
                parsed = _parse_image_header(data)
                if parsed is not None:
                    w, h, mode = parsed
                    rows.append((doc_id, w, h, mode, "header"))
                    continue
                if fake_mode == "error":
                    raise NotImplementedError(
                        "image decoding requires PIL/cv2 — not available in this "
                        "environment; use fake='deterministic' to exercise the pipeline"
                    )
                n = len(data)
                rows.append((doc_id, (n % 640) + 1, (n % 480) + 1, "FAKE", "stub"))
            yield pd.DataFrame(rows, columns=[f.name for f in _IMAGE_META_SCHEMA.fields])

    return narrow.mapInPandas(decode, schema=_IMAGE_META_SCHEMA)


_FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("DOC_ID", LongType()),
        StructField("FRAME_INDEX", LongType()),
        StructField("FRAME_BYTES", BinaryType()),
        StructField("DECODER", StringType()),
    ]
)


@spark_transform("frame_sample", category="multimodal", streaming_ok=False)
def frame_sample(
    df: DataFrame, binary_col: str, id_col: str, num_frames: int = 3
) -> DataFrame:
    """Sample N frames from a binary payload via mapInPandas (UDTF-style
    1→N fan-out). Animated (and single-frame) GIFs get a REAL decode —
    every image descriptor walked, LZW expanded, first 32 palette-index
    bytes of each of the first ``num_frames`` frames emitted with
    DECODER='gif-pure'. Other formats fall back to the honest STUB
    (deterministic byte slices, DECODER='stub') — video codecs aren't in
    this container; real ones slot into the same batch shape."""
    b, i = resolve_col(df, binary_col), resolve_col(df, id_col)
    narrow = df.select(F.col(i).alias("DOC_ID"), F.col(b).alias("__bin"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["DOC_ID"], pdf["__bin"]):
                data = bytes(blob) if blob is not None else b""
                if not data:
                    continue
                frames = _gif_frames(data, num_frames)
                if frames is not None:
                    for fi, fr in enumerate(frames):
                        rows.append((doc_id, fi, fr[:32], "gif-pure"))
                    continue
                step = max(1, len(data) // num_frames)
                for fi in range(min(num_frames, len(data))):
                    start = fi * step
                    rows.append((doc_id, fi, data[start : start + min(16, step)], "stub"))
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SAMPLE_SCHEMA.fields])

    return narrow.mapInPandas(sample, schema=_FRAME_SAMPLE_SCHEMA)


def _parse_wav_header(data: bytes):
    """Real header-level decode for WAV/RIFF — pure Python, no codec library.
    Walks the chunk list for ``fmt `` and ``data`` and returns
    (channels, sample_rate, bits_per_sample, duration_ms) or None if the
    bytes are not RIFF/WAVE. Duration comes from the declared data-chunk size
    over the byte rate (valid even when only the header bytes are present)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i, fmt, data_size = 12, None, None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(data):
            ch = int.from_bytes(data[i + 10 : i + 12], "little")
            sr = int.from_bytes(data[i + 12 : i + 16], "little")
            br = int.from_bytes(data[i + 16 : i + 20], "little")
            bits = int.from_bytes(data[i + 22 : i + 24], "little")
            fmt = (ch, sr, br, bits)
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if fmt is None:
        return None
    ch, sr, br, bits = fmt
    dur = data_size * 1000 // br if (data_size is not None and br) else None
    return ch, sr, bits, dur


_AUDIO_META_SCHEMA = StructType(
    [
        StructField("DOC_ID", LongType()),
        StructField("CHANNELS", LongType()),
        StructField("SAMPLE_RATE", LongType()),
        StructField("BITS_PER_SAMPLE", LongType()),
        StructField("DURATION_MS", LongType()),
        StructField("DECODER", StringType()),
    ]
)


@spark_transform("audio_meta", category="multimodal", streaming_ok=False)
def audio_meta(
    df: DataFrame, binary_col: str, id_col: str, fake: str = "deterministic"
) -> DataFrame:
    """Decode audio metadata via Arrow-batched mapInPandas.

    Decode ladder: real WAV/RIFF header parse (pure Python, always
    available; a soundfile/librosa decoder would slot in above it) → fake.
    fake='deterministic' derives fields arithmetically from byte length for
    unrecognized bytes; fake='error' raises NotImplementedError. Same batch
    shape and narrow-projection discipline as image_meta — embarrassingly
    parallel, no shuffle."""
    b, i = resolve_col(df, binary_col), resolve_col(df, id_col)
    if fake not in ("deterministic", "error"):
        raise ParameterException("fake must be 'deterministic' or 'error'")
    narrow = df.select(F.col(i).alias("DOC_ID"), F.col(b).alias("__bin"))
    fake_mode = fake

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["DOC_ID"], pdf["__bin"]):
                data = bytes(blob) if blob is not None else b""
                parsed = _parse_wav_header(data)
                if parsed is not None:
                    ch, sr, bits, dur = parsed
                    rows.append((doc_id, ch, sr, bits, dur, "header"))
                    continue
                if fake_mode == "error":
                    raise NotImplementedError(
                        "non-WAV audio decoding requires soundfile/librosa — "
                        "not available in this environment; use "
                        "fake='deterministic' to exercise the pipeline"
                    )
                n = len(data)
                rows.append(
                    (doc_id, n % 2 + 1, (n % 48) * 1000 + 8000, 16, n % 60000, "stub")
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _AUDIO_META_SCHEMA.fields]
            )

    return narrow.mapInPandas(decode, schema=_AUDIO_META_SCHEMA)


def _parse_mp4_header(data: bytes):
    """Real header-level decode for MP4/ISO-BMFF — pure Python box walk.
    Reads mvhd (timescale → duration) and the first video trak's tkhd
    (16.16 fixed-point width/height). Returns (duration_ms, width, height)
    or None if the bytes are not an MP4. Full frame decode still needs a
    codec library; this parses only the structural metadata."""
    n = len(data)
    if n < 12 or data[4:8] not in (b"ftyp", b"moov"):
        return None

    def walk(start, end):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(data[i : i + 4], "big")
            btype = data[i + 4 : i + 8]
            hdr = 8
            if size == 1 and i + 16 <= end:
                size = int.from_bytes(data[i + 8 : i + 16], "big")
                hdr = 16
            if size == 0:
                size = end - i
            if size < hdr:
                return
            yield btype, i + hdr, min(i + size, end)
            i += size

    dur_ms = width = height = None
    for btype, s, e in walk(0, n):
        if btype != b"moov":
            continue
        for ctype, cs, ce in walk(s, e):
            if ctype == b"mvhd" and ce - cs >= 20:
                ver = data[cs]
                if ver == 1 and ce - cs >= 32:
                    ts = int.from_bytes(data[cs + 20 : cs + 24], "big")
                    dur = int.from_bytes(data[cs + 24 : cs + 32], "big")
                else:
                    ts = int.from_bytes(data[cs + 12 : cs + 16], "big")
                    dur = int.from_bytes(data[cs + 16 : cs + 20], "big")
                if ts:
                    dur_ms = dur * 1000 // ts
            elif ctype == b"trak":
                for t2, s2, e2 in walk(cs, ce):
                    if t2 == b"tkhd" and width is None and e2 > s2:
                        off = 88 if data[s2] == 1 else 76
                        if e2 - s2 >= off + 8:
                            w = int.from_bytes(data[s2 + off : s2 + off + 4], "big") >> 16
                            h = int.from_bytes(data[s2 + off + 4 : s2 + off + 8], "big") >> 16
                            if w and h:
                                width, height = w, h
    if dur_ms is None and width is None:
        return None
    return dur_ms, width, height


_VIDEO_META_SCHEMA = StructType(
    [
        StructField("DOC_ID", LongType()),
        StructField("WIDTH", LongType()),
        StructField("HEIGHT", LongType()),
        StructField("DURATION_MS", LongType()),
        StructField("DECODER", StringType()),
    ]
)


@spark_transform("video_meta", category="multimodal", streaming_ok=False)
def video_meta(
    df: DataFrame, binary_col: str, id_col: str, fake: str = "deterministic"
) -> DataFrame:
    """Decode video container metadata via Arrow-batched mapInPandas.

    Decode ladder: real MP4/ISO-BMFF box parse (pure Python — mvhd duration,
    tkhd dimensions; a cv2/ffprobe decoder would slot in above it) → fake.
    Same narrow-projection, shuffle-free batch shape as image_meta/audio_meta.
    """
    b, i = resolve_col(df, binary_col), resolve_col(df, id_col)
    if fake not in ("deterministic", "error"):
        raise ParameterException("fake must be 'deterministic' or 'error'")
    narrow = df.select(F.col(i).alias("DOC_ID"), F.col(b).alias("__bin"))
    fake_mode = fake

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["DOC_ID"], pdf["__bin"]):
                data = bytes(blob) if blob is not None else b""
                parsed = _parse_mp4_header(data)
                if parsed is not None:
                    dur, w, h = parsed
                    rows.append((doc_id, w, h, dur, "header"))
                    continue
                if fake_mode == "error":
                    raise NotImplementedError(
                        "non-MP4 video decoding requires cv2/ffmpeg — not "
                        "available in this environment; use "
                        "fake='deterministic' to exercise the pipeline"
                    )
                n = len(data)
                rows.append(
                    (doc_id, (n % 1280) + 1, (n % 720) + 1, n % 120000, "stub")
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _VIDEO_META_SCHEMA.fields]
            )

    return narrow.mapInPandas(decode, schema=_VIDEO_META_SCHEMA)


@spark_transform("dedup_binary", category="multimodal", streaming_ok=False)
def dedup_binary(
    df: DataFrame, binary_col: str, id_col: str, mode: str = "filter"
) -> DataFrame:
    """Exact binary-content dedup — the standard first pass over a media
    corpus (identical bytes ⇒ identical asset, no decode needed). One hash
    shuffle on the 16-byte md5 fingerprint; keeps the minimum id per
    fingerprint. mode='filter' keeps surviving rows; mode='groups' returns
    ``(id, CONTENT_GROUP)`` where CONTENT_GROUP is the canonical (minimum)
    id sharing the same bytes."""
    from pyspark.sql import Window as _W

    from ..errors import ParameterException

    if mode not in ("filter", "groups"):
        raise ParameterException("mode must be 'filter' or 'groups'")
    c, i = resolve_col(df, binary_col), resolve_col(df, id_col)
    w = _W.partitionBy(F.md5(F.col(c)))
    if mode == "groups":
        return df.select(
            F.col(i),
            F.min(F.col(i)).over(w).alias("CONTENT_GROUP"),
        )
    keyed = df.withColumn("__grp_min", F.min(F.col(i)).over(w))
    return keyed.filter(F.col(i) == F.col("__grp_min")).drop("__grp_min")


@renderer("dedup_binary")
def _r_dedup_binary(source, binary_col, id_col, mode="filter") -> str:
    from ..errors import ParameterException as _PE

    if mode not in ("filter", "groups"):
        raise _PE("mode must be 'filter' or 'groups'")
    grp = f"MIN({id_col}) OVER (PARTITION BY md5({binary_col}))"
    if mode == "groups":
        return f"SELECT {id_col}, {grp} AS CONTENT_GROUP FROM {source}"
    return (
        f"SELECT * EXCEPT (__grp_min) FROM "
        f"(SELECT *, {grp} AS __grp_min FROM {source}) "
        f"WHERE {id_col} = __grp_min"
    )


# ---------------------------------------------------------------------------
# REAL pixel / sample decode (round 4) — no codec library required:
# PNG is zlib (stdlib) + per-scanline filters; WAV data is raw PCM.
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> bytearray:
    """Invert PNG scanline filters 0-4 (None/Sub/Up/Average/Paeth) for
    8-bit samples. Returns height*width*channels bytes."""
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out.extend(line)
        prev = line
    return out


def _decode_png_pixels(data: bytes):
    """Pure-Python PNG pixel decode (8-bit depth, color types 0/2/4/6,
    non-interlaced): returns (width, height, channels, per-channel means).
    Real decode — zlib inflate + filter inversion — not a header parse."""
    import struct
    import zlib

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, width = 8, None
    height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                return None
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if not (width and height and channels and idat):
        return None
    raw = zlib.decompress(bytes(idat))
    pixels = _png_unfilter(raw, width, height, channels)
    n = width * height
    sums = [0] * channels
    for i in range(0, len(pixels), channels):
        for ch in range(channels):
            sums[ch] += pixels[i + ch]
    means = [round(s / n, 6) for s in sums]
    return width, height, channels, means


_IMAGE_PIXELS_SCHEMA = StructType(
    [
        StructField("DOC_ID", LongType()),
        StructField("WIDTH", LongType()),
        StructField("HEIGHT", LongType()),
        StructField("CHANNELS", LongType()),
        StructField("CHANNEL_MEANS", StringType()),
        StructField("DECODER", StringType()),
    ]
)


@spark_transform("image_pixels", category="multimodal", streaming_ok=False)
def image_pixels(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """REAL PNG pixel decode — zlib inflate (stdlib) + scanline filter
    inversion, no codec library: per image (WIDTH, HEIGHT, CHANNELS,
    CHANNEL_MEANS as a comma-joined 6-dp string). Supports 8-bit
    non-interlaced gray/RGB/gray+A/RGBA; other payloads yield NULL stats
    with DECODER='unsupported'. Arrow-batched ``mapInPandas`` —
    embarrassingly parallel, the right shape for binary decode at scale."""
    b, i = resolve_col(df, binary_col), resolve_col(df, id_col)
    narrow = df.select(F.col(i).alias("DOC_ID"), F.col(b).alias("__bin"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["DOC_ID"], pdf["__bin"]):
                data = bytes(blob) if blob is not None else b""
                got, dec = _decode_png_pixels(data), "png-pure"
                if got is None:
                    got, dec = _decode_gif_pixels(data), "gif-pure"
                if got is None:
                    rows.append((doc_id, None, None, None, None, "unsupported"))
                else:
                    w, h, c, means = got
                    rows.append(
                        (doc_id, w, h, c, ",".join(f"{m:.6f}" for m in means), dec)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _IMAGE_PIXELS_SCHEMA.fields]
            )

    return narrow.mapInPandas(decode, schema=_IMAGE_PIXELS_SCHEMA)


def _decode_wav_samples(data: bytes):
    """Pure-Python PCM16 WAV sample decode: returns (channels, sample_rate,
    n_frames, per-channel mean amplitude rounded 6dp). Real decode of the
    data chunk, not a header parse."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i, fmt, pcm = 12, None, None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(data):
            ch = int.from_bytes(data[i + 10 : i + 12], "little")
            sr = int.from_bytes(data[i + 12 : i + 16], "little")
            bits = int.from_bytes(data[i + 22 : i + 24], "little")
            fmt = (ch, sr, bits)
        elif cid == b"data":
            pcm = data[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)
    if fmt is None or pcm is None:
        return None
    ch, sr, bits = fmt
    if bits != 16 or ch < 1:
        return None
    n_samp = len(pcm) // 2
    frames = n_samp // ch
    if frames == 0:
        return ch, sr, 0, [0.0] * ch
    vals = struct.unpack(f"<{frames * ch}h", pcm[: frames * ch * 2])
    sums = [0] * ch
    for j, v in enumerate(vals):
        sums[j % ch] += v
    return ch, sr, frames, [round(s / frames, 6) for s in sums]


_AUDIO_SAMPLES_SCHEMA = StructType(
    [
        StructField("DOC_ID", LongType()),
        StructField("CHANNELS", LongType()),
        StructField("SAMPLE_RATE", LongType()),
        StructField("N_FRAMES", LongType()),
        StructField("CHANNEL_MEANS", StringType()),
        StructField("DECODER", StringType()),
    ]
)


@spark_transform("audio_samples", category="multimodal", streaming_ok=False)
def audio_samples(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """REAL PCM16 WAV sample decode (struct unpack of the data chunk): per
    clip (CHANNELS, SAMPLE_RATE, N_FRAMES, per-channel mean amplitude).
    Non-PCM16 payloads yield NULL stats with DECODER='unsupported'.
    Arrow-batched ``mapInPandas``."""
    b, i = resolve_col(df, binary_col), resolve_col(df, id_col)
    narrow = df.select(F.col(i).alias("DOC_ID"), F.col(b).alias("__bin"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["DOC_ID"], pdf["__bin"]):
                data = bytes(blob) if blob is not None else b""
                got = _decode_wav_samples(data)
                if got is None:
                    rows.append((doc_id, None, None, None, None, "unsupported"))
                else:
                    ch, sr, fr, means = got
                    rows.append(
                        (doc_id, ch, sr, fr, ",".join(f"{m:.6f}" for m in means), "pcm16-pure")
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _AUDIO_SAMPLES_SCHEMA.fields]
            )

    return narrow.mapInPandas(decode, schema=_AUDIO_SAMPLES_SCHEMA)


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int):
    """GIF-flavor LZW decode (variable code width, CLEAR/EOI codes) of a
    concatenated image-data sub-block stream. Returns the index list."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    bitpos = 0
    nbits = len(data) * 8

    def reset():
        return {i: [i] for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev: list[int] | None = None
    next_code = eoi + 1
    while bitpos + width <= nbits:
        code = 0
        for b in range(width):
            byte = data[(bitpos + b) >> 3]
            code |= ((byte >> ((bitpos + b) & 7)) & 1) << b
        bitpos += width
        if code == clear:
            table, width = reset()
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code not in table:
                # corrupt stream: first code after CLEAR must be a root —
                # raise ValueError uniformly so every caller's corrupt-GIF
                # fallback path triggers instead of a KeyError crashing the
                # mapInPandas batch
                raise ValueError("corrupt LZW stream: invalid initial code")
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + [entry[0]]
            next_code += 1
        elif code == next_code:
            entry = prev + [prev[0]]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError("corrupt LZW stream")
        if prev is not None and next_code - 1 == (1 << width) - 1 and width < 12:
            width += 1
        out.extend(entry)
        prev = entry
        if len(out) >= max_pixels:
            break
    return out[:max_pixels]


def _decode_gif_pixels(data: bytes):
    """Pure-Python GIF87a/89a pixel decode for the FIRST image frame
    (global color table, no interlace): (width, height, 3, RGB channel
    means). Real decode — LZW expansion + palette lookup."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    packed = data[10]
    has_gct = packed & 0x80
    gct_size = 2 << (packed & 0x07)
    pos = 13
    palette = None
    if has_gct:
        palette = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(gct_size)]
        pos += 3 * gct_size
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            iw = int.from_bytes(data[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(data[pos + 7 : pos + 9], "little")
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x80:  # local color table
                lct_size = 2 << (ipacked & 0x07)
                palette = [
                    tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(lct_size)
                ]
                pos += 3 * lct_size
            if ipacked & 0x40 or palette is None:  # interlaced: unsupported
                return None
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while pos < len(data) and data[pos] != 0:
                n = data[pos]
                stream.extend(data[pos + 1 : pos + 1 + n])
                pos += 1 + n
            try:
                idx = _lzw_decode(bytes(stream), min_code, iw * ih)
            except ValueError:
                return None
            if len(idx) < iw * ih:
                return None
            n = iw * ih
            sums = [0, 0, 0]
            for i in idx:
                r, g, b2 = palette[i % len(palette)]
                sums[0] += r
                sums[1] += g
                sums[2] += b2
            return iw, ih, 3, [round(s / n, 6) for s in sums]
        else:
            break
    return None


def _gif_frames(data: bytes, max_frames: int, max_pixels: int = 4096):
    """REAL multi-frame GIF87a/89a decode (pure Python, no codec lib):
    walks every image descriptor, LZW-expands each frame's sub-block
    stream, and returns the per-frame palette-index byte strings (up to
    ``max_frames`` frames, ``max_pixels`` px per frame). Returns None when
    the bytes are not a decodable non-interlaced GIF."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    frames: list[bytes] = []
    while pos < len(data) and len(frames) < max_frames:
        b = data[pos]
        if b == 0x21:  # extension
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                return None
            iw = int.from_bytes(data[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(data[pos + 7 : pos + 9], "little")
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            if ipacked & 0x40:  # interlaced: unsupported
                return None
            if pos >= len(data):
                return None
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while pos < len(data) and data[pos] != 0:
                n = data[pos]
                stream.extend(data[pos + 1 : pos + 1 + n])
                pos += 1 + n
            pos += 1  # block terminator
            try:
                idx = _lzw_decode(bytes(stream), min_code, min(iw * ih, max_pixels))
            except ValueError:
                return None
            frames.append(bytes(idx))
        elif b == 0x3B:  # trailer
            break
        else:
            return None
    return frames or None
