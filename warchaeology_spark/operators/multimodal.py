"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video travel as opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery (schema, partition-friendly
batch shape, Arrow-batched UDF signatures) is real and tested. Codecs:
uncompressed 24-bit BMP, binary PPM (P6), 8-bit truecolor PNG
(zlib inflate + scanline unfilter) and PCM WAV (8/16-bit) are
decoded FOR REAL in pure numpy (header parse + pixel/audio stats -> a
16-dim feature vector); every other format is stubbed (this container ships no PIL/ffmpeg) —
``decode_media`` raises NotImplementedError for them in strict mode, or
emits a deterministic fake feature vector clearly labeled
``codec='fake-sha256'`` otherwise.

The flow mirrors what the 100 TB pipeline does:
  media manifest (explode media spans) -> fetch/attach bytes ->
  mapInPandas decode/feature-extract (Arrow batches, one model per task) ->
  feature table partitioned by content hash.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_META_SCHEMA = (
    "doc_id string, media_ref string, span_offset int, media_type string,"
    " content binary"
)

FEATURE_SCHEMA = (
    "doc_id string, media_ref string, span_offset int, media_type string,"
    " content_hash string, n_bytes long, codec string, features array<float>"
)


def media_manifest(docs_spans: DataFrame) -> DataFrame:
    """Explode media spans -> one row per media reference, typed by
    extension. (doc_id, media_ref, span_offset, media_type)."""
    sp = docs_spans.select("doc_id", F.explode("spans").alias("span")).filter(
        F.col("span.kind") == "media"
    )
    ext = F.lower(F.regexp_extract("span.media_ref", r"\.([A-Za-z0-9]+)$", 1))
    media_type = (
        F.when(ext.isin("jpg", "jpeg", "png", "gif", "webp", "bmp", "ppm"), "image")
        .when(ext.isin("mp3", "wav", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "webm", "mkv", "avi"), "video")
        .otherwise("unknown")
    )
    return sp.select(
        "doc_id",
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("span_offset"),
        media_type.alias("media_type"),
    )


def attach_fake_bytes(manifest: DataFrame) -> DataFrame:
    """Test stand-in for the fetch step: deterministic bytes from the ref
    (in production this is a join against a blob store / binaryFile scan)."""
    return manifest.withColumn(
        "content", F.encode(F.concat(F.lit("bytes:"), F.col("media_ref")), "utf-8")
    )


def _decode_bmp(data: bytes) -> np.ndarray | None:
    """HxWx3 uint8 RGB for uncompressed 24-bit BI_RGB BMPs (top-down or
    bottom-up); None for anything else. Pure struct+numpy — no PIL."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        return None
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_sz = struct.unpack_from("<I", data, 14)[0]
    if hdr_sz < 40:
        return None
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down, height = h < 0, abs(h)
    row_sz = (w * 3 + 3) // 4 * 4  # rows pad to 4 bytes
    if off + row_sz * height > len(data):
        return None
    rows = np.frombuffer(data, np.uint8, count=row_sz * height, offset=off)
    px = rows.reshape(height, row_sz)[:, : w * 3].reshape(height, w, 3)[..., ::-1]
    return px if top_down else px[::-1]


def _decode_ppm(data: bytes) -> np.ndarray | None:
    """HxWx3 uint8 RGB for binary PPM (P6, maxval<=255); None otherwise."""
    if not data.startswith(b"P6"):
        return None
    # header: P6 <w> <h> <maxval> then ONE whitespace byte, then pixels;
    # '#' comments allowed between tokens
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(data):
        c = data[pos:pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = data.find(b"\n", pos)
            if nl < 0:  # comment never terminated -> malformed header
                return None
            pos = nl + 1
        else:
            end = pos
            while end < len(data) and not data[end:end + 1].isspace():
                end += 1
            tokens.append(data[pos:end])
            pos = end
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or maxval > 255:
        return None
    pos += 1  # the single whitespace after maxval
    if pos + w * h * 3 > len(data):
        return None
    return np.frombuffer(data, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


def _png_unfilter(ftypes: np.ndarray, scan: np.ndarray, ch: int) -> np.ndarray | None:
    """Reverse PNG scanline filtering (spec §6: None/Sub/Up/Average/Paeth).

    ``scan``: (h, stride) filtered bytes; ``ftypes``: per-row filter ids.
    Row-sequential by definition; within a row, Sub is a per-channel
    modular prefix sum and Up/None are fully vectorized — only
    Average/Paeth fall back to a per-pixel loop (left-dependence)."""
    h, stride = scan.shape
    out = np.zeros((h, stride), np.uint8)
    zero_row = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        line = scan[y]
        prev = out[y - 1] if y else zero_row
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: per-channel modular prefix sum
            rec = line.reshape(-1, ch).astype(np.uint8)
            out[y] = np.cumsum(rec, axis=0, dtype=np.uint64).astype(np.uint8).ravel()
        elif f == 2:  # Up
            out[y] = line + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            row = out[y]
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            row = out[y]
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(line[x]) + pred) & 0xFF
        else:
            return None
    return out


def _decode_png(data: bytes) -> np.ndarray | None:
    """HxWx3 uint8 RGB for 8-bit non-interlaced truecolor PNG (color type
    2 = RGB, 6 = RGBA with alpha dropped); None for anything else. Pure
    zlib+numpy — chunk walk, IDAT inflate, scanline unfilter."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        if len(chunk) < ln:
            return None
        if typ == b"IHDR":
            if ln < 13:
                return None
            ihdr = struct.unpack(">IIBBBBB", chunk[:13])
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None or not idat:
        return None
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in (2, 6) or comp or filt or interlace:
        return None
    if w == 0 or h == 0 or w * h > 64_000_000:  # decompression-bomb guard
        return None
    ch = 3 if ctype == 2 else 4
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    arr = np.frombuffer(raw, np.uint8, count=h * (stride + 1)).reshape(h, stride + 1)
    px = _png_unfilter(arr[:, 0], arr[:, 1:], ch)
    if px is None:
        return None
    return px.reshape(h, w, ch)[..., :3]  # drop alpha for feature purposes


def _decode_wav(data: bytes) -> list[float] | None:
    """16-dim audio features for PCM WAV (8/16-bit, any channel count);
    None for anything else. Pure struct+numpy — no audio libs.

    Features: duration / channels / sample-rate (normalized), RMS, peak,
    zero-crossing rate, 8-bin temporal energy profile, mean|x|, std."""
    import struct

    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        sz = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + sz]
        # trust len(body), not the declared sz: a truncated file can claim
        # sz>=16 while the sliced body is shorter, and unpack_from would
        # raise inside the UDF — crawled media is adversarial (ADVICE r3 #3)
        if cid == b"fmt " and sz >= 16 and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        return None
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or channels < 1 or rate <= 0 or bits not in (8, 16):
        return None
    if bits == 16:
        x = np.frombuffer(pcm, "<i2", count=len(pcm) // 2).astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(pcm, np.uint8).astype(np.float64) - 128.0) / 128.0
    x = x[: (x.size // channels) * channels]  # tolerate truncated tails
    if x.size == 0:
        return None
    mono = x.reshape(-1, channels).mean(axis=1) if channels > 1 else x
    n = mono.size
    duration = n / rate
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.max(np.abs(mono)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    # 8-bin temporal energy profile (density over time)
    edges = np.linspace(0, n, 9, dtype=np.int64)
    energy = np.array([
        float(np.sum(mono[a:b] ** 2)) for a, b in zip(edges[:-1], edges[1:])
    ])
    total = energy.sum()
    profile = (energy / total).tolist() if total > 0 else [0.0] * 8
    out = [
        min(duration, 3600.0) / 3600.0,
        min(channels, 8) / 8.0,
        min(rate, 96000) / 96000.0,
        rms, peak, zcr,
        *profile,
        float(np.mean(np.abs(mono))),
        float(np.std(mono)),
    ]
    return [float(v) for v in out]


def _pixel_features(px: np.ndarray) -> list[float]:
    """16-dim real feature vector: normalized dims, per-channel mean/std,
    8-bin grayscale histogram density."""
    height, width, _ = px.shape
    flat = px.reshape(-1, 3).astype(np.float64)
    gray = flat.mean(axis=1)
    hist, _ = np.histogram(gray, bins=8, range=(0, 256))
    out = [min(width, 4096) / 4096.0, min(height, 4096) / 4096.0]
    out += (flat.mean(axis=0) / 255.0).tolist()
    out += (flat.std(axis=0) / 255.0).tolist()
    out += (hist / gray.size).tolist()
    return [float(x) for x in out]


def decode_media(with_bytes: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched decode / feature-extract over mapInPandas.

    Real codecs: uncompressed 24-bit BMP, binary PPM (P6) and 8-bit
    truecolor PNG -> pixel-stat features (``codec`` = 'bmp'/'ppm'/'png');
    PCM WAV (8/16-bit) -> audio-stat features (``codec`` = 'wav').
    Everything else needs PIL/ffmpeg
    (absent in this image): strict=True raises NotImplementedError exactly
    where the codec call would go; otherwise a deterministic fake feature
    vector is derived from the content bytes (``codec`` = 'fake-sha256')
    so batch shape, schema, and partitioning are exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats, hashes, codecs = [], [], []
            for b in pdf["content"]:
                data = bytes(b)
                hashes.append(hashlib.sha256(data).hexdigest())
                # non-strict contract: malformed media NEVER kills the task
                # — any decoder exception on adversarial bytes degrades to
                # the fake feature vector (strict mode re-raises so fuzzing
                # still surfaces decoder bugs). (ADVICE r3 #3.)
                try:
                    px = _decode_bmp(data)
                    codec = "bmp" if px is not None else None
                    if px is None:
                        px = _decode_ppm(data)
                        codec = "ppm" if px is not None else None
                    if px is None:
                        px = _decode_png(data)
                        codec = "png" if px is not None else None
                    if px is not None:
                        feats.append(
                            np.asarray(_pixel_features(px), dtype=np.float32).tolist()
                        )
                        codecs.append(codec)
                        continue
                    wav = _decode_wav(data)
                    if wav is not None:
                        feats.append(np.asarray(wav, dtype=np.float32).tolist())
                        codecs.append("wav")
                        continue
                except Exception:
                    if strict:
                        raise
                if strict:
                    raise NotImplementedError(
                        f"no codec for media bytes (magic {data[:4]!r}): only "
                        "BMP/P6-PPM/PCM-WAV decode without PIL/ffmpeg in this image"
                    )
                digest = hashlib.sha256(data).digest()
                feats.append(
                    (np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8) / 256.0)
                    .astype(np.float32)
                    .tolist()
                )
                codecs.append("fake-sha256")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "span_offset": pdf["span_offset"],
                    "media_type": pdf["media_type"],
                    "content_hash": hashes,
                    "n_bytes": pdf["content"].map(len),
                    "codec": codecs,
                    "features": feats,
                }
            )

    return with_bytes.mapInPandas(run, FEATURE_SCHEMA)


def media_feature_table(docs_spans: DataFrame, strict: bool = False) -> DataFrame:
    """manifest -> bytes -> decode; repartitioned by content hash so the
    downstream near-dup/groupBy work is co-located."""
    out = decode_media(attach_fake_bytes(media_manifest(docs_spans)), strict)
    return out.repartition(F.col("content_hash"))
