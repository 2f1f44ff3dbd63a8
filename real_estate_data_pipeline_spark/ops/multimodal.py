"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` operators.

Two decode tiers:
- ``decode_ppm_info`` / ``resize_ppm`` are REAL image operators for
  P6/PPM payloads (header parse, pixel stats, nearest-neighbor resize,
  64-bit average-hash) — PPM is numpy-decodable, so this container can
  prove the full decode->resize->perceptual-hash path end to end.
- ``parse_png`` / ``decode_png_info`` / ``resize_png`` are REAL too:
  8-bit RGB/RGBA non-interlaced PNG via stdlib zlib + numpy scanline
  filter reconstruction (all five filters) — a genuine compressed
  codec with no image library.
- ``decode_jpeg_info`` / ``resize_jpeg`` are REAL as well: baseline
  sequential 4:4:4 JPEG via a pure numpy/stdlib codec (ops/jpeg.py —
  marker parse, canonical Huffman entropy decode, dequantize + float
  IDCT, JFIF color transform; progressive/subsampled/DRI streams raise
  NotImplementedError rather than decoding wrong).
- ``decode_gif_info`` / ``resize_gif`` are REAL: GIF87a/89a palette +
  variable-width LZW via ops/gif.py (decoder verified against the
  GIF89a spec-appendix sample stream) — the third compressed lane
  after PNG's zlib and JPEG's DCT.
- audio is REAL too (ops/audio.py: RIFF/WAVE PCM16, value-oracled),
  and the video tier's FRAME SAMPLING runs against two real lanes:
  per-frame JPEG decode through a minimal motion-JPEG container
  (``encode_mjpeg``) and the standard UNCOMPRESSED interchange
  container YUV4MPEG2 (``encode_y4m`` / ``parse_y4m`` — Cmono/C444/
  C420 planar, stdlib-only), both dispatched by
  ``sample_video_frames`` at the bottom of this file.
- ``decode_image_features`` remains the documented STUB for the
  remaining codecs (WebP, inter-frame codecs like H.264 themselves:
  no PIL/ffmpeg in this container — the y4m lane covers the
  post-transcode frame contract those codecs feed):
  deterministic fake features from the bytes so the Spark-side
  plumbing — schema, batch iteration, partitioning, output shape — is
  real and testable. Swapping in PIL/torchvision/ffmpeg changes one
  inner function, not the plan.

Scale notes: mapInPandas streams Arrow batches, so peak memory is one
batch (spark.sql.execution.arrow.maxRecordsPerBatch), not one
partition; binary payloads should be size-bucketed before repartition
so batches stay balanced; metadata-only predicates (width/height/
media_type) are plain columns and prune BEFORE bytes are read when the
table is stored columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_std", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media table from any table with a string column: payload =
    UTF-8 bytes (stand-in for real image bytes), typed metadata columns."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image/png").alias("media_type"),
        payload.alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def _decode_stub(payload: bytes) -> tuple[float, float, int]:
    """Deterministic fake 'decode': byte-level statistics + a 64-bit
    rolling hash. A real implementation would be:
        img = PIL.Image.open(io.BytesIO(payload))   # not in container
    and raise NotImplementedError if the codec is unsupported."""
    if payload is None or len(payload) == 0:
        return 0.0, 0.0, 0
    n = len(payload)
    mean = sum(payload) / n
    var = sum((b - mean) ** 2 for b in payload) / n
    h = 1469598103934665603
    for b in payload[:256]:
        h = ((h ^ b) * 1099511628211) & 0x7FFFFFFFFFFFFFFF
    return float(mean), float(var**0.5), h


def decode_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow batches
    in, Arrow batches out, no row-at-a-time Python UDF."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_mean": [f[0] for f in feats],
                    "feat_std": [f[1] for f in feats],
                    "phash": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def resize_image(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """'Resize' stand-in: stride-sample the payload down to at most
    ``target_bytes`` bytes (a real implementation decodes, resamples
    pixels, re-encodes — PIL's ``Image.resize`` — and changes only the
    inner function). Arrow-batched like the decode; emits the same
    media schema so resized tables flow through every downstream op."""

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                if p is None or len(p) <= target_bytes:
                    out.append(p)
                else:
                    step = -(-len(p) // target_bytes)  # ceil division
                    out.append(bytes(p[::step]))
            pdf = pdf.copy()
            pdf["payload"] = out
            pdf["n_bytes"] = [len(p) if p is not None else 0 for p in out]
            yield pdf

    return media.mapInPandas(shrink, MEDIA_SCHEMA)


EMBED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def embed_media(media: DataFrame, dim: int = 64) -> DataFrame:
    """Media -> embedding bridge: a deterministic stub 'encoder' (an
    L2-normalized hashed byte-bigram histogram — a real encoder would
    run a vision model over the decoded image) producing the
    ``array<float>`` column every similarity/dedup operator consumes:
    ``embedding_dup_pairs``, ``ivf_knn_self_join``, ``lsh_topk``...
    This is the end-to-end multimodal dedup path: attach_payload ->
    [resize_image ->] embed_media -> ANN."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            vecs = []
            for p in pdf["payload"]:
                v = np.zeros(dim, dtype=np.float64)
                if p:
                    a = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                    bigrams = (a[:-1] * 257 + a[1:]) if len(a) > 1 else a
                    np.add.at(v, bigrams % dim, 1.0)
                n = np.linalg.norm(v)
                vecs.append((v / n if n else v).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    return media.mapInPandas(encode, EMBED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload every N bytes (the
    video analogue would sample every Nth frame). Pure built-ins:
    substring over binary stays JVM-side."""
    n_frames = F.floor(F.col("n_bytes") / every_n_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    frames = F.transform(idx, lambda i: F.substring(F.col("payload"), i * every_n_bytes + 1, every_n_bytes))
    return media.select("media_id", F.posexplode(frames).alias("frame_no", "frame_bytes"))


# --- real decode path (PPM) -------------------------------------------------
# P6/PPM is a header + raw RGB bytes: decodable with numpy alone, so THIS
# format gets a real decode/resize/perceptual-hash implementation in this
# container; PNG gets one above (zlib + filter reconstruction); JPEG keeps
# the documented stub until an image lib exists.
# The operators below are the same mapInPandas shape as the stubs — a real
# codec library swaps the parser, not the plan.

PPM_INFO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("gray_mean", T.DoubleType()),
        T.StructField("gray_std", T.DoubleType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def parse_ppm(payload: bytes):
    """Decode a binary P6 PPM: returns (width, height, HxWx3 uint8
    array) or None when the payload is not PPM (caller falls back to
    the stub). Pure numpy; tolerates comments and whitespace runs in
    the header per the netpbm spec."""
    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        return None
    toks: list[bytes] = []
    i, n = 2, len(payload)
    while len(toks) < 3 and i < n:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j > i:
            toks.append(payload[i:j])
        i = j
    if len(toks) < 3:
        return None
    try:
        w, h, maxv = (int(t) for t in toks)
    except ValueError:
        return None  # corrupt header token: not PPM, fall to the stub path
    if maxv > 255 or w <= 0 or h <= 0:
        return None
    i += 1  # exactly one whitespace byte after maxval
    need = w * h * 3
    if len(payload) - i < need:
        return None
    px = np.frombuffer(payload, np.uint8, count=need, offset=i).reshape(h, w, 3)
    return w, h, px


def encode_ppm(px) -> bytes:
    """Re-encode an HxWx3 uint8 array as P6 bytes."""
    h, w = px.shape[0], px.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def _nearest_resize(px, tw: int, th: int):
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return px[ys][:, xs]


def _ahash64(px) -> int:
    """Average-hash: nearest-resize the grayscale to 8x8, bit i is set
    iff cell i is above the 64-cell mean — the classic perceptual hash;
    near-identical images differ in few bits."""
    import numpy as np

    g = px.mean(axis=2)
    g8 = _nearest_resize(g[..., None], 8, 8)[..., 0]
    bits = (g8 > g8.mean()).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b and i < 63:
            v |= 1 << i
        elif b:
            v |= -(1 << 63)  # bit 63 via the sign bit, BIGINT-safe
    return v


# --- real decode path #2 (PNG, stdlib-only) ---------------------------------
# PNG = zlib (stdlib) + per-scanline filter reconstruction (numpy) for
# 8-bit RGB/RGBA, non-interlaced: a REAL second codec, no PIL. The encoder
# below exists so the container can round-trip its own payloads; it can
# apply any of the five PNG filters, which is how the decoder's full
# filter reconstruction gets pixel-exact test coverage.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_filter_line(ftype: int, line, prev, bpp: int):
    """Apply PNG filter ``ftype`` to one raw scanline (encode side)."""
    import numpy as np

    cur = line.astype(np.int32)
    a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
    b = prev.astype(np.int32)
    c = np.concatenate([np.zeros(bpp, np.int32), b[:-bpp]])
    if ftype == 0:
        out = cur
    elif ftype == 1:
        out = cur - a
    elif ftype == 2:
        out = cur - b
    elif ftype == 3:
        out = cur - ((a + b) >> 1)
    else:  # Paeth
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
        out = cur - pred
    return (out & 255).astype(np.uint8)


def encode_png(px, filter_type: int = 0) -> bytes:
    """Encode an HxWx3 (RGB) or HxWx4 (RGBA) uint8 array as 8-bit PNG.
    ``filter_type`` picks the per-scanline filter (0-4) — sub-optimal
    compression is fine; the point is a spec-correct payload that
    exercises the decoder's filter reconstruction."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = px.shape
    color_type = {3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros(w * ch, np.uint8)
    for y in range(h):
        line = px[y].reshape(-1)
        raw.append(filter_type)
        raw += _png_filter_line(filter_type, line, prev, ch).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def parse_png(payload: bytes):
    """Decode an 8-bit RGB/RGBA non-interlaced PNG: signature + chunk
    walk, concatenated-IDAT zlib inflate, then per-scanline filter
    reconstruction (all five filter types; Sub/Average/Paeth are
    sequential within a line, so those lanes run a per-byte loop —
    lines our own encoder emits are filter 0/2 and stay vectorized).
    Returns (width, height, HxWxC uint8) or None when the payload is
    not a PNG this decoder covers (caller falls back to the stub)."""
    import struct
    import zlib

    import numpy as np

    if not payload or not payload.startswith(_PNG_SIG):
        return None
    pos, n = len(_PNG_SIG), len(payload)
    w = h = ch = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if tag == b"IHDR":
            if len(body) != 13:
                return None
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in (2, 6) or comp or filt or interlace:
                return None  # outside the 8-bit RGB/RGBA truecolor subset
            ch = 3 if color == 2 else 4
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None or not idat:
        return None
    try:
        data = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(data) != h * (stride + 1):
        return None
    arr = np.frombuffer(data, np.uint8).reshape(h, stride + 1)
    ftypes, lines = arr[:, 0], arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f, rec = int(ftypes[y]), lines[y].copy()
        if f == 0:
            pass
        elif f == 2:
            rec = (rec + prev) & 255
        elif f == 1:
            for x in range(ch, stride):
                rec[x] = (rec[x] + rec[x - ch]) & 255
        elif f == 3:
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                rec[x] = (rec[x] + ((a + prev[x]) >> 1)) & 255
        elif f == 4:
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 255
        else:
            return None
        out[y] = rec
        prev = rec
    return w, h, out.astype(np.uint8).reshape(h, w, ch)


def decode_png_info(media: DataFrame) -> DataFrame:
    """REAL PNG decode over binary payloads (mapInPandas, Arrow
    batches): dimensions, grayscale statistics over the RGB channels,
    and the same 64-bit average-hash as the PPM path — so PNG payloads
    flow into the identical perceptual-dedup loop. Non-PNG payloads
    are dropped (the stub path handles them)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = parse_png(p)
                if parsed is None:
                    continue
                w, h, px = parsed
                rgb = px[..., :3]
                g = rgb.mean(axis=2)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "gray_mean": float(g.mean()),
                        "gray_std": float(g.std()),
                        "ahash": _ahash64(rgb),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "gray_mean", "gray_std", "ahash"],
            )

    return media.mapInPandas(extract, PPM_INFO_SCHEMA)


def resize_png(media: DataFrame, max_side: int = 32) -> DataFrame:
    """REAL nearest-neighbor resize for PNG payloads: decode, resample
    so the longer side is ``max_side`` (aspect preserved), re-encode.
    Non-PNG payloads pass through untouched; same media schema out."""

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_p, out_n, out_w, out_h = [], [], [], []
            for p, w0, h0 in zip(pdf["payload"], pdf["width"], pdf["height"]):
                parsed = parse_png(p)
                if parsed is None:
                    out_p.append(p)
                    out_n.append(len(p) if p is not None else 0)
                    out_w.append(w0)
                    out_h.append(h0)
                    continue
                w, h, px = parsed
                scale = max(w, h) / max_side
                if scale > 1.0:
                    w, h = max(1, round(w / scale)), max(1, round(h / scale))
                    px = _nearest_resize(px, w, h)
                p = encode_png(px)
                out_p.append(p)
                out_n.append(len(p))
                out_w.append(w)
                out_h.append(h)
            pdf = pdf.copy()
            pdf["payload"] = out_p
            pdf["n_bytes"] = out_n
            pdf["width"] = pd.array(out_w, dtype="Int32")
            pdf["height"] = pd.array(out_h, dtype="Int32")
            yield pdf

    return media.mapInPandas(shrink, MEDIA_SCHEMA)


def decode_ppm_info(media: DataFrame) -> DataFrame:
    """REAL image decode over PPM payloads (mapInPandas, Arrow batches):
    dimensions, grayscale statistics, and a 64-bit average-hash. Rows
    whose payload is not PPM are dropped (the stub path handles them)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = parse_ppm(p)
                if parsed is None:
                    continue
                w, h, px = parsed
                g = px.mean(axis=2)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "gray_mean": float(g.mean()),
                        "gray_std": float(g.std()),
                        "ahash": _ahash64(px),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "gray_mean", "gray_std", "ahash"],
            )

    return media.mapInPandas(extract, PPM_INFO_SCHEMA)


def resize_ppm(media: DataFrame, max_side: int = 32) -> DataFrame:
    """REAL nearest-neighbor resize for PPM payloads: decode, resample
    so the longer side is ``max_side`` (aspect preserved), re-encode.
    Non-PPM payloads pass through untouched. Same media schema out, so
    resized tables flow into every downstream operator."""

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_p, out_n, out_w, out_h = [], [], [], []
            for p, w0, h0 in zip(pdf["payload"], pdf["width"], pdf["height"]):
                parsed = parse_ppm(p)
                if parsed is None:
                    out_p.append(p)
                    out_n.append(len(p) if p is not None else 0)
                    out_w.append(w0)
                    out_h.append(h0)
                    continue
                w, h, px = parsed
                scale = max(w, h) / max_side
                if scale > 1.0:
                    w, h = max(1, round(w / scale)), max(1, round(h / scale))
                    p = encode_ppm(_nearest_resize(px, w, h))
                out_p.append(p)
                out_n.append(len(p))
                # keep the metadata columns true to the new payload
                out_w.append(w)
                out_h.append(h)
            pdf = pdf.copy()
            pdf["payload"] = out_p
            pdf["n_bytes"] = out_n
            pdf["width"] = pd.array(out_w, dtype="Int32")
            pdf["height"] = pd.array(out_h, dtype="Int32")
            yield pdf

    return media.mapInPandas(shrink, MEDIA_SCHEMA)


def _try_decode_jpeg(payload):
    """Decoded (w, h, px) for baseline-JPEG payloads, None otherwise
    (mirrors parse_png's tolerant contract so mixed media tables route
    rows to the right codec path)."""
    from . import jpeg as J

    if payload is None or len(payload) < 2 or bytes(payload[:2]) != b"\xff\xd8":
        return None
    try:
        px = J.decode_jpeg(bytes(payload))
    except (NotImplementedError, ValueError, EOFError):
        return None
    h, w = px.shape[:2]
    return w, h, px


def decode_jpeg_info(media: DataFrame) -> DataFrame:
    """REAL baseline-JPEG decode over binary payloads (mapInPandas,
    Arrow batches): full marker parse, Huffman entropy decode,
    dequantize + IDCT (ops/jpeg.py — pure numpy/stdlib, no libjpeg),
    then the same stats + 64-bit average-hash as the PPM/PNG paths, so
    DCT-compressed payloads flow into the identical perceptual-dedup
    loop. Non-JPEG / unsupported-variant payloads are dropped (the stub
    path handles them)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = _try_decode_jpeg(p)
                if parsed is None:
                    continue
                w, h, px = parsed
                g = px.mean(axis=2)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "gray_mean": float(g.mean()),
                        "gray_std": float(g.std()),
                        "ahash": _ahash64(px),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "gray_mean", "gray_std", "ahash"],
            )

    return media.mapInPandas(extract, PPM_INFO_SCHEMA)


def resize_jpeg(media: DataFrame, max_side: int = 32, quality: int = 95) -> DataFrame:
    """REAL resize for JPEG payloads: decode, nearest-neighbor resample
    so the longer side is ``max_side``, re-encode at ``quality`` —
    decode + transform + re-encode through an actual DCT codec, the
    thumbnailing shape of a multimodal ingest pipeline. Non-JPEG
    payloads pass through untouched."""
    from . import jpeg as J

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_p, out_n, out_w, out_h = [], [], [], []
            for p, w0, h0 in zip(pdf["payload"], pdf["width"], pdf["height"]):
                parsed = _try_decode_jpeg(p)
                if parsed is None:
                    out_p.append(p)
                    out_n.append(len(p) if p is not None else 0)
                    out_w.append(w0)
                    out_h.append(h0)
                    continue
                w, h, px = parsed
                scale = max(w, h) / max_side
                if scale > 1.0:
                    w, h = max(1, round(w / scale)), max(1, round(h / scale))
                    px = _nearest_resize(px, w, h)
                p = J.encode_jpeg(px, quality)
                out_p.append(p)
                out_n.append(len(p))
                out_w.append(w)
                out_h.append(h)
            pdf = pdf.copy()
            pdf["payload"] = out_p
            pdf["n_bytes"] = out_n
            pdf["width"] = pd.array(out_w, dtype="Int32")
            pdf["height"] = pd.array(out_h, dtype="Int32")
            yield pdf

    return media.mapInPandas(shrink, MEDIA_SCHEMA)


# --- real decode path #4 (GIF, stdlib/numpy LZW) ---------------------------
# GIF = palette + variable-width LZW (ops/gif.py): the third compressed
# lane after PNG's zlib and JPEG's DCT. Same mapInPandas shapes, same
# perceptual-dedup loop.


def _try_decode_gif(payload):
    """Decoded (w, h, px) for GIF payloads, None otherwise (the
    tolerant parse_png/_try_decode_jpeg contract)."""
    from . import gif as G

    if payload is None or len(payload) < 6 or bytes(payload[:3]) != b"GIF":
        return None
    try:
        px = G.decode_gif(bytes(payload))
    except (NotImplementedError, ValueError):
        return None
    h, w = px.shape[:2]
    return w, h, px


def decode_gif_info(media: DataFrame) -> DataFrame:
    """REAL GIF decode over binary payloads (mapInPandas, Arrow
    batches): dimensions, grayscale stats, the shared 64-bit
    average-hash — GIF payloads flow into the identical perceptual-
    dedup loop as PPM/PNG/JPEG. Non-GIF payloads are dropped."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = _try_decode_gif(p)
                if parsed is None:
                    continue
                w, h, px = parsed
                g = px.mean(axis=2)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "gray_mean": float(g.mean()),
                        "gray_std": float(g.std()),
                        "ahash": _ahash64(px),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "gray_mean", "gray_std", "ahash"],
            )

    return media.mapInPandas(extract, PPM_INFO_SCHEMA)


def resize_gif(media: DataFrame, max_side: int = 32) -> DataFrame:
    """REAL nearest-neighbor resize for GIF payloads: decode, resample,
    re-encode (nearest sampling only selects existing pixels, so the
    result stays within the source palette and always re-encodes).
    Non-GIF payloads pass through untouched."""
    from . import gif as G

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_p, out_n, out_w, out_h = [], [], [], []
            for p, w0, h0 in zip(pdf["payload"], pdf["width"], pdf["height"]):
                parsed = _try_decode_gif(p)
                if parsed is None:
                    out_p.append(p)
                    out_n.append(len(p) if p is not None else 0)
                    out_w.append(w0)
                    out_h.append(h0)
                    continue
                w, h, px = parsed
                scale = max(w, h) / max_side
                if scale > 1.0:
                    w, h = max(1, round(w / scale)), max(1, round(h / scale))
                    px = _nearest_resize(px, w, h)
                p = G.encode_gif(px)
                out_p.append(p)
                out_n.append(len(p))
                out_w.append(w)
                out_h.append(h)
            pdf = pdf.copy()
            pdf["payload"] = out_p
            pdf["n_bytes"] = out_n
            pdf["width"] = pd.array(out_w, dtype="Int32")
            pdf["height"] = pd.array(out_h, dtype="Int32")
            yield pdf

    return media.mapInPandas(shrink, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# video tier: a minimal motion-JPEG container, so FRAME SAMPLING — the
# video-pipeline primitive — runs against real codec work end to end.
# Layout: b"MJPG" | u32 n_frames | u32 fps_milli | n x u32 frame size |
# concatenated baseline-JPEG frames. (Real containers — MP4/AVI — add
# audio muxing and inter-frame codecs; the honest stub for those
# remains decode_image_features. The per-frame work here is the REAL
# ops/jpeg.py decoder.)
# ---------------------------------------------------------------------------

_MJPG_MAGIC = b"MJPG"


def encode_mjpeg(frames: list, fps: float = 4.0) -> bytes:
    """Container bytes for a list of (h, w, 3) uint8 RGB frames, each
    stored as a quality-95 baseline JPEG."""
    import struct as _struct

    from . import jpeg as J

    blobs = [J.encode_jpeg(f, 95) for f in frames]
    out = bytearray(_MJPG_MAGIC)
    out += _struct.pack("<II", len(blobs), int(round(fps * 1000)))
    for b in blobs:
        out += _struct.pack("<I", len(b))
    for b in blobs:
        out += b
    return bytes(out)


def parse_mjpeg(payload):
    """(fps, [frame bytes]) for MJPG payloads, None otherwise."""
    import struct as _struct

    if payload is None:
        return None
    b = bytes(payload)
    if len(b) < 12 or b[:4] != _MJPG_MAGIC:
        return None
    n, fps_milli = _struct.unpack("<II", b[4:12])
    sizes = []
    pos = 12
    for _ in range(n):
        if pos + 4 > len(b):
            return None
        (sz,) = _struct.unpack("<I", b[pos : pos + 4])
        sizes.append(sz)
        pos += 4
    frames = []
    for sz in sizes:
        if pos + sz > len(b):
            return None
        frames.append(b[pos : pos + sz])
        pos += sz
    return fps_milli / 1000.0, frames


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def sample_video_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """FRAME SAMPLING over video payloads (mapInPandas): parse the
    container index, decode ONLY every ``every_n``-th frame (the index
    makes skipped frames free — the same reason real pipelines sample
    on keyframes), and emit per-frame timestamps + perceptual hashes.
    Dispatches on the container magic: MJPG frames go through the real
    JPEG decoder, YUV4MPEG2 frames through the raw-planar y4m decoder,
    RIFF-AVI frames through the uncompressed-DIB decoder — one frame
    table regardless of lane, which is what video dedup and shot
    detection aggregate. One input row fans out to
    ceil(n_frames / every_n) rows."""
    from . import jpeg as J

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mj = parse_mjpeg(p)
                if mj is not None:
                    fps, frames = mj

                    def dec(fr):
                        return J.decode_jpeg(fr)

                elif (y4 := parse_y4m(p)) is not None:
                    w4, h4, fps, cs, frames = y4

                    def dec(fr):
                        return decode_y4m_frame(fr, w4, h4, cs)

                else:
                    av = parse_avi(p)
                    if av is None:
                        continue
                    wa, ha, fps, frames = av

                    def dec(fr):
                        return decode_avi_frame(fr, wa, ha)

                for idx in range(0, len(frames), every_n):
                    try:
                        px = dec(frames[idx])
                    except (NotImplementedError, ValueError, EOFError):
                        continue
                    h, w = px.shape[:2]
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": idx,
                            "ts_ms": idx * 1000.0 / fps if fps else 0.0,
                            "width": w,
                            "height": h,
                            "ahash": _ahash64(px),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "ts_ms", "width", "height", "ahash"],
            )

    return media.mapInPandas(extract, VIDEO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) tier: the standard UNCOMPRESSED video interchange
# container — what ffmpeg pipes between pipeline stages — parsed from
# scratch with stdlib bytes only, frames decoded to RGB through the same
# BT.601 math as the JPEG tier (ops/jpeg.ycbcr_to_rgb). This retires the
# "inter-frame video" gap the honest way: production samplers never
# touch inter-frame codec state — the transcode boundary (H.264 -> y4m/
# raw) exists precisely so downstream frame ops see independent frames —
# and this is that downstream contract, for real. The inter-frame codecs
# THEMSELVES (H.264/VP9) stay env-blocked (no ffmpeg in this container)
# and keep raising through decode_image_features.
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def _y4m_plane_sizes(w: int, h: int, colorspace: str):
    """(luma_bytes, chroma_bytes_per_plane, chroma_w, chroma_h)."""
    if colorspace == "Cmono":
        return w * h, 0, 0, 0
    if colorspace == "C444":
        return w * h, w * h, w, h
    if colorspace in ("C420", "C420jpeg", "C420paldv", "C420mpeg2"):
        # Explicit allowlist of the 8-bit 4:2:0 variants only: ffmpeg's
        # high-bit-depth tags share the prefix (C420p10, C420p16) but carry
        # 2 bytes/sample — prefix-matching them here would missize every
        # plane and silently drop (or garbage-slice) the clip.
        cw, ch = (w + 1) // 2, (h + 1) // 2
        return w * h, cw * ch, cw, ch
    raise NotImplementedError(f"y4m colorspace {colorspace!r} not supported")


def encode_y4m(frames: list, fps: float = 4.0, colorspace: str = "C444") -> bytes:
    """YUV4MPEG2 container for a list of frames: (h, w, 3) uint8 RGB for
    C444/C420jpeg (forward BT.601, chroma 2x2-mean subsampled for 420 —
    even dimensions required there), or (h, w) uint8 gray for Cmono
    (lossless: the Y plane IS the image)."""
    import numpy as np

    from . import jpeg as J

    if not frames:
        raise ValueError("encode_y4m: no frames")
    f0 = np.asarray(frames[0])
    h, w = f0.shape[:2]
    if colorspace.startswith("C420") and (w % 2 or h % 2):
        raise ValueError("encode_y4m: C420 needs even dimensions")
    num = int(round(fps * 1000))
    head = (
        _Y4M_MAGIC
        + f" W{w} H{h} F{num}:1000 Ip A1:1 {colorspace}\n".encode()
    )
    out = bytearray(head)
    for fr in frames:
        px = np.asarray(fr, dtype=np.uint8)
        if px.shape[:2] != (h, w):
            raise ValueError("encode_y4m: inconsistent frame shapes")
        out += b"FRAME\n"
        if colorspace == "Cmono":
            if px.ndim != 2:
                raise ValueError("encode_y4m: Cmono takes (h, w) gray frames")
            out += px.tobytes()
            continue
        yc = J.rgb_to_ycbcr(px)
        y = np.clip(np.round(yc[..., 0]), 0, 255).astype(np.uint8)
        out += y.tobytes()
        for c in (1, 2):
            ch = yc[..., c]
            if colorspace.startswith("C420"):
                ch = (
                    ch.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
                )
            out += np.clip(np.round(ch), 0, 255).astype(np.uint8).tobytes()
    return bytes(out)


def parse_y4m(payload):
    """(width, height, fps, colorspace, [frame plane bytes]) for
    YUV4MPEG2 payloads, None otherwise. Per-frame FRAME parameter tags
    are tolerated; interlacing/extension tags are ignored (frame data
    layout is planar either way)."""
    if payload is None:
        return None
    b = bytes(payload)
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(_Y4M_MAGIC + b" "):
        return None
    w = h = None
    fps = 0.0
    colorspace = "C420jpeg"  # the spec default when C is absent
    # A malformed header (non-numeric W/H/F) or an unsupported
    # colorspace must yield None, not an exception: this parser runs
    # inside mapInPandas, where one bad payload must never kill the
    # task (the same contract parse_mjpeg honors).
    try:
        for tag in b[len(_Y4M_MAGIC) + 1 : nl].split(b" "):
            if not tag:
                continue
            k, v = tag[:1], tag[1:]
            if k == b"W":
                w = int(v)
            elif k == b"H":
                h = int(v)
            elif k == b"F":
                num, _, den = v.partition(b":")
                fps = int(num) / max(int(den or b"1"), 1)
            elif k == b"C":
                colorspace = tag.decode("ascii", "replace")
        # negative dims would make fsize negative and the FRAME loop
        # below spin forever on the same offset — reject, don't hang
        if not w or not h or w < 0 or h < 0:
            return None
        ly, lc, _, _ = _y4m_plane_sizes(w, h, colorspace)
    except (ValueError, NotImplementedError):
        return None
    fsize = ly + 2 * lc
    frames = []
    pos = nl + 1
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if fnl < 0 or b[pos : pos + 5] != b"FRAME":
            return None
        pos = fnl + 1
        if pos + fsize > len(b):
            return None
        frames.append(b[pos : pos + fsize])
        pos += fsize
    return w, h, fps, colorspace, frames


def decode_y4m_frame(fr: bytes, w: int, h: int, colorspace: str) -> np.ndarray:
    """(h, w, 3) uint8 RGB from one planar y4m frame: Cmono replicates
    luma, C444 converts per-pixel, C420* nearest-neighbor-upsamples the
    half-res chroma (the sampler's perceptual hash is chroma-coarse
    anyway — the same trade real thumbnailers make)."""
    import numpy as np

    from . import jpeg as J

    ly, lc, cw, ch = _y4m_plane_sizes(w, h, colorspace)
    y = np.frombuffer(fr[:ly], dtype=np.uint8).reshape(h, w).astype(np.float64)
    if colorspace == "Cmono":
        g = y.astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    u = np.frombuffer(fr[ly : ly + lc], dtype=np.uint8).reshape(ch, cw)
    v = np.frombuffer(fr[ly + lc : ly + 2 * lc], dtype=np.uint8).reshape(ch, cw)
    if colorspace.startswith("C420"):
        u = u.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
        v = v.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
    return J.ycbcr_to_rgb(
        np.stack([y, u.astype(np.float64), v.astype(np.float64)], axis=2)
    )


# ---------------------------------------------------------------------------
# AVI (RIFF) tier: the third stdlib-feasible video container — classic
# uncompressed AVI (BI_RGB 24-bit DIB frames in '00db' chunks), the
# format every capture tool and VirtualDub-era pipeline emits, parsed
# from scratch with stdlib bytes only. Together with MJPEG (per-frame
# DCT) and Y4M (raw planar YUV) this makes the sampler genuinely
# container-agnostic across the three uncompressed/intra-frame lanes.
# Compressed-stream AVIs (biCompression != 0, e.g. XVID) are honestly
# out of scope: the parser returns None for them (same skip-don't-kill
# contract as the other lanes — the codec itself is env-blocked).
# Reference behavior: giabaovo/real-estate-data-pipeline's media ingestion treats video
# as opaque bytes + metadata; the frame ops are this repo's extension.
# ---------------------------------------------------------------------------

_RIFF_MAGIC = b"RIFF"


def _avi_row_stride(w: int) -> int:
    """DIB rows pad to 4-byte boundaries."""
    return (w * 3 + 3) & ~3


def encode_avi(frames: list, fps: float = 4.0) -> bytes:
    """Minimal uncompressed AVI: RIFF('AVI ') { LIST(hdrl){avih,
    LIST(strl){strh,strf}}, LIST(movi){'00db' DIB frames} }. Frames are
    (h, w, 3) uint8 RGB, stored bottom-up BGR with 4-byte row padding
    (the BITMAPINFOHEADER contract)."""
    import struct as _struct

    import numpy as np

    if not frames:
        raise ValueError("encode_avi: no frames")
    f0 = np.asarray(frames[0])
    h, w = f0.shape[:2]
    stride = _avi_row_stride(w)
    fsize = stride * h
    usec = int(round(1_000_000 / fps)) if fps else 0

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + _struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = _struct.pack(
        "<14I",
        usec, fsize * int(round(fps)) if fps else 0, 0, 0x10,  # HASINDEX-less, flags
        len(frames), 0, 1, fsize, w, h, 0, 0, 0, 0,
    )
    strh = _struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1000, int(round(fps * 1000)),  # scale / rate
        0, len(frames), fsize, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fsize, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = bytearray(b"movi")
    for fr in frames:
        px = np.asarray(fr, dtype=np.uint8)
        if px.shape[:2] != (h, w):
            raise ValueError("encode_avi: inconsistent frame shapes")
        bgr = px[::-1, :, ::-1]  # bottom-up rows, BGR channel order
        if stride == w * 3:
            body = bgr.tobytes()
        else:
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
            body = rows.tobytes()
        movi_body += chunk(b"00db", body)
    riff_body = b"AVI " + hdrl + chunk(b"LIST", bytes(movi_body))
    return _RIFF_MAGIC + _struct.pack("<I", len(riff_body)) + riff_body


def parse_avi(payload):
    """(width, height, fps, [frame DIB bytes]) for uncompressed 24-bit
    RIFF-AVI payloads, None otherwise (malformed, compressed, or
    non-24-bit — the skip-don't-kill mapInPandas contract). Chunk walk
    honors RIFF even-byte padding; dimensions and sizes are bounds-
    checked so a hostile header can neither hang the walk nor slice
    garbage."""
    import struct as _struct

    if payload is None:
        return None
    b = bytes(payload)
    if len(b) < 12 or b[:4] != _RIFF_MAGIC or b[8:12] != b"AVI ":
        return None

    def walk(pos: int, end: int):
        """Yield (fourcc, body_start, body_len) at one nesting level."""
        while pos + 8 <= end:
            fourcc = b[pos : pos + 4]
            (size,) = _struct.unpack("<I", b[pos + 4 : pos + 8])
            body = pos + 8
            if size > end - body:  # truncated/hostile size: stop, don't slice
                return
            yield fourcc, body, size
            pos = body + size + (size % 2)  # RIFF pads chunks to even

    w = h = None
    fps = 0.0
    bitcount = compression = None
    strf_w = strf_h = None  # vids BITMAPINFOHEADER dims, checked vs avih
    vids_idx = None  # the video stream's ORDINAL among the strl lists
    strl_ordinal = 0
    movi_chunks = []  # (fourcc, body bytes) — filtered by stream id below
    try:
        for fourcc, body, size in walk(12, len(b)):
            if fourcc != b"LIST":
                continue
            kind = b[body : body + 4]
            if kind == b"hdrl":
                for f2, b2, s2 in walk(body + 4, body + size):
                    if f2 == b"avih" and s2 >= 40:
                        usec, _, _, _, _, _, _, _, aw, ah = _struct.unpack(
                            "<10I", b[b2 : b2 + 40]
                        )
                        w, h = aw, ah
                        fps = 1_000_000 / usec if usec else 0.0
                    elif f2 == b"LIST" and b[b2 : b2 + 4] == b"strl":
                        # read strf ONLY from the 'vids' stream's strl,
                        # and REMEMBER ITS ORDINAL: movi chunk ids carry
                        # the stream index ('01db' when an audio strl
                        # precedes the video one), so both the format
                        # header and the data chunks must come from the
                        # same stream. An audio strf is a WAVEFORMATEX —
                        # parsing it as a BITMAPINFOHEADER would
                        # overwrite the video format (review findings,
                        # passes 1 AND 2).
                        is_vids = False
                        for f3, b3, s3 in walk(b2 + 4, b2 + s2):
                            if f3 == b"strh" and s3 >= 4:
                                is_vids = b[b3 : b3 + 4] == b"vids"
                            elif (
                                f3 == b"strf"
                                and s3 >= 40
                                and is_vids
                                and vids_idx is None
                            ):
                                (_, bw, bh, _, bc, comp) = _struct.unpack(
                                    "<IiiHHI", b[b3 : b3 + 20]
                                )
                                bitcount, compression = bc, comp
                                strf_w, strf_h = bw, bh
                                vids_idx = strl_ordinal
                        strl_ordinal += 1
            elif kind == b"movi":
                # hdrl precedes movi in every conformant file, so the
                # vids ordinal is known here and other streams' (audio,
                # secondary video) chunk bodies are skipped WITHOUT
                # slicing; the collect-all path only runs for the
                # nonconformant movi-first layout. Interleaved files
                # wrap data chunks in one level of 'LIST rec ' sublists
                # (the MSDN layout) — descend into those too.
                vprefix = None if vids_idx is None else b"%02d" % vids_idx

                def _collect(pos, end, depth):
                    # depth-bounded: the spec allows exactly ONE level
                    # of rec nesting, and an unbounded descent would let
                    # a hostile rec-in-rec-in-... file blow the Python
                    # stack inside mapInPandas (RecursionError is not a
                    # struct.error — it would kill the task)
                    for f2, b2, s2 in walk(pos, end):
                        if f2 == b"LIST" and b[b2 : b2 + 4] == b"rec ":
                            if depth == 0:
                                _collect(b2 + 4, b2 + s2, 1)
                        elif f2[2:4] in (b"db", b"dc") and f2[:2].isdigit():
                            if vprefix is not None and f2[:2] != vprefix:
                                continue
                            movi_chunks.append((f2, b[b2 : b2 + s2]))

                _collect(body + 4, body + size, 0)
    except _struct.error:
        return None
    if not w or not h or w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        return None
    if vids_idx is None or bitcount != 24 or compression != 0:
        return None  # compressed / non-RGB24 / headerless: unsupported
    if strf_w != w or strf_h != h:
        # decode_avi_frame assumes a BOTTOM-UP DIB whose dims match the
        # avih dims used for fsize. A top-down DIB (negative biHeight)
        # would pass every other check and decode vertically flipped —
        # silently corrupting ahash dedup — and mismatched strf/avih dims
        # would mis-stride rows. Skip, don't kill (advice r10).
        return None
    prefix = b"%02d" % vids_idx
    frames = [body for fourcc, body in movi_chunks if fourcc[:2] == prefix]
    fsize = _avi_row_stride(w) * h
    if any(len(fr) != fsize for fr in frames):
        return None
    return w, h, fps, frames


def decode_avi_frame(fr: bytes, w: int, h: int):
    """(h, w, 3) uint8 RGB from one bottom-up BGR DIB frame body."""
    import numpy as np

    stride = _avi_row_stride(w)
    rows = np.frombuffer(fr, dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()
