"""Audio modality with a REAL codec: RIFF/WAVE PCM16 in pure
stdlib/numpy (struct + int16 arrays — no soundfile/ffmpeg). PCM is
lossless integer data, which buys something the image codecs can't:
the feature path is VALUE-ORACLE-ABLE — a SQL engine can recompute the
features of an analytically-defined waveform without ever touching the
bytes, while the Spark side can only reproduce them by genuinely
encoding and decoding the payload (see queries.mm_wav_feature_oracle).

Scope: PCM (format tag 1), 16-bit, mono or stereo. Anything else —
float WAV, 8/24-bit, ADPCM, extensible — returns None from
``parse_wav`` (the tolerant mixed-media contract shared with
parse_png) so unsupported payloads route to the stub path instead of
decoding wrong.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

WAV_INFO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("afp", T.LongType()),
    ]
)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE bytes for a mono int16 sample array. Deterministic."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects a 1-D int16 array")
    data = samples.tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def parse_wav(payload) -> tuple[int, np.ndarray] | None:
    """(sample_rate, mono int16 samples) for PCM16 WAV payloads, None
    otherwise. Stereo is averaged to mono with integer floor division
    (deterministic). Walks RIFF chunks, so extra chunks (LIST, fact)
    are tolerated."""
    if payload is None:
        return None
    b = bytes(payload)
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits != 16 or n_ch not in (1, 2):
        return None  # not PCM16 mono/stereo -> unsupported, not wrong
    samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    if n_ch == 2:
        samples = samples[: len(samples) // 2 * 2].reshape(-1, 2)
        samples = (
            (samples[:, 0].astype(np.int32) + samples[:, 1].astype(np.int32)) // 2
        ).astype(np.int16)
    return int(rate), samples.astype(np.int16)


def _round6(x: float) -> float:
    """HALF_UP (away from zero) 6-dp rounding — matches Spark F.round
    and DuckDB round(); python's built-in round() is banker's and would
    diverge on exact .5 micro boundaries."""
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def wav_features(rate: int, samples: np.ndarray) -> dict:
    """Integer-exact features of a PCM16 signal: RMS from an exact int64
    sum of squares (sqrt + 6-dp round — the cross-engine float
    convention), zero-crossing count (strict sign products < 0), and a
    frame-energy-delta fingerprint (the Shazam-style shape: 1 bit per
    adjacent frame-energy comparison over up to 64 frames = 63
    comparison bits, always a non-negative int64 with no lossy
    masking)."""
    n = int(samples.size)
    s = samples.astype(np.int64)
    if n == 0:
        return {
            "sample_rate": rate, "n_samples": 0, "duration_ms": 0.0,
            "rms": 0.0, "zero_crossings": 0, "afp": 0,
        }
    sumsq = int((s * s).sum())
    rms = _round6(float(np.sqrt(sumsq / n)))
    zc = int(((s[:-1] * s[1:]) < 0).sum())
    frames = np.array_split(s, min(64, n))
    energies = [int((f.astype(np.int64) ** 2).sum()) for f in frames]
    afp = 0
    for a, b in zip(energies, energies[1:]):
        afp = (afp << 1) | (1 if b > a else 0)
    return {
        "sample_rate": rate,
        "n_samples": n,
        "duration_ms": _round6(n * 1000.0 / rate),
        "rms": rms,
        "zero_crossings": zc,
        "afp": afp,
    }


def decode_wav_info(media: DataFrame) -> DataFrame:
    """REAL audio decode over binary payloads (mapInPandas, Arrow
    batches): RIFF parse + PCM16 samples -> duration, integer-exact
    RMS, zero-crossing count, frame-energy fingerprint. Non-WAV /
    unsupported payloads are dropped (the stub path handles them)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = parse_wav(p)
                if parsed is None:
                    continue
                rate, samples = parsed
                rows.append({"media_id": mid, **wav_features(rate, samples)})
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_ms",
                    "rms", "zero_crossings", "afp",
                ],
            )

    return media.mapInPandas(extract, WAV_INFO_SCHEMA)


def resample_wav(media: DataFrame, target_rate: int = 4000) -> DataFrame:
    """Naive nearest-index resample (decode -> index map -> re-encode):
    the deterministic down/up-sampling pass an audio ingest pipeline
    runs before feature extraction. Non-WAV payloads pass through."""
    from .multimodal import MEDIA_SCHEMA

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_p, out_n = [], []
            for p in pdf["payload"]:
                parsed = parse_wav(p)
                if parsed is None:
                    out_p.append(p)
                    out_n.append(len(p) if p is not None else 0)
                    continue
                rate, samples = parsed
                n_out = max(1, int(round(samples.size * target_rate / rate)))
                idx = np.minimum(
                    (np.arange(n_out) * rate) // target_rate, samples.size - 1
                )
                res = samples[idx.astype(np.int64)]
                p2 = encode_wav(res.astype(np.int16), target_rate)
                out_p.append(p2)
                out_n.append(len(p2))
            pdf = pdf.copy()
            pdf["payload"] = out_p
            pdf["n_bytes"] = out_n
            yield pdf

    return media.mapInPandas(shrink, MEDIA_SCHEMA)
