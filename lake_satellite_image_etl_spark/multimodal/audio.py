"""Opaque audio columns (SURVEY.md §2.10 EXT multimodal): binary
waveforms + typed metadata, with frame/feature kernels over
``mapInPandas`` — the audio leg of the multimodal surface.

Real codecs (mp3/flac/ffmpeg) are absent by design; the deterministic
``FWAV`` container (int16 PCM) stands in, keeping the Spark plumbing
real: schema, Arrow batching, framing math, per-clip feature
extraction.

FWAV layout (little-endian): magic ``FWAV`` | uint32 n_samples |
uint16 sample_rate | payload int16[n_samples].
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query

MAGIC = b"FWAV"
HEADER = struct.Struct("<4sIH")
FRAME = 256  # samples per analysis frame


def encode_fwav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    return HEADER.pack(MAGIC, len(samples), sample_rate) + samples.astype(
        "<i2"
    ).tobytes()


def decode_fwav(blob: bytes) -> tuple[np.ndarray, int]:
    magic, n, sr = HEADER.unpack_from(blob)
    if magic != MAGIC:
        raise ValueError("not a FWAV blob")
    return np.frombuffer(blob, dtype="<i2", offset=HEADER.size, count=n), sr


def decode_standard_audio(blob: bytes):  # pragma: no cover
    """Decode mp3/flac/wav — requires an audio lib, absent here."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "audio codecs unavailable; use the FWAV container"
        ) from exc
    raise NotImplementedError


def synth_fwav(entity_id: int, n_samples: int = 2048) -> bytes:
    """Deterministic int16 waveform: integer-recurrence 'chirp' (no
    float RNG), amplitude bounded well inside int16."""
    t = np.arange(n_samples, dtype=np.int64)
    wave = ((entity_id * 37 + t * (t + 3)) % 2000) - 1000
    return encode_fwav(wave.astype(np.int16))


AUDIO_FEATURE_SCHEMA = (
    "entity_id long, n_samples long, sample_rate int, n_frames int, "
    "duration_ms double, rms_mean double, rms_max double, zcr_mean double"
)


def audio_features(clips: DataFrame) -> DataFrame:
    """Per-clip frame features: RMS per 256-sample frame (mean/max)
    and zero-crossing rate — the framing+aggregate stage every audio
    pipeline starts with, with the codec swapped for FWAV."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                wave, sr = decode_fwav(r["audio"])
                n = len(wave)
                n_frames = n // FRAME
                framed = (
                    wave[: n_frames * FRAME].astype(np.float64).reshape(
                        n_frames, FRAME
                    )
                )
                rms = np.sqrt((framed**2).mean(axis=1))
                zc = (np.diff(np.signbit(framed), axis=1) != 0).mean(axis=1)
                rows.append(
                    (
                        int(r["entity_id"]),
                        n,
                        sr,
                        n_frames,
                        round(1000.0 * n / sr, 3),
                        round(float(rms.mean()), 6),
                        round(float(rms.max()), 6),
                        round(float(zc.mean()), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "entity_id", "n_samples", "sample_rate", "n_frames",
                    "duration_ms", "rms_mean", "rms_max", "zcr_mean",
                ],
            )

    return clips.mapInPandas(feats, schema=AUDIO_FEATURE_SCHEMA)


@query("multimodal_audio_features")  # rows-only: pandas-UDF kernel path
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize one clip per supplier row (bounded to 40), frame,
    and feature-extract. Rows-only; values golden-tested in
    tests/test_raster.py."""
    ids = (
        read_table(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").cast("long").alias("entity_id"))
        .filter(F.col("entity_id") <= 40)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "entity_id": pdf["entity_id"].astype("int64"),
                    "audio": [synth_fwav(int(e)) for e in pdf["entity_id"]],
                }
            )

    clips = ids.mapInPandas(gen, schema="entity_id long, audio binary")
    return audio_features(clips).orderBy("entity_id")
