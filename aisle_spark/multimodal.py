"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partitioning, Arrow batch shapes,
vectorized UDF signatures — while the actual media decode is stubbed behind
an import gate (this container ships no image/audio libraries): with PIL/
soundfile absent, `decode_media` raises NotImplementedError and
`extract_features` substitutes a DETERMINISTIC fake embedding derived from
the payload bytes (seeded per item, stable across runs/parallelism), so the
distributed pipeline around the stub is fully exercised and testable.

Media table schema:
  media_id  string
  kind      string  (image | audio)
  payload   binary  (opaque encoded bytes)
  width, height, sample_rate, n_frames  int  (typed metadata)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_DIM = 32


def synth_media_df(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(0).to_numpy()
            if ids.size == 0:
                continue
            rng = np.random.default_rng([seed, int(ids[0])])
            kinds = np.where(ids % 3 == 0, "audio", "image")
            sizes = rng.integers(256, 4096, ids.size)
            payloads = [rng.bytes(int(s)) for s in sizes]  # opaque blobs
            yield pa.record_batch(
                {
                    "media_id": pa.array([f"m-{i:010d}" for i in ids.tolist()]),
                    "kind": pa.array(kinds.tolist()),
                    "payload": pa.array(payloads, type=pa.binary()),
                    "width": pa.array((64 + ids % 512).astype("int32")),
                    "height": pa.array((64 + ids % 256).astype("int32")),
                    "sample_rate": pa.array(
                        np.where(kinds == "audio", 16000, 0).astype("int32")
                    ),
                    "n_frames": pa.array((1 + ids % 16).astype("int32")),
                }
            )

    return spark.range(0, n_rows, 1, max(4, n_rows // 25000)).mapInArrow(
        gen, MEDIA_SCHEMA
    )


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_media(payload: bytes, kind: str):
    """Real decode — STUB: the container has no media libraries installed.
    The call signature and the distributed plumbing around it are final."""
    if kind == "image" and _have_pil():  # pragma: no cover - env-dependent
        import io

        from PIL import Image

        return Image.open(io.BytesIO(payload))
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires PIL/soundfile, "
        "not available in this environment (deterministic fake features "
        "are used instead — see extract_features)"
    )


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in for a vision/audio encoder: features seeded
    from a stable digest of each payload. Vectorized per Arrow batch."""
    import zlib

    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, p in enumerate(payloads):  # per-ITEM loop over opaque blobs
        rng = np.random.default_rng(zlib.crc32(p))
        out[i] = rng.standard_normal(FEATURE_DIM).astype(np.float32)
    return out


def extract_features(df: DataFrame) -> DataFrame:
    """media table -> (media_id, kind, feature array<float>): mapInPandas
    with Arrow-bounded batches; swaps to the real encoder when available."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = _fake_features(b["payload"])
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "feature": list(feats),
                }
            )

    return df.mapInPandas(run, "media_id string, kind string, feature array<float>")


def frame_sample(df: DataFrame, every: int = 4) -> DataFrame:
    """Frame-sampling plumbing: explode per-media frame indices (metadata-
    driven; the frame DECODE itself is the stubbed step). Pure built-ins."""
    from pyspark.sql import functions as F

    return df.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every))
        ).alias("frame_idx"),
    )
