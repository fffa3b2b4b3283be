"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Engine extension family. Images/audio/video are opaque `binary`
columns with typed metadata alongside; the Spark-side machinery that
matters at 100 TB is real and tested here:

- schema: (id, payload binary, modality string, n_bytes, ...);
- metadata extraction as native expressions (length, header bytes);
- feature extraction over Arrow batches with mapInPandas — the pattern
  every decode/resize/embed stage uses: iterator of pandas frames in,
  iterator of frames out, no row-at-a-time Python;
- decode itself is STUBBED: the container ships no image/audio codecs,
  so `decode_image` raises NotImplementedError and callers opt into
  `fake_decode` (a deterministic seeded byte grid) to exercise the
  plumbing end-to-end.

The testdata has no binary table, so payloads derive deterministically
from `documents.text` (utf-8 encode) — both engines derive the same
bytes, which keeps the metadata query oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hgn_spark.catalog import load_table
from hgn_spark.registry import register


def binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, modality) — the standard
    multimodal table shape. Repartitioned so downstream mapInPandas
    batches run on every core (the table is a single parquet file)."""
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(max(spark.sparkContext.defaultParallelism, 8))
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/utf-8").alias("modality"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — unavailable in this container (no PIL/cv2).

    A deployment would swap this for PIL.Image.open(io.BytesIO(payload))
    inside the same mapInPandas batch loop; the stub keeps the call
    site honest instead of silently faking."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "use fake_decode for deterministic plumbing tests"
    )


def fake_decode(payload: bytes, height: int = 8, width: int = 8) -> list[int]:
    """Deterministic stand-in decoder: tiles the payload bytes into an
    h×w grid (row-major). Same input → same 'pixels', so tests are
    reproducible without codecs."""
    if not payload:
        return [0] * (height * width)
    n = height * width
    return [payload[i % len(payload)] for i in range(n)]


def byte_histogram_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-payload byte-distribution features via mapInPandas.

    The Arrow-batched shape every multimodal feature extractor uses:
    each batch is a pandas frame; numpy does the per-payload work;
    output schema is declared up front. Partition-parallel, no shuffle.
    """
    import numpy as np

    out_schema = (
        "doc_id long, n_bytes int, n_distinct_bytes int, top_bin int, "
        f"hist array<int>"
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload or b"", dtype=np.uint8)
                hist = np.bincount(b // (256 // n_bins), minlength=n_bins)[:n_bins]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": int(b.size),
                        "n_distinct_bytes": int(np.unique(b).size),
                        "top_bin": int(hist.argmax()),
                        "hist": [int(x) for x in hist],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(_extract, schema=out_schema)


def sample_frames(df: DataFrame, every_nth: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: split each
    payload into fixed-size 'frames', keep every nth — native slice
    expressions, one row per kept frame."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(
                (F.length("payload") - 1) / frame_bytes, F.lit(0)
            ).cast("int"),
        ),
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(F.col("payload"), i * frame_bytes + 1, frame_bytes).alias(
                "frame"
            ),
        ),
    )
    return (
        df.select("doc_id", F.explode(frames).alias("f"))
        .select("doc_id", F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame").alias("frame"))
        .filter(F.col("frame_idx") % every_nth == 0)
    )


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           substring(text, 1, 4) AS head
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads as native expressions —
    the query a catalog scan over 100 TB of media runs first (size,
    magic-bytes prefix) with full pushdown."""
    b = binary_documents(spark, sf_dir)
    return b.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.decode(F.substring("payload", 1, 4), "utf-8").alias("head"),
    )


@register("multimodal_byte_histogram", oracle=None, tags=("multimodal", "pandas-udf"))
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram features via mapInPandas (Arrow batches). Rows-only:
    the oracle can't run pandas; exact values are pinned in
    tests/test_multimodal.py. Hist serialized for a stable schema."""
    feats = byte_histogram_features(binary_documents(spark, sf_dir))
    return feats.select(
        "doc_id",
        "n_bytes",
        "n_distinct_bytes",
        "top_bin",
        F.array_join(F.transform("hist", lambda x: x.cast("string")), ",").alias("hist"),
    )
