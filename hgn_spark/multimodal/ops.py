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


# (magic-bytes header, sniffed modality) — the standard signatures a
# catalog scan classifies on. WAV needs RIFF at byte 1 AND WAVE at
# byte 9 (bytes 5-8 are the chunk size), so it is handled separately.
MAGIC_HEADERS: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"%PDF", "application/pdf"),
]
_WAV_HEADER = b"RIFF\x00\x00\x00\x00WAVE"


def sniff_modality(payload) -> "object":
    """Scan-side magic-byte modality classifier over a binary column —
    the first pass a catalog job runs over 100 TB of mixed media
    (route-by-modality before any codec touches a byte). Pure JVM
    prefix comparisons (substring on binary + when/otherwise), codegen
    inside the scan stage: no UDF, no shuffle, no decode.

    Returns a string column: image/png, image/jpeg, image/gif,
    audio/wav (RIFF....WAVE), application/pdf, or
    application/octet-stream for anything unrecognized.
    """
    from pyspark.sql import functions as F

    expr = F.when(
        (F.substring(payload, 1, 4) == F.lit(b"RIFF"))
        & (F.substring(payload, 9, 4) == F.lit(b"WAVE")),
        "audio/wav",
    )
    for magic, modality in MAGIC_HEADERS:
        expr = expr.when(
            F.substring(payload, 1, len(magic)) == F.lit(magic), modality
        )
    return expr.otherwise("application/octet-stream")


def decode_image(payload: bytes) -> "object":
    """Image decode: REAL for non-interlaced 8-bit grayscale PNG (the
    stdlib-only decoder in codecs.py — chunk walk, CRC check, inflate,
    all five scanline filters); other formats (JPEG/GIF/...) still
    raise — a deployment swaps the fallback for
    PIL.Image.open(io.BytesIO(payload)) inside the same mapInPandas
    batch loop. The stub branch keeps those call sites honest instead
    of silently faking."""
    from hgn_spark.multimodal.codecs import _PNG_SIG, decode_png_gray8

    if payload[:8] == _PNG_SIG:
        return decode_png_gray8(payload)
    raise NotImplementedError(
        "only grayscale PNG decodes in this environment (no PIL/cv2); "
        "use fake_decode for deterministic plumbing tests of other formats"
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
        "doc_id long, n_bytes long, n_distinct_bytes long, top_bin long, "
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
    # explode_outer: plain explode lets InferFiltersFromGenerate push a
    # size()>0 filter carrying the whole frame-build expression below
    # the repartition (see decontaminate_ngram_overlap); the outer
    # variant infers nothing and f is never null here anyway.
    return (
        df.select("doc_id", F.explode_outer(frames).alias("f"))
        .filter(F.col("f").isNotNull())
        .select("doc_id", F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame").alias("frame"))
        .filter(F.col("frame_idx") % every_nth == 0)
    )


def window_energy(df: DataFrame, window_bytes: int = 32) -> DataFrame:
    """Audio-frame analog of `sample_frames`: split each payload into
    fixed-size byte windows and emit per-window 'energy' (mean of the
    unsigned byte values) plus peak — the plumbing shape of any
    framed-signal featurizer; an RMS or spectral stage swaps into the
    same per-window loop.

    Execution: Arrow-batched mapInPandas with vectorized numpy per
    payload (Spark SQL has no unsigned-byte accessor for binary
    columns, so JVM-side expressions can't read the raw bytes — the
    same reason the byte-histogram stage batches through Arrow).
    Partition-parallel, no shuffle."""
    import pandas as pd
    import numpy as np

    out_schema = (
        "doc_id long, window_idx int, n_bytes int, energy double, peak int"
    )

    def _energy(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                if len(buf) == 0:
                    # Keep empty payloads visible in the feature table
                    # (one zero-window row), consistent with
                    # byte_histogram_features' n_bytes=0 row per doc.
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "window_idx": 0,
                            "n_bytes": 0,
                            "energy": 0.0,
                            "peak": 0,
                        }
                    )
                    continue
                for w in range(0, len(buf), window_bytes):
                    win = buf[w : w + window_bytes]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "window_idx": w // window_bytes,
                            "n_bytes": int(len(win)),
                            "energy": round(float(win.mean()), 4),
                            "peak": int(win.max()),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(_energy, schema=out_schema)


def audio_rms_features(df: DataFrame, frame_samples: int = 256) -> DataFrame:
    """REAL audio feature extraction over PCM-WAV payloads: decode with
    the stdlib codec, then per-frame RMS + peak over the actual int16
    samples (not byte-value proxies) — the standard first stage of any
    audio-quality / VAD pipeline. → (doc_id, frame_idx, n_samples,
    rms, peak) rows, one per fixed-size WINDOW of ``frame_samples``
    WAV frames; multi-channel payloads window along the frame axis with
    rms/peak over all channels in the window and ``n_samples`` counting
    frames (stereo parity vs numpy pinned in tests/test_multimodal.py).

    mapInPandas over Arrow batches, partition-parallel, no shuffle;
    codec functions serialize BY VALUE (register_pickle_by_value on
    the codecs module) so workers need no hgn_spark on sys.path.
    Payloads that are not 16-bit PCM WAV raise — callers route by
    `sniff_modality` first, the whole point of the modality column.
    """
    import numpy as np
    from pyspark import cloudpickle

    from hgn_spark.multimodal import codecs

    cloudpickle.register_pickle_by_value(codecs)
    decode = codecs.decode_wav_pcm16

    out_schema = (
        "doc_id long, frame_idx int, n_samples int, rms double, peak int"
    )

    def _rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, samples = decode(bytes(payload))
                # Frame along the FRAME axis, not the flat sample count:
                # stereo decodes to (n_frames, 2), where iterating by
                # s.size would overrun the row axis (empty windows →
                # ValueError in .max()) and mix per-channel counts into
                # n_samples. Mono reshapes to (n, 1); a window's rms/peak
                # cover all channels, n_samples counts frames.
                s = np.atleast_1d(samples).astype(np.float64)
                s = s.reshape(s.shape[0], -1) if s.size else s.reshape(0, 1)
                if s.shape[0] == 0:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": 0,
                            "n_samples": 0,
                            "rms": 0.0,
                            "peak": 0,
                        }
                    )
                    continue
                for f in range(0, s.shape[0], frame_samples):
                    win = s[f : f + frame_samples]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": f // frame_samples,
                            "n_samples": int(win.shape[0]),
                            "rms": round(float(np.sqrt(np.mean(win**2))), 4),
                            "peak": int(np.abs(win).max()),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(_rms, schema=out_schema)


def png_decode_resize_features(
    df: DataFrame, out_h: int = 4, out_w: int = 4
) -> DataFrame:
    """REAL image preprocessing: decode grayscale-PNG payloads with the
    stdlib codec, nearest-neighbor resize to (out_h, out_w), emit the
    pixel grid + mean intensity — `decode_resize_features`' shape with
    an actual format decode in place of the byte-tiling fake.
    → (doc_id, height, width, pixels array<long>, mean_px).
    """
    import numpy as np
    from pyspark import cloudpickle

    from hgn_spark.multimodal import codecs

    cloudpickle.register_pickle_by_value(codecs)
    decode = codecs.decode_png_gray8

    out_schema = (
        "doc_id long, height int, width int, pixels array<long>, mean_px double"
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                grid = decode(bytes(payload))
                h, w = grid.shape
                r_idx = np.floor(np.arange(out_h) * h / out_h).astype(int)
                c_idx = np.floor(np.arange(out_w) * w / out_w).astype(int)
                small = grid[np.ix_(r_idx, c_idx)].astype(np.int64)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "height": int(h),
                        "width": int(w),
                        "pixels": small.ravel().tolist(),
                        "mean_px": round(float(small.mean()), 4),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(_resize, schema=out_schema)


def _png_decodable(payload) -> "object":
    """Scan-side CAPABILITY check for the stdlib PNG decoder: 8-bit
    depth + grayscale color type (IHDR bytes 25-26 = 0x08 0x00) and
    non-interlaced (byte 29 = 0x00). Routing must not send an RGB /
    palette / interlaced PNG to the strict decoder — it would raise
    inside mapInPandas and fail the job."""
    from pyspark.sql import functions as F

    return (F.substring(payload, 25, 2) == F.lit(b"\x08\x00")) & (
        F.substring(payload, 29, 1) == F.lit(b"\x00")
    )


def _wav_decodable(payload) -> "object":
    """Scan-side CAPABILITY check for the stdlib WAV decoder, mirroring
    `_png_decodable`: a RIFF/WAVE payload sniffs as audio/wav whatever
    its encoding, but `decode_wav_pcm16` only accepts 16-bit PCM —
    8/24/32-bit, IEEE-float and ADPCM variants would raise mid-job.
    For the canonical layout ('fmt ' chunk directly after WAVE) the
    fields sit at fixed offsets: audioFormat (bytes 21-22, LE) == 1
    (PCM) and bitsPerSample (bytes 35-36, LE) == 16. Non-canonical
    chunk orders fail the check and route to the format-agnostic
    extractor — conservative by design (never feeds the strict decoder
    something it might reject)."""
    from pyspark.sql import functions as F

    return (
        (F.substring(payload, 13, 4) == F.lit(b"fmt "))
        & (F.substring(payload, 21, 2) == F.lit(b"\x01\x00"))
        & (F.substring(payload, 35, 2) == F.lit(b"\x10\x00"))
    )


def route_by_modality(
    df: DataFrame, materialize: str | None = None
) -> dict[str, DataFrame]:
    """The catalog-scan routing step `sniff_modality` exists for: one
    scan classifies every payload by magic bytes, then each modality
    slice feeds its own extractor —

    - ``audio/wav`` the stdlib decoder can handle (16-bit PCM, checked
      scan-side via `_wav_decodable`) → `audio_rms_features` (real PCM
      decode);
    - ``image/png`` the stdlib decoder can handle (grayscale 8-bit
      non-interlaced, checked scan-side via `_png_decodable`) →
      `png_decode_resize_features` (real PNG decode);
    - everything else — including WAV/PNG variants beyond the stdlib
      decoders (float/ADPCM WAV, RGB/palette/interlaced PNG) →
      `byte_histogram_features` (format-agnostic).

    Both capability checks run before routing, so a routing mistake can
    never crash a strict decoder mid-job. Returns the three labeled
    feature frames.

    ``materialize=None`` (default): routing is a lazy scan-side
    predicate on the sniffed column — no shuffle, no decode during
    routing — but acting on all three frames independently re-reads
    the source three times.

    ``materialize=<path>``: the 100 TB layout — ONE source pass writes
    a parquet table partitioned by the routing decision (a ``route``
    partition column: audio_wav / image_png / other), then each
    extractor reads back a partition-pruned scan of only its own
    slice (PartitionFilters, asserted in tests/test_multimodal.py).
    Total source traffic: one write + one read, instead of three scans
    of the raw corpus.
    """
    classified = df.withColumn("modality", sniff_modality(F.col("payload")))
    wav_ok = (F.col("modality") == "audio/wav") & _wav_decodable(
        F.col("payload")
    )
    png_ok = (F.col("modality") == "image/png") & _png_decodable(
        F.col("payload")
    )
    if materialize is None:
        return {
            "audio/wav": audio_rms_features(classified.filter(wav_ok)),
            "image/png": png_decode_resize_features(classified.filter(png_ok)),
            "other": byte_histogram_features(
                classified.filter(~wav_ok & ~png_ok)
            ),
        }
    # Partition values avoid '/' (it would be %-escaped in directory
    # names) and encode DECODABILITY, not just the sniffed modality —
    # an undecodable WAV lands in `other`, so each partition is exactly
    # one extractor's input.
    route = (
        F.when(wav_ok, "audio_wav").when(png_ok, "image_png").otherwise("other")
    )
    classified.withColumn("route", route).write.mode("overwrite").partitionBy(
        "route"
    ).parquet(materialize)
    base = df.sparkSession.read.parquet(materialize)
    return {
        "audio/wav": audio_rms_features(base.filter(F.col("route") == "audio_wav")),
        "image/png": png_decode_resize_features(
            base.filter(F.col("route") == "image_png")
        ),
        "other": byte_histogram_features(base.filter(F.col("route") == "other")),
    }


def decode_resize_features(
    df: DataFrame, height: int = 8, width: int = 8, out_h: int = 4, out_w: int = 4
) -> DataFrame:
    """decode → nearest-neighbor resize over mapInPandas — the standard
    image-preprocessing stage. Decode is `fake_decode` (deterministic
    byte tiling; a deployment swaps in PIL inside the same batch loop),
    resize is vectorized numpy fancy-indexing per payload. Output:
    (doc_id, pixels array<int> of out_h×out_w)."""
    import numpy as np

    r_idx = np.floor(np.arange(out_h) * height / out_h).astype(int)
    c_idx = np.floor(np.arange(out_w) * width / out_w).astype(int)

    n_px = height * width

    # Self-contained closure (captures only locals/numpy): cloudpickle
    # must not reference this module — the driver's workers may not
    # have hgn_spark on sys.path. `decode` mirrors fake_decode.
    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(payload: bytes) -> "np.ndarray":
            if not payload:
                return np.zeros(n_px, dtype=np.int64)
            b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            return b[np.arange(n_px) % len(b)]

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                grid = decode(payload).reshape(height, width)
                small = grid[np.ix_(r_idx, c_idx)]
                rows.append({"doc_id": doc_id, "pixels": small.ravel().tolist()})
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(
        _resize, schema="doc_id long, pixels array<long>"
    )


# Flat positions the 8×8→4×4 nearest-neighbor resize samples from the
# tiled payload (row r*8+col for r,c in {0,2,4,6}) — the DuckDB twin
# recomputes fake_decode(payload)[p] as ascii(text[(p % len) + 1])
# (documents.text is ASCII, so code point == utf-8 byte).
_RESIZE_POSITIONS = [r * 8 + c for r in (0, 2, 4, 6) for c in (0, 2, 4, 6)]


@register(
    "multimodal_decode_resize",
    # Byte-histogram columns absorbed from the former standalone
    # `multimodal_byte_histogram` row (r7 window consolidation): both
    # extractors are mapInPandas features over the same binary table at
    # the same per-doc grain, joined on doc_id into one hash-checked
    # row. The payloads are utf-8 encodings of ASCII text, so the
    # oracle recomputes every byte as ascii(substr(text, i, 1));
    # top_bin uses the same first-max tie-break as np.argmax
    # (list_position finds the first match).
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             list_transform({_RESIZE_POSITIONS},
                            p -> ascii(substr(text, (p % len(text)) + 1, 1))) AS pixels
      FROM documents WHERE len(text) > 0
    ),
    hb AS (
      SELECT doc_id,
             list_transform(range(1, len(text) + 1),
                            i -> ascii(substr(text, i, 1))) AS bytes
      FROM documents WHERE len(text) > 0),
    hh AS (
      SELECT doc_id, bytes,
             list_transform(range(0, 16),
                            bin -> len(list_filter(bytes, x -> x // 16 = bin)))
               AS hist
      FROM hb)
    SELECT px.doc_id,
           CAST(pixels[1] AS BIGINT) AS px0,
           CAST(list_sum(pixels) AS BIGINT) AS px_sum,
           round(list_sum(pixels) / 16.0, 4) AS mean_px,
           CAST(len(bytes) AS BIGINT) AS n_bytes,
           CAST(len(list_distinct(bytes)) AS BIGINT) AS n_distinct_bytes,
           CAST(list_position(hist, list_max(hist)) - 1 AS BIGINT) AS top_bin,
           array_to_string(hist, ',') AS hist
    FROM px JOIN hh ON px.doc_id = hh.doc_id
    """,
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Arrow-batched multimodal extractors in one hash-checked row:
    the decode→resize pipeline with scalar outputs (fake_decode is
    deterministic byte tiling, so the oracle can recompute the sampled
    positions in SQL; the full pixel grid is pinned against numpy in
    tests/test_multimodal.py) joined per-doc with the byte-histogram
    features (hist serialized for a stable schema; exact values also
    pinned against numpy). Both extractors are partition-parallel
    mapInPandas passes over the same binary table; the join is the only
    shuffle and stays at the per-doc grain."""
    b = binary_documents(spark, sf_dir).filter(F.length("payload") > 0)
    feats = decode_resize_features(b)
    s = F.aggregate(F.col("pixels"), F.lit(0).cast("long"), lambda a, x: a + x)
    resize = feats.select(
        "doc_id",
        F.element_at("pixels", 1).alias("px0"),
        s.alias("px_sum"),
        F.round(s / 16.0, 4).alias("mean_px"),
    )
    hist = byte_histogram_features(b).select(
        "doc_id",
        "n_bytes",
        "n_distinct_bytes",
        "top_bin",
        F.array_join(
            F.transform("hist", lambda x: x.cast("string")), ","
        ).alias("hist"),
    )
    return resize.join(hist, "doc_id")


@register(
    "multimodal_binary_meta",
    # Payloads are utf-8 encodings of ASCII text, so byte offsets equal
    # character offsets and the oracle replays frame slicing with
    # substr. Frame i covers bytes [i*16+1, i*16+16], frames exist for
    # i in [0, (len-1)//16], and every 4th is kept — the video
    # frame-sampling shape over opaque binary.
    oracle="""
    SELECT 'meta' AS branch, doc_id, CAST(NULL AS BIGINT) AS idx,
           octet_length(encode(text)) AS n_bytes,
           substring(text, 1, 4) AS head
    FROM documents
    UNION ALL
    SELECT 'frame' AS branch, doc_id, CAST(i AS BIGINT) AS idx,
           octet_length(encode(substr(text, CAST(i * 16 + 1 AS INT), 16)))
             AS n_bytes,
           substr(text, CAST(i * 16 + 1 AS INT), 4) AS head
    FROM documents,
         unnest(range(0, (octet_length(encode(text)) - 1) // 16 + 1)) AS t(i)
    WHERE i % 4 = 0
    UNION ALL
    SELECT 'sniff' AS branch, doc_id, CAST(NULL AS BIGINT) AS idx,
           octet_length(encode(text)) + CASE CAST(doc_id % 5 AS INT)
             WHEN 0 THEN 8 WHEN 1 THEN 3 WHEN 2 THEN 12 WHEN 3 THEN 4
             ELSE 0 END AS n_bytes,
           CASE CAST(doc_id % 5 AS INT)
             WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
             WHEN 2 THEN 'audio/wav' WHEN 3 THEN 'application/pdf'
             ELSE 'application/octet-stream' END AS head
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads as native expressions — the
    query a catalog scan over 100 TB of media runs first (size,
    magic-bytes prefix) — unioned with the frame-sampling pass (every
    4th fixed-size frame per payload, per-frame size + head) and the
    magic-byte modality sniff (VERDICT r5 #7): real signatures
    (PNG/JPEG/GIF/WAV/PDF) planted per doc_id % 5, classified by
    `sniff_modality` reading the actual payload bytes, while the
    oracle derives the expected label independently from the plant
    rule — three §multimodal plumbing shapes in one hash-checked
    driver row. (No document text starts with a signature, verified at
    all SFs, so the no-header residue class is stable.)"""
    b = binary_documents(spark, sf_dir)
    meta = b.select(
        F.lit("meta").alias("branch"),
        "doc_id",
        F.lit(None).cast("long").alias("idx"),
        F.length("payload").alias("n_bytes"),
        F.decode(F.substring("payload", 1, 4), "utf-8").alias("head"),
    )
    fr = sample_frames(b, every_nth=4, frame_bytes=16).select(
        F.lit("frame").alias("branch"),
        "doc_id",
        F.col("frame_idx").cast("long").alias("idx"),
        F.length("frame").alias("n_bytes"),
        F.decode(F.substring("frame", 1, 4), "utf-8").alias("head"),
    )
    hdr = (
        F.when(F.col("doc_id") % 5 == 0, F.lit(MAGIC_HEADERS[0][0]))
        .when(F.col("doc_id") % 5 == 1, F.lit(MAGIC_HEADERS[1][0]))
        .when(F.col("doc_id") % 5 == 2, F.lit(_WAV_HEADER))
        .when(F.col("doc_id") % 5 == 3, F.lit(MAGIC_HEADERS[3][0]))
        .otherwise(F.lit(b""))
    )
    planted = b.select(
        "doc_id", F.concat(hdr, F.col("payload")).alias("payload")
    )
    sniff = planted.select(
        F.lit("sniff").alias("branch"),
        "doc_id",
        F.lit(None).cast("long").alias("idx"),
        F.length("payload").alias("n_bytes"),
        sniff_modality(F.col("payload")).alias("head"),
    )
    return meta.unionByName(fr).unionByName(sniff)


