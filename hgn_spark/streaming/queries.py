"""Structured Streaming slice over `events` (SURVEY §2.10 — a reference
gap; the reference has no streaming at all).

Each query reads the events parquet as a file stream, runs a windowed /
stateful transformation with an availableNow trigger into a sink
(a checkpointed parquet file sink — the deployable pattern — for every
query except the update-mode stateful one, which the append-only file
sink cannot express and drains to a memory sink instead),
and returns the materialized result as a batch DataFrame — so the
driver contract (callable → DataFrame) holds. Batch twins
(`json_date_daily`, `sessionize_events`) exist for parity testing;
streaming queries are rows-only in the oracle gate (non-SQL surface).

Semantics notes:
- tumbling window uses complete output mode (every window emitted at
  the final trigger);
- session windows use append mode + watermark, which is the honest
  streaming semantics: sessions not closed by the final watermark
  (those within the last hour of data) are withheld — the parity test
  asserts the emitted subset matches the batch sessionizer;
- the custom stateful operator (applyInPandasWithState) keeps a
  per-user running count in explicit state — the pattern any custom
  sessionizer/accumulator uses at scale.
"""

from __future__ import annotations

import itertools
import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hgn_spark.registry import register

_SINK_COUNTER = itertools.count()


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a file stream; same timestamp normalization as the
    batch catalog (hgn_spark/catalog.py:_load_events) — withWatermark
    rejects TIMESTAMP_NTZ, so ts must be plain TIMESTAMP."""
    path = os.path.join(sf_dir, "events.parquet")
    try:
        schema = spark.read.parquet(path).schema
    except Exception:
        # TIMESTAMP(NANOS) flavor: needs the legacy long mapping. Set
        # only on demand — the conf is session-global and would
        # otherwise flip the schema of every later nanos parquet read
        # (see catalog._load_events).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = spark.read.parquet(path).schema
    # The file-stream source wants a directory: stream the sf dir with a
    # glob that selects just the events file.
    s = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    dt = dict(s.dtypes).get("ts")
    if dt == "bigint":
        s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        s = s.withColumn("ts", F.col("ts").cast("timestamp"))
    return s


def _run_to_memory(df: DataFrame, mode: str) -> DataFrame:
    """Drain a streaming frame into a uniquely-named memory sink and
    return the materialized table. Test-harness sink, used ONLY by the
    update-mode stateful query (the file sink is append-only); every
    other streaming query drains through the parquet sink below."""
    name = f"hgn_stream_sink_{next(_SINK_COUNTER)}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def _run_to_parquet(df: DataFrame, mode: str) -> DataFrame:
    """Drain a streaming frame through a parquet FILE sink (checkpointed)
    and read the result back — the deployable sink pattern, not a test
    harness. The file sink itself is append-only, so:

    - append mode writes directly via the parquet sink;
    - complete-mode aggregations go through foreachBatch with an
      overwrite write per trigger — the standard production shape for
      complete output (each trigger replaces the result table), and with
      availableNow there is exactly one final trigger.
    """
    import tempfile

    base = tempfile.mkdtemp(prefix="hgn_stream_parquet_")
    path = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    if mode == "complete":
        writer = df.writeStream.foreachBatch(
            lambda batch, _epoch: batch.write.mode("overwrite").parquet(path)
        ).outputMode("complete")
    else:
        writer = df.writeStream.format("parquet").option("path", path).outputMode(mode)
    q = (
        writer.option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # Read back with the sink's declared schema: an append sink that
    # emitted zero rows leaves only _spark_metadata in the directory,
    # and schema inference would raise instead of returning the empty
    # frame the caller expects.
    return df.sparkSession.read.schema(df.schema).parquet(path)


@register(
    "streaming_tumbling_daily",
    # Complete output mode + availableNow processes the whole input and
    # emits every window at the final trigger, so the result is exactly
    # the batch aggregation — deterministic, hence a real oracle (the
    # other streaming queries stay rows-only: append-mode emission
    # depends on watermark progression across micro-batches).
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def streaming_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling-window counts/sums with a 1-day watermark — the
    streaming twin of `json_date_daily` (exact parity asserted in
    tests/test_streaming.py)."""
    s = _stream_events(spark, sf_dir).withWatermark("ts", "1 day")
    agg = s.groupBy(F.window("ts", "1 day").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    )
    out = agg.select(
        F.col("w.start").alias("day"), "event_type", "n", "total_value"
    )
    return _run_to_parquet(out, "complete")


@register(
    "streaming_sliding_2d",
    # Complete mode again → deterministic batch equivalence. Each event
    # belongs to exactly two 2-day/1-day-slide windows (starts at
    # floor_day(ts) and floor_day(ts) - 1 day), which the oracle
    # replays with an unnest.
    oracle="""
    WITH ev AS (
      SELECT unnest([date_trunc('day', ts),
                     date_trunc('day', ts) - INTERVAL 1 DAY]) AS window_start,
             event_type, value
      FROM events)
    SELECT window_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM ev GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def streaming_sliding_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-day windows sliding by 1 day (each event counted in two
    overlapping windows) with a 1-day watermark — the sliding-window
    member of the streaming family (SURVEY §7 M5)."""
    s = _stream_events(spark, sf_dir).withWatermark("ts", "1 day")
    agg = s.groupBy(
        F.window("ts", "2 days", "1 day").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    )
    out = agg.select(
        F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
    )
    return _run_to_parquet(out, "complete")


@register(
    "streaming_session_windows",
    # With availableNow the final watermark is max(ts) - 1 h, so the
    # emitted set — sessions whose window end (last event + 30 min gap)
    # the final watermark has passed — is deterministic and
    # SQL-expressible: the batch sessionizer filtered by the watermark
    # cutoff replays it. Boundary semantics (merge on gap < vs <= 30 min;
    # cutoff < vs <=; ms-floored vs µs watermark) are indistinguishable
    # on µs-random timestamps — all variants verified identical to the
    # Spark emission at sf0.001/0.01/0.1; the SQL uses interval-overlap
    # merge (new session at gap >= 30 min) and end <= watermark.
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w < 1800000000
                  THEN 0 ELSE 1 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid
      FROM flagged
    ), sess AS (
      SELECT user_id, min(ts) AS session_start,
             epoch_us(max(ts)) + 1800000000 AS session_end_us,
             count(*) AS n_events, round(sum(value), 4) AS session_value
      FROM numbered GROUP BY user_id, sid
    )
    SELECT user_id, session_start, n_events, session_value
    FROM sess
    WHERE session_end_us <= (SELECT epoch_us(max(ts)) - 3600000000
                             FROM events)
    """,
    tags=("streaming",),
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user with a 1-hour watermark,
    append mode — the streaming twin of `sessionize_events`. Append
    emission under availableNow is a pure function of the data (final
    watermark = max(ts) - 1 h), so the oracle replays it with the batch
    sessionizer + watermark cutoff — a hash-checked driver row for
    append-mode streaming."""
    s = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = s.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sw")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )
    out = agg.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        "n_events",
        "session_value",
    )
    return _run_to_parquet(out, "append")


@register("streaming_dedup_events", oracle=None, tags=("streaming", "stateful"))
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    dropDuplicatesWithinWatermark on event_id, so a key's dedup state
    ages out once the watermark passes it. Plain
    dropDuplicates(["event_id"]) would look the same on a finite
    replay but keeps every key ever seen — a watermark only expires
    dedup state through the WithinWatermark variant (or by putting the
    event-time column in the key), so on an unbounded stream the plain
    form grows until executors OOM. Tradeoff, stated: duplicates
    arriving farther apart than the 1-hour delay may both survive —
    the standard bounded-state dedup contract. Result re-aggregated
    batch-side."""
    s = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = s.dropDuplicatesWithinWatermark(["event_id"]).select(
        "event_id", "event_type"
    )
    table = _run_to_parquet(deduped, "append")
    return table.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register("streaming_stream_stream_join", oracle=None, tags=("streaming", "join"))
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases joined to the same user's
    clicks within the preceding 30 minutes. Both sides carry watermarks
    and the join condition carries the time bound — that pair is what
    lets Spark expire join state instead of buffering both streams
    forever. Result re-aggregated batch-side per user."""
    base = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    purchases = base.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    clicks = (
        _stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select("p_user", "p_ts", "c_ts")
    table = _run_to_parquet(joined, "append")
    return table.groupBy(F.col("p_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_click_purchase_pairs")
    )


@register("streaming_static_enrich", oracle=None, tags=("streaming", "join"))
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the standard streaming-ETL
    pattern the family still lacked: the event stream joins a static
    dimension (the per-user lifetime purchase count, precomputed
    batch-side) and aggregates enriched rows per segment. The static
    side needs no watermark and no state: Spark re-plans it into each
    micro-batch as an ordinary (broadcastable) batch join, so state
    stays bounded by the aggregation alone. Complete mode +
    availableNow emits exactly the batch aggregation — deterministic;
    exact batch parity asserted in tests/test_streaming.py. Rows-only
    in the driver gate only because the 50-slot window is already
    fully oracle-backed."""
    from hgn_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    user_dim = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("lifetime_purchases"))
    )
    s = _stream_events(spark, sf_dir).withWatermark("ts", "1 day")
    # LEFT join: a user with zero purchases has no dim row, and an
    # inner join would silently drop their events from every bucket —
    # the tier ladder says they are 'light', so the fact stream must
    # survive the enrichment (coalesce fills the missing count).
    enriched = s.join(user_dim, "user_id", "left").withColumn(
        "buyer_tier",
        F.when(F.coalesce("lifetime_purchases", F.lit(0)) >= 10, "heavy")
        .when(F.coalesce("lifetime_purchases", F.lit(0)) >= 3, "mid")
        .otherwise("light"),
    )
    agg = enriched.groupBy(
        F.window("ts", "1 day").alias("w"), "buyer_tier"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    out = agg.select(
        F.col("w.start").alias("day"), "buyer_tier", "n_events", "total_value"
    )
    return _run_to_parquet(out, "complete")


@register("streaming_stateful_user_counts", oracle=None, tags=("streaming", "stateful"))
def streaming_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    event counter held in explicit GroupState. Update mode appends one
    row per (user, batch); the final per-user value is the max —
    asserted equal to the batch groupBy count in tests."""

    def _count(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    s = _stream_events(spark, sf_dir).select("user_id", "event_id")
    counted = s.groupBy("user_id").applyInPandasWithState(
        _count,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    table = _run_to_memory(counted, "update")
    return table.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
