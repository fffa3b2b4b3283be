"""Structured Streaming slice over `events` (SURVEY §2.10 — a reference
gap; the reference has no streaming at all).

Each query reads the events parquet as a file stream, runs a windowed /
stateful transformation with an availableNow trigger into a sink
(a checkpointed parquet file sink — the deployable pattern — for every
query except the update-mode stateful one, which the append-only file
sink cannot express and drains to a memory sink instead),
and returns the materialized result as a batch DataFrame — so the
driver contract (callable → DataFrame) holds. Batch twins
(`json_date_daily`, `sessionize_events`) exist for parity testing.
Under availableNow every emission here is a pure function of the data
(complete mode emits the full batch aggregation; append emissions are
pinned by the final watermark = max(ts) − horizon), so 7 of the 8
queries carry full DuckDB oracles — only the update-mode stateful
row's INTERMEDIATE emissions are non-SQL, and its final accumulated
state is oracle-checked against the batch count.

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
import threading
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hgn_spark.registry import register

_SINK_COUNTER = itertools.count()

# Scale-adaptive streaming state partitioning (r14, guide §2 "make
# partitioning scale-adaptive ... rather than a constant tuned for
# either local mode or the cluster"): batch exchanges get AQE
# coalescing, but STREAMING exchanges do not — the session's
# shuffle-partition constant (≈ core count) becomes the state-store
# partition count raw. Every state partition pays a fixed per-batch
# cost (store instantiation + HDFS-backed delta commit + one sink
# file), so on a small input the constant dominates: the sf0.1
# stream-stream join measured 5.4 s at 32 state partitions vs 2.0 s at
# 4 for identical output. Derive the partition count from the INPUT
# SIZE instead — ceil(input_bytes / target) capped at the session's
# parallelism — so a large deployment still saturates its cores while
# a small batch stops paying for empty stores. Target bytes per state
# partition is env-tunable (SPARK_GRAFT_STREAM_STATE_PART_BYTES,
# default 32 MiB); the cap keeps the derivation monotone up to exactly
# the constant the session would have used anyway.
_STREAM_STATE_PART_BYTES = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PART_BYTES", str(32 << 20))
)


# Arrow/pandas STATEFUL operators (applyInPandasWithState) have the
# opposite cost model: their per-partition fixed cost is small next to
# the Python-worker compute, which PARALLELIZES — the r14 sweep on the
# stateful-counts row measured 2.5 s at 1 partition vs 1.3 s at ~8 vs
# 1.4 s at 32. Size those by ROWS per Python task instead of bytes per
# state store, same env-tunable/cap discipline.
_STREAM_PY_ROWS_PER_PART = int(
    os.environ.get("SPARK_GRAFT_STREAM_PY_ROWS_PER_PART", str(16384))
)


def _stream_shuffle_partitions(spark: SparkSession, sf_dir: str) -> int:
    """Input-size-derived shuffle/state partition count for the
    availableNow streaming queries over ``events`` (module comment on
    _STREAM_STATE_PART_BYTES)."""
    import math

    path = os.path.join(sf_dir, "events.parquet")
    try:
        if os.path.isdir(path):
            # Data files only (ADVICE r14): a hive-partitioned or nested
            # layout would otherwise count dirent sizes of subdirectories
            # and non-parquet sidecars into the state sizing.
            size = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
        else:
            size = os.path.getsize(path)
    except OSError:
        return spark.sparkContext.defaultParallelism
    want = max(1, math.ceil(size / _STREAM_STATE_PART_BYTES))
    return min(want, spark.sparkContext.defaultParallelism)


def _stream_python_partitions(spark: SparkSession, sf_dir: str) -> int:
    """Row-count-derived partition count for Python-stateful streaming
    queries (comment on _STREAM_PY_ROWS_PER_PART). Row counts come
    from parquet footers — metadata only, no scan."""
    import math

    path = os.path.join(sf_dir, "events.parquet")
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            rows = sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
        else:
            rows = pq.ParquetFile(path).metadata.num_rows
    except Exception:  # noqa: BLE001 — sizing must never kill the query
        return spark.sparkContext.defaultParallelism
    want = max(1, math.ceil(rows / _STREAM_PY_ROWS_PER_PART))
    return min(want, spark.sparkContext.defaultParallelism)


class _stream_partitions:
    """Context manager: pin spark.sql.shuffle.partitions to the
    input-derived value for the duration of a streaming query's
    start→awaitTermination (the value is captured into the query's
    offset log at start), then restore the session value for batch
    work, where AQE owns the coalescing decision.

    The pin mutates SESSION-GLOBAL conf with a save/restore, so two
    concurrent or nested pins would capture each other's pinned value
    as `_old` and restore the session to a stale state (ADVICE r14 /
    VERDICT r14 #8). A non-blocking module lock enforces the
    single-pin-at-a-time invariant LOUDLY: a second pin while one is
    held raises instead of silently corrupting the session conf.
    (streaming_windowed_aggs' concurrent tumbling/sliding pair holds
    ONE pin on the main thread around both branch threads — that stays
    a single acquisition.)"""

    _lock = threading.Lock()

    def __init__(self, spark: SparkSession, n: int) -> None:
        self._spark = spark
        self._n = n

    def __enter__(self) -> None:
        if not _stream_partitions._lock.acquire(blocking=False):
            raise RuntimeError(
                "_stream_partitions: a shuffle-partition pin is already "
                "held in this process; nested/concurrent pins would "
                "restore a stale session value (single-pin invariant)"
            )
        self._old = self._spark.conf.get("spark.sql.shuffle.partitions")
        self._spark.conf.set("spark.sql.shuffle.partitions", str(self._n))

    def __exit__(self, *exc) -> None:
        try:
            self._spark.conf.set("spark.sql.shuffle.partitions", self._old)
        finally:
            _stream_partitions._lock.release()


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
    # The file-stream source wants a directory. Two layouts exist:
    # the driver testdata ships events.parquet as a single FILE (stream
    # the sf dir with a glob selecting it), while Spark-written tables
    # (the scale slices, any real deployment) are a DIRECTORY of
    # part-files (stream it directly — a leaf-name glob of
    # "events.parquet" matches nothing inside, which made every
    # streaming row silently emit zero rows on directory-layout
    # tables until the r10 100x probe caught it).
    if os.path.isdir(path):
        s = spark.readStream.schema(schema).format("parquet").load(path)
    else:
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


def _run_to_memory(df: DataFrame, mode: str, sf_dir: str | None = None) -> DataFrame:
    """Drain a streaming frame into a uniquely-named memory sink and
    return the materialized table. Test-harness sink, used ONLY by the
    update-mode stateful query (the file sink is append-only); every
    other streaming query drains through the parquet sink below.
    ``sf_dir`` (when given) sizes the state partitioning from the
    input — see _stream_shuffle_partitions."""
    import contextlib

    name = f"hgn_stream_sink_{next(_SINK_COUNTER)}"
    ctx = (
        _stream_partitions(
            df.sparkSession, _stream_python_partitions(df.sparkSession, sf_dir)
        )
        if sf_dir is not None
        else contextlib.nullcontext()
    )
    with ctx:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return df.sparkSession.table(name)


def _run_to_parquet(
    df: DataFrame, mode: str, tag: str, sf_dir: str | None = None
) -> DataFrame:
    """Drain a streaming frame through a parquet FILE sink (checkpointed)
    and read the result back — the deployable sink pattern, not a test
    harness. The file sink itself is append-only, so:

    - append mode writes directly via the parquet sink;
    - complete-mode aggregations go through foreachBatch with an
      overwrite write per trigger — the standard production shape for
      complete output (each trigger replaces the result table), and with
      availableNow there is exactly one final trigger.
    """
    from hgn_spark.sources.sinks import ephemeral_io_dir

    # Deterministic per-(tag, application) tree, wiped per call and
    # reaped at process exit — a fresh checkpoint per invocation with
    # none of the r9 mkdtemp leak (ADVICE/VERDICT r9 #4). The tag
    # keys the tree per CALL SITE: two rows (or two branches of one
    # row) draining concurrently must not wipe each other's sink.
    base = ephemeral_io_dir(df.sparkSession, f"stream_{tag}")
    path = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    import contextlib

    if mode == "complete":
        writer = df.writeStream.foreachBatch(
            lambda batch, _epoch: batch.write.mode("overwrite").parquet(path)
        ).outputMode("complete")
    else:
        writer = df.writeStream.format("parquet").option("path", path).outputMode(mode)
    ctx = (
        _stream_partitions(
            df.sparkSession, _stream_shuffle_partitions(df.sparkSession, sf_dir)
        )
        if sf_dir is not None
        else contextlib.nullcontext()
    )
    with ctx:
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
    "streaming_windowed_aggs",
    # Complete output mode + availableNow processes the whole input and
    # emits every window at the final trigger, so each branch is
    # exactly its batch aggregation — deterministic, hence a real
    # oracle. Two labeled branches in one hash-checked row (the r7
    # window consolidation that paid for the new streaming-dedup and
    # stream-stream-join oracle rows): 'tumbling' = daily windows;
    # 'sliding' = 2-day windows sliding by 1 day, where each event
    # belongs to exactly two windows (starts at floor_day(ts) and
    # floor_day(ts) - 1 day), which the oracle replays with an unnest.
    oracle="""
    SELECT 'tumbling' AS branch, date_trunc('day', ts) AS window_start,
           event_type, count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS branch, window_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM (
      SELECT unnest([date_trunc('day', ts),
                     date_trunc('day', ts) - INTERVAL 1 DAY]) AS window_start,
             event_type, value
      FROM events)
    GROUP BY 2, 3
    """,
    tags=("streaming",),
)
def streaming_windowed_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed streaming aggregations, both shapes in one row:
    daily tumbling-window counts/sums (the streaming twin of
    `json_date_daily`, exact parity asserted in tests/test_streaming.py)
    and 2-day/1-day-slide sliding windows (each event counted in two
    overlapping windows — SURVEY §7 M5). Each branch runs as its own
    availableNow drain through the checkpointed parquet file sink with
    a 1-day watermark."""
    s = _stream_events(spark, sf_dir).withWatermark("ts", "1 day")
    tumbling = s.groupBy(F.window("ts", "1 day").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    ).select(
        F.lit("tumbling").alias("branch"),
        F.col("w.start").alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )
    s2 = _stream_events(spark, sf_dir).withWatermark("ts", "1 day")
    sliding = s2.groupBy(
        F.window("ts", "2 days", "1 day").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    ).select(
        F.lit("sliding").alias("branch"),
        F.col("w.start").alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )
    # r14 (guide §2.6): the two branches are independent streams with
    # separate sinks/checkpoints — run them concurrently instead of
    # back-to-back (each availableNow run spends most of its wall in
    # driver-side query start/commit that leaves executors idle). The
    # partition pin wraps BOTH on the main thread: one enter/exit, no
    # set/restore race between the threads (both would pin the same
    # value; the conf is read at each query's start).
    from concurrent.futures import ThreadPoolExecutor

    with _stream_partitions(spark, _stream_shuffle_partitions(spark, sf_dir)):
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_t = pool.submit(_run_to_parquet, tumbling, "complete", "tumbling")
            f_s = pool.submit(_run_to_parquet, sliding, "complete", "sliding")
            t_back, s_back = f_t.result(), f_s.result()
    return t_back.unionByName(s_back)


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
    return _run_to_parquet(out, "append", "session_windows", sf_dir)


@register(
    "streaming_dedup_events",
    # Oracle-able by the availableNow argument (VERDICT r6 #1): the
    # events table is one parquet file, so the availableNow trigger
    # runs exactly one micro-batch; during it the watermark is still
    # the initial 0, so no dedup state expires mid-batch and EVERY
    # duplicate of a key is dropped regardless of time gap — the
    # emitted set is exactly one row per distinct key. Projecting only
    # the KEY columns makes that set independent of which physical row
    # survived, so the emission is a pure function of the data. The
    # key is (user_id, event_type) — event_id is unique at every SF
    # (verified), so an event_id dedup would never fire; this key has
    # real duplicates (a user repeats event types), making the row a
    # dedup that actually drops ~90% of its input.
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "stateful"),
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with BOUNDED state — first event per
    (user, event_type): dropDuplicatesWithinWatermark, so a key's
    dedup state ages out once the watermark passes it. Plain
    dropDuplicates would look the same on a finite replay but keeps
    every key ever seen — a watermark only expires dedup state through
    the WithinWatermark variant (or by putting the event-time column
    in the key), so on an unbounded stream the plain form grows until
    executors OOM. Tradeoff, stated: duplicates arriving farther apart
    than the 1-hour delay may both survive — the standard
    bounded-state dedup contract (exercised across 3 incremental feeds
    + restart in tests/test_streaming.py). Result re-aggregated
    batch-side per event_type."""
    s = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = s.dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    ).select("user_id", "event_type")
    table = _run_to_parquet(deduped, "append", "dedup", sf_dir)
    return table.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "streaming_stream_stream_join",
    # Oracle-able (VERDICT r6 #1): stream-stream INNER join results are
    # emitted in the micro-batch where both sides are present — unlike
    # outer-join nulls, nothing is withheld for watermark progress —
    # and with availableNow both sides arrive in batch 1 while the
    # watermark is still 0 (nothing dropped as late). The append
    # emission is therefore exactly the batch interval join.
    oracle="""
    SELECT p.user_id AS user_id, count(*) AS n_click_purchase_pairs
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    GROUP BY p.user_id
    """,
    tags=("streaming", "join"),
)
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
    table = _run_to_parquet(joined, "append", "ss_join", sf_dir)
    return table.groupBy(F.col("p_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_click_purchase_pairs")
    )


@register(
    "streaming_static_enrich",
    # Oracle-able by the complete-mode argument (same as
    # streaming_windowed_aggs): the static side is re-planned into the
    # single availableNow micro-batch as an ordinary batch join, and
    # complete output emits every window at the final trigger — the
    # emission IS the batch aggregation of the enriched join,
    # deterministic end to end. Spark's 1-day tumbling windows align
    # to the epoch, so w.start replays as date_trunc('day', ts) in UTC.
    oracle="""
    WITH dim AS (
      SELECT user_id, count(*) AS lifetime_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT date_trunc('day', e.ts) AS day,
           CASE WHEN coalesce(d.lifetime_purchases, 0) >= 10 THEN 'heavy'
                WHEN coalesce(d.lifetime_purchases, 0) >= 3 THEN 'mid'
                ELSE 'light' END AS buyer_tier,
           count(*) AS n_events,
           round(sum(e.value), 4) AS total_value
    FROM events e LEFT JOIN dim d USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("streaming", "join"),
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the standard streaming-ETL
    pattern the family still lacked: the event stream joins a static
    dimension (the per-user lifetime purchase count, precomputed
    batch-side) and aggregates enriched rows per segment. The static
    side needs no watermark and no state: Spark re-plans it into each
    micro-batch as an ordinary (broadcastable) batch join, so state
    stays bounded by the aggregation alone. Complete mode +
    availableNow emits exactly the batch aggregation — deterministic;
    exact batch parity asserted in tests/test_streaming.py and
    hash-checked against the DuckDB replay of the enriched join."""
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
    return _run_to_parquet(out, "complete", "static_enrich", sf_dir)


@register(
    "streaming_stateful_user_counts",
    # Oracle-able: the GroupState counter accumulates monotonically
    # across micro-batches and update mode emits one row per
    # (user, batch), so max(n_events) per user is the state's FINAL
    # value — which, once every event has been processed (availableNow
    # drains the whole input), must equal the plain batch count. The
    # oracle hash-checks the custom stateful operator end to end: a
    # lost batch, double-counted state, or dropped key diverges it.
    oracle="""
    SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def streaming_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    event counter held in explicit GroupState. Update mode appends one
    row per (user, batch); the final per-user value is the max —
    the state's accumulated total, hash-checked against the batch
    groupBy count (and asserted again in tests/test_streaming.py)."""

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
    table = _run_to_memory(counted, "update", sf_dir)
    return table.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
