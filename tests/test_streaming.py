"""Streaming↔batch parity at sf0.001."""

from __future__ import annotations

from hgn_spark.registry import load_all
from tests.conftest import SF_SMOKE

SPECS = load_all()


def test_windowed_aggs_match_batch(spark):
    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table

    rows = SPECS["streaming_windowed_aggs"].fn(spark, SF_SMOKE).collect()
    stream_t = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in rows
        if r["branch"] == "tumbling"
    }
    batch = {
        (r["day"], r["event_type"]): (r["n"], r["total_value"])
        for r in SPECS["json_date_daily"].fn(spark, SF_SMOKE).collect()
    }
    assert stream_t == batch
    # sliding branch: each event lands in exactly two 2d/1d windows
    stream_s = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in rows
        if r["branch"] == "sliding"
    }
    e = load_table(spark, SF_SMOKE, "events")
    two = e.select(
        F.explode(
            F.array(
                F.date_trunc("day", "ts"),
                F.date_trunc("day", "ts") - F.expr("INTERVAL 1 DAY"),
            )
        ).alias("window_start"),
        "event_type",
        "value",
    )
    want_s = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in two.groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .collect()
    }
    assert stream_s == want_s


def test_session_windows_subset_of_batch(spark):
    from hgn_spark.operators.relational import sessionize_events

    stream = SPECS["streaming_session_windows"].fn(spark, SF_SMOKE).collect()
    batch = {
        (r["user_id"], r["n_events"], r["session_value"])
        for r in sessionize_events(spark, SF_SMOKE).collect()
    }
    assert len(stream) > 0
    emitted = {(r["user_id"], r["n_events"], r["session_value"]) for r in stream}
    # Append mode withholds sessions the final watermark hasn't closed
    # (within the last hour of data); everything emitted must match a
    # batch session, and nearly all batch sessions should be emitted.
    assert emitted <= batch
    assert len(emitted) >= 0.9 * len(batch)


def test_session_windows_incremental_multibatch(spark, tmp_path):
    """Sessionization across REAL incremental micro-batches: the event
    stream arrives as three chronological feeds, each processed by its
    own availableNow run against a SHARED checkpoint — so session
    state (including sessions spanning feed boundaries) survives
    restart via the state store, the watermark advances per run, and
    append emission accumulates. The union of emitted sessions must
    equal the batch sessionizer filtered by the final watermark — the
    same rule the single-batch driver oracle replays. This is the
    deployment shape (a daily feed into a standing checkpoint), not
    the single-batch degenerate case."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    mid1, mid2 = events.approxQuantile("ts_us", [0.34, 0.67], 0.0)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    chunks = [
        events.filter(F.col("ts_us") <= mid1).drop("ts_us"),
        events.filter((F.col("ts_us") > mid1) & (F.col("ts_us") <= mid2)).drop(
            "ts_us"
        ),
        events.filter(F.col("ts_us") > mid2).drop("ts_us"),
    ]
    schema = chunks[0].schema
    events = events.drop("ts_us")
    for i, chunk in enumerate(chunks):
        chunk.write.mode("append").parquet(src)
        s = (
            spark.readStream.schema(schema).format("parquet").load(src)
            .withWatermark("ts", "1 hour")
        )
        agg = s.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        q = (
            agg.select(
                "user_id",
                F.col("sw.start").alias("session_start"),
                "n_events",
                "session_value",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    emitted = {
        (r["user_id"], r["session_start"], r["n_events"], r["session_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert len(emitted) > 0

    # Expected: batch gap-sessionization, sessions whose window end
    # (last event + 30 min) the final watermark (max ts - 1 h) passed.
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    us = F.unix_micros(F.col("ts"))
    sess = (
        events.withColumn(
            "new_s", F.when(us - F.lag(us).over(w) < 1_800_000_000, 0).otherwise(1)
        )
        .withColumn("sid", F.sum("new_s").over(wrun))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            (F.unix_micros(F.max("ts")) + 1_800_000_000).alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )
    wm = events.agg(F.unix_micros(F.max("ts")) - 3_600_000_000).first()[0]
    want = {
        (r["user_id"], r["session_start"], r["n_events"], r["session_value"])
        for r in sess.filter(F.col("end_us") <= wm).collect()
    }
    assert emitted == want
    # the run count is real multi-batch: at least one session must span
    # a feed boundary if any user has events in adjacent chunks within
    # 30 min — regardless, the equality above proves cross-run state
    # merge + per-run watermark advance produced exactly the batch
    # semantics.


def test_tumbling_incremental_multibatch(spark, tmp_path):
    """Complete-mode tumbling aggregation across three incremental
    feeds, each its own availableNow run against a SHARED checkpoint
    with the foreachBatch-overwrite sink (the production pattern for
    complete output): after the last feed the overwritten result table
    equals the full batch aggregation — aggregation state survives
    restarts and each trigger's overwrite replaces, never appends."""
    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    mid1, mid2 = events.approxQuantile("ts_us", [0.34, 0.67], 0.0)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    chunks = [
        events.filter(F.col("ts_us") <= mid1).drop("ts_us"),
        events.filter((F.col("ts_us") > mid1) & (F.col("ts_us") <= mid2)).drop(
            "ts_us"
        ),
        events.filter(F.col("ts_us") > mid2).drop("ts_us"),
    ]
    schema = chunks[0].schema
    for chunk in chunks:
        chunk.write.mode("append").parquet(src)
        s = (
            spark.readStream.schema(schema).format("parquet").load(src)
            .withWatermark("ts", "1 day")
        )
        agg = s.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
        q = (
            agg.select(F.col("w.start").alias("day"), "event_type", "n")
            .writeStream.foreachBatch(
                lambda batch, _e: batch.write.mode("overwrite").parquet(out)
            )
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    got = {
        (r["day"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["day"], r["event_type"]): r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_dedup_matches_batch(spark):
    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table

    got = {
        r["event_type"]: r["n"]
        for r in SPECS["streaming_dedup_events"].fn(spark, SF_SMOKE).collect()
    }
    e = load_table(spark, SF_SMOKE, "events")
    want = {
        r["event_type"]: r["n"]
        for r in e.dropDuplicates(["user_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    # the dedup must actually fire: keys repeat in the synthetic feed
    assert sum(want.values()) < e.count()


def test_dedup_incremental_multibatch(spark, tmp_path):
    """Bounded-state streaming dedup across three chronological feeds
    with a shared checkpoint: dropDuplicatesWithinWatermark keys age
    out behind the watermark, yet on feeds with no cross-feed
    duplicates beyond the horizon the accumulated append output equals
    the batch dropDuplicates — the contract the bounded-state variant
    promises."""
    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table

    events = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    mid1, mid2 = events.approxQuantile("ts_us", [0.34, 0.67], 0.0)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    chunks = [
        events.filter(F.col("ts_us") <= mid1).drop("ts_us"),
        events.filter((F.col("ts_us") > mid1) & (F.col("ts_us") <= mid2)).drop(
            "ts_us"
        ),
        events.filter(F.col("ts_us") > mid2).drop("ts_us"),
    ]
    schema = chunks[0].schema
    for chunk in chunks:
        chunk.write.mode("append").parquet(src)
        s = (
            spark.readStream.schema(schema).format("parquet").load(src)
            .withWatermark("ts", "1 hour")
        )
        deduped = s.dropDuplicatesWithinWatermark(["event_id"]).select(
            "event_id", "event_type"
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    got = spark.read.schema(
        "event_id long, event_type string"
    ).parquet(out)
    want = load_table(spark, SF_SMOKE, "events").dropDuplicates(["event_id"])
    assert got.count() == want.count()
    assert got.select("event_id").distinct().count() == want.count()


def test_stream_stream_join_matches_batch(spark):
    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table

    got = {
        r["user_id"]: r["n_click_purchase_pairs"]
        for r in SPECS["streaming_stream_stream_join"].fn(spark, SF_SMOKE).collect()
    }
    e = load_table(spark, SF_SMOKE, "events")
    p = e.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = e.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    want = {
        r["p_user"]: r["n"]
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy("p_user")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stateful_counts_match_batch(spark):
    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table

    got = {
        r["user_id"]: r["n_events"]
        for r in SPECS["streaming_stateful_user_counts"].fn(spark, SF_SMOKE).collect()
    }
    want = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_static_enrich_matches_batch(spark):
    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table

    got = {
        (r["day"], r["buyer_tier"]): (r["n_events"], r["total_value"])
        for r in SPECS["streaming_static_enrich"].fn(spark, SF_SMOKE).collect()
    }
    e = load_table(spark, SF_SMOKE, "events")
    dim = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("lifetime_purchases"))
    )
    # left join + coalesce: zero-purchase users are 'light', not dropped
    tier = (
        F.when(F.coalesce("lifetime_purchases", F.lit(0)) >= 10, "heavy")
        .when(F.coalesce("lifetime_purchases", F.lit(0)) >= 3, "mid")
        .otherwise("light")
    )
    want = {
        (r["day"], r["buyer_tier"]): (r["n_events"], r["total_value"])
        for r in e.join(dim, "user_id", "left")
        .withColumn("buyer_tier", tier)
        .groupBy(F.date_trunc("day", "ts").alias("day"), "buyer_tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_dedup_state_bounded_by_watermark_horizon(spark):
    """The bounded-state claim, MEASURED (VERDICT r7 #7): replaying
    events as time-ordered files (one micro-batch each, so the
    watermark advances between batches and eviction actually runs),
    dropDuplicatesWithinWatermark's state tracks keys within the
    watermark horizon — it drains to near-zero once the final
    watermark passes the data — while plain dropDuplicates (the
    anti-pattern the operator docstring warns about) accumulates
    every key ever seen, monotonically, to the corpus total."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from streaming_state_probe import probe

    out = probe(spark, SF_SMOKE, n_files=8)
    total = out["total_distinct_keys"]
    bounded, unbounded = out["bounded_curve"], out["unbounded_curve"]
    assert unbounded[-1] == total  # keeps EVERY key ever seen
    assert all(a <= b for a, b in zip(unbounded, unbounded[1:]))  # monotone
    # Bounded state never exceeds the unbounded total and, decisively,
    # drains once the final watermark passes the last events — state
    # is horizon-bound, not history-bound (observed 3 of 750).
    assert max(bounded) < total
    assert bounded[-1] < 0.1 * total


def test_state_store_partitions_pinned_at_checkpoint_creation(spark, tmp_path):
    """The operational cliff a 100 TB deployment hits in week one
    (VERDICT r8 #6): AQE is disabled inside stateful streaming
    workloads, so `spark.sql.shuffle.partitions` AT FIRST RUN
    permanently fixes the number of state-store partitions for that
    checkpoint — later session settings are ignored on restart (the
    count is read back from the checkpoint's offset metadata), they do
    NOT resize the state store. Pinned here: a checkpoint created at 7
    partitions (a) lays out exactly 7 state-store partition dirs,
    (b) restarts cleanly under a session setting of 13, (c) still runs
    on 7 partitions after that restart, and (d) produces exactly the
    batch-dedup result across both runs. Sizing guidance lives in
    ARCHITECTURE.md §streaming: pick first-run partitions for the
    TARGET state size, not the first day's."""
    import os

    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts"
    )
    mid = int(events.agg(F.expr("percentile(unix_micros(ts), 0.5)")).first()[0])
    chunks = [
        events.filter(F.unix_micros("ts") <= mid),
        events.filter(F.unix_micros("ts") > mid),
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = events.schema

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n_part, chunk in zip(("7", "13"), chunks):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            chunk.write.mode("append").parquet(src)
            q = (
                spark.readStream.schema(schema).format("parquet").load(src)
                .withWatermark("ts", "1 hour")
                .dropDuplicates(["event_id"])
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # State-store layout: ckpt/state/<operator>/<partition>/…
            state_op = os.path.join(ckpt, "state", "0")
            parts = sorted(
                int(d) for d in os.listdir(state_op) if d.isdigit()
            )
            assert parts == list(range(7)), (
                f"state partitions {parts} after run at session "
                f"setting {n_part} — first-run count must pin the layout"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)

    got = {r["event_id"] for r in spark.read.parquet(out).collect()}
    want = {r["event_id"] for r in events.select("event_id").distinct().collect()}
    assert got == want


import pytest


@pytest.mark.parametrize(
    "provider,marker",
    [
        (
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
            ".delta",
        ),
        (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
            ".zip",
        ),
    ],
    ids=["hdfs", "rocksdb"],
)
def test_state_store_provider_parity(spark, tmp_path, provider, marker):
    """The state-store BACKEND knob (VERDICT r9 #7): at 100 TB the
    default HDFSBackedStateStoreProvider holds every partition's state
    on the executor HEAP — a large watermark-dedup or stateful-counter
    state evicts into GC pressure long before it evicts into disk. The
    production configuration is RocksDBStateStoreProvider (off-heap +
    SST files). Pinned here, per provider, against fresh checkpoints:
    (a) watermark dedup and (b) the applyInPandasWithState counter
    produce exactly the batch-truth results, and (c) the checkpoint's
    state dir carries the provider's own file format (.delta vs .zip
    snapshots) — proving the knob engaged rather than silently falling
    back. Providers are NOT interchangeable within one checkpoint
    (incompatible state formats), hence fresh dirs per case; sizing
    guidance lives in ARCHITECTURE.md §streaming."""
    import os
    from glob import glob
    from typing import Any, Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from hgn_spark.catalog import load_table

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts"
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)
    schema = events.schema

    orig = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try:
        # (a) watermark dedup through the file sink
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        q = (
            spark.readStream.schema(schema).format("parquet").load(src)
            .withWatermark("ts", "1 hour")
            .dropDuplicates(["event_id"])
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r["event_id"] for r in spark.read.parquet(out).collect()}
        want = {r["event_id"] for r in events.select("event_id").collect()}
        assert got == want

        # (c) the provider's on-disk signature, not a silent fallback
        state_files = glob(os.path.join(ckpt, "state", "0", "*", "*"))
        assert any(f.endswith(marker) for f in state_files), (
            f"no {marker} files under {ckpt}/state — provider "
            f"{provider} did not engage"
        )

        # (b) custom stateful counter (GroupState) through memory sink
        def _count(
            key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
        ) -> Iterator[pd.DataFrame]:
            total = state.get[0] if state.exists else 0
            for pdf in pdfs:
                total += len(pdf)
            state.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

        counted = (
            spark.readStream.schema(schema).format("parquet").load(src)
            .groupBy("user_id")
            .applyInPandasWithState(
                _count,
                outputStructType="user_id long, n_events long",
                stateStructType="n long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        name = f"prov_parity_{marker.strip('.')}"
        q2 = (
            counted.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
        got_counts = {
            r["user_id"]: r["n_events"]
            for r in spark.table(name)
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"))
            .collect()
        }
        want_counts = {
            r["user_id"]: r["n"]
            for r in events.groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got_counts == want_counts
    finally:
        if orig is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", orig
            )


def test_stream_events_directory_layout(spark, tmp_path):
    """Streaming rows must read BOTH events layouts: the testdata's
    single events.parquet FILE and the Spark-written DIRECTORY of
    part-files (every real deployment; the scale slices). The r10 100x
    probe caught the directory case silently matching zero files
    (pathGlobFilter applies to leaf names), so every streaming row
    emitted nothing — pin both layouts to the same result."""
    from pyspark.sql import functions as F

    from hgn_spark.catalog import load_table
    from hgn_spark.streaming.queries import _stream_events

    # Build a directory-layout copy of the smoke events table.
    d = str(tmp_path / "slice")
    load_table(spark, SF_SMOKE, "events").write.parquet(
        f"{d}/events.parquet"
    )

    def drain(sf_dir):
        s = _stream_events(spark, sf_dir).groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        name = f"dirlayout_{abs(hash(sf_dir)) % 10**8}"
        q = (
            s.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["event_type"], r["n"]) for r in spark.table(name).collect()
        }

    got_file = drain(SF_SMOKE)
    got_dir = drain(d)
    assert got_file == got_dir
    assert len(got_file) > 0


def test_stream_partitions_pin_rejects_concurrent_second_pin(spark):
    """VERDICT r14 #8 / ADVICE r14: the shuffle-partition pin mutates
    session-global conf with save/restore; a second pin while one is
    held must fail loudly instead of capturing the pinned value as its
    `_old` and restoring the session to a stale state."""
    import pytest as _pytest

    from hgn_spark.streaming.queries import _stream_partitions

    old = spark.conf.get("spark.sql.shuffle.partitions")
    with _stream_partitions(spark, 3):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
        with _pytest.raises(RuntimeError, match="single-pin"):
            with _stream_partitions(spark, 5):
                pass
        # The failed pin must not have touched the conf.
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    # And the lock is free again after a clean exit.
    with _stream_partitions(spark, 4):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_stream_shuffle_partitions_ignores_non_parquet_entries(
    spark, tmp_path, monkeypatch
):
    """ADVICE r14: directory sizing must count *.parquet data files
    only — subdirectories and sidecar files would mis-size the state
    partition count."""
    import hgn_spark.streaming.queries as sq

    d = tmp_path / "events.parquet"
    d.mkdir()
    (d / "part-0001.parquet").write_bytes(b"x" * 1000)
    (d / "junk.txt").write_bytes(b"y" * (64 << 20))  # would add 2 partitions
    (d / "nested").mkdir()
    (d / "_SUCCESS").write_bytes(b"")
    monkeypatch.setattr(sq, "_STREAM_STATE_PART_BYTES", 1 << 20)
    assert sq._stream_shuffle_partitions(spark, str(tmp_path)) == 1
