"""Streaming↔batch parity at sf0.001."""

from __future__ import annotations

from hgn_spark.registry import load_all
from tests.conftest import SF_SMOKE

SPECS = load_all()


def test_tumbling_matches_batch(spark):
    stream = {
        (r["day"], r["event_type"]): (r["n"], r["total_value"])
        for r in SPECS["streaming_tumbling_daily"].fn(spark, SF_SMOKE).collect()
    }
    batch = {
        (r["day"], r["event_type"]): (r["n"], r["total_value"])
        for r in SPECS["date_trunc_daily"].fn(spark, SF_SMOKE).collect()
    }
    assert stream == batch


def test_session_windows_subset_of_batch(spark):
    stream = SPECS["streaming_session_windows"].fn(spark, SF_SMOKE).collect()
    batch = {
        (r["user_id"], r["n_events"], r["session_value"])
        for r in SPECS["sessionize_events"].fn(spark, SF_SMOKE).collect()
    }
    assert len(stream) > 0
    emitted = {(r["user_id"], r["n_events"], r["session_value"]) for r in stream}
    # Append mode withholds sessions the final watermark hasn't closed
    # (within the last hour of data); everything emitted must match a
    # batch session, and nearly all batch sessions should be emitted.
    assert emitted <= batch
    assert len(emitted) >= 0.9 * len(batch)


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
