"""Scale-utility checks: bucketed joins really skip the exchange;
salted joins preserve results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hgn_spark.operators.scale import read_bucketed, salted_join, write_bucketed


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # Managed tables land in the session warehouse dir; isolate names.
    return spark


def test_bucketed_join_has_no_exchange(spark):
    import shutil

    # A fresh Derby metastore can't see tables a previous process wrote,
    # but their warehouse directories survive — clear both layers.
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_bucket_a", "t_bucket_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    a = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 10_000).withColumn("w", F.col("id") % 7)
    write_bucketed(a, "t_bucket_a", ["id"], num_buckets=8, sort_cols=["id"])
    write_bucketed(b, "t_bucket_b", ["id"], num_buckets=8, sort_cols=["id"])
    ta = read_bucketed(spark, "t_bucket_a")
    tb = read_bucketed(spark, "t_bucket_b")
    # Tables this small get broadcast, which hides the bucketing (and
    # is the right call!). Pin the threshold down to expose the
    # co-located sort-merge path a 100 TB fact-fact join would take.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Same key, same bucket count: both sides pre-shuffled at write
        # time — the sort-merge join plans without any shuffle Exchange.
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark):
    # Skewed big side: 90% of rows share key 1.
    big = spark.range(0, 5_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim")
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s")
    )
    salted = salted_join(big, small, "k", salt_factor=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_outer_kind(spark):
    big = spark.range(0, 100).select((F.col("id") % 5).alias("k"), "id")
    small = spark.range(0, 3).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    out = salted_join(big, small, "k", salt_factor=4, how="left")
    assert out.count() == 100
    assert out.filter(F.col("tag").isNull()).count() == 40  # keys 3,4 unmatched


def test_standing_index_bucketed_join(spark):
    """The 100 TB ingestion layout (r10): the standing shingle index
    as a bucketed table. Pins BOTH halves of the claim:

    - correctness: the bucketed-index path returns exactly the
      oracle-checked vs_corpus branch of neardup_incremental;
    - physics: with broadcast disabled, the candidate join plans ONE
      Exchange (the incoming batch shuffled into the bucket layout) —
      the standing-index side reads in place, bucket-local.
    """
    import shutil

    from pyspark.sql import functions as F

    from hgn_spark.operators.dedup import (
        neardup_incremental,
        neardup_vs_standing_index,
        write_standing_shingle_index,
    )
    from tests.conftest import SF_SMOKE

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS t_standing_idx")
    shutil.rmtree(f"{warehouse}/t_standing_idx", ignore_errors=True)
    write_standing_shingle_index(
        spark, SF_SMOKE, table="t_standing_idx", num_buckets=8
    )

    got = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in neardup_vs_standing_index(
            spark, SF_SMOKE, table="t_standing_idx"
        ).collect()
    }
    want = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in neardup_incremental(spark, SF_SMOKE).collect()
        if r["op"] == "vs_corpus"
    }
    assert got == want
    assert len(got) > 0

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from hgn_spark.operators.dedup import (
            INC_BATCH_MOD,
            INC_BATCH_REM,
            _hashed_shingle_index,
        )

        standing = spark.table("t_standing_idx").select(
            F.col("doc_id").alias("d2"), "h"
        )
        batch = (
            _hashed_shingle_index(spark, SF_SMOKE)
            .filter(F.col("doc_id") % INC_BATCH_MOD == INC_BATCH_REM)
            .select(F.col("doc_id").alias("d1"), "h")
        )
        joined = batch.join(standing, "h")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_standing_index_two_epochs(spark):
    """Feed-after-feed ingestion over the bucketed standing index
    (VERDICT r10 #7): epoch 1's batch joins the initial corpus index,
    is accepted, and APPENDS its shingles in place
    (append_batch_to_standing_index, same bucketBy(h) spec); epoch 2's
    batch must then see corpus + epoch-1 docs — parity pinned against
    the whole-corpus exact-jaccard pair list, and the epoch-2 join
    must STILL plan exactly one Exchange (the index is never
    re-shuffled, no matter how many epochs appended)."""
    import shutil

    from pyspark.sql import functions as F

    from hgn_spark.operators.dedup import (
        append_batch_to_standing_index,
        dedup_ngram_jaccard_pairs,
        neardup_vs_standing_index,
        write_standing_shingle_index,
        _hashed_shingle_index,
    )
    from tests.conftest import SF_SMOKE

    MOD, EP1, EP2 = 5, 0, 4  # corpus = residues 1-3; two feeds
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS t_standing_2ep")
    shutil.rmtree(f"{warehouse}/t_standing_2ep", ignore_errors=True)
    write_standing_shingle_index(
        spark,
        SF_SMOKE,
        table="t_standing_2ep",
        num_buckets=8,
        batch_mod=MOD,
        exclude_rems=(EP1, EP2),
    )

    # The whole-corpus exact pair list is the oracle for both epochs
    # (same verify, candidate generation un-gated).
    allp = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in dedup_ngram_jaccard_pairs(spark, SF_SMOKE).collect()
    }

    def _expected(feed_rem: int, indexed_rems: set[int]) -> set:
        # vs_corpus orientation: the feed doc is d1.
        out = set()
        for d1, d2, j in allp:
            r1, r2 = d1 % MOD, d2 % MOD
            if r1 == feed_rem and r2 in indexed_rems:
                out.add((d1, d2, j))
            elif r2 == feed_rem and r1 in indexed_rems:
                out.add((d2, d1, j))
        return out

    got1 = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in neardup_vs_standing_index(
            spark, SF_SMOKE, table="t_standing_2ep", batch_mod=MOD, batch_rem=EP1
        ).collect()
    }
    assert got1 == _expected(EP1, {1, 2, 3})

    # Epoch 1 accepted -> append its shingles in place.
    append_batch_to_standing_index(
        spark,
        SF_SMOKE,
        table="t_standing_2ep",
        num_buckets=8,
        batch_mod=MOD,
        batch_rem=EP1,
    )

    got2 = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in neardup_vs_standing_index(
            spark, SF_SMOKE, table="t_standing_2ep", batch_mod=MOD, batch_rem=EP2
        ).collect()
    }
    want2 = _expected(EP2, {1, 2, 3, EP1})
    assert got2 == want2
    # Non-vacuous: epoch 2 must actually surface at least one pair
    # against an epoch-1 doc, or the append proved nothing.
    assert any(d2 % MOD == EP1 for _, d2, _ in got2), got2

    # Physics after the append: one Exchange, batch side only.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        standing = spark.table("t_standing_2ep").select(
            F.col("doc_id").alias("d2"), "h"
        )
        batch = (
            _hashed_shingle_index(spark, SF_SMOKE)
            .filter(F.col("doc_id") % MOD == EP2)
            .select(F.col("doc_id").alias("d1"), "h")
        )
        plan = (
            batch.join(standing, "h")._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
