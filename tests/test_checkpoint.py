"""CheckpointJanitor attribution under concurrency (ADVICE r14,
medium): the getPersistentRDDs before/after diff is exercised from
thread pools (HGN init, simsearch chains); attribution must be exact
per thread so releasing one thread's generation can never unpersist
another thread's live localCheckpoint (which has no lineage and cannot
be recomputed)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from hgn_spark.checkpoint import (
    CheckpointJanitor,
    attributed_local_checkpoint,
    persistent_rdd_ids,
    release_rdds,
)


def test_lazy_local_checkpoint_registers_persistent_rdd_synchronously(spark):
    """The locked-attribution design depends on Dataset.localCheckpoint
    (eager=False) registering its RDD with the context's persistent map
    at CALL time, before any job runs — pin that engine behavior."""
    df = spark.range(100)
    before = persistent_rdd_ids(spark)
    lazy = df.localCheckpoint(eager=False)
    new = persistent_rdd_ids(spark) - before
    assert new, "lazy localCheckpoint did not register a persistent RDD"
    assert lazy.count() == 100
    release_rdds(spark, new)


def test_concurrent_janitor_attribution_is_disjoint_and_safe(spark):
    """Two threads checkpointing concurrently must attribute DISJOINT
    id sets, and releasing one thread's set must leave the other
    thread's materialized frame fully readable."""
    jan = CheckpointJanitor(spark)

    def chain(tag: int):
        # A frame with a real (if small) job behind it, so the
        # materialization windows overlap across threads.
        df = (
            spark.range(20000)
            .selectExpr("id", f"id % {7 + tag} AS k")
            .groupBy("k")
            .count()
        )
        return jan.checkpoint(df)

    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [pool.submit(chain, i) for i in range(4)]
        results = [f.result() for f in futs]

    id_sets = [ids for _, ids in results]
    for i in range(len(id_sets)):
        for j in range(i + 1, len(id_sets)):
            assert id_sets[i].isdisjoint(id_sets[j]), (i, j, id_sets)

    # Release every other set; the survivors must still be readable
    # (a localCheckpoint has no lineage — a cross-attributed release
    # would have destroyed live blocks).
    for k, (_, ids) in enumerate(results):
        if k % 2 == 0:
            jan.release(ids)
    for k, (df, _) in enumerate(results):
        if k % 2 == 1:
            assert df.count() == 7 + k
    for k, (_, ids) in enumerate(results):
        if k % 2 == 1:
            jan.release(ids)


def test_attributed_local_checkpoint_during_janitor_window(spark):
    """A raw attributed_local_checkpoint on another thread must never
    leak its id into a concurrently-attributing janitor window."""
    jan = CheckpointJanitor(spark)

    raw_frames = []

    def raw_chain():
        for _ in range(5):
            raw_frames.append(attributed_local_checkpoint(spark.range(5000)))

    jan_results = []

    def jan_chain():
        for i in range(5):
            jan_results.append(jan.checkpoint(spark.range(1000 + i)))

    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(raw_chain)
        f2 = pool.submit(jan_chain)
        f1.result()
        f2.result()

    # Releasing every janitor set must leave every raw frame readable.
    for _, ids in jan_results:
        jan.release(ids)
    for k, df in enumerate(raw_frames):
        assert df.count() == 5000
