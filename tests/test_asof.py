"""asof_join semantics: inclusive vs strict ties, left-outer no-match,
null-key right rows, and the merge-asof plan shape (single shuffle)."""

from __future__ import annotations

import datetime as dt

import pytest

from hgn_spark.operators.relational import asof_join


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts(5)),   # matches right at day 3 (incl+strict)
            (2, "k1", _ts(10)),  # tie with right at day 10
            (3, "k1", _ts(1)),   # before any right row -> nulls
            (4, "k2", _ts(9)),   # key with no right rows at all
        ],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts(3), 30.0),
            ("k1", _ts(10), 100.0),
            ("k1", _ts(20), 200.0),  # future row: never visible
            (None, _ts(1), -1.0),    # null key: dropped
        ],
        "k string, rt timestamp, v double",
    )
    return left, right


def _by_id(rows):
    return {r["id"]: (r["rt"], r["v"]) for r in rows}


def test_inclusive_tie_takes_equal_ts(frames):
    left, right = frames
    got = _by_id(asof_join(left, right, "k", "t", "rt").collect())
    assert got[1] == (_ts(3), 30.0)
    assert got[2] == (_ts(10), 100.0)  # equal ts IS a match
    assert got[3] == (None, None)
    assert got[4] == (None, None)


def test_strict_tie_skips_equal_ts(frames):
    left, right = frames
    got = _by_id(asof_join(left, right, "k", "t", "rt", strict=True).collect())
    assert got[2] == (_ts(3), 30.0)  # equal ts is NOT a match -> day 3
    assert got[1] == (_ts(3), 30.0)


def test_left_columns_preserved(frames):
    left, right = frames
    out = asof_join(left, right, "k", "t", "rt")
    assert out.columns == ["id", "k", "t", "rt", "v"]
    assert out.count() == left.count()  # left-outer: no row loss


def test_single_shuffle_plan(frames):
    """The merge-asof plan must contain exactly one Exchange (the key
    hash-shuffle feeding the window sort) — no join operator at all."""
    left, right = frames
    plan = (
        asof_join(left, right, "k", "t", "rt")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan
