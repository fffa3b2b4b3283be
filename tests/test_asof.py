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


# ---- property: random data matches pandas merge_asof -----------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_right_rows = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),
        st.integers(min_value=1, max_value=25),
        st.integers(min_value=0, max_value=999),
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda r: (r[0], r[1]),  # unique (key, ts): no tie ambiguity
)
_left_rows = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3", "k4"]),
        st.integers(min_value=1, max_value=25),
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(lrows=_left_rows, rrows=_right_rows)
def test_asof_matches_pandas_merge_asof(spark, lrows, rrows):
    """The union+window merge-asof must agree with pandas.merge_asof
    (backward, inclusive) on arbitrary key/timestamp layouts."""
    import pandas as pd

    left = spark.createDataFrame(
        [(i, k, _ts(d)) for i, (k, d) in enumerate(lrows)],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [(k, _ts(d), float(v)) for k, d, v in rrows] or [],
        "k string, rt timestamp, v double",
    )
    got = {
        r["id"]: (r["rt"], r["v"])
        for r in asof_join(left, right, "k", "t", "rt").collect()
    }

    lp = pd.DataFrame(
        [(i, k, _ts(d)) for i, (k, d) in enumerate(lrows)],
        columns=["id", "k", "t"],
    ).sort_values("t", kind="stable")
    rp = pd.DataFrame(
        [(k, _ts(d), float(v)) for k, d, v in rrows],
        columns=["k", "rt", "v"],
    ).sort_values("rt", kind="stable")
    if rp.empty:
        expected = {i: (None, None) for i in lp["id"]}
    else:
        m = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k")
        expected = {
            int(r.id): (
                None if pd.isna(r.rt) else r.rt.to_pydatetime(),
                None if pd.isna(r.v) else r.v,
            )
            for r in m.itertuples()
        }
    assert got == expected
