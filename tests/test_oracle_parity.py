"""Mirror of the driver's correctness gate: every registered query with an
oracle must match DuckDB on row count, column names, and (order-insensitive)
values at the test scale factor."""

from __future__ import annotations

import pytest

from hgn_spark.registry import load_all
from tests.conftest import SF_ORACLE

SPECS = load_all()
ORACLE_SPECS = [s for s in SPECS.values() if s.oracle is not None]


def _normalize(df):
    """pandas frame → sorted-by-name columns, canonical row ordering, rounded."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            # + 0.0 folds -0.0 into +0.0 so the exact compare below
            # can't flake on the sign of a rounded zero
            df[c] = df[c].astype("float64").round(6) + 0.0
        # duckdb can return int32 where spark gives int64 etc.
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _dtype_family(dtype) -> str:
    s = str(dtype)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("datetime"):
        return "datetime"
    return s


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, duck, spec):
    raw_got = spec.fn(spark, SF_ORACLE).toPandas()
    raw_want = duck.execute(spec.oracle).fetchdf()

    # The driver's value-hash is dtype-sensitive (ADVICE r1: DuckDB HUGEINT
    # → float64 silently passed the coerced check). Fail on family drift
    # BEFORE any normalization coerces it away.
    got_fams = {c: _dtype_family(raw_got[c].dtype) for c in sorted(raw_got.columns)}
    want_fams = {c: _dtype_family(raw_want[c].dtype) for c in sorted(raw_want.columns)}
    assert got_fams == want_fams, (
        f"{spec.name}: dtype-family drift (driver hash would diverge): "
        f"spark={got_fams} duckdb={want_fams}"
    )

    got = _normalize(raw_got)
    want = _normalize(raw_want)

    assert list(got.columns) == list(want.columns), (
        f"{spec.name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{spec.name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        # EXACT equality of the 6-dp-rounded values — the same strength
        # as the driver's value hash. A tolerance here (the old
        # rel_tol=1e-9 isclose) was strictly weaker for large
        # aggregates: revenue sums ~1e9 admitted absolute diffs the
        # driver's hash rejects, so the mirror could stay green on a
        # driver failure.
        bad = ~((g.isna() & w.isna()) | (g == w))
        assert not bad.any(), (
            f"{spec.name}: column {c} differs at rows "
            f"{got[bad].head(5).to_dict()} vs {want[bad].head(5).to_dict()}"
        )


def test_personalized_pagerank_unrolled_sql_oracle(spark, duck):
    """Personalized PageRank vs the fixed-iteration recurrence UNROLLED
    in DuckDB SQL (VERDICT r6 #5) — the same independent-engine
    technique as the registered `graph_pagerank` oracle, applied to the
    seeded variant: teleport mass returns only to the seed set, the
    start vector IS the teleport distribution, 20 rounds of one join +
    one grouped sum. Seeds = the two lowest vertex ids (deterministic
    on both sides). Not a driver row only because the 50-slot window is
    full; same evidence strength."""
    from pyspark.sql import functions as F

    from hgn_spark.graph.pagerank import personalized_pagerank
    from hgn_spark.graph.queries import _GRAPH_CTE_MAT, derived_edges
    from hgn_spark.graph.core import symmetrize

    d, n_iter = 0.85, 20
    e = derived_edges(spark, SF_ORACLE)
    seeds = (
        symmetrize(e)
        .select(F.col("src").alias("id"))
        .distinct()
        .orderBy("id")
        .limit(2)
    )
    got = {
        r["id"]: r["pagerank"]
        for r in personalized_pagerank(e, seeds, damping=d, n_iter=n_iter).collect()
    }

    base = (
        f"(CASE WHEN sd.id IS NOT NULL THEN {1.0 - d} / "
        "(SELECT n FROM ns) ELSE 0.0 END)"
    )
    rounds = ",".join(
        f"""
    pr{i} AS MATERIALIZED (
      SELECT s.dst AS id, {base} + {d} * sum(p.pr / o.od) AS pr
      FROM sym s
      JOIN pr{i - 1} p ON p.id = s.src
      JOIN outdeg o ON o.id = s.src
      LEFT JOIN seeds sd ON sd.id = s.dst
      GROUP BY s.dst, sd.id)"""
        for i in range(1, n_iter + 1)
    )
    sql = f"""
    WITH {_GRAPH_CTE_MAT},
    outdeg AS MATERIALIZED (
      SELECT src AS id, count(*) AS od FROM sym GROUP BY src),
    seeds AS MATERIALIZED (SELECT id FROM outdeg ORDER BY id LIMIT 2),
    ns AS (SELECT count(*) AS n FROM seeds),
    pr0 AS MATERIALIZED (
      SELECT o.id,
             CASE WHEN s.id IS NOT NULL
                  THEN 1.0 / (SELECT n FROM ns) ELSE 0.0 END AS pr
      FROM outdeg o LEFT JOIN seeds s ON s.id = o.id),
    {rounds}
    SELECT id, pr FROM pr{n_iter}
    """
    want = {int(r[0]): float(r[1]) for r in duck.execute(sql).fetchall()}
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) <= 1e-9, (k, got[k], want[k])


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # driver requires rows > 0 (ADVICE r1)
    assert df.columns == ["nation", "revenue", "n_orders", "avg_qty"]


def test_all_queries_have_fn():
    for name, spec in SPECS.items():
        assert callable(spec.fn), name
