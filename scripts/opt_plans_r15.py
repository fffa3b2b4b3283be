"""Capture .explain("formatted") for every declared query into
plans/r15/<query>_<tag>.txt (tag = before/after, argv[1]).

Usage: python scripts/opt_plans_r15.py before [row ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = _REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)

    from hgn_spark.registry import load_all
    from hgn_spark.session import get_spark

    specs = load_all()
    rows = sys.argv[2:] or list(specs)
    spark = get_spark(app_name="opt_plans_r15")
    for name in rows:
        spec = specs.get(name)
        if spec is None:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"# wrote {name}_{tag}.txt ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
