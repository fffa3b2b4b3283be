"""Compose a 1000x-class GRAPH slice (VERDICT r10 #8) by re-replicating
an existing replica slice's graph tables — lineitem (the derived
graph's edge source: self-join on l_partkey, %5-preserved suppkeys)
and supplier (HGN's vertex attributes) — instead of building a
1000-arm union from sf0.1. Replication composes: gen_scale_slice.py's
pads are multiples of 10 computed per key DOMAIN, so replicating the
k=100 slice by 10 yields the same key-disjoint isomorphic-component
structure as k=1000 from scratch (each outer replica is a disjoint
copy of the inner slice's 100 components), at 1/100th the plan size.

Only the graph tables are written — the slice feeds
scale_probe_heavy.py's pagerank_row/lpa_row/hgn_row, which read
nothing else.

Usage: python scripts/gen_graph_slice.py [k2] [src] [out]
       (defaults: 10, /tmp/hgn_scale/sf10, /tmp/hgn_scale/sf100graph
        -> 10 x the 100x slice = the 1000x point)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from gen_scale_slice import _domain_pad, replicate_keyed  # noqa: E402


def main() -> None:
    k2 = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hgn_scale/sf10"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/hgn_scale/sf100graph"
    os.makedirs(out_dir, exist_ok=True)

    from hgn_spark.session import get_spark

    spark = get_spark(app_name="gen_graph_slice")
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    supp = spark.read.parquet(f"{src}/supplier.parquet")
    orders = spark.read.parquet(f"{src}/orders.parquet")
    part = spark.read.parquet(f"{src}/part.parquet")
    # Same domain-pad discipline as the base generator: suppkey over
    # supplier ∪ lineitem, order/part keys over their domains (kept
    # aligned even though the graph rows don't read orders/part — the
    # pads must not alias lineitem FKs).
    suppkey = _domain_pad([(supp, "s_suppkey"), (li, "l_suppkey")])
    orderkey = _domain_pad([(orders, "o_orderkey"), (li, "l_orderkey")])
    partkey = _domain_pad([(part, "p_partkey"), (li, "l_partkey")])

    replicate_keyed(
        li,
        {"l_orderkey": orderkey, "l_partkey": partkey, "l_suppkey": suppkey},
        k2,
    ).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    print("lineitem: written", flush=True)
    replicate_keyed(supp, {"s_suppkey": suppkey}, k2).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/supplier.parquet")
    print("supplier: written", flush=True)
    print(f"graph slice {k2}x of {src} at {out_dir}")


if __name__ == "__main__":
    main()
