"""End-to-end CLI run: config → load → HGN → exports, on a generated
two-triangle graph (the test_graph.py fixture as CSV files)."""

from __future__ import annotations

import os

import pytest

from hgn_spark.main import run

CONF = """
spark:
  config: {{}}
input:
  nodes:
    path: {nodes}
    feature_names: [id, attr]
    has_header: true
  edges:
    path: {edges}
    has_header: true
run_options:
  r_lvl1_thres: 0.25
  r_lvl2_thres: 0.9
  max_edge_weight: 0.9
  betweenness_thres: 5.0
  feature_min_avg: 0.6
  max_steps: 5
  max_sp_length: 2
  min_comp_size: 2
  features_to_check: [attr]
"""


@pytest.fixture()
def conf_file(tmp_path):
    nodes = tmp_path / "nodes.csv"
    nodes.write_text(
        "id,attr\n1,a\n2,a\n3,a\n4,b\n5,b\n6,b\n7,c\n"
    )
    edges = tmp_path / "edges.csv"
    edges.write_text("src,dst\n1,2\n2,3\n1,3\n4,5\n5,6\n4,6\n3,4\n")
    conf = tmp_path / "conf.yml"
    conf.write_text(CONF.format(nodes=nodes, edges=edges))
    return str(conf), str(tmp_path / "out")


def test_cli_run_end_to_end(spark, conf_file):
    conf_path, out_dir = conf_file
    stats = run(conf_path, out_dir)
    # Bridge deleted → two triangle communities; isolated vertex 7
    # dropped; min_comp_size=2 keeps both size-3 communities.
    assert stats == {"n_vertices": 6, "n_communities": 2}
    # The filter must size COMMUNITIES (post-pruning), not the original
    # graph's components: with min_comp_size=4 both size-3 communities
    # die even though the original graph is one size-7 component (the
    # old wiring re-ran CC on the unpruned edges and was a silent no-op
    # on any connected input).
    import yaml

    conf = yaml.safe_load(open(conf_path))
    conf["run_options"]["min_comp_size"] = 4
    strict = conf_path + ".strict.yml"
    with open(strict, "w") as f:
        yaml.safe_dump(conf, f)
    stats4 = run(strict, out_dir + "_strict")
    assert stats4 == {"n_vertices": 0, "n_communities": 0}
    assert os.path.exists(os.path.join(out_dir, "communities.parquet"))
    csv_dir = os.path.join(out_dir, "communities_csv")
    comps = [d for d in os.listdir(csv_dir) if d.startswith("component=")]
    assert len(comps) == 2
    back = spark.read.parquet(os.path.join(out_dir, "communities.parquet"))
    assert {r["component"] for r in back.collect()} == {1, 4}
