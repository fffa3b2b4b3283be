"""The bench regression gate's spread adjudication (ADVICE r12
medium): INSPREAD may only clear an over-threshold reading when the
spread is same-code with the NEW artifact AND the spread's own
fastest pass is under the line — a consistent regression baked into
every spread pass must surface as SPREADWARN, not self-exonerate.

Pure subprocess tests over fixture JSONs — no Spark.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "bench_regression.py",
)


def _run(tmp_path, new, base, spread=None, thresh="1.3"):
    paths = []
    for name, doc in (("new", new), ("base", base), ("spread", spread)):
        if doc is None:
            continue
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(doc))
        paths.append(str(p))
    argv = [sys.executable, SCRIPT, paths[0], paths[1], thresh] + paths[2:]
    res = subprocess.run(argv, capture_output=True, text=True, timeout=60)
    return res.returncode, res.stdout


def test_inspread_requires_fast_floor(tmp_path):
    """Same-code spread covers the reading, but even its fastest pass
    is over thresh*baseline -> SPREADWARN (not INSPREAD), exit 0."""
    new = {"queries": {"q": 2.0}, "tree_hash": "T1"}
    base = {"queries": {"q": 1.0}}
    spread = {
        "tree_hash": "T1",
        "spread": {"q": {"min": 1.9, "median": 2.0, "max": 2.1, "passes": 5}},
    }
    code, out = _run(tmp_path, new, base, spread)
    assert code == 0
    assert "SPREADWARN q:" in out
    assert "INSPREAD" not in out
    assert "consistent slowdown" in out


def test_inspread_granted_when_min_under_line(tmp_path):
    """Same-code spread whose min is a clean reading -> INSPREAD."""
    new = {"queries": {"q": 2.0}, "tree_hash": "T1"}
    base = {"queries": {"q": 1.0}}
    spread = {
        "tree_hash": "T1",
        "spread": {"q": {"min": 0.9, "median": 1.5, "max": 2.1, "passes": 5}},
    }
    code, out = _run(tmp_path, new, base, spread)
    assert code == 0
    assert "INSPREAD q:" in out and "noise, not code" in out


def test_provenance_mismatch_still_warns(tmp_path):
    """Spread recorded on different code cannot clear anything."""
    new = {"queries": {"q": 2.0}, "tree_hash": "T1"}
    base = {"queries": {"q": 1.0}}
    spread = {
        "tree_hash": "OTHER",
        "spread": {"q": {"min": 0.9, "median": 1.5, "max": 2.1, "passes": 5}},
    }
    code, out = _run(tmp_path, new, base, spread)
    assert code == 0
    assert "SPREADWARN q:" in out and "adjudicate manually" in out


def test_over_threshold_outside_spread_fails(tmp_path):
    new = {"queries": {"q": 2.0}, "tree_hash": "T1"}
    base = {"queries": {"q": 1.0}}
    spread = {
        "tree_hash": "T1",
        "spread": {"q": {"min": 0.9, "median": 1.0, "max": 1.1, "passes": 5}},
    }
    code, out = _run(tmp_path, new, base, spread)
    assert code == 1
    assert "FAIL     q:" in out


def test_under_threshold_passes_clean(tmp_path):
    new = {"queries": {"q": 1.1}, "tree_hash": "T1"}
    base = {"queries": {"q": 1.0}}
    code, out = _run(tmp_path, new, base)
    assert code == 0
    assert "ok       q:" in out
