"""Shuffle-bytes regression gate (round-12, VERDICT r11 task 2).

Unit tests for tools/bench_diff.py's pure comparison, plus the real
gate: the repo's current BENCH_FULL.json must not show an
unallowlisted >1.2x shuffle growth against the committed
previous-round baseline (tools/shuffle_baseline.json). Wall seconds
are environment noise; shuffle bytes are the work metric."""
from __future__ import annotations

import json
import os
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(REPO, "tools"))

import bench_diff  # noqa: E402


def test_diff_flags_ratio_and_floor():
    prev = {"a": 10_000_000, "b": 10_000_000, "c": 1_000, "d": 5_000_000}
    cur = {
        "a": 13_000_000,   # x1.3 and +3MB -> regression
        "b": 11_000_000,   # x1.1 -> under ratio, ok
        "c": 100_000,      # x100 but +99KB < abs floor -> jitter, ok
        "d": 5_000_000,    # flat
        "e": 7,            # new query, no baseline
    }
    d = bench_diff.diff(cur, prev)
    assert [r["query"] for r in d["regressions"]] == ["a"]
    assert d["regressions"][0]["ratio"] == 1.3
    assert d["new"] == ["e"]
    assert d["gone"] == []


def test_diff_allowlist_moves_not_hides():
    prev = {"a": 10_000_000}
    cur = {"a": 50_000_000}
    d = bench_diff.diff(cur, prev, {"a": "intentional rework"})
    assert d["regressions"] == []
    assert len(d["allowed"]) == 1
    assert d["allowed"][0]["justification"] == "intentional rework"


def test_diff_zero_and_missing_prev():
    # prev==0 with real growth must flag (infinite ratio), not divide
    d = bench_diff.diff({"a": 10_000_000}, {"a": 0})
    assert [r["query"] for r in d["regressions"]] == ["a"]
    # missing prev entry is "new", never a regression
    d2 = bench_diff.diff({"a": 10_000_000}, {})
    assert d2["regressions"] == [] and d2["new"] == ["a"]


def test_repo_snapshot_has_no_unallowlisted_regressions():
    """THE gate: current BENCH_FULL.json vs the committed baseline.
    On regression: either fix the plan, or add a one-line justification
    to tools/shuffle_allowlist.json for an intentional change."""
    cur_p = os.path.join(REPO, "BENCH_FULL.json")
    base_p = os.path.join(REPO, "tools", "shuffle_baseline.json")
    if not (os.path.exists(cur_p) and os.path.exists(base_p)):
        pytest.skip("bench snapshot or baseline missing")
    cur = bench_diff.load_shuffles(cur_p)
    prev = bench_diff.load_shuffles(base_p)
    allow = {}
    ap = os.path.join(REPO, "tools", "shuffle_allowlist.json")
    if os.path.exists(ap):
        allow = json.load(open(ap))
    d = bench_diff.diff(cur, prev, allow)
    assert d["regressions"] == [], (
        "unallowlisted shuffle regressions — fix the plan or justify "
        f"in tools/shuffle_allowlist.json: {d['regressions']}"
    )
