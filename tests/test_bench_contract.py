"""Focused contract tests for bench.py's r18 additions: the subtotal
partition, the executor-totals delta math, and the host-baseline
sentinel-ceiling derivation. Pure unit tests — no SparkSession."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(REPO, "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_subtotal_groups_partition_headline():
    """The three subtotal groups must partition the HEADLINE set: every
    group member is a headline query and no query is double-counted, so
    batch_core + composition_folds + streaming_replay == value."""
    headline = set(bench.HEADLINE)
    stream = set(bench.STREAMING_REPLAY_QUERIES)
    folds = set(bench.COMPOSITION_FOLD_QUERIES)
    assert stream <= headline, stream - headline
    assert folds <= headline, folds - headline
    assert not (stream & folds), stream & folds


def test_totals_delta_per_run_average():
    before = {"task_time_ms": 1000, "shuffle_read_b": 50}
    after = {"task_time_ms": 1600, "shuffle_read_b": 350}
    d = bench._totals_delta(before, after, 3)
    assert d == {"task_time_ms": 200.0, "shuffle_read_b": 100.0, "n_runs": 3}
    assert bench._totals_delta(None, after, 3) is None
    assert bench._totals_delta(before, None, 3) is None
    assert bench._totals_delta(before, after, 0) is None


def test_sentinel_ceiling_derived_from_host_baseline():
    """The contamination ceiling is 1.4x the committed idle sentinel
    median (ADVICE r17) — not a hard-coded per-host constant."""
    with open(os.path.join(REPO, "tools", "host_baseline.json")) as f:
        base = json.load(f)
    expect = round(1.4 * base["idle_sentinel_median_s"], 2)
    assert bench.SENTINEL_CEILING_SF01 == expect
    assert "idle median" in bench.SENTINEL_CEILING_BASIS
