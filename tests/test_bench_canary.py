"""Focused tests for bench.py's contention canary (r14: the parallel
multi-thread canary that catches host core oversubscription, which the
single-thread canary provably cannot — a 94 s run on a 33-36 s clean
band passed contended=false before this fix).

No Spark session needed: these exercise the pure helpers.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

# bench.py lives at the repo root, not in the package
_BENCH = Path(__file__).resolve().parent.parent / "bench.py"
spec = importlib.util.spec_from_file_location("_bench_under_test", _BENCH)
bench = importlib.util.module_from_spec(spec)
sys.modules.setdefault("_bench_under_test", bench)
spec.loader.exec_module(bench)


def test_mt_draw_returns_positive_wall_clock():
    d = bench._canary_draw_mt()
    assert isinstance(d, float) and d > 0


def test_verdict_clean_when_all_three_triggers_under_bars():
    contended, spread, mt_ratio, mt_med = bench._canary_verdict(
        {"st": [0.5, 0.125, 0.13, 0.12], "mt": [0.6, 0.15, 0.16, 0.17]},
        median_bar_sec=0.19,
        mt_ratio_bar=2.5,
    )
    assert contended is False
    assert spread <= 2.0
    assert mt_ratio < 2.5
    assert mt_med == 0.16
    # index 0 (warm draw) excluded: a slow warm draw must not flag


def test_verdict_flags_uniform_single_thread_slowdown():
    contended, _, _, _ = bench._canary_verdict(
        {"st": [0.5, 0.4, 0.41, 0.39], "mt": [0.6, 0.45, 0.46, 0.44]},
        median_bar_sec=0.19,
        mt_ratio_bar=2.5,
    )
    assert contended is True


def test_verdict_flags_core_oversubscription_with_clean_single_thread():
    # the r14 failure mode: single-thread median under its bar, spread
    # tight, but the box cannot deliver its cores — mt ratio over bar
    contended, spread, mt_ratio, _ = bench._canary_verdict(
        {"st": [0.2, 0.125, 0.13, 0.128], "mt": [0.8, 0.5, 0.45, 0.52]},
        median_bar_sec=0.19,
        mt_ratio_bar=2.5,
    )
    assert spread <= 2.0  # the old triggers alone would say clean
    assert mt_ratio > 2.5
    assert contended is True


def test_mt_bar_sources_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CANARY_MT_BAR", "3.25")
    bar, source = bench._canary_mt_bar()
    assert bar == 3.25
    assert source == "env:SPARK_GRAFT_CANARY_MT_BAR"


def test_mt_bar_falls_back_without_recorded_anchor(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CANARY_MT_BAR", raising=False)
    bar, source = bench._canary_mt_bar()
    # no BENCH_r*.json carries canary_mt_ratio yet (the field is new
    # this round) → absolute fallback; once a clean record lands the
    # source flips to anchor:<file> and this assertion half still holds
    assert bar >= 1.5
    assert source.startswith(("fallback:", "anchor:"))
