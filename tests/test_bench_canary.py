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


def test_mt_bar_ratchets_tight_never_loose(tmp_path, monkeypatch):
    """r15 (the r14 verdict's ratchet finding): the anchor is the
    MINIMUM across clean records, clamped into [1.0, 1.3] — a newer
    record whose mt_ratio was elevated (mild steal that slipped past
    the then-current bar, e.g. r14's 2.09) must NOT loosen the bar."""
    import json as _json

    monkeypatch.delenv("SPARK_GRAFT_CANARY_MT_BAR", raising=False)
    for rnum, mt in ((10, 1.12), (11, 2.09)):
        (tmp_path / f"BENCH_r{rnum:02d}.json").write_text(
            _json.dumps({"contended": False, "canary_mt_ratio": mt})
        )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    bar, source = bench._canary_mt_bar()
    # min(1.12, 2.09)=1.12 → clamped to 1.12 → bar 1.68; were the
    # NEWEST anchor used the bar would be 2.09*1.5=3.14
    assert bar == 1.68
    assert "min-clean" in source
    # an r14-grade contaminated record (2.09) flags against this bar
    contended, _, mt_ratio, _ = bench._canary_verdict(
        {"st": [0.2, 0.125, 0.13, 0.128], "mt": [0.4, 0.26, 0.27, 0.26]},
        median_bar_sec=0.19,
        mt_ratio_bar=bar,
    )
    assert mt_ratio > bar and contended is True


def test_mt_bar_clamp_keeps_bar_in_healthy_band(tmp_path, monkeypatch):
    """Even when the ONLY clean record carries an elevated anchor, the
    clamp caps the bar at 1.3*1.5=1.95 — below r14's 2.09. And a
    suspiciously LOW anchor cannot tighten the bar into the healthy
    1-1.5 band's false-positive zone (floor 1.0*1.5=1.5)."""
    import json as _json

    monkeypatch.delenv("SPARK_GRAFT_CANARY_MT_BAR", raising=False)
    (tmp_path / "BENCH_r14.json").write_text(
        _json.dumps({"contended": False, "canary_mt_ratio": 2.09})
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    bar, _ = bench._canary_mt_bar()
    assert bar == 1.95 < 2.09

    (tmp_path / "BENCH_r14.json").write_text(
        _json.dumps({"contended": False, "canary_mt_ratio": 0.4})
    )
    bar, _ = bench._canary_mt_bar()
    assert bar == 1.5
