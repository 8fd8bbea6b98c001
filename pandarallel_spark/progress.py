"""Console progress for Spark actions — the engine's analog of
pandarallel's progress-bar channel.

The reference ships worker→driver heartbeats over a SyncManager queue
and repaints per-chunk bars (``progress_bars.py:57-121,190-223``,
``core.py:301-322``), throttled to ~0.25 s. Spark already *has* the
control plane — the driver's ``StatusTracker`` — so the bridge is a
polling thread, no executor-side machinery at all (UDFs stay
zero-overhead; the reference documents its wrapper "may slightly
increase computation time", ours cannot).

Usage::

    with spark_progress(spark):
        df.collect()

or via the compat shim: ``pandarallel.initialize(progress_bar=True)``.
"""

from __future__ import annotations

import sys
import threading
import time

from pyspark.sql import SparkSession

_INTERVAL = 0.25  # reference's throttle target (progress_bars.py:13)
_BAR_WIDTH = 30


class spark_progress:
    """Context manager: render active-stage task progress while the body
    runs an action. Writes \\r-repainted lines to ``out`` (default
    stderr), one bar per concurrently-active stage."""

    def __init__(self, spark: SparkSession, out=None, interval: float = _INTERVAL):
        self._sc = spark.sparkContext
        self._out = out if out is not None else sys.stderr
        self._interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._rendered = False
        self._last: dict[int, int] = {}  # stage id → numTasks last seen active

    @staticmethod
    def _bar(done: int, total: int) -> str:
        filled = int(done / total * _BAR_WIDTH)
        return "#" * filled + "-" * (_BAR_WIDTH - filled)

    def _render_once(self) -> None:
        st = self._sc.statusTracker()
        parts = []
        for sid in sorted(st.getActiveStageIds()):
            info = st.getStageInfo(sid)
            if info is None or info.numTasks == 0:
                continue
            done = info.numCompletedTasks
            self._last[sid] = info.numTasks
            parts.append(f"stage {sid} |{self._bar(done, info.numTasks)}| {done}/{info.numTasks}")
        if parts:
            line = "  ".join(parts)
            # pad to the longest line written so far: when the active
            # stage set shrinks, a short repaint would otherwise leave
            # the old line's tail visible (review finding r4)
            self._width = max(getattr(self, "_width", 0), len(line))
            self._out.write("\r" + line.ljust(self._width))
            self._out.flush()
            self._rendered = True

    def _loop(self) -> None:
        while not self._stop.wait(self._interval):
            try:
                self._render_once()
            except Exception:  # noqa: BLE001 — tracker races at stage end
                pass

    def __enter__(self) -> "spark_progress":
        # fresh state per entry — the same instance may be reused
        self._stop = threading.Event()
        self._rendered = False
        self._last = {}
        self._width = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, exc_type=None, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        if self._rendered and self._last and exc_type is None:
            # stages we saw active have finished by now (the action
            # returned): repaint them full rather than frozen mid-bar
            parts = [
                f"stage {sid} |{self._bar(n, n)}| {n}/{n}"
                for sid, n in sorted(self._last.items())
            ]
            line = "  ".join(parts)
            width = max(getattr(self, "_width", 0), len(line))
            self._out.write("\r" + line.ljust(width))
        if self._rendered:
            self._out.write("\n")
            self._out.flush()
