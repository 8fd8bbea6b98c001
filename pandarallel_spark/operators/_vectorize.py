"""Shared express-or-fallback validation for batch-vectorized UDF fast
paths (row apply, series apply, rolling windows).

The engine's optimization story (SURVEY.md §4.2b): a scalar UDF that is
elementwise arithmetic computes every element at once when handed the
whole batch/column — same IEEE results for +,-,*,/ — so we TRY the
batch call, validate it bit-exact against per-element calls on a spread
sample, and fall back to the stock loop on any mismatch, exception,
wrong shape, or precision hazard. The caveats this module centralizes:

- **Mutation**: callers must hand the batch call a private copy and
  sample with copies; a mutating UDF then only garbage-in-garbage-outs
  its own result (which validation usually rejects) and can never
  corrupt passthrough columns or the fallback's input.
- **float64 coercion blindness**: comparisons run in float64, which is
  exact for |x| < 2^53 but rounds beyond — where the validation would
  be structurally unable to see a difference. Results that leave that
  range are rejected outright when the declared output is integral.
- **NaN-vacuity**: a sample whose scalar results are all NaN matches
  any same-shape function; at least one finite sampled result is
  required.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

_EXACT_F64 = float(1 << 53)


def fast_path_type(dtype) -> tuple[bool, bool]:
    """(eligible, integral) for a declared output Spark type.

    The fast path produces a float64 array, so it can only serve
    float/double, the int family (range-guarded), and boolean. Decimal
    (exactness beyond float64), string/binary, temporal, and nested
    types must always take the stock per-element loop."""
    from pyspark.sql import types as T

    integral = isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    eligible = integral or isinstance(
        dtype, (T.FloatType, T.DoubleType, T.BooleanType)
    )
    return eligible, integral


def sample_indices(n: int, k: int = 8) -> np.ndarray:
    """Up to k indices spread across [0, n) — head-only samples go
    vacuous when the head is a NaN run (e.g. downstream of a rolling)."""
    return np.unique(np.linspace(0, n - 1, num=min(k, n), dtype="int64"))


def validated_vectorized(
    n: int,
    scalar_at: Callable[[int], object],
    call_batch: Callable[[], object],
    integral_out: bool = False,
    exact_out: bool = False,
) -> np.ndarray | None:
    """Run ``call_batch`` once and return its float64 result iff it has
    shape (n,) and bit-matches ``scalar_at(i)`` on a spread sample.
    Returns None → caller must run the stock per-element loop.

    ``scalar_at`` MUST evaluate the UDF on a private copy of element i;
    ``call_batch`` MUST hand the UDF a private copy of the batch.
    ``integral_out``: the declared output type is integral — reject
    results outside float64's exact-integer range (the validation
    cannot distinguish them, but the final Arrow cast would).
    ``exact_out``: the declared output type demands exactness float64
    can't carry at all (DecimalType) — never vectorize.
    """
    if n == 0 or exact_out:
        return None
    idxs = sample_indices(n)
    try:
        scalar = np.asarray([scalar_at(int(i)) for i in idxs], dtype="float64")
        vec = call_batch()
        if not isinstance(vec, (pd.Series, np.ndarray)) or len(vec) != n:
            return None
        vecf = np.asarray(vec, dtype="float64")
    except Exception:  # noqa: BLE001 — any failure means "not vectorizable"
        return None
    if vecf.ndim != 1:
        return None
    if not np.isfinite(scalar).any():
        return None
    if not np.array_equal(vecf[idxs], scalar, equal_nan=True):
        return None
    if integral_out and np.any(np.abs(vecf[np.isfinite(vecf)]) >= _EXACT_F64):
        return None
    return vecf
