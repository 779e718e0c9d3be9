"""Zero-extra-pass pipeline metrics via ``Dataset.observe``.

A curation pipeline wants row counts, null rates, and quality aggregates
for every batch it writes — but a separate ``count()``/``agg()`` re-runs
the plan (at 100 TB: a second full scan per metric set). ``observe``
attaches named aggregate expressions to a point IN the plan; they are
accumulated task-side while the action that was going to run anyway runs,
and read from the driver afterwards. This module packages the quality-gate
metric set the reference's CSV append step would want (K1, main.py:349)
and a helper to assert thresholds from the observed values.

Scale: observation aggregates ride the existing tasks as accumulators —
no extra scan, no shuffle, no job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality_gate(
    df: DataFrame,
    *,
    numeric_cols: list[str] | None = None,
    name: str = "quality_gate",
) -> tuple[DataFrame, Observation]:
    """Attach a quality-gate observation to ``df``.

    Returns ``(df_with_observation, observation)``; run any action on the
    returned frame (write, count, noop sink), then read
    ``observation.get`` — a dict with ``n_rows``, per-column null counts
    (``nulls_<col>``), and per-column min/max (``min_<col>``/``max_<col>``)
    for the requested numeric columns. The plan is executed ONCE.
    """
    numeric_cols = numeric_cols or []
    obs = Observation(name)
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in numeric_cols:
        metrics.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}"))
        metrics.append(F.min(c).alias(f"min_{c}"))
        metrics.append(F.max(c).alias(f"max_{c}"))
    return df.observe(obs, *metrics), obs


def assert_gate(observed: dict, *, min_rows: int = 1, max_null_frac: float = 0.5) -> None:
    """Threshold check over an observation result — raises ValueError with
    the failing metric so a pipeline step can fail fast WITHOUT having
    spent a second pass computing its own stats."""
    n = observed.get("n_rows", 0)
    if n < min_rows:
        raise ValueError(f"quality gate: n_rows={n} < min_rows={min_rows}")
    for k, v in observed.items():
        if k.startswith("nulls_") and n and (v / n) > max_null_frac:
            raise ValueError(
                f"quality gate: {k}={v} is {v / n:.1%} of rows (max {max_null_frac:.0%})"
            )
