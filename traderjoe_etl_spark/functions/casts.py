"""Lenient casting — the engine equivalent of pandas ``to_numeric(errors='coerce')``.

The reference coerces strings to numerics with NULL-on-failure in eight
places (reference main.py:125-126, 195-196, 221-222, 254-255, 266, 275-276,
288-291), sometimes followed by ``fillna(0)`` (main.py:125-126 — amounts
only, never prices; see SURVEY.md §2C.3).

``try_cast`` keeps the whole expression JVM-side (no UDF) and Catalyst still
constant-folds / prunes around it.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lenient_cast(col: Column | str, to: str = "double", default: float | None = None) -> Column:
    """``pd.to_numeric(errors='coerce')`` ≡ try_cast: invalid input → NULL.

    ``default`` replicates the reference's ``.fillna(default)`` where used.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = c.try_cast(to)
    if default is not None:
        out = F.coalesce(out, F.lit(default).cast(to))
    return out


def lenient_cast_cols(
    df: DataFrame,
    cols: Iterable[str],
    to: str = "double",
    default: float | None = None,
) -> DataFrame:
    """Apply :func:`lenient_cast` in-place to each named column (if present).

    Mirrors the reference's batch coercion loop (main.py:185-196) including
    its tolerance for absent columns.
    """
    out = df
    for name in cols:
        if name in out.columns:
            out = out.withColumn(name, lenient_cast(name, to=to, default=default))
    return out
