"""Aggregation operators.

Generalizes the reference's scalar aggregations (max: main.py:130, 132;
sum: main.py:134-135, 158-167) and its packed-string rendering
(main.py:163-170, 239-244) into keyed, distributed operators.

Scale notes: every ``groupBy().agg()`` here compiles to partial (map-side)
+ final aggregation, so the shuffle carries one row per (partition, key),
not per input row. ``argmax_rows`` uses a window, which shuffles once on the
partition keys; at 100 TB that is the unavoidable single shuffle for
"latest event per key" and AQE handles skewed keys.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_AGG_FNS = {
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "avg": F.avg,
    "mean": F.avg,
    "count": F.count,
    "count_distinct": F.countDistinct,
    "approx_count_distinct": F.approx_count_distinct,
    "first": F.first,
    "stddev": F.stddev,
    "collect_list": F.collect_list,
}


def group_agg(df: DataFrame, keys: Sequence[str], aggs: Mapping[str, tuple[str, str]]) -> DataFrame:
    """``groupBy(keys).agg(...)`` from a spec ``{out_name: (fn, col)}``.

    The declarative form of the reference's per-frame scalar reductions
    (main.py:130-135); partial aggregation is automatic.
    """
    exprs = [_AGG_FNS[fn](col).alias(out) for out, (fn, col) in aggs.items()]
    return df.groupBy(*keys).agg(*exprs)


def argmax_rows(df: DataFrame, keys: Sequence[str], order_cols: Sequence[str | Column]) -> DataFrame:
    """Keep, per key group, ALL rows tied at the maximum of ``order_cols``
    (lexicographic, descending).

    This is the reference's two-step "latest deposit" selection
    (main.py:130-133: max blockNumber, then max timestamp within it) as one
    operator. Tie behavior is load-bearing: every row at the max survives so
    downstream sums (main.py:134-135) include all of them — hence ``rank()``,
    not ``row_number()`` (SURVEY.md §2C.4).

    With empty ``keys`` (the reference's case — it processes one pair at a
    time) a global window would drag everything to ONE partition; instead we
    aggregate the lexicographic max (``max(struct(...))`` — partial+final,
    no shuffle of the data) and broadcast it back as a filter.
    """
    if not keys:
        mx = df.agg(F.max(F.struct(*order_cols)).alias("__mx"))
        return (
            df.crossJoin(F.broadcast(mx))
            .filter(F.struct(*order_cols) == F.col("__mx"))
            .drop("__mx")
        )
    order = [F.col(c).desc() if isinstance(c, str) else c.desc() for c in order_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rk", F.rank().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def string_agg(
    df: DataFrame,
    keys: Sequence[str],
    expr: Column,
    order_by: Sequence[str],
    sep: str = "; ",
    out: str = "agg_string",
    wrap: tuple[str, str] | None = ("(", ")"),
) -> DataFrame:
    """Deterministic per-group string aggregation.

    Engine form of the reference's packed per-bin strings
    ``"(binId: feesX, feesY; …)"`` (main.py:163-170) and
    ``"(binId: amtX, amtY; …)"`` (main.py:239-244). The reference relies on
    API response order; distributed collection has no such order, so rows
    are sorted by ``order_by`` inside the group before joining
    (SURVEY.md §2C.1).

    Implementation: ``collect_list(struct(order_by…, rendered))`` →
    ``array_sort`` (sorts by struct fields left-to-right) → ``transform`` to
    the rendered string → ``concat_ws``. All higher-order built-ins, one
    shuffle.
    """
    packed = F.struct(*[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_by)], expr.alias("_s"))
    joined = F.concat_ws(sep, F.transform(F.array_sort(F.collect_list(packed)), lambda s: s["_s"]))
    if wrap:
        joined = F.concat(F.lit(wrap[0]), joined, F.lit(wrap[1]))
    return df.groupBy(*keys).agg(joined.alias(out))
