"""UDF / UDAF surface (SURVEY.md §2B).

Engine policy: built-ins and higher-order functions first — every reference
loop (P5, P11, A5 at main.py:107-123, 158-170, 227-244) is expressed
without Python in this engine. The UDF registry exists for the cases where
column expressions genuinely cannot express the semantics; everything here
is an Arrow-batched ``pandas_udf`` (vectorized, ~10-100× over row-at-a-time
Python UDFs), registered via ``spark.udf.register`` for SQL access.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def big_decimal_ratio(raw: pd.Series, scale_digits: pd.Series) -> pd.Series:
    """Arbitrary-precision decimal scaling: value / 10**digits computed with
    Python ints (exact beyond float64 and beyond Decimal(38) products) then
    emitted as double — the fallback for on-chain uint256 math when
    DecimalType(38,0) would overflow (SURVEY.md §7.4.1; reference drops to
    float64 at main.py:232-233)."""
    out = []
    for v, d in zip(raw, scale_digits):
        if v is None or d is None:
            out.append(None)
        else:
            # single correctly-rounded int/int division — rounding each
            # operand to float64 first would double-round
            out.append(int(v) / (10 ** int(d)))
    return pd.Series(out, dtype="float64")


@pandas_udf(T.DoubleType())
def gini_impurity(counts: pd.Series) -> pd.Series:
    """Vectorized Gini impurity over an array<long> column — an example of
    per-row array math that is clumsy as nested HOFs but one numpy line in
    an Arrow batch."""
    import numpy as np

    def one(arr):
        if arr is None or len(arr) == 0:
            return None
        a = np.asarray(arr, dtype="float64")
        s = a.sum()
        if s == 0:
            return None
        p = a / s
        return float(1.0 - (p * p).sum())

    return counts.map(one)


@pandas_udf(T.StringType())
def py_float_repr(v: pd.Series) -> pd.Series:
    """Python ``repr`` rendering of doubles (shortest round-trip form:
    ``0.0001`` / ``1e+16``), for strict byte-parity with the reference's
    f-string packing (main.py:168, 239) where Spark's JVM rendering
    (``1.0E-4`` / ``1.0E16``) differs. Formatting is presentation-layer
    only, so this UDF sits at the final projection — never in a hot
    aggregation path."""
    return pd.Series(
        [None if x is None or pd.isna(x) else repr(float(x)) for x in v], dtype="object"
    )


@pandas_udf(T.DoubleType())
def median_abs_deviation(v: pd.Series) -> float:
    """Grouped-agg pandas UDAF (Series → scalar): robust spread measure
    with no built-in Spark equivalent (two nested medians). Arrives per
    group as one Arrow batch; partial aggregation does NOT apply — at scale
    a skewed group lands on one executor, so pair with a salting pre-pass
    or the approx sketch path when groups exceed executor memory."""
    d = v.dropna()
    if d.empty:
        return None
    return float((d - d.median()).abs().median())


def register_udfs(spark: SparkSession) -> None:
    """Expose the UDF surface to SQL (`SELECT big_decimal_ratio(...)`)."""
    spark.udf.register("big_decimal_ratio", big_decimal_ratio)
    spark.udf.register("gini_impurity", gini_impurity)
    spark.udf.register("median_abs_deviation", median_abs_deviation)
    spark.udf.register("py_float_repr", py_float_repr)
