"""pandas-on-Spark bridge: the reference is a pandas script
(main.py throughout) — pyspark.pandas runs the same idioms
(to_numeric coercion, fillna, groupby-agg, column assignment) on the
distributed engine, which is the lowest-friction migration path for a
reference user. These tests pin that the bridge's SEMANTICS match real
pandas on the same data, so "switch the import" is an honest claim."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def psm(spark):
    ps = pytest.importorskip("pyspark.pandas")
    # required by pandas-on-Spark for frames built from local pandas data
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return ps


def _ref_frame() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "pool": ["a", "a", "b", "b", "b"],
            "amount": ["1.5", "2.5", "x", None, "4.0"],
            "fees": [0.1, None, 0.3, 0.4, None],
        }
    )


def test_to_numeric_coerce_and_fillna(psm):
    """reference main.py:115-118: pd.to_numeric(errors='coerce') + fillna(0)."""
    pdf = _ref_frame()
    expected = pdf.assign(
        amount=pd.to_numeric(pdf["amount"], errors="coerce").fillna(0.0),
        fees=pdf["fees"].fillna(0.0),
    )
    psdf = psm.DataFrame(pdf)
    got = psdf.assign(
        amount=psm.to_numeric(psdf["amount"], errors="coerce").fillna(0.0),
        fees=psdf["fees"].fillna(0.0),
    ).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_index(axis=1), expected.sort_index(axis=1), check_dtype=False
    )


def test_groupby_agg_matches_pandas(psm):
    """reference main.py:130-135: groupby sums over coerced numerics."""
    pdf = _ref_frame()
    pdf["amount"] = pd.to_numeric(pdf["amount"], errors="coerce").fillna(0.0)
    # "size" is a known bridge incompatibility (pandas-on-Spark resolves
    # it to Spark's array size()); "count" is the portable spelling.
    expected = pdf.groupby("pool", as_index=False).agg(
        total=("amount", "sum"), n=("amount", "count")
    )
    psdf = psm.DataFrame(pdf)
    got = (
        psdf.groupby("pool", as_index=False)
        .agg(total=("amount", "sum"), n=("amount", "count"))
        .to_pandas()
        .sort_values("pool")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
