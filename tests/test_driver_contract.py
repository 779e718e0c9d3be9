"""Oracle-differential tests — the primary gate (SURVEY.md §5.1).

Mirrors the driver: every query with an oracle must match DuckDB at sf0.01
on row count + schema + order-insensitive values; oracle-less queries must
at least run and return a stable schema.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duckdb_conn

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, duck, name):
    spark_df = QUERIES[name](spark, sf_dir)
    oracle_df = duck.execute(ORACLES[name]).df()
    problems = compare(spark_df, oracle_df)
    assert not problems, f"{name}: " + " | ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    df.limit(5).collect()  # plan executes


def _is_atomic(dt) -> bool:
    # The driver canonicalizer feeds every column into pandas
    # sort_values then hashes values, so each cell must be a hashable
    # scalar. Arrays/structs/maps become numpy arrays / dicts →
    # ``TypeError: unhashable type`` (the r4 embedding_pca_project
    # failure). Binary is fine: ``bytes`` is hashable and ordered.
    from pyspark.sql import types as T

    return isinstance(
        dt,
        (
            T.StringType,
            T.BooleanType,
            T.DateType,
            T.BinaryType,
            T.NumericType,
            T.TimestampType,
            T.TimestampNTZType,
        ),
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_is_driver_canonicalizable(spark, sf_smoke, name):
    """Every registered query must emit only atomic columns — the driver
    canonicalizer (pandas sort_values + value hash) cannot handle
    array/struct/map cells. Regression gate for the r4
    embedding_pca_project red row (VERDICT r4 item 2)."""
    df = QUERIES[name](spark, sf_smoke)
    offenders = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if not _is_atomic(f.dataType)
    ]
    assert not offenders, (
        f"{name} emits non-atomic driver-unhashable columns: {offenders}"
    )


def test_bad_sf_dir_raises_cleanly(spark):
    """A wrong sf_dir must fail fast with PATH_NOT_FOUND, never hang or
    return an empty frame."""
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        QUERIES["pricing_summary"](spark, "/nonexistent_sf_dir").collect()


def test_non_utc_session_still_matches(spark, sf_dir):
    """A session preconfigured with a non-UTC timezone must still produce
    oracle-consistent timestamps: apply_runtime_confs pins UTC on every
    query entry."""
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        out = QUERIES["orders_by_month"](spark, sf_dir).limit(3).collect()
        assert out  # ran; TZ pinned back to UTC inside the query
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_runtime_confs_pinned(spark):
    """The conf surface queries rely on must survive apply_runtime_confs:
    timestamp reading/writing modes and Python-source pushdown."""
    from traderjoe_etl_spark.session import RUNTIME_CONFS, apply_runtime_confs

    apply_runtime_confs(spark)
    for key in (
        "spark.sql.parquet.inferTimestampNTZ.enabled",
        "spark.sql.parquet.outputTimestampType",
        "spark.sql.python.filterPushdown.enabled",
        "spark.sql.session.timeZone",
    ):
        assert spark.conf.get(key) == RUNTIME_CONFS[key]
