"""Spark 4 Python DataSource API form of the REST snapshot source.

``sources/rest.py`` implements distributed fetch with ``mapInPandas`` —
portable back to Spark 3.x. This module is the Spark-4-native form using
the Python DataSource API (pyspark.sql.datasource), which adds what the
mapInPandas shape structurally cannot:

- **partition planning**: one InputPartition per key chunk, so Spark's
  scheduler (not a manual repartition) owns fetch parallelism, retries,
  and locality;
- **source-level filter pushdown**: ``pushFilters`` receives the query's
  predicates BEFORE partitions are planned — an ``EqualTo``/``In`` on the
  key column prunes whole partitions, the engine analog of the
  reference's manual query params (main.py:30-34: pageSize, startTime);
- **declared schema**: the source advertises its schema to Catalyst, so
  column pruning and downstream optimization see a normal relation.

The fetch itself is injected the same way as rest.py: ``mode=fixture``
(default) generates the deterministic fixture payload used by tests — a
pure function of (pool_id, hour) — while a real deployment would issue
the HTTP call at the marked point. Keeping the payload deterministic
makes the WHOLE source path (planning, pushdown, schema, row emission)
testable with zero network.

Register once per session, then it is a normal format:

    spark.dataSource.register(SnapshotRestDataSource)
    df = (spark.read.format("rest_snapshot")
          .option("n_pools", 8).option("hours", 24).load())
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "pool_id BIGINT, hour INT, reserve_x DOUBLE, reserve_y DOUBLE, fees_usd DOUBLE"
)


def fixture_payload(pool_id: int, hours: int) -> list[tuple]:
    """Deterministic fixture 'server': what the REST endpoint would return
    for one pool — a pure function so oracle/tests can replay it."""
    rows = []
    for h in range(hours):
        base = (pool_id * 1_000_003 + h * 7_919) % 1_000_000
        rows.append(
            (
                pool_id,
                h,
                round(1000.0 + (base % 5000) / 10.0, 4),
                round(2000.0 + (base % 3000) / 10.0, 4),
                round((base % 1000) / 100.0, 4),
            )
        )
    return rows


class _PoolPartition(InputPartition):
    def __init__(self, pool_ids: list[int], hours: int):
        self.pool_ids = pool_ids
        self.hours = hours


class SnapshotRestReader(DataSourceReader):
    def __init__(self, options):
        self.n_pools = int(options.get("n_pools", 8))
        self.hours = int(options.get("hours", 24))
        self.chunk = int(options.get("pools_per_partition", 1))
        self.mode = options.get("mode", "fixture")
        self._wanted: set[int] | None = None  # None = all pools

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept EqualTo/In on pool_id (partition pruning); everything
        else is returned for Spark to evaluate post-scan."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("pool_id",):
                self._wanted = {int(f.value)}
            elif isinstance(f, In) and f.attribute == ("pool_id",):
                self._wanted = {int(v) for v in f.value}
            else:
                yield f  # unsupported -> Spark applies it after the scan

    def partitions(self) -> Sequence[InputPartition]:
        pools = [
            p
            for p in range(self.n_pools)
            if self._wanted is None or p in self._wanted
        ]
        return [
            _PoolPartition(pools[i : i + self.chunk], self.hours)
            for i in range(0, len(pools), self.chunk)
        ] or [_PoolPartition([], self.hours)]

    def read(self, partition: _PoolPartition) -> Iterator[tuple]:
        for pool_id in partition.pool_ids:
            if self.mode == "fixture":
                rows = fixture_payload(pool_id, partition.hours)
            else:  # pragma: no cover - network path, same row shape
                raise NotImplementedError(
                    "real HTTP mode: issue the endpoint call here "
                    "(rest.py:_default_fetcher) and yield the same tuples"
                )
            yield from rows


class SnapshotRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_snapshot"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SnapshotRestReader:
        return SnapshotRestReader(self.options)

    def streamReader(self, schema: StructType) -> "SnapshotRestStreamReader":
        return SnapshotRestStreamReader(self.options)


class SnapshotRestStreamReader(DataSourceStreamReader):
    """Micro-batch stream form: each trigger advances the offset by one
    'hour' and emits that hour's snapshot for every pool — exactly the
    reference's hourly polling loop (main.py:353-359) recast as a
    checkpointable Structured Streaming source. Offsets are dicts
    ({"hour": n}), so restarts resume from the committed hour instead of
    re-fetching history; `max_hours` bounds the fixture stream so tests
    can drain it deterministically."""

    def __init__(self, options):
        self.n_pools = int(options.get("n_pools", 8))
        self.max_hours = int(options.get("max_hours", 24))

    def initialOffset(self) -> dict:
        return {"hour": 0}

    def latestOffset(self) -> dict:
        # fixture stream: all hours are immediately available; a real
        # endpoint would return the newest hour the API can serve.
        return {"hour": self.max_hours}

    def partitions(self, start: dict, end: dict):
        return [
            _HourRange(p, start["hour"], end["hour"]) for p in range(self.n_pools)
        ]

    def read(self, partition) -> Iterator[tuple]:
        all_rows = fixture_payload(partition.pool_id, self.max_hours)
        for h in range(partition.start_h, partition.end_h):
            yield all_rows[h]

    def commit(self, end: dict) -> None:
        pass  # fixture source has nothing to clean up


class _HourRange(InputPartition):
    def __init__(self, pool_id: int, start_h: int, end_h: int):
        self.pool_id = pool_id
        self.start_h = start_h
        self.end_h = end_h
