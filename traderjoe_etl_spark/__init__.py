"""traderjoe_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference ETL pipeline
(noobie1506/traderjoe-etl, ``/root/reference/main.py``), re-expressed as a
Spark-first operator library:

- ``sources``    — parquet/JSON readers with explicit schemas, distributed
  REST/RPC snapshot fetchers (reference main.py:36-42, 203-219).
- ``functions``  — scalar helpers: lenient casts (main.py:125-126, 195-196),
  inf/NaN scrub (main.py:268-269, 284-286), existence-tolerant projection
  (main.py:81-83, 342-343).
- ``operators``  — the generalized relational surface (joins, aggregates,
  windows, set ops, top-k, MERGE upsert, connected components, skew/salting,
  data layout: z-order + compaction) plus LLM-data-pipeline ops (dedup,
  similarity search, text analysis, multimodal plumbing) exercised on the
  driver's documents/embeddings.
- ``plans``      — the reference pipeline recomposed as one lazy DataFrame DAG,
  plus physical-plan audit helpers (plans/audit.py).
- ``streaming``  — the hourly scheduler loop (main.py:353-359) generalized to
  Structured Streaming triggers, watermarks, stream-static enrichment and
  stateful dedup/position tracking.
- ``sinks``      — append-mode parquet snapshot sink, range-clustered writes,
  header-once CSV export (main.py:345-351).
- ``queries``    — the driver-facing registry (124 named queries, DuckDB
  oracle twins for everything SQL-expressible).

CLI: ``python -m traderjoe_etl_spark run|query|list``.

Everything is built on the public PySpark DataFrame/SQL API; Catalyst/AQE
does the physical planning.
"""

__version__ = "0.1.0"
