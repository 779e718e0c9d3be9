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
  windows, set ops, top-k) plus LLM-data-pipeline ops (dedup, similarity
  search, text analysis) exercised on the driver's documents/embeddings.
- ``plans``      — the reference pipeline recomposed as one lazy DataFrame DAG.
- ``streaming``  — the hourly scheduler loop (main.py:353-359) generalized to
  Structured Streaming triggers, watermarks and stateful dedup.
- ``sinks``      — append-mode parquet snapshot sink + header-once CSV export
  (main.py:345-351).

Everything is built on the public PySpark DataFrame/SQL API; Catalyst/AQE
does the physical planning.
"""

__version__ = "0.1.0"
