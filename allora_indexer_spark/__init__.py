"""allora_indexer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of allora-network/allora-indexer.

The reference (/root/reference, Go) is a blockchain ETL indexer: it polls a
Cosmos chain, decodes blocks/txs/events, and normalizes them into 23 relational
tables in Postgres (see SURVEY.md). This package re-expresses those
capabilities Spark-first:

- ``session``    — SparkSession factory tuned for the engine (AQE, UTC, Arrow).
- ``tables``     — loaders for the synthetic test tables.
- ``schemas``    — explicit StructTypes for the 23-table model and raw payloads.
- ``functions``  — scalar helpers (event-type parsing, numeric guards, text).
- ``operators``  — relational + LLM-pipeline operators (dedup, similarity, ...).
- ``plans``      — batch ingest pipeline (block/tx/event → 23 tables).
- ``streaming``  — Structured Streaming wrapper of the ingest plan.
- ``queries``    — the registry consumed by __spark_entry__ (queries + oracle SQL).
"""

__version__ = "0.1.0"
