"""dbt_demo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the acryldata/dbt-demo reference project
("Fiction Bank"), re-expressed Spark-first.

The reference (read-only at /root/reference) is a dbt project executed by
DuckDB: 3 CSV seeds, 2 staging views, 2 mart tables, and a documented join
fan-out bug.  This package rebuilds that surface on Spark's DataFrame/SQL
stack — Catalyst does the planning, Tungsten the execution — and extends it
with LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing, streaming rollups) designed for 100 TB scale.

Layout:
  core/       @model registry + topo-sort runner (the dbt-run analog)
  sources/    schema'd CSV seed + parquet loaders
  models/     Fiction Bank models (faithful, incl. the fan-out bug)
  functions/  scalar/column helpers (dates, finance, text, vectors)
  operators/  dedup / similarity / multimodal building blocks
  queries/    the differential-test catalog (Spark fn + DuckDB oracle SQL)
  streaming/  Structured Streaming twins of the batch rollups
"""

__version__ = "0.1.0"
