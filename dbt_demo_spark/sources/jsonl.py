"""JSON-lines source — the landing-zone format between raw logs and
parquet marts.

Scale discipline: the schema is REQUIRED.  ``inferSchema`` on JSON is a
full extra pass over the data (at 100 TB, a second 100 TB scan before the
first real one) and infers unstable types across days of data; a declared
schema makes the read single-pass and the contract explicit.  Malformed
lines follow Spark's public reader modes:

  * PERMISSIVE (default) — malformed lines land in ``_corrupt_record``
    with every schema column NULL, so bad data is quarantined, not lost;
  * DROPMALFORMED — silently drop (sampling pipelines);
  * FAILFAST — abort the job (contract-enforcing ingest).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def load_jsonl(spark: SparkSession, path: str, schema: StructType,
               mode: str = "PERMISSIVE") -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.  In PERMISSIVE
    mode the returned frame carries ``_corrupt_record`` holding the raw
    text of unparseable lines (NULL for clean rows)."""
    full = schema
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        full = schema.add(CORRUPT_COL, StringType())
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantined_rows) — the standard
    PERMISSIVE post-split: clean rows continue the pipeline, quarantine is
    persisted for replay after the producer is fixed.

    Quarantine keeps the FULL row (schema columns NULL + the raw line):
    Spark refuses scans that reference only ``_corrupt_record``
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) because the pruned scan could skip
    parsing entirely — project the raw line only after materializing."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantine


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (one JSON object per line, Spark's json writer)."""
    df.write.mode(mode).json(path)
