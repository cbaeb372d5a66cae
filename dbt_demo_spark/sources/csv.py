"""CSV seed loading — the Spark analog of `dbt seed`.

The reference loads seeds with dbt's agate type inference
(reference: README.md:47-48, dbt_project.yml:9).  At scale, per-file
inference is a full extra scan and is nondeterministic across files, so we
take explicit StructType schemas instead and reproduce the semantics that
matter from the reference seeds:

  * quoted fields with embedded commas (reference: seeds/raw_loans.csv:2
    `"123 Main St, Austin TX"`) — Spark's default quote handling covers it;
  * empty fields → NULL for ALL types including strings (reference:
    seeds/raw_loans.csv:5,9 — loans L004/L008 have empty property fields);
    Spark maps empty→null for non-strings automatically but needs an
    explicit empty-string→null pass for string columns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructType


def read_seed_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    # empty string -> NULL for string columns (dbt/agate behavior on seeds)
    for field in schema.fields:
        if isinstance(field.dataType, StringType):
            df = df.withColumn(
                field.name,
                F.when(F.col(field.name) == "", F.lit(None)).otherwise(F.col(field.name)),
            )
    return df
