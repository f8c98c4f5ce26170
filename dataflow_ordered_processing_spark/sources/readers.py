"""Additional transcript source formats (explicit schema, never inferred)
and bucketed-table layout for exchange-free joins.

The reference reads protobuf from Pub/Sub and writes Avro/JSON files
(SURVEY.md §2.1/§2.6); the analog breadth here:
  parquet (default everywhere) · csv · json lines · in-memory ·
  streaming directory (jobs/run_pipeline.py)

Bucketing: `write_bucketed` lays a table out with bucketBy(conv_id) +
sortBy(turn_idx) so any subsequent equi-join or groupBy on conv_id reuses
the on-disk clustering — no Exchange in the plan (the Spark analog of the
reference's BigQuery clustering on (session_id, contract_id),
terraform/bigquery.tf:26)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TRANSCRIPT_SCHEMA


def read_transcripts(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "parquet":
        return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
    if fmt == "csv":
        return spark.read.schema(TRANSCRIPT_SCHEMA).option("header", "true").csv(path)
    if fmt == "json":
        return spark.read.schema(TRANSCRIPT_SCHEMA).json(path)
    raise ValueError(f"unknown transcript format {fmt!r}")


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int = 32, overwrite: bool = True
) -> None:
    """Persist with conv_id bucketing + turn_idx sort order; joins/groupBys
    on conv_id against this table need no shuffle."""
    writer = (
        df.write.bucketBy(n_buckets, "conv_id")
        .sortBy("turn_idx")
        .format("parquet")
    )
    if overwrite:
        writer = writer.mode("overwrite")
    writer.saveAsTable(table)
