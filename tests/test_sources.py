"""Source format readers + bucketed exchange-free joins."""

import pandas as pd

from dataflow_ordered_processing_spark.schemas import TRANSCRIPT_SCHEMA
from dataflow_ordered_processing_spark.sources.readers import (
    read_transcripts,
    write_bucketed,
)
from dataflow_ordered_processing_spark.sources.scenarios import scenario


def _pdf():
    return pd.concat(scenario("multi_conversation"), ignore_index=True)


def test_csv_and_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(_pdf(), schema=TRANSCRIPT_SCHEMA)
    df.write.mode("overwrite").option("header", "true").csv(str(tmp_path / "csv"))
    df.write.mode("overwrite").json(str(tmp_path / "json"))
    n = df.count()
    csv_back = read_transcripts(spark, str(tmp_path / "csv"), "csv")
    json_back = read_transcripts(spark, str(tmp_path / "json"), "json")
    assert csv_back.count() == json_back.count() == n
    assert [f.name for f in csv_back.schema.fields] == [
        f.name for f in TRANSCRIPT_SCHEMA.fields
    ]
    # payload integrity through the text column (csv quoting, json escaping)
    want = set(_pdf()["text"])
    assert set(r["text"] for r in csv_back.select("text").collect()) == want
    assert set(r["text"] for r in json_back.select("text").collect()) == want


def test_bucketed_join_has_no_exchange(spark):
    # warehouse.dir is a static conf — use the session default warehouse and
    # clean the tables up afterwards
    df = spark.createDataFrame(_pdf(), schema=TRANSCRIPT_SCHEMA)
    try:
        write_bucketed(df, "t_bucketed_a", n_buckets=8)
        write_bucketed(
            df.select("conv_id", "turn_idx", "role"), "t_bucketed_b", n_buckets=8
        )
        a = spark.table("t_bucketed_a")
        b = spark.table("t_bucketed_b").groupBy("conv_id").count()
        # force sort-merge (AQE would broadcast the small side here — also a
        # no-shuffle plan, but the bucketing claim is about SMJ at scale
        # where neither side broadcasts)
        joined = a.hint("merge").join(b, "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed layout: NO shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        assert joined.count() == df.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")