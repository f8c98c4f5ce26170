"""Training-data preparation operators (late r7): sequence packing
(concat-and-chunk assignment, distributed two-phase prefix sum) and the
cross-document repeated-n-gram blocklist."""

from __future__ import annotations
# ------------------------------------------------------- r7: packing + grams
def test_pack_sequences_matches_single_window(spark):
    """The distributed two-phase prefix sum must equal the naive global
    cumulative sum, for bucket sizes that split / don't split the data —
    and chunks must tile: offset = cum % max, seq strictly nondecreasing."""
    import pandas as pd

    from dataflow_ordered_processing_spark.functions.text import pack_sequences

    pdf = pd.DataFrame(
        {
            "doc_id": range(100),
            "text": [" ".join(["w"] * (7 + (i * 13) % 40)) for i in range(100)],
        }
    )
    df = spark.createDataFrame(pdf)
    expect = None
    for buckets in (8192, 16, 1):  # one bucket / many / one-doc-per-bucket
        got = (
            pack_sequences(df, 64, buckets=buckets)
            .orderBy("doc_id")
            .toPandas()
            .reset_index(drop=True)
        )
        if expect is None:
            # naive oracle in pandas
            n = pdf["text"].str.split().str.len()
            cum = n.cumsum().shift(fill_value=0)
            assert got["n_tokens"].tolist() == n.tolist()
            assert got["seq_id"].tolist() == (cum // 64).tolist()
            assert got["token_offset"].tolist() == (cum % 64).tolist()
            expect = got
        else:
            pd.testing.assert_frame_equal(got, expect)
    assert expect["seq_id"].is_monotonic_increasing
    assert expect["seq_id"].max() > 0


def test_pack_sequences_scale_shape(spark):
    """100-TB posture: the ONLY unpartitioned window runs over the bucket
    TOTALS (#buckets rows), never the corpus — the corpus-side window is
    partitioned by bucket, and the offsets come back via broadcast."""
    import pandas as pd

    from dataflow_ordered_processing_spark.functions.text import pack_sequences

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(50), "text": ["a b c"] * 50})
    )
    plan = (
        pack_sequences(df, 64, buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    # the global window must be fed by the aggregate, not the raw rows:
    # exactly one single-partition exchange, downstream of a HashAggregate
    assert plan.count("Exchange SinglePartition") == 1


def test_repeated_ngrams_blocklist(spark):
    import pandas as pd

    from dataflow_ordered_processing_spark.functions.text import repeated_ngrams

    boiler = "the quick brown fox jumps"
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                f"{boiler} doc zero unique tail here",
                f"intro words then {boiler} and more",
                "completely unrelated content with no overlap at all",
                f"{boiler} appears a third time in this one",
                "another unique document body entirely different words",
                "yet another singleton document with its own phrasing",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    got = repeated_ngrams(df, shingle=5, min_docs=2).toPandas()
    # the boilerplate 5-gram is flagged with the right doc count
    import hashlib

    gh = hashlib.md5(boiler.encode()).hexdigest()
    hit = got[got.gh == gh]
    assert len(hit) == 1 and int(hit.n_docs.iloc[0]) == 3
    # nothing from the singleton docs
    assert (got.n_docs >= 2).all()
