"""Pure-Python Avro OCF implementation: golden vectors from the Avro 1.11
specification + container round-trips. These pin the WIRE FORMAT (not just
self-consistency): the varint/zigzag vectors and the string encoding are
the spec's own examples, so a conforming external reader decodes our files."""

import io

import pandas as pd
import pytest

from dataflow_ordered_processing_spark.sources.avro_io import (
    MAGIC,
    encode_records,
    read_long,
    read_ocf,
    spark_schema_to_avro,
    write_long,
    write_ocf,
    write_string,
)


# spec: https://avro.apache.org/docs/1.11.1/specification/ "Binary Encoding"
SPEC_VECTORS = [
    (0, b"\x00"),
    (-1, b"\x01"),
    (1, b"\x02"),
    (-2, b"\x03"),
    (2, b"\x04"),
    (-64, b"\x7f"),
    (64, b"\x80\x01"),
    (-8193, b"\x81\x80\x01"),
    (8192, b"\x80\x80\x01"),
]


@pytest.mark.parametrize("n,expect", SPEC_VECTORS)
def test_long_encoding_matches_spec(n, expect):
    buf = io.BytesIO()
    write_long(buf, n)
    assert buf.getvalue() == expect
    assert read_long(io.BytesIO(expect)) == n


def test_string_encoding_matches_spec():
    buf = io.BytesIO()
    write_string(buf, "foo")  # spec example: \x06 f o o
    assert buf.getvalue() == b"\x06foo"


def test_long_roundtrip_extremes():
    for n in (2**62, -(2**62), 2**31 - 1, -(2**31), 123456789012345):
        buf = io.BytesIO()
        write_long(buf, n)
        assert read_long(io.BytesIO(buf.getvalue())) == n


def _schema():
    return {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "k", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "x", "type": "double"},
            {"name": "ok", "type": "boolean"},
            {"name": "opt", "type": ["null", "string"]},
            {
                "name": "ts",
                "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}],
            },
        ],
    }


def _frame():
    return pd.DataFrame(
        {
            "k": ["a", "b"],
            "n": [1, -(2**40)],
            "x": [1.5, -0.25],
            "ok": [True, False],
            "opt": ["v", None],
            "ts": [pd.Timestamp("2026-01-02 03:04:05.000006"), None],
        }
    )


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    with open(p, "wb") as f:
        n = write_ocf(f, _schema(), [_frame(), _frame()], codec=codec)
    assert n == 4
    raw = open(p, "rb").read()
    assert raw.startswith(MAGIC)
    schema, rows = read_ocf(p)
    assert schema == _schema() and len(rows) == 4
    assert rows[0]["k"] == "a" and rows[1]["n"] == -(2**40)
    assert rows[0]["ts"] == pd.Timestamp("2026-01-02 03:04:05.000006")
    assert rows[1]["opt"] is None and rows[1]["ts"] is None


def test_null_in_required_field_rejected():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [{"name": "k", "type": "string"}],
    }
    with pytest.raises(ValueError, match="non-nullable"):
        encode_records(pd.DataFrame({"k": ["x", None]}), schema)


def test_spark_schema_mapping(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0, True, None)],
        "s string, i int, d double, b boolean, t timestamp",
    )
    avro = spark_schema_to_avro(df.schema)
    types = {f["name"]: f["type"] for f in avro["fields"]}
    assert types["s"] == ["null", "string"]
    assert types["i"] == ["null", "int"]
    assert types["t"] == ["null", {"type": "long", "logicalType": "timestamp-micros"}]
    with pytest.raises(ValueError, match="unsupported"):
        spark_schema_to_avro(
            spark.createDataFrame([([1],)], "a array<int>").schema
        )
