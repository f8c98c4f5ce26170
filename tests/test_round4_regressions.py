"""Round-4 regression tests for the VERDICT/ADVICE round-3 findings:

  R4-A1  integer-micros money sums: BIGINT wraps silently past its per-group
         bound; exact_decimal=True must survive the same input (ADVICE #1)
  (R4-A2 TWS cap config guard lives in test_ordered_tws.py; R4-A3 max_bucket
   opt-in default is covered by the updated test_lsh_degenerate_bucket_capped)
"""

import pytest
from pyspark.sql import functions as F

from dataflow_ordered_processing_spark.plans.relational import _micros, _sum_micros


# ---------------------------------------------------------------- R4-A1

def test_micros_sum_decimal_survives_int64_overflow(spark):
    """Two rows of ~9.2e18 micros each: the BIGINT accumulator wraps (the
    silent-overflow hazard ADVICE flagged), the DECIMAL(38,0) accumulator is
    exact. Values chosen so the per-row double→micros fold itself is exact
    (9e12 * 1e6 = 9e18 < 2^63, representable as a double power-of-10)."""
    df = spark.createDataFrame([(9.0e12,), (9.0e12,)], "x double")
    exact = df.agg(_sum_micros(F.col("x"), exact_decimal=True).alias("s")).collect()[0]["s"]
    assert int(exact) == 18_000_000_000_000_000_000  # 1.8e19 > int64 max

    # BIGINT mode past the bound: loud ARITHMETIC_OVERFLOW under Spark 4's
    # default ANSI mode (ansi.enabled=true since 4.0) — the silent wrap
    # ADVICE warned about applies only when a deployment disables ANSI,
    # which _sum_micros's docstring calls out.
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    bigint = lambda: df.agg(  # noqa: E731
        _sum_micros(F.col("x"), exact_decimal=False).alias("s")
    ).collect()[0]["s"]
    if ansi == "true":
        with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
            bigint()
    else:  # non-ANSI deployment: documents the wrap hazard
        assert bigint() < 0

    # below the bound the two modes agree exactly
    small = spark.createDataFrame([(123.456789,), (0.000001,), (99999.5,)], "x double")
    a = small.agg(_sum_micros(F.col("x"), False).alias("s")).collect()[0]["s"]
    b = small.agg(_sum_micros(F.col("x"), True).alias("s")).collect()[0]["s"]
    assert int(a) == int(b)
    # sanity: the per-row fold is what it claims
    one = small.select(_micros(F.col("x")).alias("m")).orderBy("m").collect()
    assert [r["m"] for r in one] == [1, 123456789, 99999500000]
