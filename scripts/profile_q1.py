"""Profile q1 variants at sf0.1 to find the cost center (round-5 perf work).

Not part of the engine; a measurement harness.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.session import get_spark
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bench(name, df, n=3):
    df.write.mode("overwrite").format("noop").save()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    print(f"{name:30s} {min(ts):.3f}s")


def main():
    spark = get_spark(app_name="profile-q1")
    li = load_table(spark, SF, "lineitem")
    filt = li.filter(
        F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp")
    )

    bench("scan+filter+count", filt.groupBy().count())

    bench(
        "group+count only",
        filt.groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1))),
    )

    bench(
        "plain double sums",
        filt.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)),
            F.sum("l_quantity"),
            F.sum("l_extendedprice"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            F.sum("l_discount"),
        ),
    )

    cents = lambda c: F.round(F.col(c) * 100, 0).cast("long")  # noqa: E731
    ep_c = cents("l_extendedprice")
    d100 = F.lit(100) - cents("l_discount")
    t100 = F.lit(100) + cents("l_tax")

    bench(
        "long products, long sums",
        filt.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)),
            F.sum("l_quantity"),
            F.sum(ep_c),
            F.sum(ep_c * d100),
            F.sum(ep_c * d100 * t100),
            F.sum(cents("l_discount")),
        ),
    )

    bench(
        "long products, decimal sums",
        filt.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)),
            F.sum("l_quantity"),
            F.sum(ep_c.cast("decimal(18,0)")),
            F.sum((ep_c * d100).cast("decimal(18,0)")),
            F.sum((ep_c * d100 * t100).cast("decimal(20,0)")),
            F.sum(cents("l_discount").cast("decimal(18,0)")),
        ),
    )

    disc_u = ep_c * d100
    charge_u = ep_c * d100 * t100
    M = F.lit(1 << 20)
    bench(
        "split-long sums (hi/lo)",
        filt.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)),
            F.sum("l_quantity"),
            F.sum(ep_c),
            F.sum(disc_u.bitwiseAND(F.lit((1 << 20) - 1))),
            F.sum(F.shiftright(disc_u, 20)),
            F.sum(charge_u.bitwiseAND(F.lit((1 << 20) - 1))),
            F.sum(F.shiftright(charge_u, 20)),
            F.sum(cents("l_discount")),
        ),
    )

    # cents via +0.5-and-truncate: F.round(double) allocates a BigDecimal
    # per row; for positive exactly-2dp inputs trunc(x*100+0.5) is the
    # same integer at a fraction of the cost.
    ccents = lambda c: (F.col(c) * 100 + 0.5).cast("long")  # noqa: E731
    cep = ccents("l_extendedprice")
    cd100 = F.lit(100) - ccents("l_discount")
    ct100 = F.lit(100) + ccents("l_tax")

    bench(
        "cheap cents, long sums",
        filt.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)),
            F.sum("l_quantity"),
            F.sum(cep),
            F.sum(cep * cd100),
            F.sum(cep * cd100 * ct100),
            F.sum(ccents("l_discount")),
        ),
    )

    pre = filt.select(
        "l_returnflag", "l_linestatus", "l_quantity",
        cep.alias("ep_c"),
        (cep * cd100).alias("disc_u"),
        (cep * cd100 * ct100).alias("charge_u"),
        ccents("l_discount").alias("disc_c"),
    )
    LO = F.lit((1 << 20) - 1)
    bench(
        "cheap cents, split sums",
        pre.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)),
            F.sum("l_quantity"),
            F.sum("ep_c"),
            F.sum(F.col("disc_u").bitwiseAND(LO)),
            F.sum(F.shiftright("disc_u", 20)),
            F.sum(F.col("charge_u").bitwiseAND(LO)),
            F.sum(F.shiftright("charge_u", 20)),
            F.sum("disc_c"),
        ),
    )

    from equity_volatility_lakehouse_platform_spark.plans.relational import (
        q1_pricing_summary,
    )

    bench("full q1 (current)", q1_pricing_summary(spark, SF))
    spark.stop()


if __name__ == "__main__":
    main()
