"""ANN knob study: recall@k vs probe fraction as the LSH bit count sweeps.

Round-6 VERDICT item 3: the bucket count (2^bits) is the recall/cost knob
of the LSH ANN path (plans/similarity.lsh_bucket). This script measures,
per bits in {2, 4, 8}:

* recall@k  — mean over the query sample of |ANN topk ∩ exact topk| / k
              (sim05 with the bits override),
* probe fraction — E[candidates scanned per query] / corpus size
              (the expected cost of the bucket probe relative to brute
              force; computed from the actual bucket-size distribution:
              sum(sz^2)/N^2 over buckets = P(candidate shares the
              query's bucket)).

Results are recorded in SCALE.md (round-6 addendum). Usage::

    python scripts/ann_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from equity_volatility_lakehouse_platform_spark.plans.similarity import (
        _emb,
        lsh_bucket,
        sim05_ann_recall,
    )
    from equity_volatility_lakehouse_platform_spark.session import get_spark

    spark = get_spark(app_name="ann-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    n = _emb(spark, sf_dir).count()
    rows = []
    for bits in (2, 4, 8):
        rec = sim05_ann_recall(spark, sf_dir, bits=bits).agg(
            F.avg(F.col("n_hit") * 1.0 / F.col("n_exact"))
        ).first()[0]
        # Bucket-size distribution -> expected probe fraction:
        # P(random corpus vector lands in a random query's bucket)
        # = sum(sz^2) / N^2.
        sizes = (
            _emb(spark, sf_dir)
            .select(lsh_bucket(F.col("v"), bits).alias("b"))
            .groupBy("b")
            .count()
            .agg(
                F.sum(F.col("count") * F.col("count")).alias("s2"),
                F.count(F.lit(1)).alias("n_buckets"),
            )
            .first()
        )
        rows.append(
            {
                "bits": bits,
                "buckets_used": sizes["n_buckets"],
                "recall_at_3": round(rec, 4),
                "probe_fraction": round(sizes["s2"] / (n * n), 4),
            }
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"sf_dir": sf_dir, "corpus": n, "sweep": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
