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

    # PQ knob (round 7): recall@3 of the full ADC pipeline as the
    # re-rank shortlist sweeps. The shortlist size is PQ's cost knob —
    # exact-distance work per query is O(shortlist), independent of the
    # corpus once codes are built.
    from equity_volatility_lakehouse_platform_spark.plans.similarity import (
        sim06_pq_ann_topk,
    )

    from pyspark.sql import Window

    from equity_volatility_lakehouse_platform_spark.plans.similarity import (
        sim01_bruteforce_topk,
    )

    exact_rows = (
        sim01_bruteforce_topk(spark, sf_dir)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
            ),
        )
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    pq_rows = []
    for shortlist in (5, 10, 20, 50):
        ann = sim06_pq_ann_topk(spark, sf_dir, shortlist=shortlist).select(
            "q_id", F.col("vec_id").alias("a_vec")
        )
        hit = (
            exact_rows.join(
                ann,
                (exact_rows["q_id"] == ann["q_id"])
                & (exact_rows["vec_id"] == ann["a_vec"]),
                "left",
            )
            .drop(ann["q_id"])
            .agg(
                (F.count("a_vec") * 1.0 / F.count(F.lit(1))).alias("recall")
            )
            .first()["recall"]
        )
        pq_rows.append({"shortlist": shortlist, "recall_at_3": round(hit, 4)})
        print(json.dumps(pq_rows[-1]))
    print(json.dumps(
        {"sf_dir": sf_dir, "corpus": n, "sweep": rows, "pq_sweep": pq_rows}
    ))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


def ivfadc_sweep(spark, sf_dir: str) -> list[dict]:
    """Round 9: recall@3 of the COMPOSED IVFADC path as nprobe sweeps —
    with the coarse quantizer now TRAINED, nprobe is the remaining
    recall/cost knob (probe fraction ~= nprobe / K)."""
    import json as _json

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from equity_volatility_lakehouse_platform_spark.plans.similarity import (
        sim01_bruteforce_topk,
        sim08_ivfadc_topk,
    )

    exact_rows = (
        sim01_bruteforce_topk(spark, sf_dir)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
            ),
        )
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    out = []
    for nprobe in (1, 2, 3, 4):
        ann = sim08_ivfadc_topk(spark, sf_dir, nprobe=nprobe).select(
            "q_id", F.col("vec_id").alias("a_vec")
        )
        hit = (
            exact_rows.join(
                ann,
                (exact_rows["q_id"] == ann["q_id"])
                & (exact_rows["vec_id"] == ann["a_vec"]),
                "left",
            )
            .drop(ann["q_id"])
            .agg((F.count("a_vec") * 1.0 / F.count(F.lit(1))).alias("r"))
            .first()["r"]
        )
        out.append(
            {"nprobe": nprobe, "probe_fraction": nprobe / 4.0,
             "recall_at_3": round(hit, 4)}
        )
        print(_json.dumps(out[-1]))
    return out


def shortlist_sweep(spark, sf_dir: str) -> list[dict]:
    """Round 10 (r9 verdict item 6): recall@3 of the composed IVFADC
    path as the ADC shortlist sweeps — with the coarse stage trained
    (zero pruning loss at any nprobe, round-9 sweep) the shortlist is
    the knob that buys back PQ quantization error via exact re-rank.
    The r7 PQ sweep predicted recall 1.0 at 50; the composed-path
    measurement (this sweep) found one neighbor at ADC rank 80 at
    sf0.1, so the recall-1.0 operating point is 100 — the round-10
    default."""
    import json as _json

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from equity_volatility_lakehouse_platform_spark.plans.similarity import (
        sim01_bruteforce_topk,
        sim08_ivfadc_topk,
    )

    exact_rows = (
        sim01_bruteforce_topk(spark, sf_dir)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
            ),
        )
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    out = []
    for shortlist in (10, 25, 50, 100):
        ann = sim08_ivfadc_topk(spark, sf_dir, shortlist=shortlist).select(
            "q_id", F.col("vec_id").alias("a_vec")
        )
        hit = (
            exact_rows.join(
                ann,
                (exact_rows["q_id"] == ann["q_id"])
                & (exact_rows["vec_id"] == ann["a_vec"]),
                "left",
            )
            .drop(ann["q_id"])
            .agg((F.count("a_vec") * 1.0 / F.count(F.lit(1))).alias("r"))
            .first()["r"]
        )
        out.append({"shortlist": shortlist, "recall_at_3": round(hit, 4)})
        print(_json.dumps(out[-1]))
    return out
