"""Profile the sim06/sim08/sim11 chain stage-by-stage at sf0.1 (round-14
optimization round) — where do the ~8 s per bench run actually go?

Not part of the engine; a measurement harness.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.plans.similarity import (
    _emb,
    _ivf_emb,
    _ivfadc_rerank,
    _pq_subspaces,
    ivf_assign,
    ivf_probe,
    ivf_train_centroids,
    pq_encode,
    pq_train_codebook,
    sim06_pq_ann_topk,
    sim08_ivfadc_topk,
    sim11_ann_mmr,
)
from equity_volatility_lakehouse_platform_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(name, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} min={min(ts):.3f}s  all={[round(x, 3) for x in ts]}")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    spark = get_spark(app_name="profile-ann")

    # Stage-level timing: each stage built fresh (mirrors bench extended
    # tier, which rebuilds per run).
    t("sim06 full (build+exec)", lambda: noop(sim06_pq_ann_topk(spark, SF)))
    t("sim08 full (build+exec)", lambda: noop(sim08_ivfadc_topk(spark, SF)))
    t("sim11 full (build+exec)", lambda: noop(sim11_ann_mmr(spark, SF)))

    # Components.
    t("ivf_train_centroids(4,2) exec", lambda: noop(
        ivf_train_centroids(_ivf_emb(spark, SF), n_centroids=4, iters=2)))
    t("pq_train_codebook(16,2) exec", lambda: noop(
        pq_train_codebook(_pq_subspaces(_emb(spark, SF), 16))))

    def _enc_only():
        sub = _pq_subspaces(_emb(spark, SF), 16)
        cb = pq_train_codebook(sub)
        noop(pq_encode(_emb(spark, SF), cb, 16))

    t("train + pq_encode exec", _enc_only)

    def _assign_only():
        emb = _ivf_emb(spark, SF)
        cent = ivf_train_centroids(emb, n_centroids=4, iters=2)
        noop(ivf_assign(emb, cent).select("vec_id", "cid"))

    t("train + ivf_assign exec", _assign_only)

    def _rerank_only():
        noop(_ivfadc_rerank(spark, SF))

    t("_ivfadc_rerank full", _rerank_only)

    # Build-only cost (plan construction incl. eager training collects).
    t("sim08 build only", lambda: sim08_ivfadc_topk(spark, SF))
    t("sim11 build only", lambda: sim11_ann_mmr(spark, SF))
    t("sim06 build only", lambda: sim06_pq_ann_topk(spark, SF))
    spark.stop()


if __name__ == "__main__":
    main()
