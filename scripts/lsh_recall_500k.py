"""500k-doc LSH study: widened-signature recall + cost (round 12).

Rebuilds the round-11 addendum-5 corpus (500k docs, ~12 unique filler
tokens each, 5% sharing a six-token boilerplate phrase, 5,000 planted
~0.714-Jaccard near-dup pairs) and measures, under the AUTO ladder
(n_perm=36, b=9, r=4 at this size) vs the round-11 fixed-8 counterfactual
(n_perm=8, b=2, r=4):

  * planted-pair RECALL through d03's full banded pipeline — the round-11
    verdict's headline gap (fixed-8 r=4 collides 0.7-Jaccard pairs at
    ~48%; the widened signature's 9 bands should recover >= 90%),
  * candidate-pair volume (the FP-suppression side of the dial must
    survive the widening),
  * d03 end-to-end wall and the signature stage's own wall (the 4.5x
    hash-work cost axis, measured not guessed).

Writes LSH_RECALL_500K_r{N}.json.

Usage: python scripts/lsh_recall_500k.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 500_000
N_PLANTED = 5_000
BOILER = "alpha beta gamma delta epsilon zeta"


def build_corpus(root: str) -> list[tuple[int, int]]:
    import pandas as pd

    rows = []
    planted = []
    for i in range(N_DOCS - 2 * N_PLANTED):
        toks = [f"f{i}t{j}" for j in range(12)]
        if i % 20 == 0:  # 5% boilerplate carriers
            toks = BOILER.split() + toks[:6]
        rows.append((i, " ".join(toks)))
    for k in range(N_PLANTED):
        a_id = 1_000_000 + k
        b_id = 2_000_000 + k
        toks = [f"p{k}w{j}" for j in range(20)]
        rows.append((a_id, " ".join(toks)))
        toks[9] = f"p{k}x"  # 3 of 21 distinct shingles change: J = 15/21
        rows.append((b_id, " ".join(toks)))
        planted.append((a_id, b_id))
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "s0",
            "n_chars": pd.array([len(r[1]) for r in rows], dtype="int64"),
        }
    )
    os.makedirs(root, exist_ok=True)
    pdf.to_parquet(os.path.join(root, "documents.parquet"), index=False)
    return planted


def measure(spark, root: str, planted, n_perm: int, b: int, r: int) -> dict:
    from unittest import mock

    from equity_volatility_lakehouse_platform_spark.operators import textops
    from equity_volatility_lakehouse_platform_spark.plans import dedup
    from equity_volatility_lakehouse_platform_spark.sources.readers import (
        load_table,
    )

    with mock.patch.object(dedup, "lsh_n_perm", lambda n: n_perm), \
         mock.patch.object(dedup, "lsh_banding", lambda n: (b, r)):
        # Signature stage: MATERIALIZED once per (corpus, n_perm) — the
        # 100 TB shape (round 13; the round-12 study noop-saved it, so
        # every banding consumer re-paid the widened hash work). The
        # timed cost is compute + parquet write, amortized across every
        # downstream consumer of the snapshot.
        sig_path = os.path.join(root, f"sig_np{n_perm}")
        t0 = time.time()
        sig = textops.minhash_signature(
            load_table(spark, root, "documents"), n_perm=n_perm
        )
        sig.write.mode("overwrite").parquet(sig_path)
        sig_wall = time.time() - t0

        # d03 on the materialized table (the sig_path reuse hook) —
        # what a production consumer pays per run.
        t0 = time.time()
        pairs = dedup.d03_minhash_lsh_pairs(spark, root, sig_path=sig_path)
        got = {
            (row["doc_a"], row["doc_b"])
            for row in pairs.filter("doc_a >= 1000000").collect()
        }
        n_cand = pairs.count()
        wall = time.time() - t0

        # Recompute counterfactual (no sig_path): what the round-12
        # study measured — signature hash work re-paid inside d03.
        t0 = time.time()
        pairs_rc = dedup.d03_minhash_lsh_pairs(spark, root)
        n_cand_rc = pairs_rc.count()
        wall_rc = time.time() - t0
    if n_cand_rc != n_cand:
        raise AssertionError(
            f"sig_path parity broke: {n_cand} reused vs {n_cand_rc} recomputed"
        )
    recall = sum(1 for p in planted if p in got) / len(planted)
    return {
        "n_perm": n_perm,
        "bands": b,
        "rows_per_band": r,
        "signature_write_wall_s": round(sig_wall, 2),
        "d03_sig_reuse_wall_s": round(wall, 2),
        "d03_recompute_wall_s": round(wall_rc, 2),
        "candidate_pairs": n_cand,
        "planted_recall_at_0.714_jaccard": round(recall, 4),
    }


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "LSH_RECALL_500K_r12.json"
    from pyspark.sql import SparkSession

    root = "/tmp/evlp_lsh500k"
    shutil.rmtree(root, ignore_errors=True)
    planted = build_corpus(root)

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {
        "corpus": {
            "n_docs": N_DOCS,
            "n_planted_pairs": N_PLANTED,
            "planted_jaccard": round(15 / 21, 4),
            "boilerplate_share": 0.05,
        },
        "auto_r12": measure(spark, root, planted, 36, 9, 4),
        "fixed8_r11_counterfactual": measure(spark, root, planted, 8, 2, 4),
    }
    print(json.dumps(results, indent=1))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
