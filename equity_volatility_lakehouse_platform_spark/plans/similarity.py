"""Similarity-search queries over the embeddings table (north-star:
brute-force cosine top-k baseline + LSH-bucketed ANN scale path).

Cosine math folds JVM-side over double-cast arrays (zip_with/aggregate).
The brute-force variant is the correctness baseline (O(Q*N), Q small);
the random-hyperplane bucket variant is the 100 TB path: vectors shuffle
once on the bucket key, and each query probes only its own bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table
from equity_volatility_lakehouse_platform_spark.functions.rounding import r6


def dot(x: Column, y: Column) -> Column:
    """Sequential fold dot product — bit-identical to a left-to-right SQL
    list_dot_product over the same doubles."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
    )


def cosine(x: Column, y: Column) -> Column:
    return dot(x, y) / F.nullif(F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)), F.lit(0.0))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


# Deterministic pseudo-random hyperplanes: r_j[i] = sin(i * j), i 1-based —
# reproducible in any engine without a shared RNG.
def _projection(v: Column, j: int) -> Column:
    weights = F.transform(
        F.sequence(F.lit(1), F.lit(64)), lambda i: F.sin(i.cast("double") * j)
    )
    return dot(v, weights)


def lsh_bucket(v: Column, bits: int = 2) -> Column:
    """Random-hyperplane LSH bucket id over ``bits`` hyperplanes
    (2^bits buckets). ``bits`` is THE recall/cost knob at scale: each
    extra bit halves the expected bucket (probe cost) and lowers recall;
    the measured curve lives in SCALE.md (round-6 ANN knob study).
    bits=2 is the oracle-checked default."""
    b: Column = F.lit(0).cast("long")
    for j in range(1, bits + 1):
        b = b + (_projection(v, j) >= 0).cast("long") * (1 << (bits - j))
    return b


@register(
    "sim01_bruteforce_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (
      SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3
    ), scored AS (
      SELECT q.q_id, e.vec_id,
             list_dot_product(q.qv, e.v)
               / NULLIF(sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(e.v, e.v)), 0) AS cos
      FROM q JOIN e ON e.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, (ROUND(cos, 6) + 0.0) AS cosine
    FROM (SELECT q_id, vec_id, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
)
def sim01_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact kNN baseline: tiny query set broadcast against the corpus, then
    # per-query top-k (window on the query key — k small, no global sort).
    # Norms are projected BEFORE the join, so each corpus vector's norm is
    # computed once, not once per query (Q-fold savings; float-identical:
    # dot/(sqrt*sqrt) evaluates in the same order).
    emb = _emb(spark, sf_dir).select(
        "vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nv")
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nv").alias("nq")
    )
    cos = dot(F.col("qv"), F.col("v")) / F.nullif(
        F.col("nq") * F.col("nv"), F.lit(0.0)
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "vec_id", r6("cos").alias("cosine"))
    )


@register(
    "sim02_lsh_buckets",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), proj AS (
      SELECT vec_id,
             list_dot_product(v, list_transform(range(1, 65), i -> sin(i * 1.0))) AS p1,
             list_dot_product(v, list_transform(range(1, 65), i -> sin(i * 2.0))) AS p2
      FROM e
    )
    SELECT vec_id,
           CAST(CASE WHEN p1 >= 0 THEN 1 ELSE 0 END * 2
                + CASE WHEN p2 >= 0 THEN 1 ELSE 0 END AS BIGINT) AS bucket
    FROM proj
    """,
)
def sim02_lsh_buckets(spark: SparkSession, sf_dir: str, bits: int = 2) -> DataFrame:
    # Random-hyperplane LSH bucketing (sign of ``bits`` fixed projections
    # -> 2^bits buckets). At scale this is the partition key for ANN: one
    # shuffle, queries probe one bucket instead of the corpus. ``bits``
    # parameterizes the recall/cost trade (default 2 = the oracle).
    emb = _emb(spark, sf_dir)
    return emb.select("vec_id", lsh_bucket(F.col("v"), bits).alias("bucket"))


@register(
    "sim04_ivf_ann_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), c AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id IN (5, 17, 29, 41)
    ), sc AS (
      SELECT e.vec_id, e.v, c.cid,
             list_dot_product(e.v, c.cv)
               / NULLIF(sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(c.cv, c.cv)), 0) AS cosc
      FROM e CROSS JOIN c
    ), assigned AS (
      SELECT vec_id, v, cid
      FROM (SELECT vec_id, v, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cosc DESC, cid) AS rn
            FROM sc)
      WHERE rn = 1
    ), probe AS (
      SELECT vec_id AS q_id, v AS qv, cid AS qcid
      FROM (SELECT vec_id, v, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cosc DESC, cid) AS rn
            FROM sc WHERE vec_id < 3)
      WHERE rn <= 2
    ), cand AS (
      SELECT p.q_id, a.vec_id,
             list_dot_product(p.qv, a.v)
               / NULLIF(sqrt(list_dot_product(p.qv, p.qv))
                        * sqrt(list_dot_product(a.v, a.v)), 0) AS cos
      FROM probe p JOIN assigned a ON a.cid = p.qcid AND a.vec_id <> p.q_id
    )
    SELECT q_id, vec_id, (ROUND(cos, 6) + 0.0) AS cosine
    FROM (SELECT q_id, vec_id, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, vec_id) AS rn
          FROM cand)
    WHERE rn <= 3
    """,
)
def sim04_ivf_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    centroid_ids: tuple = (5, 17, 29, 41),
    nprobe: int = 2,
    k: int = 3,
) -> DataFrame:
    # IVF (inverted-file) ANN — the other classic scale path next to LSH
    # (sim03). A small coarse quantizer (fixed seed centroids, standing in
    # for an offline-trained codebook) is broadcast; every vector is
    # assigned to its nearest centroid (argmax cosine), forming inverted
    # lists keyed by centroid id. Queries probe their ``nprobe`` nearest
    # lists and exact cosine re-ranks only those candidates. The codebook
    # size |centroid_ids| and ``nprobe`` are THE recall/cost knobs
    # (probe fraction ~= nprobe / K); defaults = the oracle. At 100 TB the
    # corpus never shuffles for the probe: the broadcast x K expansion and
    # the per-vector argmax collapse map-side (partial max_by), so the one
    # shuffle is the assignment groupBy, and probing is a broadcast join of
    # the tiny query set against the lists.
    emb = _emb(spark, sf_dir).select(
        "vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nv")
    )
    cent = emb.filter(F.col("vec_id").isin(*centroid_ids)).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nv").alias("nc")
    )
    cosc = dot(F.col("v"), F.col("cv")) / F.nullif(
        F.col("nv") * F.col("nc"), F.lit(0.0)
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "v", "nv", "cid", cosc.alias("cosc")
    )
    # Inverted lists: nearest centroid per vector (ties -> lowest cid,
    # mirroring the oracle's ORDER BY cosc DESC, cid).
    assigned = scored.groupBy("vec_id").agg(
        F.max_by("cid", F.struct(F.col("cosc"), -F.col("cid"))).alias("cid"),
        F.first("v").alias("v"),
        F.first("nv").alias("nv"),
    )
    # Query probe set: top-nprobe centroids per query vector.
    wq = Window.partitionBy("vec_id").orderBy(F.desc("cosc"), "cid")
    qprobe = (
        scored.filter(F.col("vec_id") < 3)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
            F.col("nv").alias("nq"), F.col("cid").alias("qcid"),
        )
    )
    cos = dot(F.col("qv"), F.col("v")) / F.nullif(
        F.col("nq") * F.col("nv"), F.lit(0.0)
    )
    cand = (
        F.broadcast(qprobe)
        .join(assigned, (F.col("qcid") == F.col("cid")) & (F.col("vec_id") != F.col("q_id")))
        .select("q_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", r6("cos").alias("cosine"))
    )


@register(
    "sim03_lsh_ann_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), b AS (
      SELECT vec_id, v,
             CAST(CASE WHEN list_dot_product(v, list_transform(range(1, 65), i -> sin(i * 1.0))) >= 0
                       THEN 1 ELSE 0 END * 2
                + CASE WHEN list_dot_product(v, list_transform(range(1, 65), i -> sin(i * 2.0))) >= 0
                       THEN 1 ELSE 0 END AS BIGINT) AS bucket
      FROM e
    ), q AS (
      SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id < 3
    ), scored AS (
      SELECT q.q_id, b.vec_id,
             list_dot_product(q.qv, b.v)
               / NULLIF(sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(b.v, b.v)), 0) AS cos
      FROM q JOIN b ON q.bucket = b.bucket AND b.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, (ROUND(cos, 6) + 0.0) AS cosine
    FROM (SELECT q_id, vec_id, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def sim03_lsh_ann_topk(
    spark: SparkSession, sf_dir: str, bits: int = 2, k: int = 3
) -> DataFrame:
    # ANN via bucket pruning: candidates share the query's LSH bucket
    # (equi-join on bucket), then exact cosine re-rank — the IVF/LSH scale
    # pattern from sim01's baseline. ``bits`` sets the bucket count
    # (recall/cost knob, default = oracle).
    emb = _emb(spark, sf_dir)
    bucketed = emb.select(
        "vec_id", "v", lsh_bucket(F.col("v"), bits).alias("bucket"),
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("nv"),
    )
    q = bucketed.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("bucket").alias("qb"), F.col("nv").alias("nq"),
    )
    cos = dot(F.col("qv"), F.col("v")) / F.nullif(
        F.col("nq") * F.col("nv"), F.lit(0.0)
    )
    scored = (
        F.broadcast(q)
        .join(bucketed, (F.col("qb") == F.col("bucket")) & (F.col("vec_id") != F.col("q_id")))
        .select("q_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", r6("cos").alias("cosine"))
    )


@register(
    "sim05_ann_recall",
    # Recall@k of the LSH-ANN path against the exact baseline — the
    # evaluation every ANN deployment runs before trusting the index.
    # Both top-k sets are fully deterministic (ties broken by vec_id),
    # so recall is a ratio of small exact integers.
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), b AS (
      SELECT vec_id, v,
             CAST(CASE WHEN list_dot_product(v, list_transform(range(1, 65), i -> sin(i * 1.0))) >= 0
                       THEN 1 ELSE 0 END * 2
                + CASE WHEN list_dot_product(v, list_transform(range(1, 65), i -> sin(i * 2.0))) >= 0
                       THEN 1 ELSE 0 END AS BIGINT) AS bucket
      FROM e
    ), q AS (
      SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id < 3
    ), exact_topk AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, e.vec_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 list_dot_product(q.qv, e.v)
                   / NULLIF(sqrt(list_dot_product(q.qv, q.qv))
                            * sqrt(list_dot_product(e.v, e.v)), 0) DESC, e.vec_id) AS rn
        FROM q JOIN e ON e.vec_id <> q.q_id
      ) WHERE rn <= 3
    ), ann_topk AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, b.vec_id,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 list_dot_product(q.qv, b.v)
                   / NULLIF(sqrt(list_dot_product(q.qv, q.qv))
                            * sqrt(list_dot_product(b.v, b.v)), 0) DESC, b.vec_id) AS rn
        FROM q JOIN b ON q.bucket = b.bucket AND b.vec_id <> q.q_id
      ) WHERE rn <= 3
    )
    SELECT x.q_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(a.vec_id) AS BIGINT) AS n_hit,
           (ROUND(count(a.vec_id) * 1.0 / count(*), 6) + 0.0) AS recall_at_3
    FROM exact_topk x
    LEFT JOIN ann_topk a ON a.q_id = x.q_id AND a.vec_id = x.vec_id
    GROUP BY x.q_id
    """,
)
def sim05_ann_recall(
    spark: SparkSession, sf_dir: str, bits: int = 2, k: int = 3
) -> DataFrame:
    # Composition query: exact top-k (sim01's shape) vs LSH-bucket top-k
    # (sim03's shape), joined per query to measure recall@k. Scale: the
    # exact side is the expensive one by construction — in production
    # it runs on a SAMPLE of queries (this Q=3 set), which is precisely
    # what makes the evaluation affordable at 100 TB while the ANN path
    # serves the full load. ``bits`` sweeps the knob (scripts/ann_sweep.py
    # records the recall/cost curve in SCALE.md); defaults = the oracle.
    emb = _emb(spark, sf_dir)
    bucketed = emb.select(
        "vec_id", "v", lsh_bucket(F.col("v"), bits).alias("bucket"),
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("nv"),
    )
    q = bucketed.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("bucket").alias("qb"), F.col("nv").alias("nq"),
    )
    cos = dot(F.col("qv"), F.col("v")) / F.nullif(
        F.col("nq") * F.col("nv"), F.lit(0.0)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")

    def topk(cand: DataFrame) -> DataFrame:
        return (
            cand.select("q_id", "vec_id", cos.alias("cos"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("q_id", "vec_id")
        )

    exact = topk(
        F.broadcast(q).join(bucketed, F.col("vec_id") != F.col("q_id"))
    )
    ann = topk(
        F.broadcast(q).join(
            bucketed,
            (F.col("qb") == F.col("bucket")) & (F.col("vec_id") != F.col("q_id")),
        )
    )
    hit = ann.select("q_id", F.col("vec_id").alias("hit_id"))
    return (
        exact.join(
            hit,
            (exact.q_id == hit.q_id) & (exact.vec_id == hit.hit_id),
            "left",
        )
        .select(exact.q_id.alias("q_id"), "vec_id", "hit_id")
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit_id").alias("n_hit"),
            r6(F.count("hit_id") * 1.0 / F.count(F.lit(1))).alias(f"recall_at_{k}"),
        )
    )


# ml12's oracle, shared with ml13's confusion-matrix roll-up.
_ML12_SQL = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
    ), q AS (
      SELECT vec_id AS q_id, v AS qv, label AS true_label
      FROM e WHERE vec_id % 20 = 0
    ), scored AS (
      SELECT q.q_id, q.true_label, e.vec_id, e.label,
             list_dot_product(q.qv, e.v)
               / NULLIF(sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(e.v, e.v)), 0) AS cos
      FROM q JOIN e ON e.vec_id <> q.q_id
    ), nn AS (
      SELECT q_id, true_label, label FROM (
        SELECT q_id, true_label, label,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cos DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= 3
    ), votes AS (
      SELECT q_id, true_label, label, CAST(count(*) AS BIGINT) AS n
      FROM nn GROUP BY q_id, true_label, label
    )
    SELECT q_id, true_label, label AS pred_label,
           (label = true_label) AS correct
    FROM (
      SELECT q_id, true_label, label, n,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY n DESC, label) AS vrk
      FROM votes
    ) WHERE vrk = 1
    """


@register(
    "ml12_knn_classify",
    # kNN label classification over the embedding column: every 20th
    # vector is an eval query, its label predicted by majority vote of
    # its 3 exact nearest neighbors (cosine; ties in the vote resolve to
    # the SMALLEST label). The per-query accuracy bit is the output —
    # the eval loop a similarity-search deployment runs before swapping
    # brute force for ANN.
    oracle=_ML12_SQL,
)
def ml12_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sim01's exact-kNN physical shape (norms projected pre-join, eval
    # queries broadcast into a BNLJ against the corpus) extended with a
    # two-window vote: top-3 by cosine, then majority label. The eval
    # set is a fixed 5% sample — at 100 TB an eval set stays
    # broadcast-sized by construction; the corpus side only streams.
    emb = _emb(spark, sf_dir).select(
        "vec_id", "v", "label", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nv")
    )
    q = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("label").alias("true_label"), F.col("nv").alias("nq"),
    )
    cos = dot(F.col("qv"), F.col("v")) / F.nullif(
        F.col("nq") * F.col("nv"), F.lit(0.0)
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("q_id"))
        .select("q_id", "true_label", "vec_id", "label", cos.alias("cos"))
    )
    wnn = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    nn = (
        scored.withColumn("rn", F.row_number().over(wnn))
        .filter(F.col("rn") <= 3)
        .select("q_id", "true_label", "label")
    )
    votes = nn.groupBy("q_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    wv = Window.partitionBy("q_id").orderBy(F.desc("n"), F.asc("label"))
    return (
        votes.withColumn("vrk", F.row_number().over(wv))
        .filter(F.col("vrk") == 1)
        .select(
            "q_id", "true_label",
            F.col("label").alias("pred_label"),
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
    )


@register(
    "ml13_confusion_matrix",
    # Per-label precision/recall over ml12's kNN predictions — the eval
    # report that decides whether the similarity stack ships. tp/fp/fn
    # are exact counts from the same deterministic prediction set; a
    # label missing on one side contributes zeros (full outer join).
    oracle=f"""
    WITH preds AS ({_ML12_SQL}),
    tl AS (
      SELECT true_label AS label,
             CAST(count(*) AS BIGINT) AS n_true,
             CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS tp
      FROM preds GROUP BY true_label
    ), pl AS (
      SELECT pred_label AS label,
             CAST(count(*) AS BIGINT) AS n_pred
      FROM preds GROUP BY pred_label
    )
    SELECT COALESCE(tl.label, pl.label) AS label,
           COALESCE(tl.tp, 0) AS tp,
           COALESCE(pl.n_pred, 0) - COALESCE(tl.tp, 0) AS fp,
           COALESCE(tl.n_true, 0) - COALESCE(tl.tp, 0) AS fn,
           (ROUND(COALESCE(tl.tp, 0) * 1.0
                  / NULLIF(COALESCE(pl.n_pred, 0), 0), 6) + 0.0)
             AS precision_,
           (ROUND(COALESCE(tl.tp, 0) * 1.0
                  / NULLIF(COALESCE(tl.n_true, 0), 0), 6) + 0.0) AS recall_
    FROM tl FULL OUTER JOIN pl ON tl.label = pl.label
    """,
)
def ml13_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Composes ml12 with ONE label aggregate: each prediction row
    # explodes into a (role, label) pair — its true-label row and its
    # pred-label row — so true-side and pred-side counts come out of a
    # single groupBy and the expensive kNN stage executes ONCE. (Two
    # independent aggregations over the ml12 DataFrame would each re-run
    # the broadcast-NLJ scoring pipeline: subplans above a reused
    # broadcast are not shared across join branches.) The label union is
    # implicit, so the previous full-outer-join semantics — a label
    # missing on one side contributes zeros — are preserved exactly.
    preds = ml12_knn_classify(spark, sf_dir)
    pairs = preds.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("t").alias("role"),
                    F.col("true_label").alias("label"),
                    F.col("correct").alias("correct"),
                ),
                F.struct(
                    F.lit("p").alias("role"),
                    F.col("pred_label").alias("label"),
                    F.lit(None).cast("boolean").alias("correct"),
                ),
            )
        ).alias("x")
    ).select("x.role", "x.label", "x.correct")
    is_t = F.col("role") == "t"
    g = pairs.groupBy("label").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("n_true"),
        F.sum(F.when(is_t & F.col("correct"), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(~is_t, 1).otherwise(0)).alias("n_pred"),
    )
    return g.select(
        "label",
        F.col("tp"),
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_true") - F.col("tp")).alias("fn"),
        r6(F.col("tp") * F.lit(1.0) / F.nullif(F.col("n_pred"), F.lit(0))).alias(
            "precision_"
        ),
        r6(F.col("tp") * F.lit(1.0) / F.nullif(F.col("n_true"), F.lit(0))).alias(
            "recall_"
        ),
    )


@register(
    "ml14_roc_auc",
    # Rank-based ROC AUC (Mann-Whitney U) of a deterministic score
    # against the binary label (label >= 5): AUC = (R_pos - n_pos(n_pos
    # + 1)/2) / (n_pos * n_neg) with AVERAGE ranks, which handles score
    # ties with the standard 1/2 credit. Ranks are exact integer
    # arithmetic on an identical sort, so AUC is one exact division.
    oracle="""
    WITH s AS (
      SELECT vec_id,
             v[1] AS score,
             CAST(label >= 5 AS INTEGER) AS y
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
            FROM embeddings)
    ), r AS (
      SELECT y,
             AVG(rn) OVER (PARTITION BY score) AS avg_rank
      FROM (
        SELECT y, score,
               row_number() OVER (ORDER BY score, vec_id) * 1.0 AS rn
        FROM s
      )
    )
    SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(1 - y) AS BIGINT) AS n_neg,
           (ROUND((SUM(CASE WHEN y = 1 THEN avg_rank ELSE 0 END)
                   - SUM(y) * (SUM(y) + 1.0) / 2.0)
                  / NULLIF(SUM(y) * 1.0 * SUM(1 - y), 0.0), 6) + 0.0)
             AS auc
    FROM r
    """,
)
def ml14_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The binary-classifier eval metric as pure rank arithmetic: one
    # sort by score (global here because AUC is global by definition —
    # at 100 TB you'd compute per-slice AUCs per partition or a sampled
    # global), one tie-averaging window, one single-row reduction.
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    s = emb.select(
        "vec_id",
        F.get(F.col("v"), 0).alias("score"),
        (F.col("label") >= 5).cast("int").alias("y"),
    )
    rn = F.row_number().over(Window.orderBy("score", "vec_id")) * F.lit(1.0)
    ranked = s.select("y", "score", rn.alias("rn"))
    avg_rank = F.avg("rn").over(Window.partitionBy("score"))
    r = ranked.select("y", avg_rank.alias("avg_rank"))
    n_pos = F.sum("y")
    n_neg = F.sum(1 - F.col("y"))
    r_pos = F.sum(F.when(F.col("y") == 1, F.col("avg_rank")).otherwise(0.0))
    return r.agg(
        n_pos.cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
        r6(
            (r_pos - n_pos * (n_pos + F.lit(1.0)) / F.lit(2.0))
            / F.nullif(n_pos * F.lit(1.0) * n_neg, F.lit(0.0))
        ).alias("auc"),
    )


@register(
    "ml15_lift_deciles",
    # Decile lift/calibration table for the ml14 score: rank-exact
    # NTILE(10) buckets over (score desc, vec_id), per-decile positive
    # rate, and cumulative lift vs the base rate. All ratios are exact
    # integer arithmetic; cumulative sums run over ten pre-aggregated
    # rows.
    oracle="""
    WITH s AS (
      SELECT vec_id, v[1] AS score, CAST(label >= 5 AS INTEGER) AS y
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
            FROM embeddings)
    ), d AS (
      SELECT y,
             CAST(ntile(10) OVER (ORDER BY score DESC, vec_id) AS BIGINT)
               AS decile
      FROM s
    ), g AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos
      FROM d GROUP BY decile
    ), t AS (SELECT SUM(n) AS tot_n, SUM(n_pos) AS tot_pos FROM g)
    SELECT decile, n, n_pos,
           (ROUND(n_pos * 1.0 / n, 6) + 0.0) AS pos_rate,
           (ROUND((SUM(n_pos) OVER (ORDER BY decile) * 1.0
                   / SUM(n) OVER (ORDER BY decile))
                  / NULLIF(tot_pos * 1.0 / tot_n, 0.0), 6) + 0.0)
             AS cum_lift
    FROM g CROSS JOIN t
    """,
)
def ml15_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One global sort assigns deciles (the same per-slice caveat as
    # ml14), a ten-key groupBy, then cumulative windows over ten rows —
    # the model-quality report every ranking deployment prints.
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    s = emb.select(
        "vec_id",
        F.get(F.col("v"), 0).alias("score"),
        (F.col("label") >= 5).cast("int").alias("y"),
    )
    decile = F.ntile(10).over(Window.orderBy(F.desc("score"), "vec_id"))
    d = s.select("y", decile.cast("bigint").alias("decile"))
    g = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").cast("bigint").alias("n_pos")
    )
    t = g.agg(F.sum("n").alias("tot_n"), F.sum("n_pos").alias("tot_pos"))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    j = g.crossJoin(F.broadcast(t))
    return j.select(
        "decile", "n", "n_pos",
        r6(F.col("n_pos") * F.lit(1.0) / F.col("n")).alias("pos_rate"),
        r6(
            (F.sum("n_pos").over(wc) * F.lit(1.0) / F.sum("n").over(wc))
            / F.nullif(
                F.col("tot_pos") * F.lit(1.0) / F.col("tot_n"), F.lit(0.0)
            )
        ).alias("cum_lift"),
    )


# Shared PQ/ADC CTE chain (sim06 + the sim07 recall audit): encode via
# the bit-exact L2 expansion, ADC lookups, exact-cosine re-rank input.
_PQ_SQL = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), sub AS (
      SELECT vec_id, v,
             list_slice(v, 1, 32)  AS v0,
             list_slice(v, 33, 64) AS v1
      FROM e
    ), cb AS (
      SELECT s.s, sub.vec_id AS j,
             CASE WHEN s.s = 0 THEN v0 ELSE v1 END AS c
      FROM sub CROSS JOIN (SELECT 0 AS s UNION ALL SELECT 1) s
      WHERE sub.vec_id < 8
    ), enc AS (
      SELECT sub.vec_id, cb.s, cb.j,
             (list_dot_product(CASE WHEN cb.s = 0 THEN v0 ELSE v1 END,
                               CASE WHEN cb.s = 0 THEN v0 ELSE v1 END)
              - 2 * list_dot_product(CASE WHEN cb.s = 0 THEN v0 ELSE v1 END,
                                     cb.c)
              + list_dot_product(cb.c, cb.c)) AS d
      FROM sub CROSS JOIN cb
    ), codes AS (
      SELECT vec_id,
             max(CASE WHEN s = 0 THEN j END) AS code0,
             max(CASE WHEN s = 1 THEN j END) AS code1
      FROM (SELECT vec_id, s, j,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY d, j) AS rn
            FROM enc)
      WHERE rn = 1 GROUP BY vec_id
    ), qd AS (
      SELECT sub.vec_id AS q_id, cb.s, cb.j,
             (list_dot_product(CASE WHEN cb.s = 0 THEN v0 ELSE v1 END,
                               CASE WHEN cb.s = 0 THEN v0 ELSE v1 END)
              - 2 * list_dot_product(CASE WHEN cb.s = 0 THEN v0 ELSE v1 END,
                                     cb.c)
              + list_dot_product(cb.c, cb.c)) AS dq
      FROM sub CROSS JOIN cb
      WHERE sub.vec_id < 3
    ), cand AS (
      SELECT d0.q_id, codes.vec_id, d0.dq + d1.dq AS approx
      FROM codes
      JOIN qd d0 ON d0.s = 0 AND d0.j = codes.code0
      JOIN qd d1 ON d1.s = 1 AND d1.j = codes.code1 AND d1.q_id = d0.q_id
      WHERE codes.vec_id <> d0.q_id
    ), shortlist AS (
      SELECT q_id, vec_id, approx
      FROM (SELECT q_id, vec_id, approx,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY approx, vec_id) AS rn
            FROM cand)
      WHERE rn <= 10
    ), rer AS (
      SELECT s.q_id, s.vec_id, s.approx,
             list_dot_product(q.v, x.v)
               / NULLIF(sqrt(list_dot_product(q.v, q.v))
                        * sqrt(list_dot_product(x.v, x.v)), 0) AS cos
      FROM shortlist s
      JOIN e q ON q.vec_id = s.q_id
      JOIN e x ON x.vec_id = s.vec_id
    )
"""


@register(
    "sim06_pq_ann_topk",
    # Product quantization (PQ/ADC) ANN — the MEMORY-scale path next to
    # LSH (sim03) and IVF (sim04): at 100 TB a 64-dim float vector is
    # 256-512 B, its PQ code is M small ints (here 2 bytes). Encode is
    # one broadcast-codebook pass; query-time ADC never touches raw
    # vectors until the final re-rank. Subspaces: v[1..32] / v[33..64];
    # codebook = the 8 lowest vec_ids' subvectors per subspace (fixed
    # seed standing in for an offline-trained k-means, like sim04's
    # centroids); code_s = argmin_j L2^2(sub_s(v), c_{s,j}) with the
    # d = dot(x,x) - 2*dot(x,c) + dot(c,c) expansion — the identical
    # left-to-right fold on both engines, so assignments and distances
    # are bit-exact. Queries (vec_id < 3) build a 2x8 ADC table; the
    # approximate distance is two BROADCAST hash-join lookups per code
    # (zero shuffle over the corpus), top-10 by (approx, vec_id), then
    # exact cosine re-ranks those 10 to the final top-3.
    oracle=_PQ_SQL + """
    SELECT q_id, vec_id,
           (ROUND(approx, 6) + 0.0) AS approx_l2,
           (ROUND(cos, 6) + 0.0)    AS cosine
    FROM (SELECT q_id, vec_id, approx, cos,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos DESC, vec_id) AS rn
          FROM rer)
    WHERE rn <= 3
    """,
)
def sim06_pq_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = 8,
    shortlist: int = 10,
    k: int = 3,
) -> DataFrame:
    emb = _emb(spark, sf_dir)
    sub = emb.select(
        "vec_id",
        "v",
        F.slice("v", 1, 32).alias("v0"),
        F.slice("v", 33, 32).alias("v1"),
    )
    cb = (
        sub.filter(F.col("vec_id") < n_centroids)
        .select(
            F.col("vec_id").alias("j"),
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("s"), F.col("v0").alias("c")),
                    F.struct(F.lit(1).alias("s"), F.col("v1").alias("c")),
                )
            ).alias("e"),
        )
        .select("j", F.col("e.s").alias("s"), F.col("e.c").alias("c"))
    )

    def _adc(df: DataFrame, out: str) -> DataFrame:
        # d = |x|^2 - 2<x,c> + |c|^2, same left-to-right shape as the SQL.
        x = F.when(F.col("s") == 0, F.col("v0")).otherwise(F.col("v1"))
        d = dot(x, x) - F.lit(2) * dot(x, F.col("c")) + dot(F.col("c"), F.col("c"))
        return df.crossJoin(F.broadcast(cb)).select(
            "vec_id", "v", "s", "j", d.alias(out)
        )

    # Encode: per-(vector, subspace) argmin over the broadcast codebook —
    # partial min_by collapses map-side; the only corpus shuffle is the
    # two-level code assembly keyed on vec_id.
    enc = _adc(sub, "d")
    lvl1 = enc.groupBy("vec_id", "s").agg(
        F.min_by("j", F.struct("d", "j")).alias("code"),
        F.first("v").alias("v"),
    )
    codes = lvl1.groupBy("vec_id").agg(
        F.max(F.when(F.col("s") == 0, F.col("code"))).alias("code0"),
        F.max(F.when(F.col("s") == 1, F.col("code"))).alias("code1"),
        F.first("v").alias("v"),
    )
    # ADC tables for the tiny query set (2 x n_centroids rows per query).
    qd = _adc(sub.filter(F.col("vec_id") < 3), "dq").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "s", "j", "dq"
    )
    qd0 = qd.filter(F.col("s") == 0).select(
        "q_id", "qv", F.col("j").alias("j0"), F.col("dq").alias("dq0")
    )
    qd1 = qd.filter(F.col("s") == 1).select(
        F.col("q_id").alias("q_id1"), F.col("j").alias("j1"),
        F.col("dq").alias("dq1"),
    )
    cand = (
        codes.join(F.broadcast(qd0), F.col("code0") == F.col("j0"))
        .join(
            F.broadcast(qd1),
            (F.col("code1") == F.col("j1")) & (F.col("q_id") == F.col("q_id1")),
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id", "v", "qv",
            (F.col("dq0") + F.col("dq1")).alias("approx"),
        )
    )
    w1 = Window.partitionBy("q_id").orderBy("approx", "vec_id")
    cos = dot(F.col("qv"), F.col("v")) / F.nullif(
        F.sqrt(dot(F.col("qv"), F.col("qv"))) * F.sqrt(dot(F.col("v"), F.col("v"))),
        F.lit(0.0),
    )
    short = (
        cand.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= shortlist)
        .select("q_id", "vec_id", "approx", cos.alias("cos"))
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    return (
        short.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select(
            "q_id", "vec_id",
            r6("approx").alias("approx_l2"),
            r6("cos").alias("cosine"),
        )
    )


@register(
    "sim07_pq_recall",
    # Recall@3 of the PQ/ADC path (sim06) against the exact baseline —
    # sim05's audit applied to the memory-compressed index. PQ's recall
    # loss comes from TWO stages (code quantization error in the ADC
    # shortlist, then the shortlist cap), so the audit runs the full
    # composed pipeline, not just the codes. Deterministic integer
    # ratios (ties broken by vec_id on both sides).
    oracle=_PQ_SQL + """
    , pq_topk AS (
      SELECT q_id, vec_id
      FROM (SELECT q_id, vec_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, vec_id) AS rn
            FROM rer)
      WHERE rn <= 3
    ), exact_topk AS (
      SELECT q_id, vec_id FROM (
        SELECT q.vec_id AS q_id, e.vec_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 list_dot_product(q.v, e.v)
                   / NULLIF(sqrt(list_dot_product(q.v, q.v))
                            * sqrt(list_dot_product(e.v, e.v)), 0) DESC,
                 e.vec_id) AS rn
        FROM e q JOIN e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < 3
      ) WHERE rn <= 3
    )
    SELECT x.q_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(a.vec_id) AS BIGINT) AS n_hit,
           (ROUND(count(a.vec_id) * 1.0 / count(*), 6) + 0.0) AS recall_at_3
    FROM exact_topk x
    LEFT JOIN pq_topk a ON a.q_id = x.q_id AND a.vec_id = x.vec_id
    GROUP BY x.q_id
    """,
)
def sim07_pq_recall(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    ann = sim06_pq_ann_topk(spark, sf_dir, k=k).select("q_id", "vec_id")
    emb = _emb(spark, sf_dir).select(
        "vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nv")
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    cos = dot(F.col("qv"), F.col("v")) / F.nullif(
        F.col("nq") * F.col("nv"), F.lit(0.0)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    exact = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id")
    )
    hit = ann.withColumnRenamed("vec_id", "a_vec")
    return (
        exact.join(
            hit,
            (exact["q_id"] == hit["q_id"]) & (exact["vec_id"] == hit["a_vec"]),
            "left",
        )
        .drop(hit["q_id"])
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("a_vec").alias("n_hit"),
            r6(F.count("a_vec") * 1.0 / F.count(F.lit(1))).alias("recall_at_3"),
        )
    )


@register(
    "ml17_calibration_bins",
    # Calibration table + per-bin Brier decomposition for the ml14
    # score: the reliability diagram every classifier eval plots next
    # to AUC. The calibration score is the min-max NORMALIZED raw score
    # (min/max are exact aggregates; the normalization is one
    # correctly-rounded IEEE division, bit-identical on both engines) —
    # deliberately NOT a sigmoid: transcendental libm calls can differ
    # by 1 ulp between engines and flip a bin assignment at a boundary,
    # whereas +,-,*,/ are correctly rounded everywhere. Bin =
    # least(floor(p*10), 9); per bin: count, mean score, positive
    # fraction, mean squared error (Brier term) — the three ratio
    # outputs take the nudged round.
    oracle="""
    WITH s AS (
      SELECT vec_id, v[1] AS score, CAST(label >= 5 AS INTEGER) AS y
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
            FROM embeddings)
    ), mm AS (
      SELECT min(score) AS lo, max(score) AS hi FROM s
    ), p AS (
      SELECT y,
             (score - (SELECT lo FROM mm))
               / NULLIF((SELECT hi FROM mm) - (SELECT lo FROM mm), 0) AS p
      FROM s
    )
    SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           (ROUND(AVG(p) - sign(AVG(p)) * 0.000000001, 6) + 0.0)
             AS mean_score,
           (ROUND(AVG(y * 1.0) - sign(AVG(y * 1.0)) * 0.000000001, 6) + 0.0)
             AS frac_pos,
           (ROUND(AVG((p - y) * (p - y))
                  - sign(AVG((p - y) * (p - y))) * 0.000000001, 6) + 0.0)
             AS brier
    FROM p GROUP BY 1
    """,
)
def ml17_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from equity_volatility_lakehouse_platform_spark.functions.rounding import r6s

    emb = _emb(spark, sf_dir)
    s = emb.select(
        F.get(F.col("v"), 0).alias("score"),
        (F.col("label") >= 5).cast("int").alias("y"),
    )
    mm = s.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    p = s.crossJoin(F.broadcast(mm)).select(
        "y",
        (
            (F.col("score") - F.col("lo"))
            / F.nullif(F.col("hi") - F.col("lo"), F.lit(0.0))
        ).alias("p"),
    )
    return (
        p.groupBy(
            F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("bigint").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            r6s(F.avg("p")).alias("mean_score"),
            r6s(F.avg(F.col("y") * 1.0)).alias("frac_pos"),
            r6s(F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y")))).alias(
                "brier"
            ),
        )
    )
