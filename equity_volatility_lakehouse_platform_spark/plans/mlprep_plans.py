"""ML data-contract queries (SURVEY.md §2.12): splits, encoding, label."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.operators import textops as tx
from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table
from equity_volatility_lakehouse_platform_spark.functions.rounding import r6


@register(
    "ml01_temporal_splits",
    oracle="""
    SELECT split,
           CAST(count_if(o_orderdate <  TIMESTAMP '2000-01-01') AS BIGINT) AS n_train,
           CAST(count_if(o_orderdate >= TIMESTAMP '2000-01-01') AS BIGINT) AS n_test,
           CAST(min(EXTRACT(year FROM o_orderdate)) AS BIGINT)  AS first_year,
           CAST(max(EXTRACT(year FROM o_orderdate)) AS BIGINT)  AS last_year
    FROM (SELECT o_orderdate,
                 CASE WHEN EXTRACT(year FROM o_orderdate) <= 1997 THEN 'early'
                      ELSE 'late' END AS split
          FROM orders)
    GROUP BY split
    """,
)
def ml01_temporal_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Temporal holdout + year-based split accounting (my_model.py:426-513):
    # pure date filters — never random row shuffles (leakage-safe).
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")
    split = F.when(F.year("o_orderdate") <= 1997, "early").otherwise("late")
    return (
        orders.select("o_orderdate", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count_if(F.col("o_orderdate") < cutoff).alias("n_train"),
            F.count_if(F.col("o_orderdate") >= cutoff).alias("n_test"),
            F.min(F.year("o_orderdate")).cast("long").alias("first_year"),
            F.max(F.year("o_orderdate")).cast("long").alias("last_year"),
        )
    )


@register(
    "ml02_onehot_label",
    oracle="""
    SELECT event_id,
           CAST(event_type = 'click'    AS INT) AS type_click,
           CAST(event_type = 'error'    AS INT) AS type_error,
           CAST(event_type = 'purchase' AS INT) AS type_purchase,
           CAST(event_type = 'signup'   AS INT) AS type_signup,
           CAST(event_type = 'view'     AS INT) AS type_view,
           CAST(value >= 150 AS INT)            AS label
    FROM events
    """,
)
def ml02_onehot_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One-hot encoding with an explicit category list + threshold label
    # (my_model.py:50-57) — single map stage, stable schema.
    ev = load_table(spark, sf_dir, "events")
    cats = ["click", "error", "purchase", "signup", "view"]
    return ev.select(
        "event_id",
        *[(F.col("event_type") == c).cast("int").alias(f"type_{c}") for c in cats],
        (F.col("value") >= 150).cast("int").alias("label"),
    )


@register(
    "ml03_rolling_origin_splits",
    oracle="""
    WITH by_month AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS origin,
             CAST(count(*) AS BIGINT) AS n_test
      FROM orders GROUP BY 1
    )
    SELECT origin, n_test,
           CAST(COALESCE(SUM(n_test) OVER (ORDER BY origin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS n_train
    FROM by_month
    """,
)
def ml03_rolling_origin_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rolling-origin evaluation splits (my_model.py:446-482): for every
    # monthly origin, train = all history before it, test = that month.
    # One groupBy + one cumulative window — the split table is tiny (one
    # row per month) regardless of fact scale.
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    by_month = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("origin")
    ).agg(F.count(F.lit(1)).alias("n_test"))
    w = Window.orderBy("origin").rowsBetween(Window.unboundedPreceding, -1)
    return by_month.select(
        "origin",
        "n_test",
        F.coalesce(F.sum("n_test").over(w), F.lit(0)).alias("n_train"),
    )


@register(
    "ml04_median_impute",
    oracle="""
    WITH holey AS (
      SELECT event_id, user_id,
             CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS value
      FROM events
    ), med AS (
      SELECT median(value) AS m FROM holey
    )
    SELECT h.event_id,
           (ROUND(COALESCE(h.value, med.m), 6) + 0.0) AS value_imputed,
           CAST(h.value IS NULL AS INT) AS was_imputed
    FROM holey h CROSS JOIN med
    """,
)
def ml04_median_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Median imputation (my_model.py:63-66). The exact median reduces to a
    # single scalar (one aggregate), broadcast back over the facts — no
    # per-row subquery. A deterministic subset is nulled first so the
    # imputation path is actually exercised.
    ev = load_table(spark, sf_dir, "events")
    holey = ev.select(
        "event_id",
        F.when(F.col("event_id") % 10 == 0, F.lit(None)).otherwise(F.col("value")).alias("value"),
    )
    med = holey.agg(F.median("value").alias("m"))
    return holey.crossJoin(F.broadcast(med)).select(
        "event_id",
        r6(F.coalesce("value", "m")).alias("value_imputed"),
        F.col("value").isNull().cast("int").alias("was_imputed"),
    )


# Per-stratum sampling rates for ml05 (lang -> keep probability), applied
# as integer thresholds on a 32-bit salted-md5 uniform so BOTH engines
# evaluate the identical keep/drop decision per row — reproducible,
# seedable (the salt), and cluster-deterministic (no RNG, no partition
# order dependence), which random sample()/TABLESAMPLE cannot promise.
_ML05_RATES = {"en": 0.5, "de": 0.2, "es": 0.2, "fr": 0.2, "zh": 0.1}
_ML05_SALT = "s1"
_ML05_THRESHOLDS = {k: int(v * 2**32) for k, v in _ML05_RATES.items()}


@register(
    "ml05_stratified_sample",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(sum(doc_id) AS BIGINT) AS doc_id_sum
    FROM (
      SELECT lang, doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{_ML05_SALT}'), 1, 8))
                  AS BIGINT) AS u32
      FROM documents
    )
    WHERE u32 < CASE lang
        {" ".join(f"WHEN '{k}' THEN {t}" for k, t in _ML05_THRESHOLDS.items())}
        ELSE 0 END
    GROUP BY lang
    """,
)
def ml05_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stratified corpus sampling (training-data curation): keep each doc
    # iff its salted-md5 32-bit uniform falls under the stratum's
    # threshold. Map-only (no shuffle for the decision), exactly
    # reproducible across engines/cluster layouts, rerunnable with a new
    # salt for a fresh draw. Summarized per stratum with a doc_id sum so
    # the oracle pins the exact membership, not just the counts.
    docs = load_table(spark, sf_dir, "documents")
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{_ML05_SALT}"))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    threshold = F.create_map(
        *[F.lit(x) for kv in _ML05_THRESHOLDS.items() for x in kv]
    )[F.col("lang")]
    return (
        docs.select("lang", "doc_id", u32.alias("u32"))
        .filter(F.col("u32") < F.coalesce(threshold, F.lit(0)))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("first_doc"),
            F.sum("doc_id").alias("doc_id_sum"),
        )
    )


@register(
    "ml06_feature_hashing",
    # Hashing-trick featurization (the unbounded-vocabulary path a 100 TB
    # text pipeline uses instead of a fitted vocabulary): token ->
    # bucket = md5-u32 % 64, per-(doc, bucket) term frequency plus the
    # signed variant (sign from an independent md5 nibble) that debiases
    # collisions (Weinberger et al., ICML'09). Both engines evaluate the
    # identical salted-md5 arithmetic, so membership is exact -- no
    # engine-specific hash (xxhash/murmur) leaks into the contract.
    oracle=r"""
    WITH ex AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ), h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64 AS bucket,
             CAST(('0x' || substr(md5(tok), 9, 1)) AS BIGINT) % 2 * 2 - 1 AS sgn
      FROM ex
    )
    SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS tf,
           CAST(sum(sgn) AS BIGINT) AS signed_tf
    FROM h GROUP BY doc_id, bucket
    """,
)
def ml06_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explode -> map-side hash -> one groupBy on (doc_id, bucket) with
    # partial aggregation; output is the sparse COO form (doc, bucket, tf)
    # that feeds array assembly or a trainer without ever densifying.
    docs = load_table(spark, sf_dir, "documents")
    tok_md5 = F.md5(F.col("tok"))
    bucket = (
        F.conv(F.substring(tok_md5, 1, 8), 16, 10).cast("bigint") % 64
    ).cast("int")
    sgn = F.conv(F.substring(tok_md5, 9, 1), 16, 10).cast("bigint") % 2 * 2 - 1
    return (
        docs.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .select("doc_id", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"), F.sum("sgn").alias("signed_tf"))
    )
