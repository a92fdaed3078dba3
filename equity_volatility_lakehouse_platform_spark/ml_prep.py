"""ML data-contract layer (SURVEY.md §2.12) — engine-side DataFrame ops.

The reference's model layer (data_apis/my_model.py) is sklearn on the
driver; what belongs to the ENGINE is the data contract: label
construction, one-hot encoding, median imputation, warm-up trim, and the
three split families (temporal holdout, rolling origin, per-year). Model
fitting stays a ``toPandas()`` handoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_market_path(df: DataFrame, threshold: float = 0.06) -> DataFrame:
    """my_model.py:50: market_path_flag = market_absolute_path >= 0.06."""
    return df.withColumn(
        "market_path_flag", (F.col("market_absolute_path") >= threshold).cast("int")
    )


def one_hot(df: DataFrame, col: str, values: list[str]) -> DataFrame:
    """Explicit one-hot columns (my_model.py:53-57 pd.get_dummies). Explicit
    category list keeps the plan single-pass and the schema stable."""
    for v in values:
        safe = v.lower().replace(" ", "_").replace("-", "_")
        df = df.withColumn(f"{col}_{safe}", (F.col(col) == v).cast("int"))
    return df.drop(col)


def impute_median(df: DataFrame, cols: list[str]) -> DataFrame:
    """Median imputation (my_model.py:63-66). Medians computed in one
    aggregate pass, then broadcast into coalesce."""
    meds = df.agg(*[F.median(c).alias(c) for c in cols]).first()
    return df.select(
        *[
            F.coalesce(F.col(c), F.lit(meds[c])).alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )


def trim_warmup(df: DataFrame, key: str, order_col: str, n: int = 20) -> DataFrame:
    """Drop each key's first n rows (my_model.py:59-61 cumcount>=n)."""
    w = Window.partitionBy(key).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") > n).drop("_rn")
    )


def temporal_holdout(
    df: DataFrame, date_col: str, cutoff: str
) -> tuple[DataFrame, DataFrame]:
    """Last-N-months holdout (my_model.py:426-444): train < cutoff <= test."""
    c = F.lit(cutoff).cast(dict(df.dtypes)[date_col])
    return df.filter(F.col(date_col) < c), df.filter(F.col(date_col) >= c)


def rolling_origin_splits(
    df: DataFrame, date_col: str, cutoffs: list[str]
) -> list[tuple[DataFrame, DataFrame]]:
    """Rolling-origin evaluation splits (my_model.py:446-482): one
    (train, test) pair per cutoff, train strictly before."""
    return [temporal_holdout(df, date_col, c) for c in cutoffs]


def year_splits(df: DataFrame, date_col: str) -> DataFrame:
    """Year-tagged frame for per-year evaluation loops (my_model.py:484-513)."""
    return df.withColumn("split_year", F.year(date_col))


def fit_eval(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    split_col: str = "split",
    train_value: str = "train",
    max_iter: int = 300,
    lr: float = 0.5,
) -> DataFrame:
    """Driver-side reference model loop (my_model.py:426-513,596-650):
    fit ONE binary classifier on the train split, score the rest, land
    metrics back as a one-row DataFrame comparable to the ml13/ml14
    metric shapes.

    The engine's job ends at the splits/encoding/imputation contract
    (SURVEY §2.12); fitting is BY DESIGN a ``toPandas()`` handoff — the
    matrix at this point is the small aggregated feature table, not raw
    events. Uses sklearn's LogisticRegression when the library is
    present; otherwise a deterministic pure-numpy logistic regression
    (standardized features, full-batch gradient descent, fixed seed-free
    init) so the end-to-end tester path runs in any environment.
    """
    import numpy as np

    pdf = df.select(*feature_cols, label_col, split_col).toPandas()
    train = pdf[pdf[split_col] == train_value]
    test = pdf[pdf[split_col] != train_value]
    x_tr = train[feature_cols].to_numpy(dtype=float)
    y_tr = train[label_col].to_numpy(dtype=float)
    x_te = test[feature_cols].to_numpy(dtype=float)
    y_te = test[label_col].to_numpy(dtype=float)

    # Standardize on TRAIN stats only (leakage-safe, my_model.py:470).
    mu = x_tr.mean(axis=0)
    sd = x_tr.std(axis=0)
    sd[sd == 0.0] = 1.0
    x_tr = (x_tr - mu) / sd
    x_te = (x_te - mu) / sd

    try:
        from sklearn.linear_model import LogisticRegression

        clf = LogisticRegression(max_iter=max_iter)
        clf.fit(x_tr, y_tr)
        p_te = clf.predict_proba(x_te)[:, 1]
    except ImportError:
        # Full-batch GD on the standardized design matrix: deterministic
        # (zero init, fixed steps), good enough for the reference loop's
        # linear baseline.
        xb = np.hstack([x_tr, np.ones((len(x_tr), 1))])
        wgt = np.zeros(xb.shape[1])
        for _ in range(max_iter):
            z = 1.0 / (1.0 + np.exp(-np.clip(xb @ wgt, -30, 30)))
            wgt -= lr * (xb.T @ (z - y_tr)) / max(len(y_tr), 1)
        xt = np.hstack([x_te, np.ones((len(x_te), 1))])
        p_te = 1.0 / (1.0 + np.exp(-np.clip(xt @ wgt, -30, 30)))

    pred = (p_te >= 0.5).astype(float)
    tp = float(((pred == 1) & (y_te == 1)).sum())
    fp = float(((pred == 1) & (y_te == 0)).sum())
    fn = float(((pred == 0) & (y_te == 1)).sum())
    acc = float((pred == y_te).mean()) if len(y_te) else 0.0
    prec = tp / (tp + fp) if (tp + fp) else 0.0
    rec = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    # ROC-AUC via the rank statistic (ties get midranks) — no sklearn.
    n_pos = int((y_te == 1).sum())
    n_neg = int((y_te == 0).sum())
    if n_pos and n_neg:
        order = np.argsort(p_te, kind="mergesort")
        ranks = np.empty(len(p_te), dtype=float)
        sorted_p = p_te[order]
        i = 0
        while i < len(sorted_p):
            j = i
            while j + 1 < len(sorted_p) and sorted_p[j + 1] == sorted_p[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        auc = (ranks[y_te == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (
            n_pos * n_neg
        )
    else:
        auc = 0.0

    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                len(y_tr),
                len(y_te),
                round(acc, 6),
                round(prec, 6),
                round(rec, 6),
                round(f1, 6),
                round(float(auc), 6),
            )
        ],
        "n_train BIGINT, n_test BIGINT, accuracy DOUBLE, precision DOUBLE, "
        "recall DOUBLE, f1 DOUBLE, roc_auc DOUBLE",
    )


def rolling_fit_eval(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    date_col: str,
    cutoffs: list[str],
    **fit_kwargs,
) -> DataFrame:
    """The reference's rolling evaluation loop (my_model.py:596-650):
    one ``fit_eval`` per rolling-origin cutoff — train strictly before
    the cutoff, score everything at/after it — metrics unioned into one
    DataFrame with the cutoff attached. Fitting stays driver-side by
    design; the engine side is the leakage-safe split algebra
    (``rolling_origin_splits``) and the metric landing schema."""
    out = None
    for cutoff, (train, test) in zip(
        cutoffs, rolling_origin_splits(df, date_col, cutoffs)
    ):
        tagged = train.withColumn("split", F.lit("train")).unionByName(
            test.withColumn("split", F.lit("test"))
        )
        m = fit_eval(
            tagged, feature_cols, label_col, **fit_kwargs
        ).select(F.lit(cutoff).alias("cutoff"), "*")
        out = m if out is None else out.unionByName(m)
    return out
