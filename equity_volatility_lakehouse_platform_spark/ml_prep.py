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


def _standardize(x_tr, x_te):
    """Standardize on TRAIN stats only (leakage-safe, my_model.py:470)."""
    mu = x_tr.mean(axis=0)
    sd = x_tr.std(axis=0)
    sd[sd == 0.0] = 1.0
    return (x_tr - mu) / sd, (x_te - mu) / sd


def _fit_predict(
    x_tr,
    y_tr,
    x_te,
    max_iter: int = 300,
    lr: float = 0.5,
    c: float | None = None,
    class_weight: str | None = None,
    fit_intercept: bool = True,
):
    """Fit one binary logistic classifier, return test probabilities.

    Hyperparameters mirror the reference's optuna space
    (my_model.py:123-133): ``c`` is sklearn's inverse regularization
    strength (None = unpenalized), ``class_weight`` None or
    'balanced', ``fit_intercept``. Uses sklearn when present; otherwise
    a deterministic pure-numpy logistic regression (full-batch gradient
    descent, zero init, L2 penalty lambda = 1/C, balanced weights =
    n / (2 * n_class)) so the path runs in any environment.
    """
    import numpy as np

    try:
        from sklearn.linear_model import LogisticRegression

        clf = LogisticRegression(
            max_iter=max_iter,
            C=(c if c is not None else 1e12),
            class_weight=class_weight,
            fit_intercept=fit_intercept,
        )
        clf.fit(x_tr, y_tr)
        return clf.predict_proba(x_te)[:, 1]
    except ImportError:
        pass
    n = max(len(y_tr), 1)
    wts = np.ones(len(y_tr))
    if class_weight == "balanced":
        n_pos = max(float((y_tr == 1).sum()), 1.0)
        n_neg = max(float((y_tr == 0).sum()), 1.0)
        wts = np.where(y_tr == 1, n / (2.0 * n_pos), n / (2.0 * n_neg))
    lam = (1.0 / c) if c else 0.0
    xb = (
        np.hstack([x_tr, np.ones((len(x_tr), 1))]) if fit_intercept else x_tr
    )
    wgt = np.zeros(xb.shape[1])
    for _ in range(max_iter):
        z = 1.0 / (1.0 + np.exp(-np.clip(xb @ wgt, -30, 30)))
        grad = (xb.T @ (wts * (z - y_tr))) / n
        if lam:
            reg = lam * wgt / n
            if fit_intercept:
                reg[-1] = 0.0  # intercept is never penalized
            grad = grad + reg
        wgt -= lr * grad
    xt = np.hstack([x_te, np.ones((len(x_te), 1))]) if fit_intercept else x_te
    return 1.0 / (1.0 + np.exp(-np.clip(xt @ wgt, -30, 30)))


def _fit_predict_tree(
    x_tr,
    y_tr,
    x_te,
    max_depth: int = 5,
    min_samples_split: int = 2,
    min_samples_leaf: int = 1,
):
    """Deterministic depth-limited CART (gini), the second model family
    of the reference's selection loop (my_model.py:163-178
    get_decision_tree_params). sklearn's DecisionTreeClassifier when
    present; otherwise a pure-numpy greedy splitter: candidate
    thresholds are 15 deterministic quantile cuts per feature, ties
    break to the first (lowest feature, lowest threshold) via strict
    improvement, leaves predict the class-1 fraction. No RNG anywhere —
    rerun-identical by construction."""
    import numpy as np

    try:
        from sklearn.tree import DecisionTreeClassifier

        clf = DecisionTreeClassifier(
            max_depth=max_depth,
            min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf,
            random_state=0,
        )
        clf.fit(x_tr, y_tr)
        return clf.predict_proba(x_te)[:, 1]
    except ImportError:
        pass

    def gini(y):
        if not len(y):
            return 0.0
        p = y.mean()
        return 2.0 * p * (1.0 - p)

    def build(idx, depth):
        y = y_tr[idx]
        p = float(y.mean()) if len(y) else 0.0
        if (
            depth >= max_depth
            or len(idx) < min_samples_split
            or p in (0.0, 1.0)
        ):
            return ("leaf", p)
        best = None
        for f in range(x_tr.shape[1]):
            vals = x_tr[idx, f]
            cuts = np.unique(np.quantile(vals, np.linspace(0, 1, 17)[1:-1]))
            for t in cuts:
                mask = vals <= t
                nl = int(mask.sum())
                nr = len(idx) - nl
                if nl < min_samples_leaf or nr < min_samples_leaf:
                    continue
                score = (
                    nl * gini(y[mask]) + nr * gini(y[~mask])
                ) / len(idx)
                if best is None or score < best[0] - 1e-15:
                    best = (score, f, float(t), idx[mask], idx[~mask])
        if best is None:
            return ("leaf", p)
        _, f, t, left, right = best
        return ("node", f, t, build(left, depth + 1), build(right, depth + 1))

    tree = build(np.arange(len(y_tr)), 0)

    def predict_row(row, node):
        while node[0] == "node":
            _, f, t, lo, hi = node
            node = lo if row[f] <= t else hi
        return node[1]

    return np.array([predict_row(r, tree) for r in x_te])


def _binary_metrics(y_te, p_te, pos: float = 1.0) -> dict:
    """accuracy / precision / recall / f1 (for class ``pos``) + midrank
    ROC-AUC from true labels and scores — no sklearn."""
    import numpy as np

    pred_pos = p_te >= 0.5 if pos == 1.0 else p_te < 0.5
    is_pos = y_te == pos
    tp = float((pred_pos & is_pos).sum())
    fp = float((pred_pos & ~is_pos).sum())
    fn = float((~pred_pos & is_pos).sum())
    acc = float((pred_pos == is_pos).mean()) if len(y_te) else 0.0
    prec = tp / (tp + fp) if (tp + fp) else 0.0
    rec = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    # AUC for the REQUESTED class: when pos != 1 the score ranking is
    # flipped (a low class-1 score ranks class-``pos`` high), so the
    # midrank Mann-Whitney sum runs over -p_te and positives = is_pos.
    # Previously this always scored class 1, silently returning a
    # class-1 AUC inside a class-0 metrics dict.
    auc_scores = p_te if pos == 1.0 else -p_te
    n_pos = int(is_pos.sum())
    n_neg = int((~is_pos).sum())
    if n_pos and n_neg:
        order = np.argsort(auc_scores, kind="mergesort")
        ranks = np.empty(len(auc_scores), dtype=float)
        sorted_p = auc_scores[order]
        i = 0
        while i < len(sorted_p):
            j = i
            while j + 1 < len(sorted_p) and sorted_p[j + 1] == sorted_p[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        auc = (ranks[is_pos].sum() - n_pos * (n_pos + 1) / 2.0) / (
            n_pos * n_neg
        )
    else:
        auc = 0.0
    return {
        "accuracy": acc,
        "precision": prec,
        "recall": rec,
        "f1": f1,
        "roc_auc": float(auc),
    }


def fit_eval(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    split_col: str = "split",
    train_value: str = "train",
    model: str = "logistic_regression",
    max_iter: int = 300,
    lr: float = 0.5,
    c: float | None = None,
    class_weight: str | None = None,
    fit_intercept: bool = True,
    max_depth: int = 5,
    min_samples_split: int = 2,
    min_samples_leaf: int = 1,
) -> DataFrame:
    """Driver-side reference model loop (my_model.py:426-513,596-650):
    fit ONE binary classifier on the train split, score the rest, land
    metrics back as a one-row DataFrame comparable to the ml13/ml14
    metric shapes.

    The engine's job ends at the splits/encoding/imputation contract
    (SURVEY §2.12); fitting is BY DESIGN a ``toPandas()`` handoff — the
    matrix at this point is the small aggregated feature table, not raw
    events. ``model`` selects the family ('logistic_regression' or
    'decision_tree' — the reference trains six sklearn families; the
    two portable ones here cover the linear and the tree-shaped
    decision boundary); the remaining kwargs expose each family's
    search space (my_model.py:123-178) for ``trial_search``.
    """
    pdf = df.select(*feature_cols, label_col, split_col).toPandas()
    train = pdf[pdf[split_col] == train_value]
    test = pdf[pdf[split_col] != train_value]
    x_tr = train[feature_cols].to_numpy(dtype=float)
    y_tr = train[label_col].to_numpy(dtype=float)
    x_te = test[feature_cols].to_numpy(dtype=float)
    y_te = test[label_col].to_numpy(dtype=float)
    if model == "decision_tree":
        # No standardization: splits are invariant to monotonic
        # feature transforms, and raw thresholds read better.
        p_te = _fit_predict_tree(
            x_tr, y_tr, x_te,
            max_depth=max_depth,
            min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf,
        )
    elif model == "logistic_regression":
        x_tr, x_te = _standardize(x_tr, x_te)
        p_te = _fit_predict(
            x_tr, y_tr, x_te,
            max_iter=max_iter, lr=lr, c=c,
            class_weight=class_weight, fit_intercept=fit_intercept,
        )
    else:
        raise ValueError(f"unknown model family {model!r}")
    m = _binary_metrics(y_te, p_te)
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                len(y_tr),
                len(y_te),
                round(m["accuracy"], 6),
                round(m["precision"], 6),
                round(m["recall"], 6),
                round(m["f1"], 6),
                round(m["roc_auc"], 6),
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


def sample_model_params(model: str, rng) -> dict:
    """One seeded draw from a model family's search space, mirroring
    the reference's per-family optuna suggest blocks
    (my_model.py:123-133 logistic, :163-178 decision tree). Only the
    knobs that change the portable model's fitted function are kept
    (solver/penalty/criterion are sklearn-internal)."""
    import math

    if model == "logistic_regression":
        return {
            "c": math.exp(rng.uniform(math.log(0.001), math.log(10.0))),
            "class_weight": rng.choice([None, "balanced"]),
            "fit_intercept": rng.choice([True, False]),
        }
    if model == "decision_tree":
        return {
            "max_depth": rng.randint(1, 12),
            "min_samples_split": rng.randint(2, 50),
            "min_samples_leaf": rng.randint(1, 20),
        }
    raise ValueError(f"unknown model family {model!r}")


def sample_lr_params(seed: int, n_trials: int) -> list[dict]:
    """Seeded logistic-regression trial list (kept as the single-family
    convenience entry; ``trial_search`` drives the general sampler)."""
    import random

    rng = random.Random(seed)
    return [
        {"trial": t, **sample_model_params("logistic_regression", rng)}
        for t in range(n_trials)
    ]


def _fmt_params(params: dict) -> str:
    return ",".join(
        f"{k}={round(v, 6) if isinstance(v, float) else v}"
        for k, v in sorted(params.items())
    )


def trial_search(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    split_col: str = "split",
    models: tuple = ("logistic_regression",),
    n_trials: int = 20,
    seed: int = 7,
    **fit_kwargs,
) -> DataFrame:
    """The reference's hyperparameter-selection loop (my_model.py:
    135-162: one optuna study per model family, random search
    maximizing F1 on the temporal validation split), re-expressed
    without the optuna/MLflow dependencies: per family, ``n_trials``
    seeded samples from the same search space, one ``fit_eval`` per
    trial on the SAME leakage-safe split, all families' metrics landed
    as one DataFrame ordered best-F1-first with the sampled params
    recorded as a canonical string. The engine side is the
    split/encoding algebra; the trial loop is driver-side by design
    (SURVEY §2.12), exactly like the reference's.

    Deterministic end to end: seeded sampler + deterministic fits, so
    rerunning yields the identical table (pinned in pytest)."""
    import random

    rng = random.Random(seed)
    rows = []
    t = 0
    for model in models:
        for _ in range(n_trials):
            params = sample_model_params(model, rng)
            m = fit_eval(
                df, feature_cols, label_col, split_col=split_col,
                model=model, **params, **fit_kwargs,
            ).first()
            rows.append(
                (
                    t,
                    model,
                    _fmt_params(params),
                    m["n_train"],
                    m["n_test"],
                    m["accuracy"],
                    m["precision"],
                    m["recall"],
                    m["f1"],
                    m["roc_auc"],
                )
            )
            t += 1
    spark = df.sparkSession
    out = spark.createDataFrame(
        rows,
        "trial INT, model STRING, params STRING, "
        "n_train BIGINT, n_test BIGINT, accuracy DOUBLE, precision DOUBLE, "
        "recall DOUBLE, f1 DOUBLE, roc_auc DOUBLE",
    )
    return out.orderBy(F.desc("f1"), "trial")


def monthly_metric_table(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    date_col: str,
    split_col: str = "split",
    train_value: str = "train",
    model_name: str = "logistic_regression",
    **fit_kwargs,
) -> DataFrame:
    """The reference's per-(model, year, month) evaluation table
    (my_model.py:596-650 — the shape its MLflow registry stores): fit
    once on the train split, score EVERY row, then emit one metrics row
    per calendar month with the reference's exact columns — overall
    precision/recall/F1 (positive class), ROC-AUC, and the per-class
    precision_0/recall_0/f1_0 / precision_1/recall_1/f1_1 breakdown,
    sorted by (model_name, year, month)."""
    pdf = df.select(*feature_cols, label_col, split_col, date_col).toPandas()
    train = pdf[pdf[split_col] == train_value]
    x_tr = train[feature_cols].to_numpy(dtype=float)
    y_tr = train[label_col].to_numpy(dtype=float)
    x_all = pdf[feature_cols].to_numpy(dtype=float)
    if model_name == "decision_tree":
        p_all = _fit_predict_tree(x_tr, y_tr, x_all, **fit_kwargs)
    else:
        x_tr, x_all = _standardize(x_tr, x_all)
        p_all = _fit_predict(x_tr, y_tr, x_all, **fit_kwargs)
    pdf = pdf.assign(_p=p_all)

    import pandas as pd

    dt = pd.to_datetime(pdf[date_col])
    pdf = pdf.assign(_year=dt.dt.year, _month=dt.dt.month)
    rows = []
    for (y, mo), g in pdf.groupby(["_year", "_month"], sort=True):
        y_true = g[label_col].to_numpy(dtype=float)
        p = g["_p"].to_numpy(dtype=float)
        m1 = _binary_metrics(y_true, p, pos=1.0)
        m0 = _binary_metrics(y_true, p, pos=0.0)
        rows.append(
            (
                model_name, int(y), int(mo),
                round(m1["precision"], 6), round(m1["recall"], 6),
                round(m1["f1"], 6), round(m1["roc_auc"], 6),
                round(m0["precision"], 6), round(m0["recall"], 6),
                round(m0["f1"], 6),
                round(m1["precision"], 6), round(m1["recall"], 6),
                round(m1["f1"], 6),
            )
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        rows,
        "model_name STRING, year INT, month INT, "
        "precision_overall DOUBLE, recall_overall DOUBLE, "
        "f1_overall DOUBLE, roc_auc DOUBLE, "
        "precision_0 DOUBLE, recall_0 DOUBLE, f1_0 DOUBLE, "
        "precision_1 DOUBLE, recall_1 DOUBLE, f1_1 DOUBLE",
    ).orderBy("model_name", "year", "month")
