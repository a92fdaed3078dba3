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
    wgt = _logistic_fit_np(
        x_tr, y_tr, max_iter=max_iter, lr=lr, c=c,
        class_weight=class_weight, fit_intercept=fit_intercept,
    )
    return _logistic_predict_np(wgt, fit_intercept, x_te)


def _logistic_fit_np(
    x_tr, y_tr, max_iter=300, lr=0.5, c=None, class_weight=None,
    fit_intercept=True,
):
    """Numpy logistic fit (extracted round 10 for the export registry):
    full-batch gradient descent, zero init, L2 lambda = 1/C, balanced
    weights = n / (2 * n_class). Returns the weight vector (intercept
    last when fit_intercept)."""
    import numpy as np

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
    return wgt


def _logistic_predict_np(wgt, fit_intercept, x):
    import numpy as np

    wgt = np.asarray(wgt, dtype=float)
    xt = np.hstack([x, np.ones((len(x), 1))]) if fit_intercept else x
    return 1.0 / (1.0 + np.exp(-np.clip(xt @ wgt, -30, 30)))


def _cart_build(
    x_tr,
    y_tr,
    max_depth: int = 5,
    min_samples_split: int = 2,
    min_samples_leaf: int = 1,
):
    """Pure-numpy greedy CART builder (extracted round 10 so the forest
    and the export registry reuse the identical splitter): candidate
    thresholds are 15 deterministic quantile cuts per feature, ties
    break to the first (lowest feature, lowest threshold) via strict
    improvement, leaves predict the class-1 fraction. No RNG anywhere —
    rerun-identical by construction. Nodes are JSON-serializable lists:
    ["leaf", p] / ["node", feature, threshold, left, right]."""
    import numpy as np

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
            return ["leaf", p]
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
            return ["leaf", p]
        _, f, t, left, right = best
        return ["node", f, t, build(left, depth + 1), build(right, depth + 1)]

    return build(np.arange(len(y_tr)), 0)


def _cart_predict(tree, x_te):
    import numpy as np

    def predict_row(row, node):
        while node[0] == "node":
            _, f, t, lo, hi = node
            node = lo if row[f] <= t else hi
        return node[1]

    return np.array([predict_row(r, tree) for r in x_te])


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
    present; otherwise the pure-numpy ``_cart_build`` splitter."""
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
    tree = _cart_build(
        x_tr, y_tr,
        max_depth=max_depth,
        min_samples_split=min_samples_split,
        min_samples_leaf=min_samples_leaf,
    )
    return _cart_predict(tree, x_te)


def _n_feats(p: int, max_features) -> int:
    """sklearn's max_features resolution: 'sqrt' / 'log2' / None."""
    import math

    if max_features == "sqrt":
        return max(1, math.isqrt(p))
    if max_features == "log2":
        return max(1, int(math.log2(p))) if p > 1 else 1
    return p


def _forest_fit_np(
    x_tr,
    y_tr,
    n_estimators: int = 50,
    max_depth: int = 8,
    min_samples_split: int = 2,
    min_samples_leaf: int = 1,
    max_features="sqrt",
    seed: int = 0,
):
    """Pure-numpy random forest (my_model.py:261-307
    get_random_forest_params): bagging of the deterministic CART over
    seeded bootstrap samples + per-tree feature subsets. All randomness
    flows from one RandomState(seed) — rerun-identical. Returns a
    JSON-serializable {trees, feats} pair."""
    import numpy as np

    rs = np.random.RandomState(seed)
    n, p = x_tr.shape
    k = _n_feats(p, max_features)
    trees, feats = [], []
    for _ in range(n_estimators):
        idx = rs.randint(0, n, n)
        fsub = np.sort(rs.choice(p, k, replace=False))
        trees.append(
            _cart_build(
                x_tr[idx][:, fsub], y_tr[idx],
                max_depth=max_depth,
                min_samples_split=min_samples_split,
                min_samples_leaf=min_samples_leaf,
            )
        )
        feats.append([int(f) for f in fsub])
    return {"trees": trees, "feats": feats}


def _forest_predict_np(fitted: dict, x):
    import numpy as np

    acc = np.zeros(len(x))
    for tree, fsub in zip(fitted["trees"], fitted["feats"]):
        acc += _cart_predict(tree, x[:, fsub])
    return acc / max(len(fitted["trees"]), 1)


def _boost_tree_build(
    x, g, h, max_depth, min_samples_split, min_samples_leaf,
    reg_lambda, reg_alpha, gamma, min_child_weight, feat_idx,
):
    """One regression tree on (gradient, hessian) — the shared kernel
    for gradient_boosting (first-order leaf = Newton step with lambda=0)
    and xgboost (regularized Newton: split gain with gamma penalty,
    min_child_weight on child hessian mass, L1 soft-threshold on leaf
    numerators). Same deterministic 15-quantile-cut candidate set and
    first-wins tie-break as the CART splitter."""
    import numpy as np

    def leaf(gi, hi):
        gs = float(gi.sum())
        gs = np.sign(gs) * max(abs(gs) - reg_alpha, 0.0)
        return ["leaf", float(-gs / (hi.sum() + reg_lambda))]

    def gain_term(gi, hi):
        gs = float(gi.sum())
        gs = np.sign(gs) * max(abs(gs) - reg_alpha, 0.0)
        return gs * gs / (float(hi.sum()) + reg_lambda)

    def build(idx, depth):
        gi, hi = g[idx], h[idx]
        if depth >= max_depth or len(idx) < min_samples_split:
            return leaf(gi, hi)
        parent = gain_term(gi, hi)
        best = None
        for f in feat_idx:
            vals = x[idx, f]
            cuts = np.unique(np.quantile(vals, np.linspace(0, 1, 17)[1:-1]))
            for t in cuts:
                mask = vals <= t
                nl = int(mask.sum())
                nr = len(idx) - nl
                if nl < min_samples_leaf or nr < min_samples_leaf:
                    continue
                if (
                    float(hi[mask].sum()) < min_child_weight
                    or float(hi[~mask].sum()) < min_child_weight
                ):
                    continue
                gain = (
                    0.5
                    * (
                        gain_term(gi[mask], hi[mask])
                        + gain_term(gi[~mask], hi[~mask])
                        - parent
                    )
                    - gamma
                )
                if gain > 1e-12 and (best is None or gain > best[0] + 1e-15):
                    best = (gain, f, float(t), idx[mask], idx[~mask])
        if best is None:
            return leaf(gi, hi)
        _, f, t, left, right = best
        return ["node", f, t, build(left, depth + 1), build(right, depth + 1)]

    return build(np.arange(len(g)), 0)


def _boost_fit_np(
    x_tr,
    y_tr,
    n_estimators: int = 50,
    learning_rate: float = 0.1,
    max_depth: int = 3,
    min_samples_split: int = 2,
    min_samples_leaf: int = 1,
    subsample: float = 1.0,
    colsample_bytree: float = 1.0,
    reg_lambda: float = 0.0,
    reg_alpha: float = 0.0,
    gamma: float = 0.0,
    min_child_weight: float = 0.0,
    seed: int = 0,
):
    """Pure-numpy Newton boosting on logistic loss — ONE engine for the
    reference's two boosted families: gradient_boosting
    (my_model.py:211-250; lambda = alpha = gamma = min_child_weight = 0
    collapses the leaf to the classic Newton step sum(residual) /
    sum(p(1-p))) and xgboost (my_model.py:309-356; the regularized
    split-gain / leaf formulas are XGBoost's eq. 6-7). Seeded row
    (subsample) and per-tree column (colsample_bytree) sampling —
    rerun-identical. Returns JSON-serializable {f0, lr, trees}."""
    import math

    import numpy as np

    rs = np.random.RandomState(seed)
    n, p = x_tr.shape
    prior = min(max(float(y_tr.mean()) if n else 0.5, 1e-6), 1.0 - 1e-6)
    f0 = math.log(prior / (1.0 - prior))
    fx = np.full(n, f0)
    trees = []
    n_rows = max(1, int(round(subsample * n)))
    n_cols = max(1, int(round(colsample_bytree * p)))
    for _ in range(n_estimators):
        pr = 1.0 / (1.0 + np.exp(-np.clip(fx, -30, 30)))
        grad = pr - y_tr
        hess = np.maximum(pr * (1.0 - pr), 1e-12)
        rows = (
            np.sort(rs.choice(n, n_rows, replace=False))
            if n_rows < n
            else np.arange(n)
        )
        cols = (
            np.sort(rs.choice(p, n_cols, replace=False))
            if n_cols < p
            else np.arange(p)
        )
        tree = _boost_tree_build(
            x_tr[rows], grad[rows], hess[rows],
            max_depth, min_samples_split, min_samples_leaf,
            reg_lambda, reg_alpha, gamma, min_child_weight,
            np.arange(len(cols)),
        )
        # Remap the subsampled feature indices back to global columns.
        tree = _remap_tree_features(tree, [int(c) for c in cols])
        trees.append(tree)
        fx = fx + learning_rate * _cart_predict(tree, x_tr)
    return {"f0": f0, "lr": learning_rate, "trees": trees}


def _remap_tree_features(node, cols):
    if node[0] == "leaf":
        return node
    _, f, t, lo, hi = node
    return [
        "node", cols[f], t,
        _remap_tree_features(lo, cols), _remap_tree_features(hi, cols),
    ]


def _boost_predict_np(fitted: dict, x):
    import numpy as np

    fx = np.full(len(x), fitted["f0"])
    for tree in fitted["trees"]:
        fx = fx + fitted["lr"] * _cart_predict(tree, x)
    return 1.0 / (1.0 + np.exp(-np.clip(fx, -30, 30)))


def _dummy_fit_np(y_tr, strategy: str = "most_frequent", seed: int = 0):
    """DummyClassifier floor (my_model.py:371-414): the no-information
    baseline the reference's evaluation protocol grades every family
    against. Fitted state is just the train class prior."""
    import numpy as np

    n = max(len(y_tr), 1)
    p1 = float((np.asarray(y_tr) == 1).sum()) / n
    return {"strategy": strategy, "p1": p1, "seed": seed}


def _dummy_predict_np(fitted: dict, x):
    import numpy as np

    n = len(x)
    strategy = fitted["strategy"]
    if strategy == "most_frequent":
        # sklearn ties break to the smaller class label (0).
        return np.full(n, 1.0 if fitted["p1"] > 0.5 else 0.0)
    rs = np.random.RandomState(fitted["seed"])
    if strategy == "stratified":
        return (rs.uniform(size=n) < fitted["p1"]).astype(float)
    if strategy == "uniform":
        return rs.randint(0, 2, n).astype(float)
    raise ValueError(f"unknown dummy strategy {strategy!r}")


def _fit_predict_forest(x_tr, y_tr, x_te, seed: int = 0, **params):
    try:
        from sklearn.ensemble import RandomForestClassifier

        clf = RandomForestClassifier(random_state=seed, **params)
        clf.fit(x_tr, y_tr)
        return clf.predict_proba(x_te)[:, 1]
    except ImportError:
        pass
    return _forest_predict_np(
        _forest_fit_np(x_tr, y_tr, seed=seed, **params), x_te
    )


def _fit_predict_boost(x_tr, y_tr, x_te, seed: int = 0, **params):
    return _boost_predict_np(
        _boost_fit_np(x_tr, y_tr, seed=seed, **params), x_te
    )


def _fit_predict_dummy(y_tr, x_te, strategy="most_frequent", seed: int = 0):
    return _dummy_predict_np(
        _dummy_fit_np(y_tr, strategy=strategy, seed=seed), x_te
    )


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


def _reject_unconsumed_params(model: str, params: dict) -> None:
    """logistic_regression and decision_tree take ONLY named kwargs —
    their branches never forward ``**params``, so a mistyped or
    misrouted hyperparameter (``n_estimators`` passed to logistic)
    would be silently dropped instead of erroring. Fail loud."""
    if model in ("logistic_regression", "decision_tree") and params:
        raise ValueError(
            f"{model} does not consume extra params "
            f"{sorted(params)}; its search space is the named kwargs only"
        )


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
    seed: int = 0,
    **params,
) -> DataFrame:
    """Driver-side reference model loop (my_model.py:426-513,596-650):
    fit ONE binary classifier on the train split, score the rest, land
    metrics back as a one-row DataFrame comparable to the ml13/ml14
    metric shapes.

    The engine's job ends at the splits/encoding/imputation contract
    (SURVEY §2.12); fitting is BY DESIGN a ``toPandas()`` handoff — the
    matrix at this point is the small aggregated feature table, not raw
    events. ``model`` selects the family — all SIX of the reference's
    selection-loop families (my_model.py:123-414): logistic_regression,
    decision_tree, random_forest, gradient_boosting, xgboost, and the
    dummy no-information floor its evaluation protocol grades against.
    The remaining kwargs (+ ``**params``) expose each family's search
    space for ``trial_search``; ``seed`` pins every stochastic family.
    """
    _reject_unconsumed_params(model, params)
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
    elif model == "random_forest":
        p_te = _fit_predict_forest(
            x_tr, y_tr, x_te, seed=seed,
            max_depth=max_depth,
            min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf,
            **params,
        )
    elif model in ("gradient_boosting", "xgboost"):
        # One Newton-boosting engine: xgboost draws the regularization
        # knobs (reg_lambda/alpha/gamma/min_child_weight/colsample) in
        # its sampled params; plain gradient_boosting leaves them 0.
        p_te = _fit_predict_boost(
            x_tr, y_tr, x_te, seed=seed,
            max_depth=max_depth,
            min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf,
            **params,
        )
    elif model == "dummy":
        p_te = _fit_predict_dummy(y_tr, x_te, seed=seed, **params)
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
    # Ensemble sizes: the reference samples n_estimators in 50..800
    # (sklearn-C speed); the portable numpy ensembles keep the same
    # decision-boundary family at 20..80 trees so a full trial loop
    # stays driver-tractable. Every other knob mirrors the reference
    # range exactly (my_model.py:211-356).
    if model == "random_forest":
        return {
            "n_estimators": rng.randint(20, 80),
            "max_depth": rng.randint(3, 40),
            "min_samples_split": rng.randint(2, 50),
            "min_samples_leaf": rng.randint(1, 20),
            "max_features": rng.choice(["sqrt", "log2", None]),
        }
    if model == "gradient_boosting":
        return {
            "n_estimators": rng.randint(20, 80),
            "learning_rate": rng.uniform(0.01, 0.3),
            "max_depth": rng.randint(1, 8),
            "min_samples_split": rng.randint(2, 50),
            "min_samples_leaf": rng.randint(1, 20),
            "subsample": rng.uniform(0.5, 1.0),
        }
    if model == "xgboost":
        return {
            "n_estimators": rng.randint(20, 80),
            "learning_rate": rng.uniform(0.01, 0.3),
            "max_depth": rng.randint(1, 10),
            "min_child_weight": rng.uniform(1.0, 10.0),
            "gamma": rng.uniform(0.0, 5.0),
            "subsample": rng.uniform(0.5, 1.0),
            "colsample_bytree": rng.uniform(0.5, 1.0),
            "reg_alpha": rng.uniform(0.0, 1.0),
            "reg_lambda": rng.uniform(0.0, 2.0),
        }
    if model == "dummy":
        return {
            "strategy": rng.choice(
                ["most_frequent", "stratified", "uniform"]
            ),
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
    fitted: dict | None = None,
    **fit_kwargs,
) -> DataFrame:
    """The reference's per-(model, year, month) evaluation table
    (my_model.py:596-650 — the shape its MLflow registry stores): fit
    once on the train split, score EVERY row, then emit one metrics row
    per calendar month with the reference's exact columns — overall
    precision/recall/F1 (positive class), ROC-AUC, and the per-class
    precision_0/recall_0/f1_0 / precision_1/recall_1/f1_1 breakdown,
    sorted by (model_name, year, month).

    Pass ``fitted`` (a ``fit_model`` artifact, possibly reloaded via
    ``load_model``) to SKIP fitting and score with the registered
    model — the 'evaluate a registered model months later' round trip;
    the table is then bit-identical to the one produced at fit time."""
    pdf = df.select(*feature_cols, label_col, split_col, date_col).toPandas()
    train = pdf[pdf[split_col] == train_value]
    x_tr = train[feature_cols].to_numpy(dtype=float)
    y_tr = train[label_col].to_numpy(dtype=float)
    x_all = pdf[feature_cols].to_numpy(dtype=float)
    if fitted is not None:
        model_name = fitted["model"]
        p_all = predict_scores(fitted, x_all)
    elif model_name == "decision_tree":
        p_all = _fit_predict_tree(x_tr, y_tr, x_all, **fit_kwargs)
    elif model_name == "random_forest":
        p_all = _fit_predict_forest(x_tr, y_tr, x_all, **fit_kwargs)
    elif model_name in ("gradient_boosting", "xgboost"):
        p_all = _fit_predict_boost(x_tr, y_tr, x_all, **fit_kwargs)
    elif model_name == "dummy":
        p_all = _fit_predict_dummy(y_tr, x_all, **fit_kwargs)
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


# ------------------------------------------------------------------------
# Model export / registry (round 10) — the reference's MLflow save ->
# reload -> re-evaluate workflow (my_model.py:515-650,747-925) without
# the MLflow dependency: a fitted model is a small JSON document
# (coefficients / trees / priors + the train-split standardization
# stats), persisted as a versioned row in an AcidTable so the registry
# inherits the lakehouse's atomicity, history, and time travel.
# fit_model ALWAYS uses the portable numpy implementations — the
# artifact must reproduce bit-exactly in any environment, with or
# without sklearn installed.
# ------------------------------------------------------------------------


def fit_model(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    split_col: str = "split",
    train_value: str = "train",
    model: str = "logistic_regression",
    seed: int = 0,
    max_iter: int = 300,
    lr: float = 0.5,
    c: float | None = None,
    class_weight: str | None = None,
    fit_intercept: bool = True,
    max_depth: int = 5,
    min_samples_split: int = 2,
    min_samples_leaf: int = 1,
    **params,
) -> dict:
    """Fit one classifier on the train split and return it as a
    JSON-serializable dict: {model, feature_cols, standardize, fitted}.
    The standardization stats (logistic only, train-split statistics —
    leakage-safe) travel WITH the model so a reload scores new data
    identically to fit time."""
    _reject_unconsumed_params(model, params)
    pdf = df.select(*feature_cols, label_col, split_col).toPandas()
    train = pdf[pdf[split_col] == train_value]
    x_tr = train[feature_cols].to_numpy(dtype=float)
    y_tr = train[label_col].to_numpy(dtype=float)
    standardize = None
    if model == "logistic_regression":
        mu = x_tr.mean(axis=0)
        sd = x_tr.std(axis=0)
        sd[sd == 0.0] = 1.0
        standardize = {
            "mu": [float(v) for v in mu], "sd": [float(v) for v in sd],
        }
        w = _logistic_fit_np(
            (x_tr - mu) / sd, y_tr, max_iter=max_iter, lr=lr, c=c,
            class_weight=class_weight, fit_intercept=fit_intercept,
        )
        fitted = {
            "w": [float(v) for v in w],
            "fit_intercept": bool(fit_intercept),
        }
    elif model == "decision_tree":
        fitted = {
            "tree": _cart_build(
                x_tr, y_tr, max_depth=max_depth,
                min_samples_split=min_samples_split,
                min_samples_leaf=min_samples_leaf,
            )
        }
    elif model == "random_forest":
        fitted = _forest_fit_np(
            x_tr, y_tr, seed=seed, max_depth=max_depth,
            min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf, **params,
        )
    elif model in ("gradient_boosting", "xgboost"):
        fitted = _boost_fit_np(
            x_tr, y_tr, seed=seed, max_depth=max_depth,
            min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf, **params,
        )
    elif model == "dummy":
        fitted = _dummy_fit_np(y_tr, seed=seed, **params)
    else:
        raise ValueError(f"unknown model family {model!r}")
    return {
        "model": model,
        "feature_cols": list(feature_cols),
        "standardize": standardize,
        "fitted": fitted,
    }


def predict_scores(m: dict, x) -> "object":
    """Score a feature matrix with a ``fit_model`` artifact (possibly
    reloaded from the registry). Applies the stored standardization,
    then the family's portable predictor."""
    import numpy as np

    x = np.asarray(x, dtype=float)
    st = m.get("standardize")
    if st is not None:
        x = (x - np.asarray(st["mu"])) / np.asarray(st["sd"])
    fam = m["model"]
    f = m["fitted"]
    if fam == "logistic_regression":
        return _logistic_predict_np(f["w"], f["fit_intercept"], x)
    if fam == "decision_tree":
        return _cart_predict(f["tree"], x)
    if fam == "random_forest":
        return _forest_predict_np(f, x)
    if fam in ("gradient_boosting", "xgboost"):
        return _boost_predict_np(f, x)
    if fam == "dummy":
        return _dummy_predict_np(f, x)
    raise ValueError(f"unknown model family {fam!r}")


def save_model(
    spark, registry_root: str, name: str, m: dict, max_retries: int = 10
) -> int:
    """Register a fitted model: one atomic AcidTable commit carrying
    (name, family, model_version, model_json). model_version is
    per-name monotonic (1 + the registered count), the MLflow version
    counter analogue; the ACID commit log supplies history/time-travel
    on top. Returns the new model_version.

    The version is derived INSIDE the commit loop
    (AcidTable.append_with_recompute): on a lost commit race the count
    re-runs against the winner's snapshot, so two concurrent
    registrations of the same name get DISTINCT versions — a read-side
    count taken before the append would hand both writers the same one.
    """
    import json

    from equity_volatility_lakehouse_platform_spark.sources.acid import AcidTable

    t = AcidTable(spark, registry_root)
    committed = {}

    def _build(snap):
        existing = (
            0 if snap is None
            else snap.filter(F.col("name") == name).count()
        )
        committed["version"] = existing + 1
        return spark.createDataFrame(
            [(name, m["model"], existing + 1, json.dumps(m, sort_keys=True))],
            "name STRING, family STRING, model_version INT, model_json STRING",
        )

    t.append_with_recompute(_build, max_retries=max_retries)
    return committed["version"]


def load_model(
    spark, registry_root: str, name: str, model_version: int | None = None
) -> dict:
    """Reload a registered model (latest version by default) — the
    'evaluate a registered model months later' half of the reference's
    registry round trip (my_model.py:747-925)."""
    import json

    from equity_volatility_lakehouse_platform_spark.sources.acid import AcidTable

    t = AcidTable(spark, registry_root)
    if t.latest_version() is None:
        raise KeyError(f"model registry at {registry_root!r} is empty")
    df = t.read().filter(F.col("name") == name)
    if model_version is not None:
        df = df.filter(F.col("model_version") == model_version)
    row = df.orderBy(F.desc("model_version")).first()
    if row is None:
        raise KeyError(
            f"model {name!r} (version {model_version}) not in registry"
        )
    return json.loads(row["model_json"])


def permutation_importance(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    fitted: dict,
    split_col: str = "split",
    train_value: str = "train",
    metric: str = "roc_auc",
    n_repeats: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Model-agnostic feature importance (round 10) — the portable
    analogue of the reference's ``feature_importances_`` table
    (my_model.py:85-112): permute one feature at a time in the held-out
    split (seeded, ``n_repeats`` independent permutations) and record
    the metric drop vs the unpermuted baseline. Works with ANY
    ``fit_model``/``load_model`` artifact, so the registry round trip
    extends to the importance report. Returned sorted by importance
    descending (the reference's presentation order)."""
    import numpy as np

    pdf = df.select(*feature_cols, label_col, split_col).toPandas()
    test = pdf[pdf[split_col] != train_value]
    x_te = test[feature_cols].to_numpy(dtype=float)
    y_te = test[label_col].to_numpy(dtype=float)
    base = _binary_metrics(y_te, predict_scores(fitted, x_te))[metric]
    rs = np.random.RandomState(seed)
    rows = []
    for j, feat in enumerate(feature_cols):
        drops = []
        for _ in range(n_repeats):
            xp = x_te.copy()
            xp[:, j] = xp[rs.permutation(len(xp)), j]
            m = _binary_metrics(y_te, predict_scores(fitted, xp))[metric]
            drops.append(base - m)
        rows.append((feat, round(base, 6), round(sum(drops) / n_repeats, 6)))
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, "feature STRING, base_metric DOUBLE, importance DOUBLE"
    ).orderBy(F.desc("importance"), "feature")


def sequential_feature_selection(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    direction: str = "forward",
    k_features: int | None = None,
    split_col: str = "split",
    model: str = "logistic_regression",
    **fit_kwargs,
) -> list[str]:
    """Greedy forward/backward feature selection maximizing F1 on the
    validation split — the reference's pipeline_forward /
    pipeline_back SequentialFeatureSelector stage
    (my_model.py:92-112), re-expressed with the engine's leakage-safe
    split + the portable model zoo. Deterministic: candidates are
    scanned in ``feature_cols`` order and ties keep the incumbent
    (strict improvement), so reruns select the identical subset."""
    if direction not in ("forward", "backward"):
        raise ValueError("direction must be 'forward' or 'backward'")
    if k_features is None:
        k_features = max(1, len(feature_cols) // 2)

    def score(cols: list[str]) -> float:
        m = fit_eval(
            df, cols, label_col, split_col=split_col, model=model,
            **fit_kwargs,
        ).first()
        return m["f1"]

    if direction == "forward":
        selected: list[str] = []
        while len(selected) < k_features:
            best, best_sc = None, None
            for cand in feature_cols:
                if cand in selected:
                    continue
                sc = score(selected + [cand])
                if best is None or sc > best_sc:
                    best, best_sc = cand, sc
            selected.append(best)
        return selected
    selected = list(feature_cols)
    while len(selected) > k_features:
        best, best_sc = None, None
        for cand in selected:
            trial = [c for c in selected if c != cand]
            sc = score(trial)
            if best is None or sc > best_sc:
                best, best_sc = cand, sc
        selected.remove(best)
    return selected
