"""Text-analysis queries over the documents table (north-star operators:
language-ID heuristic, quality scoring, token counting, fingerprinting).

All JVM-side expressions (split/filter/aggregate lambdas) — the shapes a
100 TB training-data pipeline runs per document with zero shuffles
(embarrassingly parallel map stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.operators import textops as tx
from equity_volatility_lakehouse_platform_spark.plans.registry import register
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table, table_rows
from equity_volatility_lakehouse_platform_spark.functions.rounding import r6

_LEX = {
    "en": ("the", "of", "and", "to", "in", "is", "for"),
    "es": ("el", "la", "de", "que", "y", "los", "por"),
    "fr": ("le", "la", "de", "et", "les", "des", "une"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit"),
}


def _lex_sql(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in _LEX[lang])


def _gopher_doc_stats(
    docs: DataFrame, passthrough: list[str], with_lang_hits: bool = False
) -> DataFrame:
    """Per-document Gopher counters in ONE Arrow-batched mapInPandas
    kernel (round 10 — the ivf_assign recipe applied to the text hot
    path). The round-9 t16/t17 evaluated 5+ higher-order-function
    lambdas per row; Spark's HOFs are CodegenFallback, so that entire
    stage ran INTERPRETED — the exact failure family that cost ml18 two
    cuts (41.8x / 12.8x at 100x, SCALE.md). Here every counter is
    computed in one C-backed pass per Arrow batch with the lexicons
    closed over once per executor (the JVM-folded-constants analogue).
    All outputs are INTEGERS, so cross-engine bit-exactness is
    structural — no float folds to re-order.

    Tokenization mirrors ``textops.tokens`` exactly on this corpus:
    trim strips SPACES only (F.trim semantics), ASCII lower, split on
    \\s+. The corpus is pure ASCII at every SF (verified: 0 docs with a
    non-ASCII byte); non-ASCII text would need JVM lower/whitespace
    mirroring — the per-query oracle gate catches any such drift.

    Plan shape: a pure map stage (zero exchanges), embarrassingly
    parallel over scan partitions at any corpus size.
    """
    lex = {k: frozenset(v) for k, v in _LEX.items()}
    base = docs.select(*passthrough, "text")
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in base.schema.fields
        if f.name != "text"
    )
    ddl += (
        ", n_tok bigint, sum_len bigint, n_alpha bigint, n_sym bigint"
        ", n_stop bigint, n_distinct bigint"
    )
    if with_lang_hits:
        ddl += ", " + ", ".join(f"h_{lang} bigint" for lang in _LEX)

    def kernel(batches):
        import re

        import pandas as pd

        alpha = re.compile(r"[a-z]+\Z")
        ws = re.compile(r"\s+")
        en = lex["en"]
        for pdf in batches:
            n_tok, sum_len, n_alpha, n_sym, n_stop, n_distinct = (
                [], [], [], [], [], [],
            )
            hits = {lang: [] for lang in lex} if with_lang_hits else None
            for text in pdf["text"]:
                toks = ws.split(text.strip(" ").lower())
                n_tok.append(len(toks))
                sum_len.append(sum(len(t) for t in toks))
                n_alpha.append(sum(1 for t in toks if alpha.match(t)))
                n_sym.append(
                    sum(1 for t in toks if "#" in t or "..." in t)
                )
                distinct = set(toks)
                n_stop.append(len(distinct & en))
                n_distinct.append(len(distinct))
                if hits is not None:
                    for lang, s in lex.items():
                        hits[lang].append(sum(1 for t in toks if t in s))
            data = {c: pdf[c] for c in pdf.columns if c != "text"}
            data.update(
                n_tok=n_tok, sum_len=sum_len, n_alpha=n_alpha,
                n_sym=n_sym, n_stop=n_stop, n_distinct=n_distinct,
            )
            if hits is not None:
                for lang in lex:
                    data[f"h_{lang}"] = hits[lang]
            yield pd.DataFrame(data)

    return base.mapInPandas(kernel, ddl)


@register(
    "t01_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           (ROUND(length(replace(text, ' ', '')) * 1.0
                 / NULLIF(len(regexp_split_to_array(trim(lower(text)), '\s+')), 0), 6) + 0.0)
             AS avg_token_len
    FROM documents
    """,
)
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Token counting: whitespace tokenization + char stats (BPE-ish regex
    # splits reduce to the same shape).
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(tx.tokens(F.col("text"))).alias("_n_tok"),  # tokenize ONCE
        F.length("text").alias("_len"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("_len_nospace"),
    )
    return base.select(
        "doc_id",
        F.col("_n_tok").cast("long").alias("n_tokens"),
        F.col("_len").cast("long").alias("n_chars_measured"),
        r6(
            F.col("_len_nospace") * 1.0 / F.nullif(F.col("_n_tok"), F.lit(0))).alias("avg_token_len"),
    )


@register(
    "t02_quality_score",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS tok
      FROM documents
    )
    SELECT doc_id,
           (ROUND((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                 * 1.0 / NULLIF(length(text), 0), 6) + 0.0) AS punct_ratio,
           (ROUND(len(list_filter(tok, x -> x IN ({_lex_sql('en')})))
                 * 1.0 / NULLIF(len(tok), 0), 6) + 0.0) AS stopword_ratio,
           (ROUND(least(len(tok) / 100.0, 1.0) * 0.5
                 + least(len(list_filter(tok, x -> x IN ({_lex_sql('en')})))
                         * 5.0 / NULLIF(len(tok), 0), 1.0) * 0.3
                 + (1.0 - (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))
                          * 1.0 / NULLIF(length(text), 0)) * 0.2, 6) + 0.0) AS quality_score
    FROM t
    """,
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality scoring: length / punctuation / stopword-ratio heuristics
    # (the C4/Gopher-style rule family), one map stage. Layered projections
    # so the expensive text ops (split, regex, lexicon filter) evaluate
    # ONCE per row — inlining them into every output column multiplied the
    # per-row cost ~4x (CollapseProject keeps non-cheap exprs as columns).
    docs = load_table(spark, sf_dir, "documents")
    tok = tx.tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        F.size(tok).alias("_n_tok"),
        tx.stopword_hits(tok, _LEX["en"]).alias("_n_stop"),
        F.length("text").alias("_len"),
        F.length(F.regexp_replace("text", r"[.,;:!?]", "")).alias("_len_nopunct"),
    )
    ratios = base.select(
        "doc_id",
        "_n_tok",
        ((F.col("_len") - F.col("_len_nopunct")) * 1.0 / F.nullif(F.col("_len"), F.lit(0))).alias(
            "_punct_ratio"
        ),
        (F.col("_n_stop") * 1.0 / F.nullif(F.col("_n_tok"), F.lit(0))).alias("_stop_ratio"),
    )
    score = (
        F.least(F.col("_n_tok") / 100.0, F.lit(1.0)) * 0.5
        + F.least(F.col("_stop_ratio") * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.col("_punct_ratio")) * 0.2
    )
    return ratios.select(
        "doc_id",
        r6("_punct_ratio").alias("punct_ratio"),
        r6("_stop_ratio").alias("stopword_ratio"),
        r6(score).alias("quality_score"),
    )


@register(
    "t03_langid",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(lower(text)), '\s+') AS tok
      FROM documents
    ), hits AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(tok, x -> x IN ({_lex_sql('en')}))) AS BIGINT) AS h_en,
             CAST(len(list_filter(tok, x -> x IN ({_lex_sql('es')}))) AS BIGINT) AS h_es,
             CAST(len(list_filter(tok, x -> x IN ({_lex_sql('fr')}))) AS BIGINT) AS h_fr,
             CAST(len(list_filter(tok, x -> x IN ({_lex_sql('de')}))) AS BIGINT) AS h_de
      FROM t
    )
    SELECT doc_id, lang, h_en, h_es, h_fr, h_de,
           CASE WHEN h_en = 0 AND h_es = 0 AND h_fr = 0 AND h_de = 0 THEN 'und'
                WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de THEN 'en'
                WHEN h_es >= h_fr AND h_es >= h_de THEN 'es'
                WHEN h_fr >= h_de THEN 'fr'
                ELSE 'de' END AS lang_pred
    FROM hits
    """,
)
def t03_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Language-ID n-gram/stopword heuristic: per-lexicon hit counts with a
    # fixed-priority argmax (deterministic on ties).
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token array once; the four lexicon filters then read
    # the column instead of re-running the split per lexicon.
    toked = docs.select("doc_id", "lang", tx.tokens(F.col("text")).alias("_tok"))
    hits = toked.select(
        "doc_id",
        "lang",
        *[tx.stopword_hits(F.col("_tok"), _LEX[lang]).alias(f"h_{lang}") for lang in _LEX],
    )
    h = {lang: F.col(f"h_{lang}") for lang in _LEX}
    pred = (
        F.when((h["en"] == 0) & (h["es"] == 0) & (h["fr"] == 0) & (h["de"] == 0), "und")
        .when((h["en"] >= h["es"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["de"]), "en")
        .when((h["es"] >= h["fr"]) & (h["es"] >= h["de"]), "es")
        .when(h["fr"] >= h["de"], "fr")
        .otherwise("de")
    )
    return hits.withColumn("lang_pred", pred)


@register(
    "t04_fingerprint",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tok
      FROM documents
    )
    SELECT doc_id,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(tok,
                 x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) % 2147483647)),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS fingerprint
    FROM t
    """,
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Order-sensitive rolling-hash document fingerprint (content drift /
    # exact-prefix detection); pure fold, no shuffle.
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", tx.fingerprint(tx.tokens(F.col("text"))).alias("fingerprint")
    )


@register(
    "t05_contamination_screen",
    # Benchmark-contamination screening (training-data hygiene): which
    # corpus docs share 3-gram shingles with a held-out benchmark set
    # (deterministic pseudo-benchmark: doc_id % 97 == 0). The flag
    # compares integers (2*overlap >= total) so no float boundary can
    # split the engines.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(range(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS shingles
      FROM toks WHERE len(t) >= 3
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), bench AS (
      SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0
    ), corpus AS (
      SELECT doc_id, s FROM ex WHERE doc_id % 97 <> 0
    ), tot AS (
      SELECT doc_id, CAST(count(DISTINCT s) AS BIGINT) AS n_shingles
      FROM corpus GROUP BY doc_id
    ), hit AS (
      SELECT c.doc_id, CAST(count(DISTINCT c.s) AS BIGINT) AS n_overlap
      FROM corpus c JOIN bench b ON c.s = b.s GROUP BY c.doc_id
    )
    SELECT t.doc_id, t.n_shingles,
           COALESCE(h.n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
           (ROUND(COALESCE(h.n_overlap, 0) * 1.0 / t.n_shingles
                  - sign(COALESCE(h.n_overlap, 0)) * 0.000000001, 6) + 0.0)
             AS overlap_ratio,
           CAST(COALESCE(h.n_overlap, 0) * 2 >= t.n_shingles AS INTEGER)
             AS contaminated
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    """,
)
def t05_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shingle-overlap contamination screen: explode 3-gram shingles on
    # both sides, equi-join corpus shingles against the (broadcast,
    # distinct) benchmark shingle set — linear in collisions, never
    # doc x doc. The same shape screens a 100 TB corpus against a fixed
    # eval suite: the benchmark side stays tiny and broadcast while the
    # corpus side is a map + one aggregation.
    docs = load_table(spark, sf_dir, "documents")
    ex = (
        docs.filter(F.size(tx.tokens(F.col("text"))) >= 3)
        .select(
            "doc_id",
            F.explode(tx.shingles(tx.tokens(F.col("text")))).alias("s"),
        )
    )
    bench = F.broadcast(
        ex.filter(F.col("doc_id") % 97 == 0).select("s").distinct()
    )
    corpus = ex.filter(F.col("doc_id") % 97 != 0)
    tot = corpus.groupBy("doc_id").agg(
        F.count_distinct(F.col("s")).alias("n_shingles")
    )
    hit = (
        corpus.join(bench, "s")
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("s")).alias("n_overlap"))
    )
    joined = tot.join(hit, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias("n_overlap"),
    )
    ratio = F.col("n_overlap") * 1.0 / F.col("n_shingles")
    return joined.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        r6(ratio - F.signum(F.col("n_overlap")) * F.lit(1e-9)).alias(
            "overlap_ratio"
        ),
        (F.col("n_overlap") * 2 >= F.col("n_shingles")).cast("int").alias(
            "contaminated"
        ),
    )


@register(
    "t06_repetition_stats",
    # Intra-document repetition / boilerplate detection (Gopher-style
    # "repetitive content" rules): token count, distinct-token count, the
    # most-frequent token's count, a duplicate-token ratio, and a
    # repetitive flag. The flag compares integers (top_tf*5 >= n_tokens:
    # most common token covers >= 20%) so no float boundary can split the
    # engines; the ratio gets the standard 1e-9 toward-zero nudge.
    oracle=r"""
    WITH ex AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT)   AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(c) AS BIGINT)   AS top_tf,
           (ROUND((1.0 - count(*) * 1.0 / sum(c))
                  - sign(1.0 - count(*) * 1.0 / sum(c)) * 0.000000001, 6) + 0.0)
             AS dup_ratio,
           CAST(max(c) * 5 >= sum(c) AS INTEGER) AS repetitive
    FROM tf GROUP BY doc_id
    """,
)
def t06_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-level aggregation: explode tokens -> per-(doc,token) counts ->
    # per-doc stats. Both groupBys get map-side partial aggregation and
    # share the doc_id-prefixed key, so at 100 TB this is one data-sized
    # shuffle (term frequencies) plus one doc-sized shuffle -- never a
    # driver loop, never doc x doc.
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_tf"),
    )
    dup = 1.0 - F.col("n_distinct") * 1.0 / F.col("n_tokens")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_tf",
        r6(dup - F.signum(dup) * F.lit(1e-9)).alias("dup_ratio"),
        (F.col("top_tf") * 5 >= F.col("n_tokens")).cast("int").alias("repetitive"),
    )


@register(
    "t07_unigram_logprob",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM freq
    ), scored AS (
      SELECT t.doc_id, f.c FROM toks t JOIN freq f USING (tok)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           (ROUND((ln((SELECT n FROM tot)) - SUM(ln(c)) / count(*))
                  - sign(ln((SELECT n FROM tot)) - SUM(ln(c)) / count(*))
                    * 0.000000001, 6) + 0.0) AS avg_logprob,
           (ROUND((ln((SELECT n FROM tot)) - ln(min(c)))
                  - sign(ln((SELECT n FROM tot)) - ln(min(c)))
                    * 0.000000001, 6) + 0.0) AS max_surprisal
    FROM scored GROUP BY doc_id
    """,
)
def t07_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus-LM quality scoring (the CCNet-style perplexity filter a
    # pretraining pipeline runs per document): fit a unigram model over
    # the WHOLE corpus (token -> count), then score each document by its
    # mean negative log-probability, avg(-ln(c/N)) = ln(N) - avg(ln c),
    # plus the rarest-token surprisal. Scale shape: one token-grain
    # groupBy builds the model (map-side partial agg), the scoring join
    # is broadcast here (vocabulary ~ millions of tokens = tens of MB at
    # any corpus size; if a tokenizer explodes the vocab past broadcast
    # range this becomes a plain shuffle join on tok — still linear),
    # and the per-doc reduce is a second map-side-combined groupBy.
    # Token ln()s can differ by 1 ulp between libm and the JVM, so both
    # engines nudge-round the aggregate (r6s device).
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n_total = freq.agg(F.sum("c").alias("n"))
    per_doc = (
        toks.join(F.broadcast(freq), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log("c")).alias("_sum_ln_c"),
            F.min("c").alias("_min_c"),
        )
        .crossJoin(F.broadcast(n_total))
    )
    avg_lp = F.log("n") - F.col("_sum_ln_c") / F.col("n_tokens")
    max_sp = F.log("n") - F.log("_min_c")
    raw = per_doc.select(
        "doc_id",
        "n_tokens",
        avg_lp.alias("avg_logprob"),
        max_sp.alias("max_surprisal"),
    )
    return raw.select(
        "doc_id",
        "n_tokens",
        r6(F.col("avg_logprob") - F.signum("avg_logprob") * F.lit(1e-9)).alias("avg_logprob"),
        r6(F.col("max_surprisal") - F.signum("max_surprisal") * F.lit(1e-9)).alias("max_surprisal"),
    )


# PII/blocklist scrub patterns — kept inside the Java-regex / RE2 common
# subset (char classes, alternation, bounded repeats, \b) so Spark and
# DuckDB match IDENTICAL spans. The email pattern finds nothing in the
# synthetic corpus (it is digit-free) but exercises the machinery the
# production path needs; the term blocklist is dense here, so the
# redaction diff is non-trivially checked.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_BLOCK = r"\b(customer|user|merge)\b"


@register(
    "t08_pattern_scrub",
    oracle=rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '{_PII_BLOCK}')) AS BIGINT) AS n_blocked,
           regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                          '{_PII_BLOCK}', '[TERM]', 'g') AS scrubbed,
           CAST(length(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                          '{_PII_BLOCK}', '[TERM]', 'g')) AS BIGINT) AS scrubbed_len
    FROM documents
    """,
)
def t08_pattern_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PII / banned-term scrub: the pre-training compliance pass (strip
    # emails, user handles, licensed strings) as a pure map stage — count
    # matches, rewrite the text, report the post-scrub length. Zero
    # shuffles, embarrassingly parallel, and the regexes stay JVM-side
    # (codegen'd StringRegexExpression — no Python in the loop). The
    # scrubbed text itself is oracle-compared byte-for-byte, so the two
    # engines' regex engines (java.util.regex vs RE2) are pinned to the
    # compatible-subset semantics documented above. Layered projection:
    # the double regexp_replace runs ONCE (scrubbed_len reads the ref).
    docs = load_table(spark, sf_dir, "documents")
    scrub = F.regexp_replace(
        F.regexp_replace("text", _PII_EMAIL, "[EMAIL]"), _PII_BLOCK, "[TERM]"
    )
    staged = docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_PII_EMAIL)).cast("bigint").alias("n_email"),
        F.regexp_count("text", F.lit(_PII_BLOCK)).cast("bigint").alias("n_blocked"),
        scrub.alias("scrubbed"),
    )
    return staged.select(
        "doc_id", "n_email", "n_blocked", "scrubbed",
        F.length("scrubbed").cast("bigint").alias("scrubbed_len"),
    )


@register(
    "t09_bigram_topk",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(lower(text)), '\s+') AS tok
      FROM documents
    ), bi AS (
      SELECT lang,
             unnest(list_transform(range(1, len(tok)),
                                   i -> tok[i] || ' ' || tok[i + 1])) AS bigram
      FROM t
    ), counts AS (
      SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n
      FROM bi GROUP BY lang, bigram
    )
    SELECT lang, bigram, n, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT lang, bigram, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
      FROM counts
    )
    WHERE rk <= 5
    """,
)
def t09_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus n-gram statistics: top-5 bigrams per language — the
    # vocabulary/contamination EDA a pretraining pipeline runs per
    # corpus slice. Bigrams come from zip_with over two shifted slices
    # of the ONE tokenization (no self-join on position); the count is
    # a map-side-combined groupBy; the per-language top-k is a window
    # row_number with a DETERMINISTIC tiebreak (count desc, bigram asc —
    # both engines must rank ties identically). Scale: the window
    # partitions by lang (few, potentially skewed) but its input is the
    # already-aggregated (lang, bigram) count table, orders of magnitude
    # smaller than the corpus; for web-scale vocabularies swap in a
    # per-partition partial top-k before the final window (o04's
    # TakeOrderedAndProject shape).
    docs = load_table(spark, sf_dir, "documents")
    tok = tx.tokens(F.col("text"))
    staged = docs.select("doc_id", "lang", tok.alias("tok"))
    n = F.size("tok")
    bigrams = F.zip_with(
        F.slice("tok", 1, n - 1),
        F.slice("tok", 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bi = staged.select("lang", F.explode(bigrams).alias("bigram"))
    counts = bi.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    )
    return (
        counts.select("lang", "bigram", "n", rk.cast("bigint").alias("rk"))
        .filter(F.col("rk") <= 5)
    )


@register(
    "t10_tfidf_topk",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, term
    ), df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    s AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, (ROUND(score, 6) + 0.0) AS tfidf,
           CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT doc_id, term, tf, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rk
      FROM s
    )
    WHERE rk <= 3
    """,
)
def t10_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TF-IDF top-3 terms per document (smooth idf, sklearn's
    # ln((N+1)/(df+1))+1 form so unseen-term idf stays positive). The
    # corpus is tokenized ONCE: token explode -> map-side-combined
    # (doc, term) count, then document frequency is a COUNT window over
    # the term partition of that already-aggregated table — no
    # groupBy+self-join (which would re-run the explode: Spark shares no
    # subplans across join branches) and no second corpus scan. Doc
    # count N is a one-row broadcast cross join. At web scale the term
    # partition is Zipf-skewed but carries one row per (term, doc) pair
    # post-aggregation — orders of magnitude smaller than the token
    # stream. Per-doc top-3 is a window with a deterministic tiebreak
    # (score desc, term asc).
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = F.count(F.lit(1)).over(Window.partitionBy("term"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    s = (
        tf.withColumn("df", df_)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
            ).alias("score"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    )
    return (
        s.select(
            "doc_id", "term", "tf", "score", rk.cast("bigint").alias("rk")
        )
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", r6("score").alias("tfidf"), "rk")
    )


@register(
    "sc08_array_functions",
    # Array/list function family over the token column: distinct-sorted
    # vocabulary, stopword intersection, first/last slices. Every output
    # is canonically SORTED (DuckDB's list_distinct/list_intersect do
    # not define order) and joined to a string so the comparator sees a
    # scalar; empty lists COALESCE to '' (DuckDB's array_to_string maps
    # an empty list to NULL where Spark's array_join yields '').
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS tok
      FROM documents
    )
    SELECT doc_id,
           CAST(len(tok) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(tok)) AS BIGINT) AS n_unique,
           COALESCE(array_to_string(list_sort(list_distinct(tok)), ' '), '')
             AS vocab,
           COALESCE(array_to_string(
             list_sort(list_distinct(
               list_intersect(tok, ['the', 'a', 'of', 'and', 'to']))), ' '), '')
             AS stopwords_seen,
           COALESCE(array_to_string(tok[1:3], ' '), '') AS head3
    FROM t
    """,
)
def sc08_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Zero-shuffle map stage exercising the array function family
    # (distinct, sort, intersect, slice) — all JVM-side higher-order
    # functions; the token split runs ONCE in a staged projection and
    # every derived column references it by name.
    docs = load_table(spark, sf_dir, "documents")
    # array_remove, not F.filter(..., lambda): lambda higher-order
    # functions are CodegenFallback (the whole projection runs
    # interpreted, ~10x — the ml18/t16/t17 gotcha family); ArrayRemove
    # is a codegen collection expression with identical semantics here
    # (drop every '' element).
    staged = docs.select(
        "doc_id",
        F.array_remove(tx.tokens(F.col("text")), "").alias("tok"),
    )
    stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to")])
    return staged.select(
        "doc_id",
        F.size("tok").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("tok")).cast("bigint").alias("n_unique"),
        F.array_join(F.sort_array(F.array_distinct("tok")), " ").alias("vocab"),
        F.array_join(
            F.sort_array(F.array_distinct(F.array_intersect("tok", stop))), " "
        ).alias("stopwords_seen"),
        F.array_join(F.slice("tok", 1, 3), " ").alias("head3"),
    )


@register(
    "t11_zipf_fit",
    # Zipf's-law fit per language: OLS slope/intercept of ln(freq) on
    # ln(rank) over the term frequency table (a healthy natural corpus
    # slopes near -1; template/spam corpora flatten). Closed-form OLS
    # from five sums — the regression aggregates accumulate in
    # engine-specific order, so outputs take the nudged 6dp round.
    oracle=r"""
    WITH tok AS (
      SELECT lang,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT lang, term, CAST(count(*) AS BIGINT) AS freq
      FROM tok WHERE term <> '' GROUP BY lang, term
    ), ranked AS (
      SELECT lang,
             ln(CAST(row_number() OVER (PARTITION BY lang
                                        ORDER BY freq DESC, term) AS DOUBLE))
               AS lx,
             ln(CAST(freq AS DOUBLE)) AS ly
      FROM tf
    ), s AS (
      SELECT lang, count(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
             SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
      FROM ranked GROUP BY lang
    )
    SELECT lang, CAST(n AS BIGINT) AS n_terms,
           (ROUND(((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0))
                  - sign((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0.0))
                    * 0.000000001, 6) + 0.0) AS zipf_slope,
           (ROUND(((sy - sx * ((n * sxy - sx * sy)
                               / NULLIF(n * sxx - sx * sx, 0.0))) / n)
                  - sign((sy - sx * ((n * sxy - sx * sy)
                                     / NULLIF(n * sxx - sx * sx, 0.0))) / n)
                    * 0.000000001, 6) + 0.0) AS zipf_intercept
    FROM s
    """,
)
def t11_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One token explode feeds the (lang, term) count; the rank window
    # runs over the aggregated frequency table (vocabulary-sized); the
    # OLS reduction is a five-sum groupBy on lang. Deterministic rank
    # tiebreak (freq desc, term asc) keeps both engines' log-log points
    # identical before the sums.
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(tx.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("freq"))
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.desc("freq"), F.asc("term"))
    )
    ranked = tf.select(
        "lang",
        F.log(rk.cast("double")).alias("lx"),
        F.log(F.col("freq").cast("double")).alias("ly"),
    )
    s = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    staged = s.select(
        "lang", F.col("n").cast("bigint").alias("n_terms"),
        slope.alias("_slope"),
        ((F.col("sy") - F.col("sx") * slope) / F.col("n")).alias("_icept"),
    )
    from equity_volatility_lakehouse_platform_spark.functions.rounding import r6s

    return staged.select(
        "lang", "n_terms",
        r6s("_slope").alias("zipf_slope"),
        r6s("_icept").alias("zipf_intercept"),
    )


@register(
    "t12_ngram_novelty",
    # Corpus novelty scoring: the fraction of a document's distinct
    # 3-gram shingles whose FIRST occurrence (lowest doc_id) is the
    # document itself — the dedup-adjacent signal curation pipelines use
    # to rank near-boilerplate low. Counts are exact; the ratio is one
    # division.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
      FROM toks WHERE len(t) >= 3
    ), fs AS (
      SELECT doc_id, shingle,
             min(doc_id) OVER (PARTITION BY shingle) AS first_seen
      FROM sh
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN first_seen = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           (ROUND(SUM(CASE WHEN first_seen = doc_id THEN 1 ELSE 0 END) * 1.0
                  / count(*), 6) + 0.0) AS novelty_ratio
    FROM fs GROUP BY doc_id
    """,
)
def t12_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One shingle explode (distinct per doc, done array-side BEFORE the
    # explode so the shuffle carries unique pairs), a first-seen window
    # on the shingle partition, then a per-doc reduction. At 100 TB the
    # shingle partition is the big shuffle — the same key d03's banding
    # join uses; hash-shingles (16-byte) would swap in for raw strings.
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = tx.tokens(F.col("text"))
    sh = (
        docs.select("doc_id", tok.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(tx.shingles(F.col("t")))
            ).alias("shingle"),
        )
    )
    first_seen = F.min("doc_id").over(Window.partitionBy("shingle"))
    fs = sh.select("doc_id", first_seen.alias("first_seen"))
    novel = F.sum(
        F.when(F.col("first_seen") == F.col("doc_id"), 1).otherwise(0)
    )
    return fs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        novel.cast("bigint").alias("n_novel"),
        r6(novel * F.lit(1.0) / F.count(F.lit(1))).alias("novelty_ratio"),
    )


_CHUNK_W, _CHUNK_S = 64, 48  # window / stride: 16-token overlap


@register(
    "t13_token_chunking",
    # LLM-training chunk fan-out (round 6): fixed W-token windows with
    # stride S over each document — the standard pre-training chunker.
    # chunk k covers tokens [k*S, k*S + W); the last chunk may be short;
    # every document emits at least one chunk. DuckDB's list_slice is
    # INCLUSIVE on both bounds; Spark's slice takes (start, length) —
    # both expressed below to cover the identical token range.
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS tok
      FROM documents
    ), c AS (
      SELECT doc_id, tok,
             unnest(generate_series(0, (greatest(len(tok), 1) - 1) // {_CHUNK_S})) AS chunk_idx
      FROM t
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(tok, chunk_idx * {_CHUNK_S} + 1,
                               chunk_idx * {_CHUNK_S} + {_CHUNK_W})) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(list_slice(tok, chunk_idx * {_CHUNK_S} + 1,
                                      chunk_idx * {_CHUNK_S} + {_CHUNK_W}), ' ')
             AS chunk_text
    FROM c
    """,
)
def t13_token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Map-only 1->N fan-out: tokenize ONCE, explode the chunk-index
    # sequence (executor-side, never a driver loop), slice per chunk.
    # At 100 TB this is the stage that feeds the tokenizer fleet: zero
    # shuffles, and the output is naturally partition-preserving so the
    # downstream dedup-by-chunk (d01 on chunk_text) colocates for free.
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tx.tokens(F.col("text")).alias("tok"))
    c = t.select(
        "doc_id",
        "tok",
        F.explode(
            F.sequence(
                F.lit(0),
                # integral chunk count: `div` (true division would make
                # the sequence stop a DOUBLE and fail analysis)
                F.expr(f"(greatest(size(tok), 1) - 1) div {_CHUNK_S}").cast("int"),
            )
        ).alias("chunk_idx"),
    )
    sl = F.slice(F.col("tok"), F.col("chunk_idx") * _CHUNK_S + 1, _CHUNK_W)
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(sl).cast("long").alias("n_chunk_tokens"),
        F.array_join(sl, " ").alias("chunk_text"),
    )


@register(
    "t14_effective_corpus_size",
    # The "effective dataset size" accounting every corpus report leads
    # with: whitespace-token totals BEFORE dedup, after WHOLE-DOCUMENT
    # dedup (d01's digest-keep rule), and after CHUNK-level dedup
    # (d14's global first-occurrence rule on 16-token chunks), plus the
    # exact retained fractions. One tokenize pass feeds all three
    # counts; the doc-level survivor set is a window rank over the text
    # digest, the chunk-level count reuses d14's chunk machinery — no
    # raw text ever shuffles (digests + token counts only).
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tok
      FROM documents
    ), keep_doc AS (
      SELECT n_tok,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM t
    ), ch AS (
      SELECT doc_id, ci,
             array_to_string(list_slice(tok, ci * 16 + 1, ci * 16 + 16), ' ')
               AS chunk_text,
             len(list_slice(tok, ci * 16 + 1, ci * 16 + 16)) AS n_chunk_tok
      FROM (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\s+') AS tok,
               unnest(generate_series(
                 0, (greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1) - 1) // 16
               )) AS ci
        FROM documents
      )
    ), keep_chunk AS (
      SELECT n_chunk_tok,
             row_number() OVER (PARTITION BY md5(chunk_text)
                                ORDER BY doc_id, ci) AS rn
      FROM ch
    )
    SELECT (SELECT CAST(SUM(n_tok) AS BIGINT) FROM t) AS total_tokens,
           (SELECT CAST(SUM(n_tok) AS BIGINT) FROM keep_doc WHERE rn = 1)
             AS tokens_after_doc_dedup,
           (SELECT CAST(SUM(n_chunk_tok) AS BIGINT) FROM keep_chunk WHERE rn = 1)
             AS tokens_after_chunk_dedup,
           (ROUND((SELECT SUM(n_tok) FROM keep_doc WHERE rn = 1) * 1.0
                  / (SELECT SUM(n_tok) FROM t), 6) + 0.0) AS doc_retention,
           (ROUND((SELECT SUM(n_chunk_tok) FROM keep_chunk WHERE rn = 1) * 1.0
                  / (SELECT SUM(n_tok) FROM t), 6) + 0.0) AS chunk_retention
    """,
)
def t14_effective_corpus_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "text", F.size(tx.tokens(F.col("text"))).alias("n_tok")
    )
    wd = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    doc_kept = (
        t.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .agg(F.sum("n_tok").alias("kept"))
    )
    W = 16
    c = docs.select("doc_id", tx.tokens(F.col("text")).alias("tok")).select(
        "doc_id",
        "tok",
        F.explode(
            F.sequence(
                F.lit(0),
                F.expr(f"(greatest(size(tok), 1) - 1) div {W}").cast("int"),
            )
        ).alias("ci"),
    )
    sl = F.slice(F.col("tok"), F.col("ci") * W + 1, W)
    chunks = c.select(
        "doc_id", "ci",
        F.array_join(sl, " ").alias("chunk_text"),
        F.size(sl).alias("n_chunk_tok"),
    )
    wc = Window.partitionBy(F.md5("chunk_text")).orderBy("doc_id", "ci")
    chunk_kept = (
        chunks.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
        .agg(F.sum("n_chunk_tok").alias("kept"))
    )
    total = t.agg(F.sum("n_tok").alias("total"))
    return (
        total.crossJoin(doc_kept.withColumnRenamed("kept", "doc_kept"))
        .crossJoin(chunk_kept.withColumnRenamed("kept", "chunk_kept"))
        .select(
            F.col("total").cast("bigint").alias("total_tokens"),
            F.col("doc_kept").cast("bigint").alias("tokens_after_doc_dedup"),
            F.col("chunk_kept").cast("bigint").alias("tokens_after_chunk_dedup"),
            r6(F.col("doc_kept") * 1.0 / F.col("total")).alias("doc_retention"),
            r6(F.col("chunk_kept") * 1.0 / F.col("total")).alias("chunk_retention"),
        )
    )


@register(
    "t15_bigram_logprob",
    # Bigram-LM fluency scoring (round 8) — the step past t07's unigram
    # model that separates "rare words" from "implausible SEQUENCES"
    # (word-salad/boilerplate detection): fit corpus bigram counts, then
    # score each document by its mean negative log-likelihood under an
    # interpolated backoff model
    #   P(w2 | w1) = 0.7 * c(w1,w2)/c(w1 ·) + 0.3 * c(w2)/N
    # (always > 0 — no OOV zeros — and every operand is a corpus count,
    # so the inner arithmetic is bit-identical across engines; the
    # ln-sums take the standard r6s nudge for 1-ulp libm drift).
    # `n_hapax_bigrams` counts the doc's corpus-unique bigrams — the
    # novelty tail. Scale shape mirrors t07: one bigram-grain groupBy
    # builds the model (map-side combined), scoring joins broadcast the
    # model tables, and the per-doc reduce is a second combined groupBy;
    # raw text never shuffles (bigram strings do — hash them for a
    # 100 TB vocabulary, same note as t07).
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ), tokf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS ct
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ), ntok AS (
      SELECT CAST(SUM(ct) AS BIGINT) AS n FROM tokf
    ), bi AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      FROM toks, LATERAL unnest(range(1, len(t))) AS u(i)
      WHERE len(t) >= 2
    ), bigf AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY w1, w2
    ), unif AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bigf GROUP BY w1
    ), scored AS (
      SELECT b.doc_id,
             f.c12,
             0.7 * (f.c12 * 1.0 / u.c1)
             + 0.3 * (tf.ct * 1.0 / (SELECT n FROM ntok)) AS p
      FROM bi b
      JOIN bigf f ON f.w1 = b.w1 AND f.w2 = b.w2
      JOIN unif u ON u.w1 = b.w1
      JOIN tokf tf ON tf.tok = b.w2
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(count_if(c12 = 1) AS BIGINT) AS n_hapax_bigrams,
           (ROUND((-SUM(ln(p)) / count(*))
                  - sign(-SUM(ln(p)) / count(*)) * 0.000000001, 6) + 0.0)
             AS avg_neg_ll
    FROM scored GROUP BY doc_id
    """,
)
def t15_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = tx.tokens(F.col("text"))
    t = docs.select("doc_id", tok.alias("t"))
    toks = t.select("doc_id", F.explode("t").alias("tok"))
    tokf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("ct"))
    ntok = tokf.agg(F.sum("ct").alias("n"))
    bi = (
        t.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("t"), 1, F.size("t") - 1).alias("w1"),
                    F.slice(F.col("t"), 2, F.size("t") - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bigf = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    unif = bigf.groupBy("w1").agg(F.sum("c12").alias("c1"))
    p = (
        F.lit(0.7) * (F.col("c12") * 1.0 / F.col("c1"))
        + F.lit(0.3) * (F.col("ct") * 1.0 / F.col("n"))
    )
    scored = (
        bi.join(F.broadcast(bigf), ["w1", "w2"])
        .join(F.broadcast(unif), "w1")
        .join(F.broadcast(tokf.withColumnRenamed("tok", "w2")), "w2")
        .crossJoin(F.broadcast(ntok))
        .select("doc_id", "c12", p.alias("p"))
    )
    neg_ll = -F.sum(F.log("p")) / F.count(F.lit(1))
    out = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.count_if(F.col("c12") == 1).alias("n_hapax_bigrams"),
        neg_ll.alias("_nll"),
    )
    return out.select(
        "doc_id", "n_bigrams", "n_hapax_bigrams",
        r6(F.col("_nll") - F.signum("_nll") * F.lit(1e-9)).alias("avg_neg_ll"),
    )


@register(
    "t16_gopher_quality_gates",
    # The Gopher rule BATTERY (Rae et al. 2021, §A1.1) as per-rule
    # boolean gates — the filter configuration every LLM corpus pipeline
    # starts from, complementing t02's continuous score and t06's
    # repetition stats with the actual pass/fail surface downstream
    # filters push down on. Every rule is INTEGER arithmetic
    # (cross-multiplied thresholds — 5*n_alpha >= 4*n_tok instead of
    # n_alpha/n_tok >= 0.8) so no float boundary can split the engines.
    # All six rules are list-scalar expressions over one tokenization —
    # ONE map stage, zero shuffle, rules evaluate in the scan's own
    # partitions at any corpus size. Constant-true rules on this
    # synthetic corpus (alpha, symbol) are still exercised end-to-end:
    # the hash covers their columns, and the varying rules (word count,
    # mean word length, stopword presence, duplicate ratio) vary row by
    # row.
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS tok
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(tok) AS n_tok,
             COALESCE(list_sum(list_transform(tok, x -> length(x))), 0)
               AS sum_len,
             len(list_filter(tok, x -> regexp_matches(x, '^[a-z]+$')))
               AS n_alpha,
             len(list_filter(tok, x -> contains(x, '#')
                                       OR contains(x, '...'))) AS n_sym,
             len(list_filter(list_distinct(tok),
                             x -> x IN ({_lex_sql('en')}))) AS n_stop,
             len(list_distinct(tok)) AS n_distinct
      FROM t
    )
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tok,
           n_tok >= 50 AND n_tok <= 100000            AS r_word_count,
           sum_len >= 3 * n_tok AND sum_len <= 10 * n_tok AS r_mean_word_len,
           5 * n_alpha >= 4 * n_tok                   AS r_alpha_fraction,
           10 * n_sym <= n_tok                        AS r_symbol_ratio,
           n_stop >= 2                                AS r_stopwords,
           2 * n_distinct >= n_tok                    AS r_dup_ratio,
           CAST((CASE WHEN n_tok >= 50 AND n_tok <= 100000 THEN 0 ELSE 1 END)
              + (CASE WHEN sum_len >= 3 * n_tok AND sum_len <= 10 * n_tok
                      THEN 0 ELSE 1 END)
              + (CASE WHEN 5 * n_alpha >= 4 * n_tok THEN 0 ELSE 1 END)
              + (CASE WHEN 10 * n_sym <= n_tok THEN 0 ELSE 1 END)
              + (CASE WHEN n_stop >= 2 THEN 0 ELSE 1 END)
              + (CASE WHEN 2 * n_distinct >= n_tok THEN 0 ELSE 1 END)
             AS BIGINT) AS n_failed,
           n_tok >= 50 AND n_tok <= 100000
             AND sum_len >= 3 * n_tok AND sum_len <= 10 * n_tok
             AND 5 * n_alpha >= 4 * n_tok
             AND 10 * n_sym <= n_tok
             AND n_stop >= 2
             AND 2 * n_distinct >= n_tok              AS passes
    FROM m
    """,
)
def t16_gopher_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Tokenize + count ONCE in the Arrow kernel (round 10 — replaces
    # five interpreted HOF lambdas per row), then the gates over plain
    # integer refs stay in whole-stage codegen.
    m = _gopher_doc_stats(docs, ["doc_id"])
    gates = {
        "r_word_count": (F.col("n_tok") >= 50) & (F.col("n_tok") <= 100000),
        "r_mean_word_len": (F.col("sum_len") >= 3 * F.col("n_tok"))
        & (F.col("sum_len") <= 10 * F.col("n_tok")),
        "r_alpha_fraction": 5 * F.col("n_alpha") >= 4 * F.col("n_tok"),
        "r_symbol_ratio": 10 * F.col("n_sym") <= F.col("n_tok"),
        "r_stopwords": F.col("n_stop") >= 2,
        "r_dup_ratio": 2 * F.col("n_distinct") >= F.col("n_tok"),
    }
    flagged = m.select(
        "doc_id", "n_tok", *[c.alias(n) for n, c in gates.items()]
    )
    n_failed = sum(
        F.when(F.col(n), 0).otherwise(1) for n in gates
    ).cast("bigint")
    passes = F.lit(True)
    for n in gates:
        passes = passes & F.col(n)
    return flagged.select(
        "doc_id", "n_tok", *gates.keys(),
        n_failed.alias("n_failed"), passes.alias("passes"),
    )


@register(
    "t17_corpus_datacard",
    # The per-(language, source) CORPUS DATA CARD — the datasheet table
    # every training-data report leads with, composing the engine's
    # curation signals into one grouped pass: volume (docs, tokens,
    # chars), exact-dup rate (d01's digest), Gopher-gate pass rate
    # (t16's battery), and language-label agreement (t03's lexicon
    # argmax vs the recorded lang). One tokenization feeds every
    # signal; all group cells are INTEGER counts (one groupBy shuffle),
    # and the three rates are single int/int divisions nudge-rounded —
    # no float accumulation anywhere. At 100 TB this is one map stage
    # plus one small-key roll-up.
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, lang, source, n_chars, md5(text) AS digest,
             regexp_split_to_array(trim(lower(text)), '\s+') AS tok
      FROM documents
    ), m AS (
      SELECT doc_id, lang, source, n_chars, digest,
             len(tok) AS n_tok,
             COALESCE(list_sum(list_transform(tok, x -> length(x))), 0)
               AS sum_len,
             len(list_filter(tok, x -> regexp_matches(x, '^[a-z]+$')))
               AS n_alpha,
             len(list_filter(tok, x -> contains(x, '#')
                                       OR contains(x, '...'))) AS n_sym,
             len(list_filter(list_distinct(tok),
                             x -> x IN ({_lex_sql('en')}))) AS n_stop,
             len(list_distinct(tok)) AS n_distinct,
             len(list_filter(tok, x -> x IN ({_lex_sql('en')}))) AS h_en,
             len(list_filter(tok, x -> x IN ({_lex_sql('es')}))) AS h_es,
             len(list_filter(tok, x -> x IN ({_lex_sql('fr')}))) AS h_fr,
             len(list_filter(tok, x -> x IN ({_lex_sql('de')}))) AS h_de
      FROM t
    ), f AS (
      SELECT lang, source, n_chars, digest, n_tok,
             (n_tok >= 50 AND n_tok <= 100000
              AND sum_len >= 3 * n_tok AND sum_len <= 10 * n_tok
              AND 5 * n_alpha >= 4 * n_tok
              AND 10 * n_sym <= n_tok
              AND n_stop >= 2
              AND 2 * n_distinct >= n_tok) AS passes,
             (CASE WHEN h_en = 0 AND h_es = 0 AND h_fr = 0 AND h_de = 0
                   THEN 'und'
                   WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de
                   THEN 'en'
                   WHEN h_es >= h_fr AND h_es >= h_de THEN 'es'
                   WHEN h_fr >= h_de THEN 'fr'
                   ELSE 'de' END) = lang AS lang_agrees
      FROM m
    ), g AS (
      SELECT lang, source,
             count(*) AS n_docs,
             sum(n_tok) AS n_tokens,
             sum(n_chars) AS total_chars,
             count(DISTINCT digest) AS n_unique,
             count_if(passes) AS n_pass,
             count_if(lang_agrees) AS n_agree
      FROM f GROUP BY lang, source
    )
    SELECT lang, source,
           CAST(n_docs AS BIGINT)      AS n_docs,
           CAST(n_tokens AS BIGINT)    AS n_tokens,
           CAST(total_chars AS BIGINT) AS total_chars,
           CAST(n_unique AS BIGINT)    AS n_unique,
           CAST(n_pass AS BIGINT)      AS n_pass,
           CAST(n_agree AS BIGINT)     AS n_agree,
           (ROUND(1.0 - n_unique * 1.0 / n_docs
                  - sign(1.0 - n_unique * 1.0 / n_docs) * 0.000000001, 6)
            + 0.0) AS dup_rate,
           (ROUND(n_pass * 1.0 / n_docs
                  - sign(n_pass * 1.0 / n_docs) * 0.000000001, 6) + 0.0)
             AS gate_pass_rate,
           (ROUND(n_agree * 1.0 / n_docs
                  - sign(n_agree * 1.0 / n_docs) * 0.000000001, 6) + 0.0)
             AS lang_agreement
    FROM g
    """,
)
def t17_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # digest stays JVM-side (md5 before the kernel, passed through);
    # every token counter comes from the one Arrow pass (round 10).
    m = _gopher_doc_stats(
        docs.withColumn("digest", F.md5("text")),
        ["doc_id", "lang", "source", "n_chars", "digest"],
        with_lang_hits=True,
    )
    passes = (
        (F.col("n_tok") >= 50) & (F.col("n_tok") <= 100000)
        & (F.col("sum_len") >= 3 * F.col("n_tok"))
        & (F.col("sum_len") <= 10 * F.col("n_tok"))
        & (5 * F.col("n_alpha") >= 4 * F.col("n_tok"))
        & (10 * F.col("n_sym") <= F.col("n_tok"))
        & (F.col("n_stop") >= 2)
        & (2 * F.col("n_distinct") >= F.col("n_tok"))
    )
    h = {lang: F.col(f"h_{lang}") for lang in _LEX}
    pred = (
        F.when(
            (h["en"] == 0) & (h["es"] == 0) & (h["fr"] == 0) & (h["de"] == 0),
            "und",
        )
        .when((h["en"] >= h["es"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["de"]), "en")
        .when((h["es"] >= h["fr"]) & (h["es"] >= h["de"]), "es")
        .when(h["fr"] >= h["de"], "fr")
        .otherwise("de")
    )
    f = m.select(
        "lang", "source", "n_chars", "digest", "n_tok",
        passes.alias("passes"),
        (pred == F.col("lang")).alias("lang_agrees"),
    )
    g = f.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.count_distinct("digest").alias("n_unique"),
        F.count_if(F.col("passes")).alias("n_pass"),
        F.count_if(F.col("lang_agrees")).alias("n_agree"),
    )
    from equity_volatility_lakehouse_platform_spark.functions.rounding import r6s

    rated = g.select(
        "lang", "source", "n_docs", "n_tokens", "total_chars",
        "n_unique", "n_pass", "n_agree",
        (1.0 - F.col("n_unique") * 1.0 / F.col("n_docs")).alias("_dup"),
        (F.col("n_pass") * 1.0 / F.col("n_docs")).alias("_pass"),
        (F.col("n_agree") * 1.0 / F.col("n_docs")).alias("_agree"),
    )
    return rated.select(
        "lang", "source", "n_docs", "n_tokens", "total_chars",
        "n_unique", "n_pass", "n_agree",
        r6s("_dup").alias("dup_rate"),
        r6s("_pass").alias("gate_pass_rate"),
        r6s("_agree").alias("lang_agreement"),
    )


# regex patterns shared by the Spark query and (verbatim) the oracle —
# simple enough to mean the same thing in Java regex and RE2.
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_SSN = r"\d{3}-\d{2}-\d{4}"
_PII_PHONE = r"\d{3}-\d{3}-\d{4}"
_PII_IP = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


@register(
    "t18_pii_redaction",
    # PII detection + redaction (round 10) — the scrub stage every
    # training-data pipeline runs before release (emails, phone
    # numbers, SSN-shaped ids, bare IPv4s). The synthetic corpus
    # carries no PII, so each row PLANTS deterministic PII from doc_id
    # arithmetic at runtime (the sc11 device: the oracle rebuilds the
    # identical augmented text, so an error in either the construction
    # or the detection/redaction breaks the hash; addresses use the
    # RFC 2606 example domain and the reserved 555 exchange / RFC 1918
    # 10.x space — nothing real is referenced). Counters are
    # regexp_count over the augmented text; redaction is an ordered
    # regexp_replace chain (email -> ssn -> phone -> ip, the order
    # matters because the patterns share digit shapes). All JVM
    # whole-stage-codegen string ops, zero shuffle — at 100 TB this is
    # a map stage over the corpus scan.
    oracle=rf"""
    WITH aug AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                THEN ' contact u' || CAST(doc_id % 97 AS VARCHAR)
                     || '@mail.example.com' ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                     || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                THEN ' id ' || CAST(doc_id % 900 + 100 AS VARCHAR)
                     || '-' || CAST(doc_id % 89 + 10 AS VARCHAR)
                     || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
                ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                     || '.' || CAST(doc_id % 250 + 1 AS VARCHAR)
                ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(t, '{_PII_SSN}')) AS BIGINT)
             AS n_ssn,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT)
             AS n_phone,
           CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT) AS n_ip,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             t, '{_PII_EMAIL}', '[EMAIL]', 'g'),
             '{_PII_SSN}', '[SSN]', 'g'),
             '{_PII_PHONE}', '[PHONE]', 'g'),
             '{_PII_IP}', '[IP]', 'g') AS redacted_text
    FROM aug
    """,
)
def t18_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" contact u"), (did % 97).cast("string"),
                F.lit("@mail.example.com"),
            ),
        ).otherwise(""),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" id "), (did % 900 + 100).cast("string"),
                F.lit("-"), (did % 89 + 10).cast("string"),
                F.lit("-"), (did % 9000 + 1000).cast("string"),
            ),
        ).otherwise(""),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" from 10."), (did % 256).cast("string"),
                F.lit("."), ((did * 7) % 256).cast("string"),
                F.lit("."), (did % 250 + 1).cast("string"),
            ),
        ).otherwise(""),
    )
    base = docs.select("doc_id", aug.alias("t"))
    red = F.col("t")
    for pat, tag in (
        (_PII_EMAIL, "[EMAIL]"),
        (_PII_SSN, "[SSN]"),
        (_PII_PHONE, "[PHONE]"),
        (_PII_IP, "[IP]"),
    ):
        red = F.regexp_replace(red, pat, tag)
    return base.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL)).cast("bigint").alias(
            "n_email"
        ),
        F.regexp_count(F.col("t"), F.lit(_PII_SSN)).cast("bigint").alias(
            "n_ssn"
        ),
        F.regexp_count(F.col("t"), F.lit(_PII_PHONE)).cast("bigint").alias(
            "n_phone"
        ),
        F.regexp_count(F.col("t"), F.lit(_PII_IP)).cast("bigint").alias(
            "n_ip"
        ),
        red.alias("redacted_text"),
    )


# Knuth multiplicative hash (a13's cross-engine uniform recipe): reduce
# mod p BEFORE the multiply so the product stays under 2^63 for ANY id
# under ANSI arithmetic.
_KNUTH_P = 1_000_000_007
_KNUTH_A = 2_654_435_761
_PACK_BUDGET = 256  # tokens per packed training sequence
_PACK_SHARD_DOCS = 4096  # target docs per packing shard


def _knuth_u(col):
    return ((col % _KNUTH_P) * F.lit(_KNUTH_A)) % _KNUTH_P


_KNUTH_U_SQL = "((doc_id % 1000000007) * 2654435761) % 1000000007"


# Shared packing CTE (t19 assignment / t22 assembly): deterministic
# Knuth-hash shards, greedy first-fit-next-bin recurrence stepped one
# row per shard per iteration.
_PACK_CTE = rf"""
    WITH RECURSIVE params AS (
      SELECT greatest(8, CAST(ceil(count(*) / {_PACK_SHARD_DOCS}.0) AS BIGINT))
               AS nshard
      FROM documents
    ), d AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
                  AS BIGINT) AS n_tok,
             {_KNUTH_U_SQL} % (SELECT nshard FROM params) AS shard
      FROM documents
    ), r AS (
      SELECT shard, doc_id, n_tok,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM d
    ), pack AS (
      SELECT shard, rn, doc_id, n_tok,
             n_tok AS fill,
             CAST(0 AS BIGINT) AS bin,
             CAST(0 AS BIGINT) AS pos
      FROM r WHERE rn = 1
      UNION ALL
      SELECT r.shard, r.rn, r.doc_id, r.n_tok,
             CASE WHEN p.fill + r.n_tok > {_PACK_BUDGET}
                  THEN r.n_tok ELSE p.fill + r.n_tok END,
             CASE WHEN p.fill + r.n_tok > {_PACK_BUDGET}
                  THEN p.bin + 1 ELSE p.bin END,
             CASE WHEN p.fill + r.n_tok > {_PACK_BUDGET}
                  THEN CAST(0 AS BIGINT) ELSE p.fill END
      FROM pack p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1
    )
"""


def pack_assign(d: DataFrame, nshard: int) -> DataFrame:
    """The greedy first-fit-next-bin assignment over a (doc_id, n_tok)
    frame: deterministic Knuth-hash shards, one exchange, grouped Arrow
    kernel. Shared by t19 (whole corpus) and d30 (curation survivors)."""
    import pandas as pd

    d = d.select("doc_id", "n_tok").withColumn(
        "shard", _knuth_u(F.col("doc_id")) % nshard
    )

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, offs = [], []
        fill, b = 0, 0
        for i, n in enumerate(pdf["n_tok"]):
            n = int(n)
            if i == 0:
                fill, b = n, 0
                offs.append(0)
            elif fill + n > _PACK_BUDGET:
                b += 1
                offs.append(0)
                fill = n
            else:
                offs.append(fill)
                fill += n
            bins.append(b)
        out = pdf[["doc_id", "shard", "n_tok"]].copy()
        out["bin_idx"] = bins
        out["bin_offset"] = offs
        return out

    return d.groupBy("shard").applyInPandas(
        _pack,
        schema="doc_id long, shard long, n_tok long, bin_idx long, "
        "bin_offset long",
    )


def pack_nshard(n_docs: int) -> int:
    """max(8, ceil(n/4096)) — mirrors the oracles' params CTE."""
    import math

    return max(8, math.ceil(n_docs / _PACK_SHARD_DOCS))


@register(
    "t19_sequence_packing",
    # Fixed-token-budget SEQUENCE PACKING (round 14) — the step between
    # t13's chunker and the training loop: greedy first-fit-next-bin
    # packing of whole documents into 256-token training sequences, the
    # standard fill-the-context recipe (T5/GPT-style "packing") that
    # turns a corpus of ragged documents into near-full fixed-length
    # rows. The scan is a per-shard RECURRENCE (every bin decision
    # depends on the running fill), i.e. the f19 family: the engine
    # runs it as a grouped Arrow kernel, the oracle steps the identical
    # state one row per shard per iteration through a recursive CTE.
    # Shards are deterministic Knuth-hash buckets provisioned at ~4096
    # docs each (count at plan build, floor 8 — identical arithmetic in
    # the oracle's params CTE), so the sequential leg stays CONSTANT
    # per shard as the corpus grows: 100 TB = more shards, not longer
    # scans, and packing quality is unaffected because bins never cross
    # shards. Plan: map-side tokenize -> ONE exchange (shard groupBy)
    # -> Arrow kernel; output is per-document (shard, bin, offset), the
    # join key a downstream writer needs to assemble physical rows.
    oracle=_PACK_CTE
    + """
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, bin AS bin_idx,
           n_tok, pos AS bin_offset
    FROM pack
    """,
)
def t19_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nshard = pack_nshard(table_rows(sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    return pack_assign(d, nshard)


@register(
    "t20_source_mixing",
    # Temperature-rebalanced SOURCE MIXING (round 14) — deterministic
    # downsampling that moves the per-source TOKEN shares toward the
    # tau=2 temperature mixture (p_s ^ (1/tau), renormalized — the
    # public multilingual-pretraining recipe from the mBERT/XLM-R
    # line). Sampling can only downweight, so the acceptance rates are
    # scaled until the rarest source keeps everything; the algebra then
    # collapses to rate_s = sqrt(min_t T_t / T_s) — a closed form with
    # NO cross-row double folds (token sums and their min are exact
    # BIGINTs; one division + sqrt per source), so cross-engine
    # bit-exactness is structural. Keep/drop is the a13 Knuth-hash
    # uniform against floor(rate * p) — integer compare, reproducible
    # across engines, retries and cluster sizes (a 100 TB re-run keeps
    # the same documents). Plan: map-side tokenize, one 20-row agg, the
    # rate table broadcast back onto the scan — the filter never
    # shuffles the corpus.
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
                  AS BIGINT) AS n_tok
      FROM documents
    ), s AS (
      SELECT source, SUM(n_tok) AS toks FROM d GROUP BY source
    ), r AS (
      SELECT source,
             (ROUND(sqrt(CAST((SELECT min(toks) FROM s) AS DOUBLE)
                         / CAST(toks AS DOUBLE)) - 0.000000001, 6) + 0.0)
               AS keep_rate
      FROM s
    )
    SELECT d.doc_id, d.source, d.n_tok, r.keep_rate
    FROM d JOIN r USING (source)
    WHERE {_KNUTH_U_SQL}
          < CAST(floor(r.keep_rate * 1000000007) AS BIGINT)
    """,
)
def t20_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    s = d.groupBy("source").agg(F.sum("n_tok").alias("toks"))
    min_t = s.agg(F.min("toks").alias("min_toks"))
    rates = (
        s.crossJoin(F.broadcast(min_t))
        .withColumn(
            "keep_rate",
            F.round(
                F.sqrt(
                    F.col("min_toks").cast("double")
                    / F.col("toks").cast("double")
                )
                - F.lit(1e-9),  # q10 nudge: rates are positive
                6,
            ),
        )
        .select("source", "keep_rate")
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(
            _knuth_u(F.col("doc_id"))
            < F.floor(F.col("keep_rate") * _KNUTH_P).cast("long")
        )
        .select("doc_id", "source", "n_tok", "keep_rate")
    )


@register(
    "t21_perplexity_filter",
    # CCNet-style PERPLEXITY FILTER (round 14) — the quality gate the
    # public pretraining pipelines run between scoring and packing:
    # fit the LM on a REFERENCE slice only (the lang='en' documents —
    # CCNet fits on Wikipedia), score EVERY document under it, keep the
    # most-fluent half. The train/score asymmetry is the point (t15
    # fits on the whole corpus): out-of-domain text must score against
    # the clean model, never shape it. OOV is handled with the add-one
    # unigram floor p = 0.7*c12/c1 [0 when w1 unseen] +
    # 0.3*(ct+1)/(N+V), so every bigram has p > 0 and every operand is
    # an exact corpus count. The keep decision is an INTEGER rank
    # (row_number over (rounded score, doc_id) <= n/2), so the median
    # boundary never compares floats cross-engine. Scale shape: model
    # tables broadcast (hash the bigram keys at 100 TB vocabulary —
    # t07's note), raw text never shuffles, and the only global stage
    # is one sort of DOC-level score rows (3-4 orders below token
    # volume; swap for approx_percentile at extreme corpus counts).
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ), ref AS (
      SELECT t FROM toks WHERE lang = 'en'
    ), tokf AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS ct
      FROM (SELECT unnest(t) AS tok FROM ref) GROUP BY tok
    ), nv AS (
      SELECT CAST(SUM(ct) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS v
      FROM tokf
    ), bigf AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      FROM (SELECT t[i] AS w1, t[i+1] AS w2
            FROM ref, LATERAL unnest(range(1, len(t))) AS u(i)
            WHERE len(t) >= 2)
      GROUP BY w1, w2
    ), unif AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bigf GROUP BY w1
    ), bi AS (
      SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
      FROM toks, LATERAL unnest(range(1, len(t))) AS u(i)
      WHERE len(t) >= 2
    ), scored AS (
      SELECT b.doc_id, b.lang,
             0.7 * COALESCE(COALESCE(f.c12, 0) * 1.0 / NULLIF(u.c1, 0), 0.0)
             + 0.3 * ((COALESCE(tf.ct, 0) + 1) * 1.0
                      / ((SELECT n FROM nv) + (SELECT v FROM nv))) AS p
      FROM bi b
      LEFT JOIN bigf f ON f.w1 = b.w1 AND f.w2 = b.w2
      LEFT JOIN unif u ON u.w1 = b.w1
      LEFT JOIN tokf tf ON tf.tok = b.w2
    ), nll AS (
      SELECT doc_id, lang,
             (ROUND((-SUM(ln(p)) / count(*))
                    - sign(-SUM(ln(p)) / count(*)) * 0.000000001, 6) + 0.0)
               AS avg_neg_ll
      FROM scored GROUP BY doc_id, lang
    ), ranked AS (
      SELECT doc_id, lang, avg_neg_ll,
             row_number() OVER (ORDER BY avg_neg_ll, doc_id) AS rn,
             count(*) OVER () AS n_docs
      FROM nll
    )
    SELECT doc_id, lang, avg_neg_ll
    FROM ranked WHERE rn <= n_docs // 2
    """,
)
def t21_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", tx.tokens(F.col("text")).alias("t"))
    ref = t.filter(F.col("lang") == "en").select("t")
    tokf = ref.select(F.explode("t").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("ct")
    )
    nv = tokf.agg(
        F.sum("ct").alias("n"), F.count(F.lit(1)).alias("v")
    )

    def _bigrams(frame: DataFrame, *keep: str) -> DataFrame:
        return (
            frame.filter(F.size("t") >= 2)
            .select(
                *keep,
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("t"), 1, F.size("t") - 1).alias("w1"),
                        F.slice(F.col("t"), 2, F.size("t") - 1).alias("w2"),
                    )
                ).alias("p"),
            )
            .select(
                *keep,
                F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"),
            )
        )

    bigf = _bigrams(ref).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    unif = bigf.groupBy("w1").agg(F.sum("c12").alias("c1"))
    bi = _bigrams(t, "doc_id", "lang")
    p = F.lit(0.7) * F.coalesce(
        F.coalesce(F.col("c12"), F.lit(0)) * 1.0
        / F.nullif(F.col("c1"), F.lit(0)),
        F.lit(0.0),
    ) + F.lit(0.3) * (
        (F.coalesce(F.col("ct"), F.lit(0)) + 1) * 1.0
        / (F.col("n") + F.col("v"))
    )
    scored = (
        bi.join(F.broadcast(bigf), ["w1", "w2"], "left")
        .join(F.broadcast(unif), "w1", "left")
        .join(
            F.broadcast(tokf.withColumnRenamed("tok", "w2")), "w2", "left"
        )
        .crossJoin(F.broadcast(nv))
        .select("doc_id", "lang", p.alias("p"))
    )
    neg_ll = -F.sum(F.log("p")) / F.count(F.lit(1))
    nll = (
        scored.groupBy("doc_id", "lang")
        .agg(neg_ll.alias("_nll"))
        .select(
            "doc_id",
            "lang",
            r6(
                F.col("_nll") - F.signum("_nll") * F.lit(1e-9)
            ).alias("avg_neg_ll"),
        )
    )
    w = Window.orderBy("avg_neg_ll", "doc_id")
    ranked = nll.select(
        "doc_id",
        "lang",
        "avg_neg_ll",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("n_docs"),
    )
    return ranked.filter(
        F.col("rn") <= F.expr("n_docs div 2")
    ).select("doc_id", "lang", "avg_neg_ll")


@register(
    "t22_packed_sequences",
    # PHYSICAL sequence assembly (round 14) — t19 decides WHERE each
    # document goes; this materializes the actual training rows: one
    # row per (shard, bin) with the member documents' text concatenated
    # in bin-offset order (the fixed-length example a data loader
    # reads). Assembly is the one stage that legitimately moves text:
    # ONE equi-join of the assignment onto documents and ONE
    # (shard, bin) groupBy — text shuffles exactly once, into its
    # training row, and the ordered concat is executor-side
    # (array_sort over (offset, text) structs, never a driver loop).
    # The oracle replays the identical recurrence and assembles with
    # string_agg ORDER BY pos.
    oracle=_PACK_CTE
    + """
    SELECT p.shard, p.bin AS bin_idx,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_tok) AS BIGINT) AS n_tokens,
           string_agg(doc.text, ' ' ORDER BY p.pos, p.doc_id) AS seq_text
    FROM pack p JOIN documents doc ON doc.doc_id = p.doc_id
    GROUP BY p.shard, p.bin
    """,
)
def t22_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    assign = t19_sequence_packing(spark, sf_dir)
    joined = assign.join(docs.select("doc_id", "text"), "doc_id")
    member = F.struct(
        F.col("bin_offset").alias("pos"),
        F.col("doc_id").alias("doc_id"),
        F.col("text").alias("text"),
    )
    return (
        joined.groupBy("shard", "bin_idx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(member)),
                    lambda x: x["text"],
                ),
                " ",
            ).alias("seq_text"),
        )
    )
