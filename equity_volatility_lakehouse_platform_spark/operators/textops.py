"""Shared text primitives for dedup / text-analysis operators.

Everything is a JVM-side expression (split/md5/conv/transform/aggregate) —
no Python UDFs in these hot paths. The cross-engine token hash is the
first 15 hex chars of md5 parsed as an integer, so DuckDB oracles can
reproduce it exactly (`CAST('0x'||substr(md5(s),1,15) AS BIGINT)`).

Scale: token/shingle hashing is embarrassingly parallel; MinHash
signatures reduce via groupBy (partial aggregation), and LSH banding
turns the quadratic near-dup search into an equi-join on band keys —
the standard shuffle-friendly formulation (Broder MinHash + banded LSH,
Mining of Massive Datasets ch.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^31-1 (Mersenne prime): keeps a*h+b inside int64 (a,h < 2^31 => a*h < 2^62).
HASH_P = 2147483647
# Permutation constants: fixed primes < 2^31 (a_i) and a linear ramp (b_i).
MINHASH_A = (1000000007, 998244353, 754974721, 167772161,
             469762049, 1004535809, 1224736769, 2013265921)
MINHASH_B = tuple(i * 15485863 + 1 for i in range(8))
FP_MOD = 1000000007


def tokens(col: Column) -> Column:
    """Whitespace tokens of lowercased, trimmed text."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_hash(col: Column) -> Column:
    """Deterministic 60-bit string hash reproducible in any SQL engine:
    int(md5(s)[:15], 16)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles. Caller must filter size(tok) >= n (Spark's
    sequence() descends when start > stop)."""
    idx = F.sequence(F.lit(0), F.size(tok) - n)
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok, i + k + 1) for k in range(n)]
        ),
    )


def minhash_signature(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-document MinHash signature (8 permutations) over word-3-gram
    shingles. One explode + one groupBy: linear, fully distributed."""
    tok = tokens(F.col(text_col))
    sh = (
        df.select(id_col, tok.alias("_tok"))
        .filter(F.size("_tok") >= n)
        .select(id_col, F.explode(shingles(F.col("_tok"), n)).alias("_sh"))
        # materialize the base hash ONCE: the 8 permutation aggregates below
        # are then pure integer arithmetic (one md5 per shingle, not eight).
        .select(id_col, (token_hash(F.col("_sh")) % HASH_P).alias("_h32"))
    )
    aggs = [
        F.min((F.lit(a) * F.col("_h32") + F.lit(b)) % HASH_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def fingerprint(tok: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash of the
    token hash stream, fold-left (acc*31 + h) % FP_MOD."""
    hashes = F.transform(tok, lambda t: token_hash(t) % HASH_P)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(FP_MOD),
    )


def stopword_hits(tok: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens belonging to a lexicon (langid / quality scoring)."""
    wordlist = list(words)
    return F.size(F.filter(tok, lambda t: t.isin(wordlist))).cast("long")
