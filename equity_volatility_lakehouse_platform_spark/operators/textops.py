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
# Horner base for combining token hashes into a shingle hash:
# acc*B + h stays < 2^31 * 2^20 + 2^31 < 2^52 — no int64 overflow.
SHINGLE_B = 1000003
# Permutation constants: fixed primes < 2^31 (a_i) and a linear ramp (b_i).
MINHASH_A = (1000000007, 998244353, 754974721, 167772161,
             469762049, 1004535809, 1224736769, 2013265921)
MINHASH_B = tuple(i * 15485863 + 1 for i in range(8))
FP_MOD = 1000000007


def minhash_params(n_perm: int = 8) -> list[tuple[int, int]]:
    """(a_k, b_k) universal-hash parameters for ``n_perm`` permutations.

    Permutations 0..7 are the legacy fixed primes (d02's signature
    contract — any widened signature has the 8-perm frame as an exact
    PREFIX, so materialized signature tables stay forward-compatible).
    Permutations k >= 8 are formula-generated:

        a_k = (1000003 * (k + 1)) % P      b_k = (15485863 * k + 1) % P

    For the universal family h(x) = (a*x + b) % P with P prime, any
    distinct nonzero a is as good as a hand-picked prime; the formula
    exists so a SQL oracle (DuckDB CASE + list_transform over range())
    derives the SAME parameters from the permutation index — the two
    engines widen in lockstep with zero shipped constants.
    """
    out = [(MINHASH_A[k], MINHASH_B[k]) for k in range(min(8, n_perm))]
    for k in range(8, n_perm):
        out.append(
            ((1000003 * (k + 1)) % HASH_P, (15485863 * k + 1) % HASH_P)
        )
    return out


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


def token_hash_array(tok: Column) -> Column:
    """Per-token 31-bit hashes — the only md5 work in the MinHash path
    (one digest per token, not per shingle)."""
    return F.transform(tok, lambda t: token_hash(t) % HASH_P)


def shingle_hash_array(th: Column, n: int = 3) -> Column:
    """n-gram shingle hashes from the token-hash array via Horner fold
    (((h_i*B + h_{i+1}) % P)*B + h_{i+2}) % P — pure integer arithmetic,
    reproducible in any SQL engine with list_transform."""
    idx = F.sequence(F.lit(1), F.size(th) - (n - 1))

    def combine(i: Column) -> Column:
        acc = F.element_at(th, i)
        for k in range(1, n):
            acc = (acc * SHINGLE_B + F.element_at(th, i + F.lit(k))) % HASH_P
        return acc

    return F.transform(idx, combine)


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_perm: int = 8,
) -> DataFrame:
    """Per-document MinHash signature (``n_perm`` permutations, default
    8 — see ``plans.dedup.lsh_n_perm`` for the corpus-size ladder) over
    word-3-gram shingle hashes.

    Entirely per-row: tokenize -> hash tokens -> Horner-combine into
    shingle hashes -> array_min of each permuted array. No explode, no
    groupBy — the plan is a narrow projection (zero shuffles), so at
    100 TB it scales with input partitions alone. Separate selects keep
    the token-hash array a named attribute, so CollapseProject won't
    re-inline (and re-md5) it into the n element_at references."""
    tok = tokens(F.col(text_col))
    base = (
        df.select(id_col, tok.alias("_tok"))
        .filter(F.size("_tok") >= n)
        .select(id_col, token_hash_array(F.col("_tok")).alias("_th"))
        .select(id_col, shingle_hash_array(F.col("_th"), n).alias("_sh"))
    )
    mins = [
        F.array_min(
            F.transform(F.col("_sh"), lambda h: (F.lit(a) * h + F.lit(b)) % HASH_P)
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_params(n_perm))
    ]
    return base.select(id_col, *mins)


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
