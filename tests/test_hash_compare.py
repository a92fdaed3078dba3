"""Calibration tests for the streaming hash comparator (tests/hash_compare.py).

The digest must (a) agree with the exact comparator wherever that one
passes, (b) catch single-value corruptions, and (c) canonicalize the
adversarial cases identically on both sides: NULL vs NaN, signed zero,
infinities, nullable ints, timestamps, dates, booleans, binary.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.hash_compare import duck_digest, run_hash_compare, spark_digest

ADVERSARIAL_SQL = """
SELECT * FROM (VALUES
  (1::BIGINT, 'alpha',  1.25::DOUBLE,      TRUE,  TIMESTAMP '2024-01-02 03:04:05.123456', DATE '2024-01-02'),
  (2,         'beta',   -0.0::DOUBLE,      FALSE, TIMESTAMP '1970-01-01 00:00:00',        DATE '1969-12-31'),
  (3,         NULL,     0.0::DOUBLE,       NULL,  NULL,                                    NULL),
  (NULL,      'gamma',  NULL,              TRUE,  TIMESTAMP '1999-12-31 23:59:59.999999', DATE '2000-02-29'),
  (5,         'delta',  'nan'::DOUBLE,     FALSE, TIMESTAMP '2024-06-30 12:00:00',        DATE '2024-06-30'),
  (6,         'eps',    'inf'::DOUBLE,     TRUE,  TIMESTAMP '2024-06-30 12:00:00',        DATE '2024-06-30'),
  (7,         'zeta',   '-inf'::DOUBLE,    FALSE, TIMESTAMP '2024-06-30 12:00:00',        DATE '2024-06-30'),
  (8,         'eta',    1234567.8899995,   TRUE,  TIMESTAMP '2024-06-30 12:00:00',        DATE '2024-06-30'),
  (9,         'x\x1fy', -0.0000005::DOUBLE, NULL, TIMESTAMP '2024-06-30 12:00:00',        DATE '2024-06-30')
) AS t(id, s, x, b, ts, d)
"""


def _spark_adversarial(spark):
    # identical rows built via Spark SQL (UTC session pinned by conftest)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.sql(
        ADVERSARIAL_SQL.replace("'nan'::DOUBLE", "double('NaN')")
        .replace("'inf'::DOUBLE", "double('Infinity')")
        .replace("'-inf'::DOUBLE", "double('-Infinity')")
        .replace("::BIGINT", "")
        .replace("::DOUBLE", "D")
        .replace("TIMESTAMP '", "TIMESTAMP'")
        .replace("DATE '", "DATE'")
    )


def test_adversarial_digest_agreement(spark):
    sdf = _spark_adversarial(spark)
    sn, s1, s2 = spark_digest(sdf)
    con = duckdb.connect()
    try:
        dn, d1, d2 = duck_digest(con, ADVERSARIAL_SQL)
    finally:
        con.close()
    assert sn == dn == 9
    assert (s1, s2) == (d1, d2)


def test_digest_catches_value_corruption(spark):
    sdf = _spark_adversarial(spark)
    _, s1, s2 = spark_digest(sdf)
    con = duckdb.connect()
    try:
        _, d1, d2 = duck_digest(
            con, ADVERSARIAL_SQL.replace("'beta'", "'beta2'")
        )
        _, e1, e2 = duck_digest(
            con, ADVERSARIAL_SQL.replace("-0.0::DOUBLE", "0.0::DOUBLE")
        )
    finally:
        con.close()
    assert (s1, s2) != (d1, d2), "string corruption must flip the digest"
    assert (s1, s2) != (e1, e2), "-0.0 vs +0.0 must flip the digest"


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "j12_asof_join", "f19_event_segmentation",
     "mm01_binary_metadata", "w04_lag_ladder"],
)
def test_hash_compare_matches_exact_gate(spark, sf_dir, name):
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    run_hash_compare(spark, sf_dir, name, qs[name], oracles[name])
