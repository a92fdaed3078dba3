"""Sinks (SURVEY.md §2.1 S7-S12): partitioned lake writes and the
incremental upsert pattern.

The reference writes per-symbol CSVs with skip-if-exists memoization
(my_alpaca.py:198-215), Iceberg CTAS/overwritePartitions (fase_1 cells
9/20), and SQLAlchemy ON CONFLICT DO NOTHING upserts (bars.py:196-198).
Engine equivalents on plain parquet; for TRANSACTIONAL semantics
(atomic MERGE, snapshot isolation, time travel) use
``sources.acid.AcidTable`` — the commit-log table format this module's
append-path helpers predate:

* ``write_partitioned`` — symbol/date-partitioned parquet, snappy;
  idempotent dynamic partition overwrite (S7/S9/S10).
* ``upsert_parquet`` — insert-new-keys-only: anti-join the incoming batch
  against existing keys, append survivors (S12 on-conflict-do-nothing).
* ``incremental_plan`` — per-key max-date fetch planner (S13) feeding the
  upsert.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_SCRATCH_ROOTS: set[str] = set()


def _cleanup_scratch() -> None:
    for root in _SCRATCH_ROOTS:
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_scratch)


def session_scratch(tag: str, sf_dir: str) -> str:
    """Per-(query, sf_dir, process) scratch root for registered queries
    that materialize corpus-sized artifacts (sim12's index tables,
    snk19's staging/prod lake, the snk01-snk08 sink round-trips). Keyed
    by sf_dir and WIPED on entry, so repeated invocations (bare sweeps,
    spot_100x's rebuild-per-timing protocol) reuse one directory instead
    of leaking a fresh mkdtemp copy of the corpus per timed run. The key
    includes the PID so two concurrent processes running the same query
    on the same sf_dir (parallel pytest, a sweep overlapping a spot run)
    never wipe each other's live tables mid-read; every root this
    process created is removed at interpreter exit.

    Placement: ``scratch_base()`` — the fastest available ephemeral
    scratch (round-14, guide §6: these artifacts live and die inside
    one process; the sink queries' wall cost at bench scale was partly
    small-file create/rename latency on the journaling /tmp disk)."""
    from equity_volatility_lakehouse_platform_spark.sources.scratch import (
        scratch_base,
    )

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(
        scratch_base() or tempfile.gettempdir(),
        f"evlp_{tag}_{key}_p{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    _SCRATCH_ROOTS.add(root)
    return root


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned parquet sink with dynamic partition overwrite — only the
    partitions present in ``df`` are replaced (Iceberg overwritePartitions
    semantics, fase_1.ipynb cell 20)."""
    (
        df.write.option("partitionOverwriteMode", "dynamic")
        .option("compression", "snappy")
        .partitionBy(*partition_cols)
        .mode(mode)
        .parquet(path)
    )


def upsert_parquet(
    spark: SparkSession, updates: DataFrame, path: str, keys: list[str]
) -> None:
    """ON CONFLICT DO NOTHING upsert (bars.py:196-198,424-428): append only
    rows whose key is absent. With Delta this is MERGE INTO ... WHEN NOT
    MATCHED INSERT; on parquet we anti-join against existing keys and
    append. The existing side reads only the key columns (column-pruned
    scan), and the anti-join broadcasts whichever side is small."""
    if not os.path.exists(path):
        updates.write.option("compression", "snappy").mode("overwrite").parquet(path)
        return
    existing_keys = spark.read.parquet(path).select(*keys)
    new_rows = updates.join(existing_keys, keys, "left_anti")
    new_rows.write.option("compression", "snappy").mode("append").parquet(path)


def incremental_plan(
    existing: DataFrame, key: str, date_col: str
) -> DataFrame:
    """Per-key resume point: next date to fetch (bars.py:74-137). Keys are
    then bucketed by identical (start, end) ranges for batched fetches
    (bars.py:363-379) — that grouping is a groupBy on the plan itself."""
    return existing.groupBy(key).agg(
        F.max(date_col).alias("last_seen"),
        F.date_add(F.max(date_col), 1).alias("fetch_from"),
    )
