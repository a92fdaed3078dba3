"""Delta-format interop (sources/delta_compat.py, round 14).

The contract under test is the public Delta transaction-log protocol:
tables this engine writes must be replayable by an INDEPENDENT engine
from nothing but the parquet files and the _delta_log JSON. DuckDB
plays the foreign engine here (same role delta-rs / Trino would play
in production): the tests replay the log with plain json (no engine
code) to derive the live file set, then have DuckDB read those files
and match the Spark-side result.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from equity_volatility_lakehouse_platform_spark.sources.acid import AcidTable
from equity_volatility_lakehouse_platform_spark.sources.delta_compat import (
    DeltaCompatTable,
    DeltaFormatError,
)
from equity_volatility_lakehouse_platform_spark.sources.readers import load_table


def _foreign_live_files(root: str) -> list[str]:
    """Replay _delta_log with NOTHING but json — what delta-rs does."""
    log_dir = os.path.join(root, "_delta_log")
    versions = sorted(
        int(f[:20])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and f[:20].isdigit()
    )
    live: set[str] = set()
    for v in versions:
        with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    live.add(action["add"]["path"])
                elif "remove" in action:
                    live.discard(action["remove"]["path"])
    return sorted(os.path.join(root, p) for p in live)


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


@pytest.fixture()
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_write_read_roundtrip_and_time_travel(spark, nation, tmp_path):
    table = DeltaCompatTable(spark, str(tmp_path / "delta"))
    v0 = table.write(nation.filter(F.col("n_regionkey") == 0))
    v1 = table.write(
        nation.filter(F.col("n_regionkey") == 1), mode="append"
    )
    assert (v0, v1) == (0, 1)
    expect = nation.filter(F.col("n_regionkey") <= 1)
    assert _rows(table.read(), "n_nationkey") == _rows(expect, "n_nationkey")
    assert _rows(table.read(version=0), "n_nationkey") == _rows(
        nation.filter(F.col("n_regionkey") == 0), "n_nationkey"
    )
    # overwrite removes the old files logically but keeps v0/v1 readable
    table.write(nation.filter(F.col("n_regionkey") == 2))
    assert _rows(table.read(), "n_nationkey") == _rows(
        nation.filter(F.col("n_regionkey") == 2), "n_nationkey"
    )
    assert _rows(table.read(version=1), "n_nationkey") == _rows(
        expect, "n_nationkey"
    )
    ops = [h["operation"] for h in table.history()]
    assert ops == ["WRITE", "WRITE", "WRITE"]


def test_foreign_engine_reads_the_log(spark, nation, tmp_path):
    """DuckDB over the json-replayed live file set == the Spark read —
    on a table whose log contains real remove actions."""
    root = str(tmp_path / "delta")
    table = DeltaCompatTable(spark, root)
    table.write(nation)
    table.write(nation.filter(F.col("n_regionkey") != 3))  # removes
    files = _foreign_live_files(root)
    assert files == table.live_files()
    got = duckdb.sql(
        f"SELECT n_nationkey, n_name FROM read_parquet({files!r}) "
        "ORDER BY n_nationkey"
    ).fetchall()
    want = [
        (r.n_nationkey, r.n_name)
        for r in table.read()
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
        .collect()
    ]
    assert got == want


def test_version0_carries_protocol_and_metadata(spark, nation, tmp_path):
    root = str(tmp_path / "delta")
    DeltaCompatTable(spark, root).write(nation)
    with open(os.path.join(root, "_delta_log", "0" * 20 + ".json")) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert "protocol" in kinds and "metaData" in kinds
    meta = next(a for a in actions if "metaData" in a)["metaData"]
    assert json.loads(meta["schemaString"])["type"] == "struct"
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and all(not a["path"].startswith("/") for a in adds)
    assert all(
        json.loads(a["stats"])["numRecords"] >= 0 for a in adds
    )


def test_partitioned_write_hive_layout_and_values(spark, nation, tmp_path):
    root = str(tmp_path / "delta")
    table = DeltaCompatTable(spark, root)
    table.write(nation, partition_by=["n_regionkey"])
    live, meta, _txns = table._replay(0)
    assert meta["partitionColumns"] == ["n_regionkey"]
    assert all(
        set(add["partitionValues"]) == {"n_regionkey"}
        and add["path"].startswith("n_regionkey=")
        for add in live.values()
    )
    assert _rows(table.read(), "n_nationkey") == _rows(
        nation, "n_nationkey"
    )
    # partition columns come back with their declared type
    assert dict(table.read().dtypes)["n_regionkey"] == dict(nation.dtypes)[
        "n_regionkey"
    ]


def test_partitioned_read_fallback_without_hive_paths(spark, nation, tmp_path):
    """A foreign table whose file paths do NOT encode the partition
    values (allowed by the spec) must still read correctly via the
    grouped-literal fallback."""
    root = str(tmp_path / "delta")
    table = DeltaCompatTable(spark, root)
    table.write(nation, partition_by=["n_regionkey"])
    live, _meta, _txns = table._replay(0)
    # flatten: move every file to the root, rewrite the log's add paths
    log = os.path.join(root, "_delta_log", "0" * 20 + ".json")
    with open(log) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    for action in actions:
        if "add" in action:
            old = action["add"]["path"]
            flat = old.replace("/", "__")
            os.rename(os.path.join(root, old), os.path.join(root, flat))
            action["add"]["path"] = flat
    os.unlink(log)
    with open(log, "w") as fh:
        for action in actions:
            fh.write(json.dumps(action) + "\n")
    assert _rows(table.read(), "n_nationkey") == _rows(nation, "n_nationkey")


def test_export_acid_preserves_every_version(spark, nation, tmp_path):
    acid = AcidTable(spark, str(tmp_path / "acid"))
    acid.overwrite(nation.filter(F.col("n_regionkey") <= 2))
    acid.append(nation.filter(F.col("n_regionkey") == 3))
    acid.delete_where(F.col("n_regionkey") == 1)  # remove+add (COW)
    acid.compact()  # pure file-layout change, same rows
    delta = DeltaCompatTable(spark, str(tmp_path / "delta"))
    top = delta.export_acid(acid)
    assert top == acid.latest_version() == delta.latest_version()
    for v in range(top + 1):
        assert _rows(delta.read(version=v), "n_nationkey") == _rows(
            acid.read(version=v), "n_nationkey"
        ), f"version {v} diverged"
    # the exported files are hard links, not copies
    live = delta.live_files()
    assert live and all(os.stat(p).st_nlink >= 2 for p in live)
    # and a foreign json replay agrees with the engine's own live set
    assert _foreign_live_files(str(tmp_path / "delta")) == live


def test_checkpoint_replay_equivalence(spark, nation, tmp_path):
    root = str(tmp_path / "delta")
    table = DeltaCompatTable(spark, root)
    table.write(nation.filter(F.col("n_regionkey") == 0))
    for rk in (1, 2, 3):
        table.write(
            nation.filter(F.col("n_regionkey") == rk), mode="append"
        )
    table.write(nation.filter(F.col("n_regionkey") != 4))  # removes
    cp = table.checkpoint()
    assert cp == table.latest_version()
    table.write(nation.filter(F.col("n_regionkey") == 4), mode="append")
    want = _rows(nation, "n_nationkey")
    assert _rows(table.read(), "n_nationkey") == want
    # prove the checkpoint is actually used: corrupt every pre-checkpoint
    # json — a replay that still touched them would now fail loudly
    log_dir = os.path.join(root, "_delta_log")
    for v in range(cp + 1):
        path = os.path.join(log_dir, f"{v:020d}.json")
        with open(path, "w") as fh:
            fh.write("{not json\n")
    assert _rows(table.read(), "n_nationkey") == want
    pointer = json.load(open(os.path.join(log_dir, "_last_checkpoint")))
    assert pointer["version"] == cp


def test_fail_loud_on_gaps_and_foreign_features(spark, nation, tmp_path):
    root = str(tmp_path / "delta")
    table = DeltaCompatTable(spark, root)
    table.write(nation)
    table.write(nation, mode="append")
    # a gap in the log must refuse, not silently skip
    os.unlink(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(DeltaFormatError, match="non-contiguous"):
        table.read()
    # a reader-v3 table (deletion vectors etc.) must refuse
    root2 = str(tmp_path / "delta2")
    t2 = DeltaCompatTable(spark, root2)
    t2._commit(
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
            t2._meta_action(nation.schema, []),
        ],
    )
    with pytest.raises(DeltaFormatError, match="reader version"):
        t2.read()
    # export refuses a non-empty target
    acid = AcidTable(spark, str(tmp_path / "acid"))
    acid.overwrite(nation)
    with pytest.raises(DeltaFormatError, match="not empty"):
        t2.export_acid(acid)


def test_append_schema_evolution_refreshes_metadata(spark, nation, tmp_path):
    table = DeltaCompatTable(spark, str(tmp_path / "delta"))
    table.write(nation.select("n_nationkey", "n_name"))
    widened = nation.select(
        "n_nationkey", "n_name", F.col("n_regionkey").alias("rk")
    )
    table.write(widened, mode="append")
    out = table.read()
    assert [f.name for f in out.schema.fields] == [
        "n_nationkey",
        "n_name",
        "rk",
    ]
    # old files lack rk -> nulls there, values in the new files
    n_old = nation.count()
    got = out.groupBy(F.col("rk").isNull().alias("missing")).count()
    assert {(r.missing, r["count"]) for r in got.collect()} == {
        (True, n_old),
        (False, n_old),
    }


def test_txn_watermark_idempotence_and_checkpoint_survival(
    spark, nation, tmp_path
):
    table = DeltaCompatTable(spark, str(tmp_path / "delta"))
    part0 = nation.filter(F.col("n_regionkey") == 0)
    part1 = nation.filter(F.col("n_regionkey") == 1)
    assert table.append_txn(part0, "app", 0) == 0
    # the foreachBatch retry race: same (app, version) is a no-op
    assert table.append_txn(part0, "app", 0) is None
    assert table.append_txn(part1, "app", 1) == 1
    assert table.txn_version("app") == 1
    assert table.txn_version("other") is None
    want = _rows(nation.filter(F.col("n_regionkey") <= 1), "n_nationkey")
    assert _rows(table.read(), "n_nationkey") == want
    # the watermark survives a checkpoint: corrupt every pre-checkpoint
    # json — a replay that still needed them would fail loudly
    cp = table.checkpoint()
    log_dir = os.path.join(str(tmp_path / "delta"), "_delta_log")
    for v in range(cp + 1):
        with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as fh:
            fh.write("{not json\n")
    assert table.txn_version("app") == 1
    assert table.append_txn(part1, "app", 1) is None
    assert table.append_txn(part1, "app", 2) == cp + 1


def test_vacuum_version_retention(spark, nation, tmp_path):
    root = str(tmp_path / "delta")
    table = DeltaCompatTable(spark, root)
    table.write(nation.filter(F.col("n_regionkey") <= 1))
    table.write(nation.filter(F.col("n_regionkey") == 2))  # overwrite
    v0_files = {os.path.relpath(p, root) for p in table.live_files(0)}
    deleted = set(table.vacuum(retain_last=1))
    assert deleted == v0_files  # v0's files are referenced nowhere live
    want = _rows(nation.filter(F.col("n_regionkey") == 2), "n_nationkey")
    assert _rows(table.read(), "n_nationkey") == want  # current unharmed
    with pytest.raises(Exception):
        table.read(version=0).collect()  # expired snapshot fails loudly


def test_commit_race_exactly_one_winner(spark, nation, tmp_path):
    """The spec's required mutual exclusion on version creation:
    concurrent committers of the SAME version — exactly one link(2)
    wins, every loser raises, the log holds one intact entry."""
    from concurrent.futures import ThreadPoolExecutor

    table = DeltaCompatTable(spark, str(tmp_path / "delta"))
    table.write(nation)
    actions = [{"commitInfo": {"operation": "RACE"}}]

    def _try(i: int) -> bool:
        try:
            table._commit(1, actions)
            return True
        except DeltaFormatError:
            return False

    with ThreadPoolExecutor(max_workers=8) as pool:
        wins = list(pool.map(_try, range(8)))
    assert sum(wins) == 1
    log = os.path.join(str(tmp_path / "delta"), "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json")) as fh:
        assert [json.loads(line) for line in fh if line.strip()] == actions
    # no torn temp files left behind
    assert not [f for f in os.listdir(log) if ".tmp-" in f]
