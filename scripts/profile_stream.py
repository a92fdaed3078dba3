"""Phase breakdown of the streaming bench cells (guide §1: measure first).

For each cell, times the phases a wall-clock bench cannot separate:
  * build+setup — temp dirs, schema probe, source prep, plan build
  * stream      — query.start() .. awaitTermination() (micro-batch machinery)
  * snapshot    — localCheckpoint detach of the memory-sink table
  * post        — the downstream batch aggregation (noop sink)

Usage: python scripts/profile_stream.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from equity_volatility_lakehouse_platform_spark.session import get_spark  # noqa: E402
from equity_volatility_lakehouse_platform_spark.plans import (  # noqa: E402
    all_queries,
    load_all,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [
        "st14_stream_stream_left_join",
        "st16_stream_stream_full_join",
        "st17_stateful_timeout_sessions",
        "st21_stream_cdc_apply",
    ]
    load_all()
    queries = all_queries()
    spark = get_spark(app_name="evlp-stream-profile")

    # Monkey-patch the scoped runner to time its phases.
    import equity_volatility_lakehouse_platform_spark.streaming.events_stream as es

    phases: dict[str, float] = {}
    orig_scoped = es._run_stream_scoped

    def timed_scoped(spark, sf_dir, build, prefix, output_mode, **kw):
        import shutil
        import tempfile
        import uuid

        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        path = os.path.join(sf_dir, "events.parquet")
        t0 = time.perf_counter()
        if es._nano_ts_columns(path):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        batch_schema = spark.read.parquet(path).schema
        tmp_root = tempfile.mkdtemp(prefix=prefix)
        src_dir = os.path.join(tmp_root, "src")
        os.makedirs(src_dir)
        n_copies = kw.get("n_copies", 1)
        for i in range(n_copies):
            os.symlink(path, os.path.join(src_dir, f"events_{i}.parquet"))

        def _make_stream():
            s = spark.readStream.schema(batch_schema).parquet(src_dir)
            if isinstance(batch_schema["ts"].dataType, T.LongType):
                s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif isinstance(batch_schema["ts"].dataType, T.TimestampNTZType):
                s = s.withColumn("ts", F.col("ts").cast("timestamp"))
            return s

        import inspect

        n_params = len(inspect.signature(build).parameters)
        built = build(_make_stream()) if n_params == 1 else build(
            _make_stream(), _make_stream
        )
        name = f"{prefix}{uuid.uuid4().hex[:8]}"
        # Mirror the engine's own sizing policy exactly (incl. the
        # per-operator min_stores floor) so the profile measures the
        # state-store layout production actually runs.
        n_state = es._n_state_partitions(
            es._input_bytes(path),
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            kw.get("bytes_per_store", 16 << 20),
            kw.get("min_stores", 8),
        )
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_state))
        phases["setup"] = time.perf_counter() - t0
        try:
            t1 = time.perf_counter()
            query = (
                built.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", os.path.join(tmp_root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            query.awaitTermination()
            phases["stream"] = time.perf_counter() - t1
            try:
                rp = query.recentProgress
                phases["batches"] = [
                    {
                        "batchId": p["batchId"],
                        "dur_ms": p.get("batchDuration"),
                        "rows": p.get("numInputRows"),
                        "durationMs": p.get("durationMs"),
                        "stateOperators": [
                            {
                                k: so.get(k)
                                for k in (
                                    "operatorName",
                                    "commitTimeMs",
                                    "allUpdatesTimeMs",
                                    "allRemovalsTimeMs",
                                    "numShufflePartitions",
                                    "numRowsTotal",
                                )
                            }
                            for so in p.get("stateOperators", [])
                        ],
                    }
                    for p in [json.loads(x.json) for x in rp]
                ]
            except Exception as exc:  # noqa: BLE001
                phases["batches"] = str(exc)
            t2 = time.perf_counter()
            out = spark.table(name).localCheckpoint(eager=True)
            phases["snapshot"] = time.perf_counter() - t2
            return out
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            spark.catalog.dropTempView(name)
            shutil.rmtree(tmp_root, ignore_errors=True)

    es._run_stream_scoped = timed_scoped

    results = {}
    for name in names:
        fn = queries[name]
        for run in range(2):  # warm + measured
            phases.clear()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t_post = time.perf_counter() - t1
            rec = dict(phases)
            rec["build_total"] = round(t_build, 3)
            rec["post_noop"] = round(t_post, 3)
            rec["wall"] = round(t_build + t_post, 3)
            for k in ("setup", "stream", "snapshot"):
                if k in rec:
                    rec[k] = round(rec[k], 3)
        results[name] = rec
        print(name, json.dumps(rec)[:400])

    with open("/tmp/stream_profile.json", "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
