#!/usr/bin/env python
"""Round-8 streaming sweep: sessionize throughput and state growth.

Stages sf0.1 events replicated Nx (user_id offset per copy, so state
KEYS scale with the corpus — 1,500 active users at 1x, 45,000 at 30x;
timestamps untouched so the event-time span and watermark behavior
stay fixed) as parquet into a temp dir, then drives the full
stateful pipeline — file source -> withWatermark ->
applyInPandasWithState sessionize -> memory sink — with
``availableNow`` in multi-file micro-batches.

Observables per scale: wall, input rows/s, closed sessions, and the
state store's peak row count from the progress telemetry (the number
that must stay O(active keys) on an unbounded run).

Usage: python tools/stream_sweep_r8.py [scales...]   (default 1 10 30)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402
from exporter_spark.streaming import stream as ss  # noqa: E402


def main():
    scales = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark("stream-sweep-r8")
    events = load_table(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), "events"
    ).select("user_id", "ts", "value")

    for scale in scales:
        parts = [events]
        for i in range(1, scale):
            parts.append(
                events.select(
                    (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
                    "ts",
                    "value",
                )
            )
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        n_rows = d.count()

        stage = tempfile.mkdtemp(prefix="stream_sweep_in_")
        ckpt = tempfile.mkdtemp(prefix="stream_sweep_ck_")
        try:
            # 8 staged files -> multiple micro-batches under
            # maxFilesPerTrigger=2, so cross-batch state handoff is
            # actually exercised, not just one giant batch
            d.repartition(8).write.mode("overwrite").parquet(stage)
            src = ss.stream_from_files(
                spark, stage, "parquet",
                schema=d.schema, maxFilesPerTrigger=2,
            )
            sess = ss.sessionize(src)
            t0 = time.perf_counter()
            q = (
                sess.writeStream.format("memory")
                .queryName(f"sweep_{scale}x")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            state_rows = 0
            for p in q.recentProgress:
                for op in p.get("stateOperators") or []:
                    state_rows = max(state_rows, op.get("numRowsTotal", 0))
            closed = spark.sql(f"SELECT count(*) FROM sweep_{scale}x").first()[0]
            print(
                f"{scale}x | rows={n_rows} keys={1500 * scale} | "
                f"wall={wall:.2f}s ({n_rows / wall / 1000:.0f}k rows/s) | "
                f"sessions={closed} | peak_state_rows={state_rows}",
                flush=True,
            )
        finally:
            shutil.rmtree(stage, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
