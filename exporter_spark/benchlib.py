"""Shared measurement primitives for bench.py and the tools/ probes.

The BASELINE.md drift-adjudication protocol depends on every canary
reading being comparable with every BENCH record ever taken — the
workloads therefore live HERE, in one place, imported by bench.py,
tools/canary_probe.py and the A/B harnesses. Changing either canary
invalidates the recorded band: bump the note in BASELINE.md if you do.
"""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import functions as F


def timed(fn, n: int = 3) -> float:
    """min-of-n wall seconds — the repo's standard on this shared host
    (single runs have shown 2-10x outliers; BASELINE.md)."""
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def cpu_canary(spark, n: int = 3) -> float:
    """Fixed pure-CPU JVM aggregate (round 7): cost depends only on
    the machine, never on engine code. Fixed 32 partitions so the
    work is identical regardless of $SPARK_GRAFT_CPUS."""
    return timed(
        lambda: spark.range(0, 400_000_000, 1, 32)
        .select(F.sum(F.col("id") % 7))
        .collect(),
        n,
    )


def shuffle_totals(spark) -> tuple[int, int]:
    """(shuffle_write_bytes, shuffle_read_bytes) summed over every
    stage this application has run, from the JVM AppStatusStore —
    deltas taken around a SERIALLY-executed job give that job's real
    shuffle traffic (round 10: the runtime complement of the
    scan-audit plan pins; see tools/shuffle_audit_r10.py). Concurrent
    jobs in the same session would fold into the delta — callers must
    not submit anything else between the two readings.

    The store is fed ASYNCHRONOUSLY by the listener bus, so a
    previous job's stage metrics can post during a caller's
    before/after window (seen as a one-off nonzero delta on a
    zero-shuffle entry in the full pytest session, where hundreds of
    jobs precede the reading). The bus is drained first so both
    readings see a settled store."""
    jsc = spark.sparkContext._jsc.sc()  # noqa: SLF001
    try:
        jsc.listenerBus().waitUntilEmpty()
    except Exception:  # noqa: BLE001 — drain is best-effort hygiene
        pass
    store = jsc.statusStore()
    jvm = spark._jvm  # noqa: SLF001
    # Spark 4's AppStatusStore.stageList takes (statuses, details,
    # withSummaries, quantiles, taskStatus); empty statuses = all.
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        getattr(store, "stageList$default$4")(),
        jvm.java.util.ArrayList(),
    )
    w = r = 0
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        w += s.shuffleWriteBytes()
        r += s.shuffleReadBytes()
    return w, r


def spill_totals(spark) -> tuple[int, int]:
    """(memory_bytes_spilled, disk_bytes_spilled) summed over every
    stage this application has run — same AppStatusStore/deltas
    contract as ``shuffle_totals`` (round 10). A nonzero DISK figure
    means some task's working set outgrew its execution-memory share
    and paid a serialize-to-disk round-trip: at sf0.1 the whole
    corpus should run spill-free, so bench.py carries the app total
    as a tripwire; the sweeps use deltas for attribution when a
    scale point bends (the winnow 100x GC bend would have shown here
    first had it spilled instead of stalling in GC)."""
    jsc = spark.sparkContext._jsc.sc()  # noqa: SLF001
    try:
        jsc.listenerBus().waitUntilEmpty()
    except Exception:  # noqa: BLE001 — drain is best-effort hygiene
        pass
    store = jsc.statusStore()
    jvm = spark._jvm  # noqa: SLF001
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        getattr(store, "stageList$default$4")(),
        jvm.java.util.ArrayList(),
    )
    mem = disk = 0
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        mem += s.memoryBytesSpilled()
        disk += s.diskBytesSpilled()
    return mem, disk


def io_canary(spark, n: int = 3) -> float:
    """Fixed ~100 MB parquet write+read through the same temp
    filesystem the export entries use (round 8): the disk-path
    denominator the CPU canary cannot see."""

    def _probe():
        d = tempfile.mkdtemp(prefix="exporter_spark_iocanary_")
        try:
            p = f"{d}/t"
            spark.range(0, 12_500_000, 1, 32).withColumn(
                "pad", F.col("id") % 997
            ).write.mode("overwrite").parquet(p)
            spark.read.parquet(p).select(F.sum("pad")).collect()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    return timed(_probe, n)
