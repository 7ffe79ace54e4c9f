#!/usr/bin/env python
"""Execute DEPLOY.md's ten-minute cluster smoke checklist against
``local-cluster[2,2,1024]`` — Spark's multi-JVM local cluster.

Unlike ``local[N]`` (one JVM, executor threads), local-cluster runs a
real Master/Worker pair and SEPARATE executor JVM processes, so it
exercises the three mechanisms whose failure surfaces are
cluster-only (DEPLOY.md §1-§3):

  1. ADD JAR distribution — the JVM kernels must be class-resolved by
     executor JVMs that did NOT compile them;
  2. reliable-checkpoint connected components — checkpoint files must
     be written/read across processes through a shared filesystem
     path (here the local FS plays the HDFS/NFS role);
  3. fsio / formatter sinks through the Hadoop FS API — part writes,
     the single-part splice (rename semantics), and read-back, with
     tasks running in non-driver JVMs.

The one thing this still cannot exercise is a REMOTE machine (object
stores, cross-host credentials); DEPLOY.md keeps those as first-run
checks.

Usage: python tools/cluster_smoke.py [sf_dir]   (default sf0.001)
Prints one SMOKE line per check; exit 1 on any failure.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_cluster_spark():
    """A session on the multi-JVM local cluster. Built through
    session.get_spark so every engine default (AQE, Arrow, timezone,
    nanos handling, PYTHONPATH injection) matches what the operators
    assume. get_spark sets PYTHONPATH in the driver environment
    BEFORE the JVM starts; local-cluster's in-process Master/Worker
    spawn executor JVMs from that same environment, so their Python
    workers inherit it (a REAL cluster has no such inheritance — ship
    the package with --py-files, DEPLOY.md 'Shipping the package')."""
    from exporter_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    return get_spark(
        "cluster-smoke", master="local-cluster[2,2,1024]",
        shuffle_partitions=4,
    )


def smoke_jar_distribution(spark, sf_dir: str) -> bool:
    """DEPLOY.md §1: the kernels compile on the driver and ship via
    ADD JAR; executors must resolve the class AND produce fingerprints
    identical to the pandas kernel."""
    from exporter_spark.operators import dedup
    from exporter_spark.sources.files import load_table

    d = load_table(spark, sf_dir, "documents")
    jv = {
        tuple(r)
        for r in dedup.simhash_near_dup_pairs(
            d, "doc_id", "text", kernel="java"
        ).collect()
    }
    pd_ = {
        tuple(r)
        for r in dedup.simhash_near_dup_pairs(
            d, "doc_id", "text", kernel="pandas"
        ).collect()
    }
    ok = jv == pd_ and len(jv) > 0
    print(
        f"SMOKE jar-distribution: java={len(jv)} pandas={len(pd_)} pairs,"
        f" symdiff={len(jv ^ pd_)} -> {'OK' if ok else 'FAIL'}"
    )
    return ok


def smoke_reliable_checkpoint(spark, ckpt_dir: str) -> bool:
    """DEPLOY.md §2: reliable-checkpoint CC over a path shared by the
    driver and both executor JVMs."""
    from exporter_spark.operators import dedup
    from exporter_spark.operators.partitioning import cache_scope

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 2000, 2)] + [(1, 2)],
        "a_id long, b_id long",
    )
    with cache_scope(blocking=True):
        # small_edge_limit=None: this smoke exists to exercise the
        # DISTRIBUTED loop's reliable cross-process checkpoint IO —
        # the r10 driver fast path would short-circuit it
        labels = dedup.connected_components(
            pairs, checkpoint_dir=ckpt_dir, small_edge_limit=None
        )
        n_nodes = labels.count()
        n_comp = labels.select("component").distinct().count()
    ok = n_nodes == 2000 and n_comp == 999
    print(
        f"SMOKE reliable-checkpoint-cc: nodes={n_nodes} (want 2000)"
        f" components={n_comp} (want 999) -> {'OK' if ok else 'FAIL'}"
    )

    # r10 driver union-find path: the Arrow edge collect crosses REAL
    # process boundaries here (executor JVMs -> driver), and its
    # labels must match the distributed loop's exactly
    stats: dict = {}
    with cache_scope(blocking=True):
        fast = {
            (r["id"], r["component"])
            for r in dedup.connected_components(pairs, stats=stats).collect()
        }
        slow = {
            (r["id"], r["component"])
            for r in dedup.connected_components(
                pairs, small_edge_limit=None
            ).collect()
        }
    ok2 = fast == slow and stats.get("mode") == "driver"
    print(
        f"SMOKE driver-unionfind-cc: mode={stats.get('mode')}"
        f" n_edges={stats.get('n_edges')} labels_match={fast == slow}"
        f" -> {'OK' if ok2 else 'FAIL'}"
    )
    return ok and ok2


def smoke_fsio_sinks(spark, sf_dir: str, out_root: str) -> bool:
    """DEPLOY.md §3: the three distinct sink IO paths through the
    Hadoop FS API with tasks on non-driver JVMs — part write,
    single-part splice, read-back."""
    from exporter_spark import Exporter, ExportSpec
    from exporter_spark.formatters.xml import XMLFormatter
    from exporter_spark.sources.files import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(5000)
    n = li.count()
    Exporter(li, "csv", ExportSpec()).write(f"{out_root}/csv")
    back = (
        spark.read.option("header", "true").csv(f"{out_root}/csv").count()
    )
    one_xml = f"{out_root}/one.xml"
    XMLFormatter(ExportSpec()).write_single_part(li, one_xml)
    xml_ok = os.path.isfile(one_xml) and os.path.getsize(one_xml) > 0
    ok = back == n and xml_ok
    print(
        f"SMOKE fsio-sinks: csv read-back {back}/{n} rows,"
        f" xml splice file={'present' if xml_ok else 'MISSING'}"
        f" -> {'OK' if ok else 'FAIL'}"
    )
    return ok


def smoke_streaming_incremental(spark, work: str) -> bool:
    """Round-12 check: the streaming incremental near-dup face across
    separate executor JVMs — foreachBatch store appends, the parameter
    manifest, the broadcast-delta store probe, compaction, the
    fresh-checkpoint idempotent replay, and the compaction resume
    guard's refusal (all driver/executor-boundary mechanisms)."""
    import time as _t

    from exporter_spark.operators.incremental import read_store_params
    from exporter_spark.streaming import stream as ss

    root = os.path.join(work, "streaminc")
    src = f"{root}/src"
    for rows in ([(1, "alpha" * 8), (2, "beta" * 8)],
                 [(10, "alpha" * 8), (11, "gamma" * 8)]):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1) \
            .write.mode("append").parquet(src)
        _t.sleep(0.6)

    def feed(store, out, ck, **kw):
        stream = ss.stream_from_files(
            spark, src, "parquet", schema="doc_id long, text string", **kw,
        )
        q = ss.streaming_incremental_minhash_dedup(
            stream, "doc_id", "text",
            store_path=store, output_path=out, checkpoint=ck, threshold=0.5,
        )
        q.processAllAvailable()
        q.stop()

    feed(f"{root}/store", f"{root}/out", f"{root}/ck", maxFilesPerTrigger=1)
    got = sorted(
        r[0]
        for r in spark.read.parquet(f"{root}/out").select("doc_id").collect()
    )
    manifest_ok = read_store_params(f"{root}/store", spark) is not None
    ss.compact_increment_store(spark, f"{root}/store", f"{root}/store2")
    feed(f"{root}/store2", f"{root}/out2", f"{root}/ck2")
    n_replay = spark.read.parquet(f"{root}/out2").count()
    refused = False
    try:
        feed(f"{root}/store2", f"{root}/out", f"{root}/ck")
    except RuntimeError as ex:
        refused = "refusing to resume" in str(ex)
    ok = got == [1, 2, 11] and manifest_ok and n_replay == 0 and refused
    print(
        f"SMOKE streaming-incremental: survivors={got} (want [1, 2, 11]),"
        f" manifest={'present' if manifest_ok else 'MISSING'},"
        f" compacted-replay={n_replay} (want 0),"
        f" unsafe-resume={'refused' if refused else 'NOT REFUSED'}"
        f" -> {'OK' if ok else 'FAIL'}"
    )
    return ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="exporter_spark_cluster_smoke_")
    spark = get_cluster_spark()
    # executors register asynchronously — force a job and poll, then
    # fail fast if the cluster did not actually spawn separate
    # executor JVMs (the whole point of the smoke)
    import time

    spark.range(0, 1000, 1, 4).count()
    tracker = spark.sparkContext._jsc.sc().statusTracker()  # noqa: SLF001
    deadline = time.monotonic() + 60
    n_exec = 0
    while time.monotonic() < deadline:
        n_exec = len(tracker.getExecutorInfos())
        if n_exec >= 3:
            break
        time.sleep(1)
    print(f"SMOKE cluster: {n_exec} executor infos (driver + 2 workers)")
    if n_exec < 3:
        print("SMOKE cluster: FAIL — no separate executor JVMs")
        return 1
    try:
        results = [
            smoke_jar_distribution(spark, sf_dir),
            smoke_reliable_checkpoint(spark, f"{work}/ckpt"),
            smoke_fsio_sinks(spark, sf_dir, f"{work}/out"),
            smoke_streaming_incremental(spark, work),
        ]
        return 0 if all(results) else 1
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
