#!/usr/bin/env python
"""Round-10 key-skew sweep — the scale axis the per-pillar curves
(SCALE.md rounds 8-10) never exercised: every prior sweep grows the
corpus UNIFORMLY, but the 100 TB failure mode the session config
carries mitigations for (AQE skew-join splitting, `skew.salted_join`)
is a HOT KEY, and none of those mitigations had a measured number.

Two workloads, both derived from sf0.1 ``lineitem`` replicated REPx
(deterministic re-key; no synthesis beyond the testdata tables):

* **Skewed aggregation** — groupBy(key).sum over a key column where
  ~30% of all rows share ONE key (the rest uniform over 1M keys),
  vs the same rows with a uniform key. Claim under test: hash
  aggregation with map-side partial aggregation makes a hot GROUP
  key harmless — the hot key's rows collapse to one partial row per
  map task before the shuffle, so the skewed and uniform walls and
  shuffle bytes should be ~equal. (AQE cannot split aggregation
  skew; partial aggregation is the only line of defense, and it is
  exactly the one Catalyst gives for free.)

* **Skewed shuffle join** — fact(REP x 600k rows, same 30%-hot key
  distribution) joined to a 5M-row dim on the key, dim genuinely
  unbroadcastable (runtime AQE broadcast disabled for the join so
  the sweep models the 100 TB big-big case at sf0.1 sizes). Three
  variants, interleaved per the BASELINE.md round-10 JIT protocol
  (A,B,C repeated; per-variant min over late repetitions):

    - ``skew_on``  — session default: AQE skew-join splits the hot
      shuffle partition across tasks. The skew thresholds are
      lowered for the run (8 MB / advisory 4 MB) because the stock
      256 MB trigger is sized for cluster-scale partitions — at
      sf0.1 the hot partition is ~30 MB, i.e. the default would
      (correctly) not bother; at 100 TB it fires on its own. The
      executed plan is grepped for the ``skewed`` AQEShuffleRead
      marker so the record proves the split actually happened.
    - ``skew_off`` — AQE skew splitting disabled: the hot key's
      entire row set lands on ONE sort-merge task (the straggler a
      1000-executor cluster would idle behind).
    - ``salted``   — ``skew.salted_join`` with 32 salt buckets and
      skew splitting off: the manual mitigation, paying dim
      replication x32 for a uniform fact distribution. Expected to
      LOSE to AQE here (5M-row dim x32 is the documented trade-off:
      salting is for when the dim is small or AQE is unavailable).

Raw JSON -> tools/audits/r10_skew_sweep.json; summary -> SCALE.md.
Usage: python tools/skew_sweep_r10.py [REP ...]   (default: 10 30)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from exporter_spark.benchlib import cpu_canary, shuffle_since, stage_marker  # noqa: E402
from exporter_spark.operators.skew import salted_join  # noqa: E402
from exporter_spark.session import get_spark  # noqa: E402
from exporter_spark.sources.files import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_PCT = 30  # percent of fact rows on the single hot key
KEY_SPACE = 1_000_000
DIM_ROWS = 5_000_000
SALT_BUCKETS = 32
ROUNDS = 3  # interleaved repetitions; min over rounds >= 2 is reported

SKEW_CONFS = {
    # stock trigger is 256 MB — sized for cluster partitions; scaled
    # down so the sf0.1 hot partition (~30 MB) is "skewed" the way a
    # multi-GB partition is at 100 TB
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    # model "dim is genuinely unbroadcastable": no runtime broadcast
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def skewed_key(col, replica: int):
    """Deterministic 30%-hot key: per-row coin from xxhash64 decides
    hot-vs-uniform; uniform keys spread over KEY_SPACE. Replica index
    enters the hash so copies don't repeat the same coin sequence."""
    h = F.xxhash64(col, F.lit(replica))
    return F.when(F.pmod(h, F.lit(100)) < HOT_PCT, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(h), F.lit(KEY_SPACE))
    )


def build_fact(spark, rep: int):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    parts = [
        li.select(
            skewed_key(F.col("l_orderkey") * 8 + F.col("l_linenumber"), r).alias("k"),
            F.col("l_extendedprice").alias("v"),
        )
        for r in range(rep)
    ]
    fact = parts[0]
    for p in parts[1:]:
        fact = fact.unionAll(p)
    return fact


def build_uniform_fact(spark, rep: int):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    parts = [
        li.select(
            F.pmod(
                F.xxhash64(F.col("l_orderkey") * 8 + F.col("l_linenumber"), F.lit(r)),
                F.lit(KEY_SPACE),
            ).alias("k"),
            F.col("l_extendedprice").alias("v"),
        )
        for r in range(rep)
    ]
    fact = parts[0]
    for p in parts[1:]:
        fact = fact.unionAll(p)
    return fact


def build_dim(spark):
    return spark.range(0, DIM_ROWS, 1, 32).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("w")
    )


def _stage_ids(spark) -> set[int]:
    jsc = spark.sparkContext._jsc.sc()  # noqa: SLF001
    try:
        jsc.listenerBus().waitUntilEmpty()
    except Exception:  # noqa: BLE001
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
    ids, it = set(), stages.iterator()
    while it.hasNext():
        s = it.next()
        ids.add((s.stageId(), s.attemptId()))
    return ids


def straggler_stats(spark, before_ids: set[int]) -> dict:
    """Task-duration distribution of the heaviest shuffle-READ stage
    run since ``before_ids`` — the join-read stage, where a hot key
    becomes one monster task. max/p50 task seconds is THE straggler
    observable: wall on local[32] hides it (31 idle threads are
    free), a 1000-executor cluster pays it as idle fleet time."""
    jsc = spark.sparkContext._jsc.sc()  # noqa: SLF001
    store = jsc.statusStore()
    jvm = spark._jvm  # noqa: SLF001
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        getattr(store, "stageList$default$4")(),
        jvm.java.util.ArrayList(),
    )
    best, it = None, stages.iterator()
    while it.hasNext():
        s = it.next()
        key = (s.stageId(), s.attemptId())
        if key in before_ids:
            continue
        if best is None or s.shuffleReadBytes() > best.shuffleReadBytes():
            best = s
    if best is None:
        return {}
    gw = spark.sparkContext._gateway  # noqa: SLF001
    q = gw.new_array(gw.jvm.double, 2)
    q[0], q[1] = 0.5, 1.0
    summ = store.taskSummary(best.stageId(), best.attemptId(), q)
    if not summ.isDefined():
        return {}
    dist = summ.get()
    dur = dist.duration()
    rb = dist.shuffleReadMetrics().readBytes()
    # durations on local[32] are contention-confounded (46 concurrent
    # tasks oversubscribe 32 cores); per-task shuffle-read BYTES is
    # the machine-independent imbalance observable
    return {
        "join_read_stage_tasks": best.numCompleteTasks(),
        "task_p50_sec": round(dur.apply(0) / 1000.0, 3),
        "task_max_sec": round(dur.apply(1) / 1000.0, 3),
        "task_p50_read_mb": round(rb.apply(0) / 1e6, 1),
        "task_max_read_mb": round(rb.apply(1) / 1e6, 1),
    }


def run_once(spark, df) -> tuple[float, int, str, dict, list]:
    """(wall_sec, shuffle_write_delta, executed_plan_str, straggler,
    rows) for a 1-row-result collect. Serial execution —
    shuffle_totals contract."""
    ids0 = _stage_ids(spark)
    marker = stage_marker(spark)
    t0 = time.perf_counter()
    rows = df.collect()
    dt = time.perf_counter() - t0
    dw, _ = shuffle_since(spark, marker)
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return round(dt, 3), dw, plan, straggler_stats(spark, ids0), rows


def agg_workload(fact):
    return fact.groupBy("k").agg(F.sum("v").alias("sv")).agg(
        F.count("*").alias("n_keys"), F.sum("sv").alias("total")
    )


def join_workload(fact, dim):
    return (
        fact.join(dim, "k")
        .agg(F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("t"))
    )


def main() -> int:
    reps = [int(a) for a in sys.argv[1:]] or [10, 30]
    spark = get_spark("exporter_spark-skew-sweep")
    out = {
        "sf_dir": SF_DIR,
        "hot_pct": HOT_PCT,
        "dim_rows": DIM_ROWS,
        "salt_buckets": SALT_BUCKETS,
        "cpu_canary_sec": cpu_canary(spark),
        "scales": {},
    }
    for c, v in SKEW_CONFS.items():
        spark.conf.set(c, v)
    try:
        for rep in reps:
            rec = {"fact_rows": rep * 600_572}
            fact = build_fact(spark, rep)
            ufact = build_uniform_fact(spark, rep)
            dim = build_dim(spark)

            # -- aggregation: skewed vs uniform, interleaved ---------
            agg = {"skewed": [], "uniform": []}
            for _ in range(ROUNDS):
                for label, f in (("skewed", fact), ("uniform", ufact)):
                    dt, sw, _, _, _ = run_once(spark, agg_workload(f))
                    agg[label].append((dt, sw))
            rec["agg"] = {
                label: {
                    "wall_sec": min(d for d, _ in runs[1:]),
                    "shuffle_write_bytes": runs[-1][1],
                }
                for label, runs in agg.items()
            }

            # -- join: three variants, interleaved -------------------
            variants = {
                "skew_on": ("true", lambda: join_workload(fact, dim)),
                "skew_off": ("false", lambda: join_workload(fact, dim)),
                "salted": (
                    "false",
                    lambda: salted_join(
                        fact, dim, "k", salt_buckets=SALT_BUCKETS
                    ).agg(
                        F.count("*").alias("n"),
                        F.sum(F.col("v") * F.col("w")).alias("t"),
                    ),
                ),
            }
            join = {k: [] for k in variants}
            answers = {}
            for _ in range(ROUNDS):
                for label, (skew_flag, mk) in variants.items():
                    spark.conf.set(
                        "spark.sql.adaptive.skewJoin.enabled", skew_flag
                    )
                    df = mk()
                    dt, sw, plan, strag, rows = run_once(spark, df)
                    join[label].append((dt, sw, "skewed" in plan, strag))
                    answers[label] = (rows[0]["n"], float(rows[0]["t"]))
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            # row counts exact; the double sum is order-dependent in
            # its last ulps across partitionings, so compare relative
            assert len({n for n, _ in answers.values()}) == 1, (
                f"variant row counts diverge: {answers}"
            )
            ts = [t for _, t in answers.values()]
            assert max(ts) - min(ts) <= 1e-9 * max(abs(t) for t in ts), (
                f"variant sums diverge beyond fp tolerance: {answers}"
            )
            rec["join"] = {
                label: {
                    "wall_sec": min(d for d, _, _, _ in runs[1:]),
                    "shuffle_write_bytes": runs[-1][1],
                    "skew_split_in_plan": runs[-1][2],
                    # straggler profile of the best LATE repetition
                    **min(runs[1:], key=lambda r: r[0])[3],
                }
                for label, runs in join.items()
            }
            rec["join_rows_out"] = answers["skew_on"][0]
            out["scales"][f"{rep}x"] = rec
            print(json.dumps({f"{rep}x": rec}), flush=True)
    finally:
        for c in SKEW_CONFS:
            try:
                spark.conf.unset(c)
            except Exception:  # noqa: BLE001
                pass
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "audits", "r10_skew_sweep.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
