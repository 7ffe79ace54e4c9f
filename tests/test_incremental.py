"""Incremental (delta-vs-store) dedup semantics.

Covers the contracts in operators/incremental.py: store bootstrap,
within-batch + against-store dropping, idempotent replay, equivalence
with the batch operator when increments arrive in order, the
short-doc invariant, and the DOCUMENTED chain-cluster divergence from
a full batch run (greedy-vs-transitive — pinned so the semantics
can't drift silently into either "bug" or "accidental batch
equivalence").
"""

from __future__ import annotations

import hashlib

import pytest

from exporter_spark.operators.dedup import hash_dedup
from exporter_spark.operators.incremental import (
    incremental_exact_dedup,
    incremental_minhash_dedup,
    minhash_signatures,
)
from exporter_spark.sources.files import load_table


@pytest.fixture(autouse=True)
def _scoped_caches():
    """Release every frame the operators materialize() inside each
    test. These tests run the incremental operators over the SAME
    documents table (often with default parameters) as the registry
    entries; a leaked cached fragment is picked up by Spark's
    automatic cache substitution in LATER tests' plans — the round-12
    full suite saw the scan-audit sentinels read extra executed
    FileScans because a leaked signature-frame cache replaced one side
    of minhash_near_dup_pairs' self-join and broke its exchange
    reuse."""
    from exporter_spark.operators.partitioning import cache_scope

    with cache_scope(blocking=True):
        yield


def _ids(df, col="doc_id"):
    return sorted(r[0] for r in df.select(col).collect())


# ------------------------------------------------------------------ exact


def test_incremental_exact_bootstrap_increment_and_idempotence(spark):
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "id long, text string"
    )
    surv1, dig1 = incremental_exact_dedup(b1, ["text"], "id")
    assert _ids(surv1, "id") == [1, 2]  # in-batch dup 3 dropped
    store = dig1

    b2 = spark.createDataFrame(
        # 10: dup of stored "alpha"; 11/12: in-batch dup pair; 13: novel
        [(10, "alpha"), (11, "gamma"), (12, "gamma"), (13, "delta")],
        "id long, text string",
    )
    surv2, dig2 = incremental_exact_dedup(b2, ["text"], "id", store)
    assert _ids(surv2, "id") == [11, 13]
    store = store.unionByName(dig2)

    # idempotence: the same delta against the updated store is empty
    surv3, dig3 = incremental_exact_dedup(b2, ["text"], "id", store)
    assert surv3.count() == 0 and dig3.count() == 0


def test_incremental_exact_matches_batch_on_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    lo = docs.filter("doc_id < 250")
    hi = docs.filter("doc_id >= 250")

    s1, d1 = incremental_exact_dedup(lo, ["text"], "doc_id")
    s2, d2 = incremental_exact_dedup(hi, ["text"], "doc_id", d1)
    got = sorted(_ids(s1) + _ids(s2))

    # increments arrive in doc_id order, so greedy keep-first equals
    # the batch keep-first over the union
    want = _ids(hash_dedup(docs, ["text"], "doc_id"))
    assert got == want


# ---------------------------------------------------------------- near-dup


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.slow
def test_incremental_minhash_star_cluster_and_store_growth(spark):
    base = "the quick brown fox jumps over the lazy dog " * 6  # ~264 chars
    near = base[:-30] + "x" * 30  # same prefix, mutated tail
    b1 = _docs_df(spark, [(1, base), (2, "completely different corpus text " * 8)])
    surv1, sigs1 = incremental_minhash_dedup(b1, "doc_id", "text", threshold=0.5)
    assert _ids(surv1) == [1, 2]
    assert _ids(sigs1) == [1, 2]
    store = sigs1

    b2 = _docs_df(
        spark,
        [
            (10, base),          # exact copy of stored 1 -> lane agreement 1.0
            (11, near),          # near-dup of stored 1
            (12, "novel text that matches nothing at all " * 8),
            (13, "short"),       # below shingle_n: always survives, never stored
        ],
    )
    surv2, sigs2 = incremental_minhash_dedup(
        b2, "doc_id", "text", store, threshold=0.5
    )
    assert _ids(surv2) == [12, 13]
    # the store gains only the long survivor; the short doc has no
    # signature by the module invariant
    assert _ids(sigs2) == [12]

    # replaying the delta against the grown store drops 12 as an exact
    # copy of itself (idempotence on the signature path)
    store = store.unionByName(sigs2)
    surv3, sigs3 = incremental_minhash_dedup(
        b2, "doc_id", "text", store, threshold=0.5
    )
    assert _ids(surv3) == [13] and sigs3.count() == 0


def test_incremental_minhash_in_batch_stage_is_batch_pipeline(spark):
    base = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 5
    b = _docs_df(
        spark,
        [(1, base), (2, base[:-20] + "y" * 20), (3, "unrelated body of text " * 10)],
    )
    surv, sigs = incremental_minhash_dedup(b, "doc_id", "text", threshold=0.5)
    # 1~2 cluster -> min id kept; novel 3 kept
    assert _ids(surv) == [1, 3]
    assert _ids(sigs) == [1, 3]


def test_incremental_minhash_null_id_sig_semantics(spark):
    """The fused keep-representatives anti-join (r17 optimization
    round) must keep the pre-fusion semi-join's NULL-key semantics: a
    NULL-id row survives the batch (anti-join equality never matches a
    loser id) but contributes NO signature row — the previous
    ``rep_sigs ⋉ batch`` semi-join dropped NULL join keys, and the
    fused ``rep_sigs ∖ losers`` shape pins that with an explicit
    isNotNull guard. A drift here would silently append NULL-keyed
    store rows that no later increment's probe could ever match."""
    long_a = "completely original first document body text " * 6
    long_b = "a different second document body of words here " * 6
    b = _docs_df(spark, [(None, long_a), (2, long_b)])
    surv, sigs = incremental_minhash_dedup(b, "doc_id", "text", threshold=0.5)
    surv_ids = [r[0] for r in surv.select("doc_id").collect()]
    assert sorted(x for x in surv_ids if x is not None) == [2]
    assert None in surv_ids and len(surv_ids) == 2
    assert _ids(sigs) == [2]


@pytest.mark.slow
def test_chain_cluster_documented_divergence(spark):
    """A~B and B~C with A!~C, arriving as three increments, keeps
    {A, C}; a batch run over all three keeps {A} via transitive
    clustering. This is the documented greedy semantics — the test
    pins the divergence so neither side drifts silently."""
    # deterministic non-repeating text (md5 chains) so the 8-gram
    # shingle sets are collision-free; realized similarities, checked
    # once and stable forever under the fixed minhash seeds:
    #   true jaccard  ab=0.812 bc=0.821 ac=0.664
    #   lane agree    ab=0.844           ac=0.625
    #   shared bands  ab=4    bc=3      ac=1
    # so at t=0.7: A~B and B~C pass, A-C is PROPOSED via its one
    # shared band but fails the lane-agreement filter — the kept-C
    # outcome exercises the estimate, not a missed candidate.
    def rnd(tag, n):
        out, i = [], 0
        while sum(len(s) for s in out) < n:
            out.append(hashlib.md5(f"{tag}:{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n]

    x = rnd("x", 180)
    a = x + rnd("ta", 20)
    b = x + rnd("tb", 20)
    # C shares B's suffix but mutates the PREFIX, so C is near B (one
    # differing region) and far from A (two differing regions)
    c = rnd("pc", 20) + x[20:] + rnd("tb", 20)
    t = 0.7

    s1, g1 = incremental_minhash_dedup(
        _docs_df(spark, [(1, a)]), "doc_id", "text", threshold=t
    )
    store = g1
    s2, g2 = incremental_minhash_dedup(
        _docs_df(spark, [(2, b)]), "doc_id", "text", store, threshold=t
    )
    assert s2.count() == 0  # B matches stored A
    store = store.unionByName(g2)
    s3, g3 = incremental_minhash_dedup(
        _docs_df(spark, [(3, c)]), "doc_id", "text", store, threshold=t
    )
    assert _ids(s3) == [3]  # C survives: compared against A only

    # the batch run over the same three docs transitively keeps A alone
    from exporter_spark.operators.dedup import (
        dedup_keep_representatives,
        minhash_dedup_pairs,
    )

    all3 = _docs_df(spark, [(1, a), (2, b), (3, c)])
    pairs = minhash_dedup_pairs(all3, "doc_id", "text", threshold=t)
    batch = dedup_keep_representatives(all3, pairs, "doc_id")
    assert _ids(batch) == [1]


def test_signature_store_schema_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    s = minhash_signatures(docs, "doc_id", "text")
    rows = {r["doc_id"]: r["__sig__"] for r in s.collect()}
    again = {r["doc_id"]: r["__sig__"] for r in s.collect()}
    assert rows == again  # fixed-seed signatures are deterministic
    assert all(len(v) == 32 for v in rows.values())


def test_near_dup_replay_idempotence_on_documents(spark, sf_dir):
    """VERDICT r10 item 5, near-dup analog of the exact-path
    idempotence: re-running a batch against the store it just
    appended drops EVERYTHING long enough to have been stored — each
    stage-1 survivor finds its own signature in the store (lane
    agreement 1.0 >= any threshold), and in-batch losers are dropped
    by stage 1 exactly as before. Only short docs (below shingle_n,
    never stored by the module invariant) can survive a replay."""
    docs = load_table(spark, sf_dir, "documents")
    surv1, sigs1 = incremental_minhash_dedup(docs, "doc_id", "text")
    store = sigs1
    surv2, sigs2 = incremental_minhash_dedup(docs, "doc_id", "text", store)
    short = {
        r[0]
        for r in docs.filter("length(text) < 8").select("doc_id").collect()
    }
    assert set(_ids(surv2)) == short
    assert sigs2.count() == 0  # the store gains nothing on a replay


@pytest.mark.slow
def test_two_increment_commutativity_on_disjoint_deltas(spark):
    """Two deltas with NO cross-delta near-duplicates commute: each
    doc's fate depends only on the store bootstrap and its own delta,
    so survivor ids and the final signature store agree as SETS
    regardless of arrival order. (Deltas with cross-delta dups do NOT
    commute — that is the documented chain/greedy semantics pinned
    above — hence the disjointness precondition.)"""

    def rnd(tag, n):
        out, i = [], 0
        while sum(len(s) for s in out) < n:
            out.append(hashlib.md5(f"{tag}:{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n]

    base_a = rnd("base-a", 200)
    base_b = rnd("base-b", 200)
    boot = _docs_df(spark, [(1, base_a), (2, base_b)])
    _, store0 = incremental_minhash_dedup(boot, "doc_id", "text", threshold=0.5)

    # d1: a near-dup of stored A + a novel doc; d2: a near-dup of
    # stored B + a different novel doc. No d1<->d2 similarity.
    d1 = _docs_df(
        spark,
        [(10, base_a[:-24] + rnd("m1", 24)), (11, rnd("novel-1", 200))],
    )
    d2 = _docs_df(
        spark,
        [(20, base_b[:-24] + rnd("m2", 24)), (21, rnd("novel-2", 200))],
    )

    def run(first, second):
        s1, g1 = incremental_minhash_dedup(
            first, "doc_id", "text", store0, threshold=0.5
        )
        s2, g2 = incremental_minhash_dedup(
            second, "doc_id", "text", store0.unionByName(g1), threshold=0.5
        )
        survivors = sorted(_ids(s1) + _ids(s2))
        final_store = sorted(
            _ids(store0.unionByName(g1).unionByName(g2))
        )
        return survivors, final_store

    surv_12, store_12 = run(d1, d2)
    surv_21, store_21 = run(d2, d1)
    assert surv_12 == surv_21 == [11, 21]  # near-dups of the store drop
    assert store_12 == store_21 == [1, 2, 11, 21]


@pytest.mark.slow
def test_broadcast_modes_value_identical_on_documents(spark, sf_dir):
    """broadcast_delta=True (map-side store scan, the default) and
    False (shuffled band/digest joins, the huge-delta escape hatch)
    must be pure physical strategies — value-identical survivors on
    real documents for BOTH operators."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    split = F.expr("doc_id % 2 = 0")
    _, dig_store = incremental_exact_dedup(docs.filter(split), ["text"], "doc_id")
    _, sig_store = incremental_minhash_dedup(docs.filter(split), "doc_id", "text")
    delta = docs.filter(~split)
    for fn, store, kw in (
        (incremental_exact_dedup, dig_store, dict(cols=["text"], order_col="doc_id")),
        (incremental_minhash_dedup, sig_store, dict(text_col="text")),
    ):
        if fn is incremental_exact_dedup:
            a, _ = fn(delta, kw["cols"], kw["order_col"], store, broadcast_delta=True)
            b, _ = fn(delta, kw["cols"], kw["order_col"], store, broadcast_delta=False)
        else:
            a, _ = fn(delta, "doc_id", kw["text_col"], store, broadcast_delta=True)
            b, _ = fn(delta, "doc_id", kw["text_col"], store, broadcast_delta=False)
        assert _ids(a) == _ids(b)


# -------------------------------------------------- store param manifest


def test_store_params_manifest_roundtrip_and_drift(spark, tmp_path):
    """Round 12 (VERDICT r11 #3): the parameter-constancy contract is
    mechanized — a store written under one configuration fails loudly
    when an increment arrives with a drifted one, including the
    bands/shingle_n/family drift the stored arrays cannot reveal."""
    import pytest

    from exporter_spark.operators.incremental import (
        check_store_params,
        ensure_store_params,
        read_store_params,
        store_params_dict,
    )

    store = str(tmp_path / "store")
    assert read_store_params(store, spark) is None
    params = ensure_store_params(
        store, num_hashes=32, bands=8, shingle_n=8, family="md5", spark=spark
    )
    assert params == store_params_dict(
        num_hashes=32, bands=8, shingle_n=8, family="md5"
    )
    # round-trips byte-stably and validates clean
    assert read_store_params(store, spark) == params
    ensure_store_params(
        store, num_hashes=32, bands=8, shingle_n=8, family="md5", spark=spark
    )
    # bands drift — the previously-undetectable one — fails loudly
    with pytest.raises(ValueError, match="parameter drift.*bands"):
        ensure_store_params(
            store, num_hashes=32, bands=4, shingle_n=8, family="md5",
            spark=spark,
        )
    with pytest.raises(ValueError, match="parameter drift"):
        check_store_params(
            params,
            store_params_dict(
                num_hashes=32, bands=8, shingle_n=5, family="md5"
            ),
        )


def test_ensure_store_params_bootstrap_race(spark, tmp_path, monkeypatch):
    """ADVICE r12: two first-contact writers racing with drifting
    parameters must not last-write-wins each other. The bootstrap
    creates exclusively (never overwrite); a loser whose initial read
    saw no manifest re-reads the winner's file and validates against
    it — drift fails loudly on the losing side. Simulated by making
    the loser's FIRST read return None after the winner has written."""
    import pytest

    from exporter_spark.operators import incremental as inc

    store = str(tmp_path / "store")
    # the "winner" bootstraps with family=md5
    inc.ensure_store_params(
        store, num_hashes=32, bands=8, shingle_n=8, family="md5", spark=spark
    )

    real_read = inc.read_store_params
    calls = {"n": 0}

    def racy_read(store_path, spark=None):
        calls["n"] += 1
        if calls["n"] == 1:
            return None  # the loser's pre-write read: manifest not yet seen
        return real_read(store_path, spark)

    monkeypatch.setattr(inc, "read_store_params", racy_read)
    # drifting loser: its exclusive create fails, the re-read sees the
    # winner's manifest, and the drift check fires — no silent bless
    with pytest.raises(ValueError, match="parameter drift.*family"):
        inc.ensure_store_params(
            store, num_hashes=32, bands=8, shingle_n=8, family="xx64",
            spark=spark,
        )
    # agreeing loser: same race, same parameters — proceeds cleanly
    calls["n"] = 0
    got = inc.ensure_store_params(
        store, num_hashes=32, bands=8, shingle_n=8, family="md5", spark=spark
    )
    assert got["family"] == "md5"
    # the winner's file was never overwritten
    monkeypatch.undo()
    assert inc.read_store_params(store, spark)["family"] == "md5"


def test_incremental_minhash_store_params_gate(spark):
    """incremental_minhash_dedup with a manifest: drifted call
    parameters raise BEFORE any computation; matching ones drop the
    store-side per-row lane assert from the plan (the delta-side
    assert stays)."""
    import pytest

    from exporter_spark.operators.incremental import store_params_dict

    docs = spark.createDataFrame(
        [(1, "a" * 40), (2, "b" * 40)], "doc_id long, text string"
    )
    _, sigs = incremental_minhash_dedup(docs, "doc_id", "text")
    manifest = store_params_dict(
        num_hashes=32, bands=8, shingle_n=8, family="md5"
    )
    with pytest.raises(ValueError, match="parameter drift"):
        incremental_minhash_dedup(
            spark.createDataFrame([(3, "c" * 40)], "doc_id long, text string"),
            "doc_id", "text", sigs, bands=16, store_params=manifest,
        )

    delta = spark.createDataFrame(
        [(3, "c" * 40)], "doc_id long, text string"
    )
    surv_guarded, _ = incremental_minhash_dedup(delta, "doc_id", "text", sigs)
    surv_manifest, _ = incremental_minhash_dedup(
        delta, "doc_id", "text", sigs, store_params=manifest
    )
    plan_guarded = surv_guarded._jdf.queryExecution().analyzed().toString()
    plan_manifest = surv_manifest._jdf.queryExecution().analyzed().toString()
    assert "store signature has" in plan_guarded
    assert "store signature has" not in plan_manifest
    assert "delta signature has" in plan_manifest  # delta assert stays
    # and the skip is value-invisible
    assert _ids(surv_guarded) == _ids(surv_manifest) == [3]


def test_append_signature_increment_helper(spark, tmp_path):
    """The batch-side store persistence helper: writes the manifest,
    refuses increment-id collisions and bad tokens, and the persisted
    store drives the next increment exactly like the in-memory one."""
    import pytest

    from exporter_spark.operators.incremental import (
        append_signature_increment,
        read_store_params,
    )

    def rnd(tag, n):
        out, i = [], 0
        while sum(len(x) for x in out) < n:
            out.append(hashlib.md5(f"{tag}:{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n]

    base = rnd("s1", 200)
    store = str(tmp_path / "sigstore")
    b1 = spark.createDataFrame(
        [(1, base), (2, rnd("s2", 200))], "doc_id long, text string"
    )
    surv1, sig1 = incremental_minhash_dedup(b1, "doc_id", "text")
    params = dict(num_hashes=32, bands=8, shingle_n=8, family="md5")
    append_signature_increment(sig1, store, "inc-0", **params)
    assert read_store_params(store, spark) is not None
    with pytest.raises(Exception, match="already exists|LOCATION_ALREADY_EXISTS"):
        append_signature_increment(sig1, store, "inc-0", **params)
    with pytest.raises(ValueError, match="increment_id"):
        append_signature_increment(sig1, store, "2024-01", **params)
    with pytest.raises(ValueError, match="parameter drift"):
        append_signature_increment(
            sig1, store, "inc-1", **{**params, "bands": 4}
        )
    # ADVICE r12: the declared num_hashes must match the frame itself —
    # a wrong declaration fails in-plan on the first row instead of
    # blessing a wrong manifest for a fresh store
    store2 = str(tmp_path / "sigstore_wrongn")
    with pytest.raises(Exception, match="lanes, expected num_hashes"):
        append_signature_increment(
            sig1, store2, "inc-0", **{**params, "num_hashes": 64}
        )

    # near-dup of stored doc 1 drops against the persisted store
    delta = spark.createDataFrame(
        [(10, base[:-24] + rnd("m", 24)), (11, rnd("s3", 200))],
        "doc_id long, text string",
    )
    seen = spark.read.parquet(store).drop("__increment__")
    surv, _ = incremental_minhash_dedup(
        delta, "doc_id", "text", seen, threshold=0.5,
        store_params=read_store_params(store, spark),
    )
    assert _ids(surv) == [11]


# -------------------------------------------------- one-pass signatures


def test_sig_append_equals_fresh_signatures(spark):
    """Round 12 one-tokenization-pass rewrite: the sig_append frame
    (rep signatures semi-joined to survivors) must be row-identical to
    re-running minhash_signatures over the survivors — across exact
    dups, near dups, short docs, and the degenerate threshold>1.0
    fallback path."""
    def rnd(tag, n):
        out, i = [], 0
        while sum(len(x) for x in out) < n:
            out.append(hashlib.md5(f"{tag}:{i}".encode()).hexdigest())
            i += 1
        return "".join(out)[:n]

    base = rnd("sig", 200)
    rows = [
        (1, base),                        # rep of exact group {1,2}
        (2, base),                        # exact dup -> dropped
        (3, base[:-24] + rnd("m", 24)),   # near-dup of 1 -> dropped at 0.5
        (4, "zzz"),                       # short (< shingle_n): kept, never stored
        (5, rnd("w", 200)),               # novel
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for thr in (0.5, 1.5):
        surv, sig_append = incremental_minhash_dedup(
            docs, "doc_id", "text", threshold=thr
        )
        fresh = minhash_signatures(surv, "doc_id", "text")
        got = sorted(
            (r["doc_id"], tuple(r["__sig__"])) for r in sig_append.collect()
        )
        want = sorted(
            (r["doc_id"], tuple(r["__sig__"])) for r in fresh.collect()
        )
        assert got == want, f"threshold={thr}"
        if thr > 1.0:
            assert _ids(surv) == [1, 2, 3, 4, 5]  # nothing can match
        else:
            assert _ids(surv) == [1, 4, 5]
            assert [d for d, _ in got] == [1, 5]  # short doc 4 unstored


def test_pairs_and_sigs_matches_pairs(spark, sf_dir):
    """minhash_dedup_pairs_and_sigs' pair output is value-identical to
    minhash_dedup_pairs (same LSH + verify semantics, sig frame
    computed once), and its sig frame matches minhash_signatures over
    the exact-text representatives."""
    from exporter_spark.operators.dedup import (
        minhash_dedup_pairs,
        minhash_dedup_pairs_and_sigs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs_ref = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5)
    pairs_new, rep_sigs = minhash_dedup_pairs_and_sigs(
        docs, "doc_id", "text", threshold=0.5
    )
    ref = sorted(map(tuple, pairs_ref.collect()))
    new = sorted(map(tuple, pairs_new.collect()))
    assert new == ref and len(ref) > 0
    # rep_sigs = signatures of the min-id member of each exact-text group
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    reps = (
        docs.withColumn("__rn__", F.row_number().over(w))
        .filter("__rn__ = 1")
        .drop("__rn__")
    )
    want = sorted(
        (r["doc_id"], tuple(r["__sig__"]))
        for r in minhash_signatures(reps, "doc_id", "text").collect()
    )
    got = sorted(
        (r["doc_id"], tuple(r["__sig__"])) for r in rep_sigs.collect()
    )
    assert got == want


def test_append_digest_increment_helper(spark, tmp_path):
    """Digest-store batch persistence: validated ids, collision
    refusal, and the persisted store drives the next increment exactly
    like the in-memory one."""
    store = str(tmp_path / "digstore")
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    from exporter_spark.operators.incremental import append_digest_increment

    _, dig1 = incremental_exact_dedup(b1, ["text"], "doc_id")
    append_digest_increment(dig1, store, "inc-0")
    with pytest.raises(Exception, match="already exists|LOCATION_ALREADY_EXISTS"):
        append_digest_increment(dig1, store, "inc-0")
    with pytest.raises(ValueError, match="increment_id"):
        append_digest_increment(dig1, store, "0-starts-with-digit")

    delta = spark.createDataFrame(
        [(10, "alpha"), (11, "novel")], "doc_id long, text string"
    )
    seen = spark.read.parquet(store).drop("__increment__")
    surv, _ = incremental_exact_dedup(delta, ["text"], "doc_id", seen)
    assert _ids(surv) == [11]


def test_token_charset_guarantees_string_partition_inference(spark, tmp_path):
    """The validator's real contract, machine-checked: every token it
    ACCEPTS produces an __increment__ partition column that Spark
    type-infers as STRING (so the replay self-exclusion `!=` compares
    string-to-string), and the shapes it REJECTS genuinely carry the
    risk — written by hand they infer as non-string types."""
    import pyspark.sql.functions as F

    from exporter_spark.operators.incremental import (
        validate_increment_token,
    )

    accepted = ["r0-0", "run_7-x", "compacted-0", "A", "z9", "inc-2024-01"]
    for tok in accepted:
        validate_increment_token(tok, "token")
    store = str(tmp_path / "ok_store")
    df = spark.createDataFrame([("d",)], "__digest__ string")
    for tok in accepted:
        df.write.parquet(f"{store}/__increment__={tok}")
    back = spark.read.parquet(store)
    assert back.schema["__increment__"].dataType.simpleString() == "string"
    got = sorted(
        r[0] for r in back.select("__increment__").distinct().collect()
    )
    assert got == sorted(accepted)  # byte-exact round trip, no casts

    # the rejected shapes are rejected FOR CAUSE: hand-written
    # partition dirs with these values infer as non-string
    risky = {"2024-01-01": "date", "123": "int", "12.5": None}
    for tok, want in risky.items():
        import pytest as _pt

        with _pt.raises(ValueError):
            validate_increment_token(tok, "token")
        p = str(tmp_path / f"risky_{abs(hash(tok))}")
        df.write.parquet(f"{p}/__increment__={tok}")
        inferred = (
            spark.read.parquet(p)
            .schema["__increment__"].dataType.simpleString()
        )
        assert inferred != "string", (tok, inferred)
        if want:
            assert inferred == want, (tok, inferred)
