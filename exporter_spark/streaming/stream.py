"""Structured Streaming export paths.

The reference is batch-only (a pull cursor drained once —
scanner/scanner.go:8-23), so streaming is engine extension surface:
the same ExportSpec/formatter stack applied to unbounded data.

Design:
  * CSV/JSON sinks stream natively (`writeStream.format(...)`) — the
    display-string projection from ExportSpec is just a columnar
    transform on the streaming DataFrame, so tostring semantics carry
    over unchanged.
  * XML/HTML have no streaming writer; ``foreach_batch_export`` runs
    the batch formatter per micro-batch into per-batch directories —
    the standard Spark recipe for sinks that only exist in batch form.
  * Watermark + windowed aggregation helpers cover the late-data
    rollup case (events table shape).

Scale notes: streaming state (windows, dedup) lives in the state
store, partitioned by key — the same shuffle-partition sizing rules
as batch apply; checkpointing is mandatory for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from exporter_spark.formatters.base import BaseFormatter
from exporter_spark.functions.tostring import display_columns
from exporter_spark.plans.spec import ExportSpec


def stream_from_files(
    spark, path: str, fmt: str = "parquet", schema=None, **options
) -> DataFrame:
    """File-watch streaming source (the streaming analog of the
    reference's scanners)."""
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def apply_spec_streaming(df: DataFrame, spec: ExportSpec) -> DataFrame:
    """Compile the declarative part of an ExportSpec onto a streaming
    DataFrame: filter + display-string projection. (order_by /
    preprocessor-row-ids / limit are meaningless on unbounded input
    and are rejected.)"""
    if spec.order_by or spec.limit >= 0 or spec.preprocessor:
        raise ValueError(
            "order_by / limit / preprocessor are batch-only spec options"
        )
    if spec.filter is not None:
        df = df.filter(spec.filter)
    resolved = spec._resolve_formatters(
        df, F.lit(None).cast("long"), df.columns
    )  # mappers run with row_id=NULL (unbounded input has no row number)
    return df.select(
        display_columns(df, float_mode=spec.float_mode, formatters=resolved)
    )


def stream_export(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "csv",
    spec: ExportSpec | None = None,
    checkpoint: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Continuous CSV/JSON export of a streaming DataFrame."""
    spec = spec or ExportSpec()
    out = apply_spec_streaming(df, spec)
    if spec.custom_header is not None:
        # same rename + arity check as the batch writers
        out = out.toDF(*spec.header_names(df))
    writer = out.writeStream.format(fmt).outputMode("append")
    if fmt == "csv":
        writer = (
            writer.option("header", str(spec.header).lower())
            .option("sep", spec.delimiter)
            .option("nullValue", spec.resolved_null(""))
            .option("emptyValue", "")
            # escape = quote ⇒ RFC-4180 quote doubling, same as the
            # batch writer and the Go fidelity path (default backslash
            # escaping would diverge on fields containing quotes)
            .option("quote", '"')
            .option("escape", '"')
            # Spark's write DEFAULT trims whitespace from unquoted
            # fields — silent data corruption, never acceptable (same
            # stance as the batch writer, formatters/csv.py)
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .option("lineSep", "\r\n" if spec.crlf else "\n")
        )
    elif fmt == "json":
        # display-string cells are the documented streaming design
        # (module docstring), but NULL cells must still serialize as
        # "col":null — the write default silently drops the key,
        # unlike every batch JSON path
        writer = writer.option("ignoreNullFields", "false")
    writer = writer.option("path", path).option(
        "checkpointLocation", checkpoint or f"{path}/_checkpoint"
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def foreach_batch_export(
    df: DataFrame,
    path: str,
    formatter: BaseFormatter,
    *,
    checkpoint: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Stream through any batch formatter (XML/HTML) one micro-batch
    directory at a time: <path>/batch=<id>/."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        formatter.write(batch_df, f"{path}/batch={batch_id}")

    writer = df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint or f"{path}/_checkpoint"
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def windowed_counts(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming rollup
    for the events table shape. Late rows beyond the watermark are
    dropped; state is bounded."""
    keys = keys or []
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def streaming_dedup(df: DataFrame, keys: list[str], *, ts_col: str, watermark: str) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon, with
    bounded state.

    Uses ``dropDuplicatesWithinWatermark(keys)``: a retried producer
    that re-emits the same key with a FRESH timestamp is still
    deduplicated (plain ``dropDuplicates(keys + [ts_col])`` would
    keep both rows — per-(key, ts) semantics, not per-key). State for
    a key expires once the watermark passes its first-seen event time
    plus the delay."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


# In-band version tag written as the FIRST field of every sessionize
# state tuple. Bump it whenever the state encoding's MEANING changes,
# even if the field shape stays identical — Spark's built-in
# state-schema compatibility check only sees shape. v2 = the round-5
# bounded multi-interval encoding (four parallel arrays).
_SESSION_STATE_VERSION = 2

# Forward-migration registry: ``{from_version: step}`` where ``step``
# takes the four state field arrays ``(starts, lasts, ns, totals)``
# AT ``from_version`` and returns the same four arrays re-encoded AT
# ``from_version + 1``.  On restart, state read at an older version is
# walked up step by step before use and re-written at the current
# version on its next update — a rolling upgrade needs no offline
# checkpoint rewrite.  Empty today (no semantic re-encoding has shipped
# since the tag was introduced); the v2->v3 rehearsal lives in
# tests/test_streaming.py so the first REAL bump follows a proven
# pattern instead of inventing one against a production checkpoint.
#
# Scope limit: in-band migration can only re-encode MEANING within the
# SAME field shape — a field-shape change is rejected by Spark's own
# state-schema compatibility check at restart and requires a fresh
# checkpoint (reprocess history through the batch sessionize).
#
# Steps MUST be pure functions of their four inputs (no IO, no
# side effects, deterministic): a step can run more than once for the
# same key — Spark replays micro-batches on failure before the
# upgraded state's update() lands, and a key whose state is read but
# whose intervals all stay open across a restart is re-migrated on
# the next restart too (ADVICE r08).  Purity makes every re-run
# byte-identical, so repeated migration is a no-op in effect; an
# impure or expensive step would re-run unpredictably per key.
_SESSION_STATE_MIGRATIONS: dict = {}


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_minutes: float = 30.0,
    watermark: str = "2 hours",
    max_open_intervals: int = 64,
    _state_version: int | None = None,
    _migrations: dict | None = None,
) -> DataFrame:
    """Custom stateful operator: event-time sessionization with an
    inactivity gap, via ``applyInPandasWithState`` (the PySpark analog
    of a hand-written stateful processor; reference exporters model
    this with their preprocessor hooks, but Spark's state store gives
    it fault-tolerant, bounded per-key state).

    Emits one row per CLOSED session ``(user, session_start,
    session_end, n_events, total_value)``. A session closes when a
    later event for the same key arrives more than ``gap_minutes``
    after the previous one (within or across micro-batches), or when
    the event-time watermark passes ``session_end + gap`` (state
    timeout — bounds state for keys that go quiet forever).

    Scale shape: state is O(active keys) × a bounded interval list;
    each micro-batch shuffles only that batch's rows on ``user_col``;
    Arrow-batched pandas transfer. Per-key state lives in the state
    store, never the driver. The processing fn is a self-contained
    closure (pickles by value; executors never import this package).

    Late-data semantics (multi-interval state): every merged interval
    is held OPEN in state until the event-time watermark passes
    ``interval_end + gap`` — only then can no admissible future event
    extend it, so only then is it emitted. Two far-late events landing
    in DIFFERENT micro-batches within ``gap`` of each other therefore
    merge into the one session gap semantics defines (the previous
    single-interval design emitted them as two singletons). State per
    key is bounded at ``max_open_intervals``; beyond it the OLDEST
    intervals are emitted immediately (the pre-watermark-confirmation
    degradation, loud in the docstring rather than silent in the
    semantics). The batch ``sessionize`` (window lag-cumsum) remains
    the exact path when reprocessing history.

    .. warning:: **State-schema versioning (round 7).** The per-key
       state tuple leads with an in-band ``schema_ver`` field
       (currently ``2`` — the round-5 bounded multi-interval design).
       Restarting from a checkpoint whose state carries a different
       version walks the ``_SESSION_STATE_MIGRATIONS`` registry
       forward one step at a time (round 8: rolling same-shape
       re-encodes without an offline checkpoint rewrite — migrated
       state is persisted at the current version on its next update);
       if no migration path reaches the current version, a loud
       RuntimeError names the mismatch instead of silently
       mis-decoding. Checkpoints from BEFORE the tag existed have a
       different field shape entirely and are rejected by Spark's own
       state-schema compatibility check at restart; the in-band tag
       additionally protects same-shape semantic changes and
       deployments that disabled that check. With no migration path:
       restart affected streams from a FRESH checkpoint location
       (reprocessing history through the batch ``sessionize`` if exact
       continuity matters).

       ``_state_version`` / ``_migrations`` override the module
       version/registry so the upgrade path can be REHEARSED against a
       real checkpoint in tests before a production bump ships — they
       are not a user surface.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_minutes * 60_000_000)
    max_open = int(max_open_intervals)
    # closure-captured (pickles by value; executors never import this
    # package) — snapshot the registry so a post-start mutation can't
    # desync running tasks
    ver = _SESSION_STATE_VERSION if _state_version is None else int(_state_version)
    migrations = dict(
        _SESSION_STATE_MIGRATIONS if _migrations is None else _migrations
    )
    # the key column keeps ITS OWN type — hardcoding long would kill
    # the query at Arrow conversion for string/int32 keys
    key_type = df.schema[user_col].dataType.simpleString()
    out_schema = (
        f"{user_col} {key_type}, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )
    state_schema = (
        "schema_ver long, starts array<long>, lasts array<long>, "
        "ns array<long>, totals array<double>"
    )

    def fn(key, pdf_iter, state):
        import pandas as pd

        user = key[0]

        def session_row(start_us, last_us, n, total):
            return pd.DataFrame(
                {
                    user_col: [user],
                    "session_start": [pd.to_datetime(start_us, unit="us")],
                    "session_end": [pd.to_datetime(last_us, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def stored():
            got_ver, starts, lasts, ns, totals = state.get
            # walk the forward-migration chain: each registered step
            # re-encodes the four field arrays from got_ver to
            # got_ver + 1 (same Arrow shape — Spark's schema check
            # guarantees the SHAPE already matched). Upgraded state is
            # persisted at `ver` on this key's next state.update().
            while got_ver < ver and got_ver in migrations:
                starts, lasts, ns, totals = migrations[got_ver](
                    starts, lasts, ns, totals
                )
                got_ver += 1
            if got_ver != ver:
                raise RuntimeError(
                    "sessionize state-schema version mismatch: the"
                    f" checkpoint's state carries version {got_ver}, this"
                    f" code reads/writes version {ver} and no registered"
                    " migration path covers the gap — the state was"
                    " written by an incompatible sessionize; restart from"
                    " a FRESH checkpoint location (reprocess history with"
                    " the batch sessionize if continuity matters)"
                )
            return list(zip(starts, lasts, ns, totals))

        # the watermark decides which intervals are final: no
        # admissible future row (ts >= watermark) can join an
        # interval once interval_end + gap < watermark
        wm_us = state.getCurrentWatermarkMs() * 1000

        if state.hasTimedOut:
            items = stored()
            still_open = [it for it in items if it[1] + gap_us >= wm_us]
            closed = [it for it in items if it[1] + gap_us < wm_us]
            if still_open:
                state.update((ver, *(list(c) for c in zip(*still_open))))
                state.setTimeoutTimestamp(
                    max(
                        min(e + gap_us for _, e, _, _ in still_open) // 1000,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
            else:
                state.remove()
            for s in closed:
                yield session_row(*s)
            return

        chunks = [pdf[[ts_col, value_col]] for pdf in pdf_iter]
        # a NULL event time (NaT) cannot join any session — and
        # .astype("int64") on NaT raises on modern pandas, killing
        # the whole streaming query for one bad row
        ev = pd.concat(chunks).dropna(subset=[ts_col]).sort_values(ts_col)
        ts_us = (ev[ts_col].astype("int64") // 1000).to_numpy()
        vals = ev[value_col].to_numpy()

        # interval merge over (event points + every open state
        # interval), sorted by start: a late event within ``gap`` of
        # an open session (on EITHER side) joins it; a late event more
        # than a gap BEFORE a session start forms its own interval
        # instead of silently bridging an interior silence longer than
        # the gap. NULL values contribute 0 to total but still count
        # the event — the batch F.sum/F.count semantics.
        items = [
            (int(t), int(t), 1, 0.0 if pd.isna(v) else float(v))
            for t, v in zip(ts_us, vals)
        ]
        if state.exists:
            items.extend(stored())
        if not items:
            # every row had a NULL timestamp and no prior state
            # exists — nothing to track or time out
            return
        items.sort(key=lambda x: (x[0], x[1]))
        merged = [items[0]]
        for s0, e0, n0, v0 in items[1:]:
            S, E, N, V = merged[-1]
            if s0 - E <= gap_us:
                merged[-1] = (min(S, s0), max(E, e0), N + n0, V + v0)
            else:
                merged.append((s0, e0, n0, v0))
        closed = [it for it in merged if it[1] + gap_us < wm_us]
        still_open = [it for it in merged if it[1] + gap_us >= wm_us]
        if len(still_open) > max_open:
            # bounded state: force-close the oldest overflow now
            closed.extend(still_open[: len(still_open) - max_open])
            still_open = still_open[len(still_open) - max_open:]
        if still_open:
            state.update((ver, *(list(c) for c in zip(*still_open))))
            # event-time timeout at the EARLIEST interval_end + gap
            # (clamped above the current watermark: Spark rejects
            # timeouts at/behind it)
            timeout_ms = max(
                min(e + gap_us for _, e, _, _ in still_open) // 1000,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(timeout_ms)
        elif state.exists:
            # a NULL-ts-only batch whose stored intervals all aged out
            state.remove()
        for s in closed:
            yield session_row(*s)

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )



def _normalize_location(loc: str) -> str:
    """Canonical spelling of a checkpoint/store location. The derived
    run_id hashes this form, so the SAME checkpoint referenced with a
    different spelling across restarts (relative vs absolute path,
    trailing slash, symlink) must not yield a different run_id — a
    replayed batch would then fail to exclude its own earlier store
    append, anti-join its own rows away, and overwrite its survivor
    directory with nothing (ADVICE r11). Scheme-less paths resolve to
    a symlink-free absolute path; URIs only lose trailing slashes
    (no driver-side resolution exists for remote schemes — the
    normalized URI string is what must stay stable across restarts)."""
    loc = loc.rstrip("/")
    if "://" not in loc:
        import os

        loc = os.path.realpath(os.path.abspath(loc))
    return loc


def _run_id_for(checkpoint: str, run_id: str | None) -> str:
    """Default run_id: derived from the NORMALIZED checkpoint
    location, so it is STABLE across restarts of the same checkpoint
    (a replayed batch must exclude its OWN earlier store append — a
    changed run_id there would un-exclude it and anti-join the
    batch's rows away) but differs for a fresh checkpoint location —
    the common ops reset — so a restarted-from-scratch query cannot
    overwrite an older run's increment partitions (round-11 review:
    the fixed default "r0" made that silent store corruption the path
    of least resistance). Resetting a checkpoint by deleting and
    recreating the SAME path still collides: pass an explicit run_id
    there. Explicit run_ids are charset-validated — they become
    partition-directory values whose type inference must stay STRING
    (see operators/incremental.py::validate_increment_token)."""
    if run_id is not None:
        from exporter_spark.operators.incremental import (
            validate_increment_token,
        )

        return validate_increment_token(run_id, "run_id")
    import hashlib

    return "r" + hashlib.md5(_normalize_location(checkpoint).encode()).hexdigest()[:10]


def _store_has_committed_data(spark, store_path: str) -> bool:
    """True when the store directory exists and holds at least one
    data file under Spark's own listing rule (HadoopFsUtils): names
    starting with "_" or "." are staging/metadata (_temporary,
    ._SUCCESS.crc, the contract sidecars) UNLESS they contain "=" —
    partition directories like ``__increment__=r0-0`` are data."""
    jvm = spark._jvm  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(store_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    if not fs.exists(path):
        return False

    def walk(p) -> bool:
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith(("_", ".")) and "=" not in name:
                continue
            if st.isDirectory():
                if walk(st.getPath()):
                    return True
            else:
                return True
        return False

    return walk(path)


def _refuse_crashed_compaction_target(spark, store_path: str) -> None:
    """A compaction lineage manifest WITHOUT committed data is a
    crashed ``compact_increment_store`` run (the sidecars commit
    before the parquet rewrite — VERDICT r12 #1): bootstrapping into
    it would silently treat the whole compacted history as empty and
    wave every duplicate through. Loud, with the recovery."""
    from exporter_spark import fsio

    if fsio.exists(f"{store_path}/{_COMPACTIONS_FILENAME}", spark):
        raise RuntimeError(
            f"increment store at {store_path} carries a compaction"
            " lineage manifest but no committed data — an"
            " interrupted compact_increment_store run. The source"
            " store is untouched: delete this target directory and"
            " re-run the compaction"
        )


def _read_increment_store(spark, store_path: str, inc: str):
    """The persisted store, minus the current batch's own increment
    partition (a post-append replay would otherwise anti-join its own
    rows away and overwrite its survivor directory with nothing) —
    or None when the store does not exist yet (bootstrap).

    Bootstrap is detected by FILESYSTEM EXISTENCE, not by parsing
    read errors: a store directory that exists but holds no committed
    data (a crash between directory creation and parquet commit) also
    bootstraps, while a store with committed-but-unreadable data
    fails the batch loudly — silently treating an unreadable store as
    empty would wave every duplicate through. Uses the Hadoop FS API
    so the same logic covers local paths and object stores."""
    if not _store_has_committed_data(spark, store_path):
        _refuse_crashed_compaction_target(spark, store_path)
        return None
    store = spark.read.parquet(store_path)
    if "__increment__" not in store.columns:
        raise RuntimeError(
            f"increment store at {store_path} has no __increment__"
            " partition column — it was not written by the streaming"
            " increment sinks / append_signature_increment; the replay"
            " self-exclusion rule cannot be applied to it"
        )
    inc_type = store.schema["__increment__"].dataType.simpleString()
    if inc_type != "string":
        # belt-and-braces behind validate_increment_token: a store
        # whose increment ids were written outside the validated
        # writers (e.g. hand-named "2024-01" partitions) type-infers
        # to date/int, and `!= inc` would then compare across a cast —
        # exactly the mis-exclusion mode the ids exist to prevent
        raise RuntimeError(
            f"increment store at {store_path}: partition column"
            f" __increment__ type-inferred as {inc_type}, not string —"
            " some increment directory value parses as a number/date"
            " (written outside the validated writers?); the replay"
            " self-exclusion comparison would cast and can mis-exclude."
            " Rename the offending __increment__=<value> directories to"
            " letter-led tokens"
        )
    return store.filter(F.col("__increment__") != inc)


# ------------------------------------------------ compaction resume guard

_STORE_STATE_FILENAME = "_increment_store_state.json"
_COMPACTIONS_FILENAME = "_compactions.json"


def _compaction_records(spark, store_path: str) -> list[dict]:
    """The store's compaction lineage (``_compactions.json``), oldest
    first; empty for a never-compacted store. Present-but-unreadable
    raises — the resume guard depends on this file."""
    import json

    from exporter_spark import fsio

    path = f"{store_path}/{_COMPACTIONS_FILENAME}"
    if not fsio.exists(path, spark):
        return []
    try:
        got = json.loads(fsio.read_text(path, spark))
        records = got["compactions"]
        if not isinstance(records, list):
            raise ValueError("'compactions' is not a list")
    except (ValueError, KeyError, TypeError) as ex:
        raise RuntimeError(
            f"unreadable compaction manifest at {path}: {ex}"
        ) from ex
    return records


def _checkpoint_has_batches(spark, ck: str) -> bool:
    """True once the checkpoint has begun ANY micro-batch (an offsets
    entry exists — written at batch START, so this is deliberately
    broader than 'committed': an offsets-without-commit batch is the
    one that replays on restart, the exact case the compaction guard
    exists for)."""
    jvm = spark._jvm  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(f"{ck}/offsets")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    if not fs.exists(path):
        return False
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not name.startswith(".") and not name.endswith(".tmp"):
            return True
    return False


_NAMING_SCHEME = 2  # normalized-path run_ids + run_id-namespaced
# survivor/batch directories (introduced round 12). Bump on ANY change
# to how run_ids are derived or how increment/survivor directories are
# named — a checkpoint written under a different scheme must refuse to
# resume (its replayed batch would self-exclude/overwrite under the
# OLD names while the new code writes the NEW ones).


def _prepare_increment_resume(spark, store_path: str, ck: str, rid: str) -> None:
    """Mechanized compaction-vs-replay guard (round 12, VERDICT r11
    #2 — previously a docstring-only SAFE PROCEDURE).

    A FRESH checkpoint records the store's identity, compaction
    lineage, naming-scheme version and effective run_id in
    ``<checkpoint>/_increment_store_state.json``. A checkpoint that
    has already begun batches REFUSES to resume when the store has
    been swapped or carries a compaction it has never seen: if the
    query's last batch appended its digests/signatures but crashed
    before the checkpoint commit, that batch replays on restart — its
    own rows are now folded inside the compacted partition where the
    ``__increment__ != <inc>`` self-exclusion cannot see them, and the
    replay would anti-join its own rows away (silent survivor loss).
    The only safe resume against a compacted store is a FRESH
    checkpoint (which reprocesses the source; against the compacted
    store everything already kept drops — the idempotence pin — so the
    restart wastes only compute).

    Round 13 (ADVICE r12, medium): the marker also pins the NAMING
    SCHEME and the run_id, and a batches-begun checkpoint WITHOUT a
    marker is refused outright — such a checkpoint predates the
    store-state guard, i.e. it ran under naming scheme 1 (fixed-string
    default run_ids, un-namespaced ``batch=N`` survivor dirs), and a
    replayed batch under today's scheme would no longer self-exclude
    its own old-rid store append (anti-joining its rows away) while
    its old survivors rot as stale ``batch=N`` duplicates. A recorded
    run_id that no longer matches (an explicit run_id changed across
    restarts, or a pre-normalization derived rid) is refused for the
    same reason. Markers written by the round-12 guard lack the two
    fields; round 12 already ran scheme 2, so they are adopted and
    backfilled in place."""
    import json

    from exporter_spark import fsio

    store_norm = _normalize_location(store_path)
    ids = [r.get("id") for r in _compaction_records(spark, store_path)]
    if ids and not _store_has_committed_data(spark, store_path):
        # driver-side twin of the per-batch check: refuse a crashed
        # compaction target BEFORE the query starts, not on batch 0
        _refuse_crashed_compaction_target(spark, store_path)
    marker = f"{ck}/{_STORE_STATE_FILENAME}"
    state = json.dumps(
        {
            "scheme": _NAMING_SCHEME,
            "run_id": rid,
            "store_path": store_norm,
            "compaction_ids": sorted(ids),
        },
        sort_keys=True,
    )
    if not _checkpoint_has_batches(spark, ck):
        # fresh checkpoint: adopt the store as it stands
        fsio.write_text_atomic(marker, state, spark)
        return
    if not fsio.exists(marker, spark):
        raise RuntimeError(
            f"refusing to resume checkpoint {ck}: it has begun batches"
            " but carries no store-state marker"
            f" ({_STORE_STATE_FILENAME}), so it predates the resume"
            " guard — created under naming scheme 1 (fixed default"
            " run_ids, un-namespaced batch=N survivor directories). A"
            " replayed batch under the current scheme would not"
            " self-exclude its own earlier store append (silently"
            " anti-joining its rows away) and would duplicate its old"
            " survivor directory. Restart from a FRESH checkpoint"
            " location against the same store: everything already kept"
            " drops on reprocess (idempotence), so the restart wastes"
            " only compute, never data"
        )
    raw = fsio.read_text(marker, spark)
    try:
        seen = json.loads(raw)
        if not isinstance(seen, dict):
            raise ValueError("marker is not a JSON object")
    except ValueError as ex:
        raise RuntimeError(
            f"unreadable store-state marker at {marker}: {ex} — the"
            " marker is load-bearing for the compaction-vs-replay"
            " resume guard (likely a torn write from a pre-atomic"
            " version). Restart from a FRESH checkpoint location"
            " (reprocessing is idempotent against the store); or, if"
            " you are CERTAIN the store was never compacted or swapped"
            " and the run_id is unchanged, rewrite the marker by hand:"
            ' {"scheme": <naming scheme>, "run_id": <run id>,'
            ' "store_path": <normalized store path>,'
            ' "compaction_ids": [...]}'
        ) from ex
    scheme = seen.get("scheme", _NAMING_SCHEME)
    if scheme != _NAMING_SCHEME:
        raise RuntimeError(
            f"refusing to resume checkpoint {ck}: it last ran under"
            f" increment naming scheme {scheme}, this code writes"
            f" scheme {_NAMING_SCHEME} — replayed batches would"
            " self-exclude/overwrite under the wrong directory names."
            " Restart from a FRESH checkpoint location"
        )
    seen_rid = seen.get("run_id")
    if seen_rid is not None and seen_rid != rid:
        raise RuntimeError(
            f"refusing to resume checkpoint {ck}: it last ran as"
            f" run_id {seen_rid!r} but this start derives/declares"
            f" {rid!r}. A replayed batch would look for its own store"
            f" append under __increment__={rid}-<batch> while the"
            f" append actually sits under {seen_rid}-<batch> — the"
            " self-exclusion misses and the batch anti-joins its own"
            " rows away. Pass the original run_id explicitly, or"
            " restart from a FRESH checkpoint location"
        )
    if seen.get("store_path") != store_norm:
        raise RuntimeError(
            f"refusing to resume checkpoint {ck}: it was created"
            f" against store {seen.get('store_path')} but is now"
            f" pointed at {store_norm}. Swapping the store under a"
            " live checkpoint breaks replay self-exclusion (a replayed"
            " batch cannot see its own appends in the new store);"
            " resume against the new store from a FRESH checkpoint"
        )
    unseen = sorted(set(ids) - set(seen.get("compaction_ids", [])))
    if unseen:
        raise RuntimeError(
            f"refusing to resume checkpoint {ck}: the store at"
            f" {store_path} was compacted ({unseen}) after this"
            " checkpoint last adopted it. If the query's final batch"
            " appended its rows but missed the checkpoint commit, the"
            " replay's self-exclusion cannot see those rows inside the"
            " compacted partition and would silently drop the whole"
            " batch's survivors. Restart from a FRESH checkpoint"
            " location against the compacted store"
        )
    if seen_rid is None:
        # round-12 marker (same naming scheme, run_id not yet
        # recorded) that passed every other check: backfill so future
        # restarts get the full run_id guard too
        fsio.write_text_atomic(
            marker,
            json.dumps(
                {**seen, "scheme": _NAMING_SCHEME, "run_id": rid},
                sort_keys=True,
            ),
            spark,
        )


def _start_increment_sink(
    df: DataFrame,
    store_path: str,
    ck: str,
    rid: str,
    trigger: dict | None,
    batch_fn,
) -> StreamingQuery:
    """Shared exactly-once scaffolding for the incremental dedup
    sinks: the compaction/store-swap resume guard (driver-side, before
    the query starts), per-batch cache_scope (the operators
    materialize() their multi-consumer frames — without a scope every
    micro-batch would leak MEMORY_AND_DISK entries for the life of
    the stream), and the checkpointed foreachBatch writer."""
    from exporter_spark.operators.partitioning import cache_scope

    _prepare_increment_resume(df.sparkSession, store_path, ck, rid)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        with cache_scope():
            batch_fn(batch_df, batch_id)

    writer = df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", ck
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def streaming_incremental_dedup(
    df: DataFrame,
    cols: list[str],
    order_col: str,
    *,
    store_path: str,
    output_path: str,
    run_id: str | None = None,
    broadcast_delta: bool = True,
    checkpoint: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Continuous exact dedup against a PERSISTENT digest store —
    the streaming face of operators/incremental.py (round 11): each
    micro-batch is deduped within itself (keep-first by ``order_col``)
    and against every digest ever kept, then survivors land in
    ``output_path`` and their digests extend the store. The corpus
    never reprocesses: per micro-batch the work is the batch's own
    digest shuffle plus one map-side store probe
    (incremental_exact_dedup broadcasts the batch's digests into the
    store scan — store-size-independent shuffle, see the r11 sweep).
    ``broadcast_delta=False`` opts out for oversized micro-batches
    (e.g. a whole-backlog batch 0 with no trigger limit) — the hard
    broadcast hint bypasses size thresholds and would OOM the driver.

    Exactly-once by construction, without foreachBatch transactions:
    survivors and digest appends are written to per-batch directories
    (``batch=<run_id>-<id>`` / ``__increment__=<run_id>-<id>``) with
    OVERWRITE, so a replayed batch rewrites the same directories with
    the same content. The store read EXCLUDES the current batch's own
    increment partition — a replay that already appended its digests
    would otherwise anti-join its own rows away and overwrite its
    survivor directory with nothing (silent data loss on recovery).
    Survivor directories are run_id-namespaced like the store
    increments (round 12, ADVICE r11): batch ids restart at 0 under a
    fresh checkpoint, and an un-namespaced rerun — whose batches are
    mostly empty against the grown store — would overwrite every
    prior ``batch=N`` directory with nothing, silently destroying
    previously written survivors.

    ``run_id`` namespaces increment partitions per logical query run:
    batch ids restart at 0 under a fresh checkpoint, and two runs'
    increment directories must not collide (the self-exclusion rule
    would exclude the WRONG history). The default is derived from the
    checkpoint location (see ``_run_id_for``). Re-feeding the same
    content under a new run_id against the grown store yields zero
    survivors — the streaming analog of the exact-path idempotence
    pin.

    The near-dup analog is :func:`streaming_incremental_minhash_dedup`.
    """
    from exporter_spark.operators.incremental import incremental_exact_dedup

    ck = checkpoint or f"{output_path}/_checkpoint"
    rid = _run_id_for(ck, run_id)

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = f"{rid}-{batch_id}"
        seen = _read_increment_store(spark, store_path, inc)
        surv, app = incremental_exact_dedup(
            batch_df, cols, order_col, seen,
            broadcast_delta=broadcast_delta,
        )
        surv.write.mode("overwrite").parquet(f"{output_path}/batch={inc}")
        app.write.mode("overwrite").parquet(
            f"{store_path}/__increment__={inc}"
        )

    return _start_increment_sink(df, store_path, ck, rid, trigger, batch_fn)


def streaming_incremental_minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    store_path: str,
    output_path: str,
    run_id: str | None = None,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 8,
    threshold: float = 0.7,
    family: str = "md5",
    broadcast_delta: bool = True,
    checkpoint: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Continuous NEAR-DUP dedup against a persistent signature store —
    the streaming face of ``incremental_minhash_dedup`` (round 11):
    each micro-batch runs the full in-batch pipeline (banded LSH
    proposes, exact Jaccard disposes), then its survivors are checked
    against every signature ever kept (map-side store scan, the
    batch's band triples broadcast in) and the final survivors' own
    signatures extend the store. The corpus/stream history never
    reprocesses: per micro-batch the work is the batch's pipeline
    plus one store scan, and the store holds ~256 B/doc (num_hashes
    bigint lanes), never text.

    Same exactly-once construction, run_id defaulting, bootstrap
    detection and ``broadcast_delta`` escape hatch as
    :func:`streaming_incremental_dedup`. The store is read from
    parquet each batch — pinned data, as the operator's store
    contract requires.

    Store parameters (``num_hashes``/``bands``/``shingle_n``/
    ``family``) must stay constant for the life of ``store_path``;
    since round 12 that contract is MECHANIZED: the first batch
    writes a ``_store_params.json`` manifest beside the store, every
    batch validates against it (loud failure on any drift, including
    the ``bands``/``shingle_n``/``family`` drift the stored arrays
    cannot reveal), and the manifest-verified store skips the per-row
    in-plan lane assert. Semantics note: increments compare against survivors
    only — chain-shaped clusters spanning many batches can keep more
    docs than a one-shot batch run (the documented greedy divergence
    in operators/incremental.py); the batch≡stream pin therefore
    compares against the SEQUENTIAL incremental run, which it equals
    exactly.
    """
    from exporter_spark.operators.incremental import (
        ensure_store_params,
        incremental_minhash_dedup,
    )

    ck = checkpoint or f"{output_path}/_checkpoint"
    rid = _run_id_for(ck, run_id)

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = f"{rid}-{batch_id}"
        # read-validate-or-create the parameter manifest BEFORE the
        # store read: a drifted configuration must fail before it can
        # mis-band a single row (writing the sidecar first also keeps
        # bootstrap detection intact — _read_increment_store ignores
        # underscore-named files)
        params = ensure_store_params(
            store_path,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            family=family, spark=spark,
        )
        seen = _read_increment_store(spark, store_path, inc)
        surv, app = incremental_minhash_dedup(
            batch_df, id_col, text_col, seen,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            threshold=threshold, family=family,
            broadcast_delta=broadcast_delta,
            store_params=params,
        )
        surv.write.mode("overwrite").parquet(f"{output_path}/batch={inc}")
        app.write.mode("overwrite").parquet(
            f"{store_path}/__increment__={inc}"
        )

    return _start_increment_sink(df, store_path, ck, rid, trigger, batch_fn)


def compact_increment_store(
    spark,
    store_path: str,
    out_path: str,
    *,
    increment_id: str = "compacted-0",
    partitions: int | None = None,
) -> None:
    """Rewrite an increment store as ONE increment partition.

    The streaming sinks append one ``__increment__=<run>-<batch>``
    directory per micro-batch; at a 1-minute trigger that is ~525k
    directories a year — a file-listing bottleneck long before it is
    a data-size problem. This offline helper reads the whole store
    and rewrites it to ``out_path`` under a single increment id,
    coalesced to ``partitions`` files (default: the session's
    parallelism).

    It writes to a NEW path on purpose: an in-place rewrite cannot be
    atomic on object stores, and a crash mid-compaction must never be
    able to eat the store. The store is just "every digest/signature
    ever kept" — increment boundaries carry no meaning beyond replay
    self-exclusion, and a compacted id can never collide with a live
    run's ``<run_id>-<batch>`` ids.

    SAFE PROCEDURE — mechanized since round 12 (VERDICT r11 #2):
    compact only while no query writes the old store, and resume
    against ``out_path`` under a FRESH checkpoint (which also gives a
    fresh default run_id; survivor directories are run_id-namespaced,
    so the rerun cannot overwrite prior batches' survivors even in
    the same ``output_path``). Resuming an OLD checkpoint against a
    compacted store is unsafe in one precise case: if the old query's
    final batch appended its digests but crashed before the
    checkpoint commit, that batch replays on restart — its own
    digests are now folded inside the compacted partition, the
    self-exclusion rule cannot see them, and the replay would
    anti-join its own rows away (silent survivor loss). The sinks now
    REFUSE that resume: this helper records the compaction in
    ``out_path/_compactions.json`` (appending the source store's own
    lineage), and a checkpoint that has begun batches will not start
    against a store carrying a compaction it never adopted
    (``_prepare_increment_resume``). A fresh checkpoint reprocesses
    the source from scratch; against the compacted store everything
    already kept drops (the idempotence pin), so the restart wastes
    only compute, never data.

    Works for both store schemas (digest and signature) — the helper
    never looks at the data columns; a signature store's
    ``_store_params.json`` manifest is carried over to ``out_path``.
    """
    import json

    from exporter_spark import fsio
    from exporter_spark.operators.incremental import (
        STORE_PARAMS_FILENAME,
        validate_increment_token,
    )

    validate_increment_token(increment_id, "increment_id")
    # refuse a pre-existing TARGET outright (ADVICE r11): mode("error")
    # below only protects the one increment partition — silently
    # merging into a directory that already holds other increments
    # (a live run's store, a previous compaction) violates the
    # fresh-out_path swap discipline everything above depends on
    if fsio.exists(out_path, spark):
        raise RuntimeError(
            f"compact_increment_store: target {out_path} already"
            " exists — compaction must write to a FRESH path (an"
            " in-place or merge rewrite cannot be atomic and breaks"
            " the checkpoint resume guard's lineage); pick a new"
            " out_path and swap readers/writers to it under a fresh"
            " checkpoint"
        )
    df = spark.read.parquet(store_path).drop("__increment__")
    # Sidecars BEFORE the data commit (VERDICT r12 #1): a crash
    # mid-compaction must only ever leave manifests-without-data in
    # the (guaranteed-fresh) target, which every reader refuses loudly
    # (_read_increment_store raises on a lineage manifest with no
    # committed data — delete the target and re-run; the old store is
    # untouched). The previous order could leave a complete-looking
    # compacted store with NO lineage record — the one shape a
    # pre-guard checkpoint would silently adopt — and the same crash
    # window silently dropped the _store_params.json carry-over,
    # re-opening parameter-drift blindness for the compacted store.
    records = _compaction_records(spark, store_path)
    records.append(
        {"id": increment_id, "source_store": _normalize_location(store_path)}
    )
    fsio.write_text_atomic(
        f"{out_path}/{_COMPACTIONS_FILENAME}",
        json.dumps({"compactions": records}, sort_keys=True),
        spark,
    )
    params_src = f"{store_path}/{STORE_PARAMS_FILENAME}"
    if fsio.exists(params_src, spark):
        fsio.write_text_atomic(
            f"{out_path}/{STORE_PARAMS_FILENAME}",
            fsio.read_text(params_src, spark),
            spark,
        )
    n = partitions or spark.sparkContext.defaultParallelism
    df.repartition(n).write.mode("error").parquet(
        f"{out_path}/__increment__={increment_id}"
    )
