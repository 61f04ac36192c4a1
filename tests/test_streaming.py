"""Structured Streaming: file-source micro-batch runs of the windowed
builders, checked against their batch equivalents (same builder, batch
frame), plus foreachBatch scoring reuse (SURVEY.md §7 Phase 5)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hdinsight_pyspark_cntk_integration_spark import streaming as st
from hdinsight_pyspark_cntk_integration_spark.operators import scoring as sc
from hdinsight_pyspark_cntk_integration_spark.sources.catalog import load_table


def _stream_events(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events_src")
    batch = load_table(spark, sf_dir, "events")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    return batch, stream


def _run_to_memory(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_matches_batch(spark, sf_dir, tmp_path):
    batch, stream = _stream_events(spark, sf_dir, tmp_path)
    agg = st.tumbling_counts(st.with_watermark(stream, delay="1 hour"))
    q = _run_to_memory(agg, "tumbling_t")
    got = spark.sql("select * from tumbling_t").toPandas()
    exp = st.tumbling_counts(batch).toPandas()
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    q.stop()


def test_session_window_stream_runs(spark, sf_dir, tmp_path):
    batch, stream = _stream_events(spark, sf_dir, tmp_path)
    agg = st.session_counts(st.with_watermark(stream, delay="1 hour"), gap="10 minutes")
    q = _run_to_memory(agg, "sessions_t")
    got = spark.sql("select * from sessions_t").toPandas()
    exp = st.session_counts(batch, gap="10 minutes").toPandas()
    assert len(got) == len(exp)
    assert int(got["n"].sum()) == int(exp["n"].sum())
    q.stop()


def test_foreach_batch_scoring(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    src = str(tmp_path / "emb_src")
    emb.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(emb.schema).parquet(src)

    def scorer(df):
        return sc.score(
            df,
            sc.make_linear_stub_loader(64, 10),
            input_col="embedding",
            pass_through=["vec_id", "label"],
        )

    sink = str(tmp_path / "scored_sink")
    ckpt = str(tmp_path / "ckpt")
    q = st.score_stream_foreach_batch(stream, scorer, sink, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(sink).toPandas()
    assert len(out) == emb.count()
    assert set(out.columns) == {"vec_id", "label", "predicted_label"}
    # spot-check against local predictions
    w = sc.linear_stub_weights(64, 10)
    pdf = emb.toPandas().sort_values("vec_id")
    preds = (np.stack(pdf["embedding"].to_numpy()).astype(np.float64) @ w.T).argmax(axis=1)
    got = out.sort_values("vec_id")["predicted_label"].to_numpy()
    assert (got == preds).all()


def test_dedup_within_watermark_stream(spark, sf_dir, tmp_path):
    batch, stream = _stream_events(spark, sf_dir, tmp_path)
    # duplicate the source rows: dedup must collapse them back
    dup_src = str(tmp_path / "events_dup")
    batch.unionAll(batch).write.mode("overwrite").parquet(dup_src)
    dup_stream = spark.readStream.schema(batch.schema).parquet(dup_src)
    out = st.dedup_within_watermark(dup_stream, keys=["event_id"], delay="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) n, count(distinct event_id) d from dedup_wm").collect()[0]
    assert got["n"] == batch.count()
    assert got["d"] == got["n"]


def test_enrich_stream_static_join(spark, sf_dir, tmp_path):
    batch, stream = _stream_events(spark, sf_dir, tmp_path)
    dim = spark.createDataFrame(
        [("view", "browse"), ("purchase", "convert"), ("click", "browse")],
        "event_type string, stage string",
    )
    out = st.enrich_stream_static(stream, dim, on="event_type")
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select count(*) n, sum(case when stage is null then 1 else 0 end) missing from enriched"
    ).collect()[0]
    assert got["n"] == batch.count()
    exp_missing = batch.filter(~batch.event_type.isin("view", "purchase", "click")).count()
    assert got["missing"] == exp_missing


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    batch, stream = _stream_events(spark, sf_dir, tmp_path)
    purchases_b = batch.filter(batch.event_type == "purchase")
    views_b = batch.filter(batch.event_type == "view")
    purchases_s = stream.filter(stream.event_type == "purchase")
    views_s = stream.filter(stream.event_type == "view")

    out = st.join_streams_within(purchases_s, views_s, within="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select count(*) n from ss_join").collect()[0]["n"]
    exp = st.join_streams_within(purchases_b, views_b, within="30 minutes").count()
    assert got == exp
    assert exp > 0


def test_dedup_stateful_ttl_import_gate(spark):
    """No google.protobuf in this container: the transformWithState
    operator must fail fast with an actionable message instead of
    crashing the streaming Python runner mid-query."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        df = spark.createDataFrame([(1, "a")], "doc_id long, fingerprint string")
        with pytest.raises(ImportError, match="google.protobuf"):
            st.dedup_stateful_ttl(df, key_col="fingerprint")
    else:
        pytest.skip("protobuf installed; gate not exercisable")


def test_dedup_stateful_ttl_stream(spark, sf_dir, tmp_path):
    """transformWithStateInPandas dedup: streaming run (RocksDB state)
    keeps exactly one row per fingerprint; batch run of the same builder
    agrees on the surviving key set."""
    import pytest

    pytest.importorskip("google.protobuf")
    from hdinsight_pyspark_cntk_integration_spark.operators.text import fingerprints
    from hdinsight_pyspark_cntk_integration_spark.session import configure_rocksdb_state

    docs = load_table(spark, sf_dir, "documents").limit(200)
    # plant duplicates: union a copy of 50 docs under new ids
    dup = docs.limit(50).withColumn("doc_id", docs.doc_id + 1_000_000)
    both = docs.unionByName(dup)
    fp = fingerprints(both).join(both, "doc_id").select("doc_id", "fingerprint")

    src = str(tmp_path / "fp_src")
    fp.write.mode("overwrite").parquet(src)

    configure_rocksdb_state(spark)
    try:
        stream = spark.readStream.schema(fp.schema).parquet(src)
        out = st.dedup_stateful_ttl(stream, key_col="fingerprint")
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_ttl_t")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select * from dedup_ttl_t").toPandas()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    n_distinct = fp.select("fingerprint").distinct().count()
    assert len(got) == n_distinct
    assert got["fingerprint"].nunique() == n_distinct
    # batch semantics of the same builder: one survivor per key too
    batch_out = st.dedup_stateful_ttl(fp, key_col="fingerprint").toPandas()
    assert sorted(batch_out["fingerprint"]) == sorted(got["fingerprint"])


def test_pii_redact_stream_matches_batch(spark, sf_dir, tmp_path):
    """redact_pii is a pure projection, so it must run unchanged on a
    streaming frame (append mode, no state) and agree with batch."""
    from hdinsight_pyspark_cntk_integration_spark.operators import text as tx

    src = str(tmp_path / "docs_pii_src")
    batch = load_table(spark, sf_dir, "documents").limit(200)
    planted = batch.selectExpr(
        "doc_id",
        "concat(text, ' reach me: u', cast(doc_id as string), "
        "'@mail.test or 10.1.2.', cast(doc_id % 256 as string)) AS text",
    )
    planted.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(planted.schema).parquet(src)
    q = (
        tx.redact_pii(stream)
        .writeStream.format("memory")
        .queryName("pii_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from pii_t").toPandas().sort_values("doc_id")
    exp = tx.redact_pii(planted).toPandas().sort_values("doc_id")
    assert len(got) == len(exp) == 200
    assert (got["text"].to_numpy() == exp["text"].to_numpy()).all()
    assert (got["n_email"].to_numpy() == exp["n_email"].to_numpy()).all()
    assert int(got["n_email"].sum()) == 200 and int(got["n_ipv4"].sum()) == 200
    q.stop()


def test_sliding_stream_matches_batch(spark, sf_dir, tmp_path):
    batch, stream = _stream_events(spark, sf_dir, tmp_path)
    agg = st.sliding_counts(
        st.with_watermark(stream, delay="1 hour"), slide="30 minutes"
    )
    q = _run_to_memory(agg, "sliding_t")
    got = spark.sql("select * from sliding_t").toPandas()
    exp = st.sliding_counts(batch, slide="30 minutes").toPandas()
    key = ["window_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    # every event lands in exactly window/slide = 2 windows
    ev = load_table(spark, sf_dir, "events")
    assert int(exp["n"].sum()) == 2 * ev.count()
    q.stop()


def test_stream_restart_from_checkpoint_no_duplicates(spark, sf_dir, tmp_path):
    """Exactly-once across a restart: run a windowed count to a file
    sink with a checkpoint, stop, append NEW source files, restart the
    SAME query — the recovered run must pick up only the new data, and
    the union of outputs must equal the batch result over everything."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "cp_src")
    sink = str(tmp_path / "cp_sink")
    cp = str(tmp_path / "cp_state")
    ev = load_table(spark, sf_dir, "events")
    # split by TIME (append mode drops below-watermark data, so the
    # second batch must be strictly later than the first)
    mid = ev.agg(F.expr("percentile(unix_timestamp(ts), 0.5)")).collect()[0][0]
    first = ev.filter(F.unix_timestamp("ts") <= mid)
    second = ev.filter(F.unix_timestamp("ts") > mid)
    first.write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        agg = st.tumbling_counts(st.with_watermark(stream, delay="1 hour"))
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return spark.read.parquet(sink).count()

    n_after_first = run_once()
    second.write.mode("append").parquet(src)
    n_after_second = run_once()
    # the restarted query picked up ONLY the new files and emitted more
    # closed windows
    assert n_after_second > n_after_first > 0

    got = spark.read.parquet(sink).toPandas()
    # exactly-once across the restart: no (window, key) emitted twice
    assert not got.duplicated(["window_start", "event_type"]).any()
    # every emitted window agrees with the batch twin over ALL data
    exp = (
        st.tumbling_counts(ev)
        .select("window_start", "event_type", F.col("n").alias("n_exp"))
        .toPandas()
    )
    merged = got.merge(exp, on=["window_start", "event_type"], how="left")
    assert (merged["n"] == merged["n_exp"]).all()


def test_events_replay_source_twin_matches_batch(spark, sf_dir):
    """The events_replay Python DataSource streams the fixture in stable
    (ts, event_id) order in fixed microbatches; tumbling counts through
    it must equal the batch computation on the same table exactly."""
    from hdinsight_pyspark_cntk_integration_spark.streaming.replay_source import (
        EventsReplayDataSource,
    )

    spark.dataSource.register(EventsReplayDataSource)
    stream = (
        spark.readStream.format("events_replay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("order_by", "ts,event_id")
        .option("rows_per_batch", "4000")
        .load()
    )
    agg = st.tumbling_counts(st.with_watermark(stream, delay="1 hour"))
    q = _run_to_memory(agg, "replay_t")
    got = (
        spark.sql("select * from replay_t")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    batch = load_table(spark, sf_dir, "events")
    exp = (
        st.tumbling_counts(batch)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)
    q.stop()


def test_ingest_dedup_foreach_batch_incremental(spark, tmp_path):
    """Two micro-batches with overlapping texts: the second batch's
    duplicates (against batch 1 AND within itself) are dropped; the
    fingerprint store accumulates one row per distinct text."""
    import hdinsight_pyspark_cntk_integration_spark.streaming as st

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")

    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "doc_id long, text string",
    )
    b1.write.mode("append").json(src)
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    st.ingest_dedup_foreach_batch(stream, corpus, store, ck).awaitTermination(120)

    got1 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got1 == {1, 2}  # in-batch dup 3 dropped (keep-min-id)

    b2 = spark.createDataFrame(
        [(4, "alpha text"), (5, "gamma text"), (6, "gamma text")],
        "doc_id long, text string",
    )
    b2.write.mode("append").json(src)
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    st.ingest_dedup_foreach_batch(stream, corpus, store, ck).awaitTermination(120)

    rows = spark.read.parquet(corpus).collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 5}
    # store has exactly one fingerprint per distinct text
    fps = [r["fingerprint"] for r in spark.read.parquet(store).collect()]
    assert len(fps) == len(set(fps)) == 3


def test_events_replay_restart_resumes_from_committed_offset(spark, tmp_path):
    """Kill a query mid-stream over events_replay, then resume from the
    same checkpoint: the union of pre- and post-restart file-sink batches
    must equal the batch read exactly — no duplicated and no lost rows
    across the restart boundary. This exercises the offset-recovery
    contract (readBetweenOffsets re-yields the planned-but-uncommitted
    batch; read() continues from the committed index)."""
    import time as _time

    from hdinsight_pyspark_cntk_integration_spark.streaming.replay_source import (
        EventsReplayDataSource,
    )

    sf_dir = "/root/testdata/sf0.001"  # 1000 rows -> 10 microbatches of 100
    spark.dataSource.register(EventsReplayDataSource)

    def make_stream():
        return (
            spark.readStream.format("events_replay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("order_by", "ts,event_id")
            .option("rows_per_batch", "100")
            .load()
            .select("event_id", "event_type", "value")
        )

    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    # Phase 1: slow trigger; stop after >=2 committed microbatches.
    q1 = (
        make_stream()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = _time.time() + 120
    while _time.time() < deadline:
        done = [p for p in q1.recentProgress if p["numInputRows"] > 0]
        if len(done) >= 2:
            break
        _time.sleep(0.2)
    q1.stop()
    q1.awaitTermination(60)

    mid = spark.read.parquet(sink).count()
    assert mid > 0, "phase 1 committed no batches"

    # Phase 2: resume from the same checkpoint, drain to the end.
    # (availableNow is not honored by SimpleDataSourceStreamReader — it
    # snapshots "available" before the prefetcher advances — so drain
    # with the default ASAP trigger and poll the sink row count.)
    q2 = (
        make_stream()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .start()
    )
    deadline = _time.time() + 120
    while _time.time() < deadline:
        if spark.read.parquet(sink).count() >= 1000:
            break
        _time.sleep(0.5)
    q2.stop()
    q2.awaitTermination(60)

    got = spark.read.parquet(sink).toPandas()
    exp = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).toPandas()
    assert len(got) == len(exp) == 1000
    assert sorted(got["event_id"]) == sorted(exp["event_id"])
    assert got["event_id"].is_unique
    g = got.sort_values("event_id").reset_index(drop=True)
    e = exp.sort_values("event_id").reset_index(drop=True)
    assert g.equals(e)


def test_dedup_stateful_first_seen_stream_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState dedup (no protobuf needed — this one
    EXECUTES in this container, unlike the transformWithState twin):
    planted duplicate fingerprints across microbatches keep exactly one
    row per key; the surviving key set equals batch distinct."""
    from hdinsight_pyspark_cntk_integration_spark.operators.text import fingerprints

    docs = load_table(spark, sf_dir, "documents").limit(200)
    dup = docs.limit(50).withColumn("doc_id", docs.doc_id + 1_000_000)
    both = docs.unionByName(dup)
    fp = fingerprints(both).join(both, "doc_id").select("doc_id", "fingerprint")

    src = str(tmp_path / "fp_src2")
    # two files -> at least two microbatches with maxFilesPerTrigger=1
    fp.filter(F.col("doc_id") < 1_000_000).write.parquet(f"{src}/a")
    fp.filter(F.col("doc_id") >= 1_000_000).write.parquet(f"{src}/b")

    stream = (
        spark.readStream.schema(fp.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = st.dedup_stateful_first_seen(stream, key_col="fingerprint")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_fs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_fs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_fs").toPandas()
    assert got["fingerprint"].is_unique
    exp_keys = {r["fingerprint"] for r in fp.select("fingerprint").distinct().collect()}
    assert set(got["fingerprint"]) == exp_keys
    # every emitted row is a real input row (first-seen, not synthesized)
    ids = {r["doc_id"] for r in fp.select("doc_id").collect()}
    assert set(got["doc_id"]).issubset(ids)
    # (note: applyInPandasWithState rejects batch frames with
    # UnsupportedOperationException — streaming-only by design, unlike
    # the transformWithState variant)


def test_dedup_stateful_ttl_parity_with_first_seen(spark, sf_dir, tmp_path):
    """Round-7 (verdict order 8): the PARITY twin between the two
    arbitrary-state dedup engines — transformWithStateInPandas
    (protobuf-gated; auto-activates on a protobuf-bundled Spark, like
    the onnx gate) and applyInPandasWithState (always runnable here) —
    on the SAME planted multi-microbatch stream: identical surviving
    key sets and one row per key from each."""
    import pytest

    pytest.importorskip("google.protobuf")
    from hdinsight_pyspark_cntk_integration_spark.operators.text import fingerprints
    from hdinsight_pyspark_cntk_integration_spark.session import configure_rocksdb_state

    docs = load_table(spark, sf_dir, "documents").limit(150)
    dup = docs.limit(40).withColumn("doc_id", docs.doc_id + 1_000_000)
    both = docs.unionByName(dup)
    fp = fingerprints(both).join(both, "doc_id").select("doc_id", "fingerprint")

    src = str(tmp_path / "fp_twin")
    fp.filter(F.col("doc_id") < 1_000_000).write.parquet(f"{src}/a")
    fp.filter(F.col("doc_id") >= 1_000_000).write.parquet(f"{src}/b")

    def stream():
        return (
            spark.readStream.schema(fp.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    def run(df, name, ck):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.sql(f"select * from {name}").toPandas()

    first_seen = run(
        st.dedup_stateful_first_seen(stream(), key_col="fingerprint"),
        "twin_fs", "ck_twin_fs",
    )
    configure_rocksdb_state(spark)
    try:
        ttl = run(
            st.dedup_stateful_ttl(stream(), key_col="fingerprint"),
            "twin_ttl", "ck_twin_ttl",
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    assert first_seen["fingerprint"].is_unique
    assert ttl["fingerprint"].is_unique
    assert set(ttl["fingerprint"]) == set(first_seen["fingerprint"])


def test_gopher_rules_stream_matches_batch(spark, sf_dir, tmp_path):
    """gopher_rules is a pure projection, so it must run unchanged on a
    streaming frame (append mode, no state) and agree with batch —
    the first-pass quality filter in its streaming-ingest posture."""
    from hdinsight_pyspark_cntk_integration_spark.operators import text as tx

    src = str(tmp_path / "docs_gopher_src")
    batch = load_table(spark, sf_dir, "documents").limit(200)
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        tx.gopher_rules(stream)
        .writeStream.format("memory")
        .queryName("gopher_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from gopher_t").toPandas().sort_values("doc_id")
    exp = tx.gopher_rules(batch).toPandas().sort_values("doc_id")
    assert len(got) == len(exp) == 200
    for c in exp.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert got["keep"].any() and (~got["keep"]).any()
    q.stop()


def test_cusum_stateful_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming CUSUM (applyInPandasWithState) vs the batch closed-form
    detector (stats.cusum_detect): split purchase events into two
    microbatch files by event id so every key's rows arrive in order
    across batches (the documented ordering contract), run availableNow,
    and assert the FINAL per-key state — n, max_cusum,
    first_alarm_step — is exactly the batch answer."""
    from hdinsight_pyspark_cntk_integration_spark.operators import stats as bstats

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    series = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    mid = series.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "cusum_src")
    series.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(f"{src}/a")
    series.filter(F.col("event_id") > mid).coalesce(1).write.parquet(f"{src}/b")

    stream = (
        spark.readStream.schema(series.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = st.cusum_stateful(
        stream, "user_id", "event_id", "cents",
        target=5000, slack=500, threshold=50_000,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_st")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_cusum"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select user_id, n, max_cusum, first_alarm_step from ("
        " select *, row_number() over (partition by user_id order by n desc) rn"
        " from cusum_st) where rn = 1"
    ).toPandas().sort_values("user_id").reset_index(drop=True)
    exp = (
        bstats.cusum_detect(
            series, "user_id", "event_id", "cents",
            target=5000, slack=500, threshold=50_000,
        )
        .withColumnRenamed("group", "user_id")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert (got["max_cusum"].to_numpy() == exp["max_cusum"].to_numpy()).all()
    ga = got["first_alarm_step"].fillna(-1).to_numpy()
    ea = exp["first_alarm_step"].fillna(-1).to_numpy()
    assert (ga == ea).all()
    q.stop()


def test_cusum_stateful_multichunk_key_sorts_whole_batch(spark, tmp_path):
    """A key's rows in ONE micro-batch can span multiple Arrow record
    batches — applyInPandasWithState guarantees grouping, not order, so
    chunk-local sorting would run the CUSUM walk out of order (ADVICE
    r13). Force tiny Arrow chunks, feed one key's rows physically
    REVERSED in the source file, and assert exact parity with the batch
    detector (order-sensitive values: alarms + resets interleaved)."""
    from hdinsight_pyspark_cntk_integration_spark.operators import stats as bstats

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        # values alternate spike/quiet so S resets between spikes: the
        # walk's max_cusum and first alarm depend on true event order
        vals = [(i, 9000 if i % 7 < 3 else 1000) for i in range(1, 61)]
        rows = [(1, i, v) for i, v in vals]
        series = spark.createDataFrame(
            rows, "user_id long, event_id long, cents long"
        )
        src = str(tmp_path / "cusum_chunks")
        # reversed physical order within the single batch file
        series.orderBy(F.col("event_id").desc()).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(series.schema).parquet(src)
        out = st.cusum_stateful(
            stream, "user_id", "event_id", "cents",
            target=5000, slack=500, threshold=8_000,
        )
        q = (
            out.writeStream.format("memory")
            .queryName("cusum_chunked")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck_chunks"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select * from cusum_chunked order by n desc limit 1"
        ).collect()[0]
        exp = bstats.cusum_detect(
            series, "user_id", "event_id", "cents",
            target=5000, slack=500, threshold=8_000,
        ).collect()[0]
        assert got["n"] == exp["n"] == 60
        assert got["max_cusum"] == exp["max_cusum"]
        assert got["first_alarm_step"] == exp["first_alarm_step"]
        q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_cusum_stateful_restart_resumes_state(spark, sf_dir, tmp_path):
    """Restart probe (the class of bug single-run tests miss): run the
    stateful CUSUM over batch A, STOP, add batch B, restart on the SAME
    checkpoint — state must resume (not reset, not re-ingest A) and the
    final per-key detector state must equal the one-shot batch answer
    over A+B."""
    from hdinsight_pyspark_cntk_integration_spark.operators import stats as bstats

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    series = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    mid = series.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "cusum_rs_src")
    ck = str(tmp_path / "ck_cusum_rs")
    series.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(f"{src}/a")

    sink = str(tmp_path / "cusum_rs_sink")

    def run_once():
        # parquet sink + append mode: the memory sink CANNOT recover
        # from a checkpoint (probed and confirmed — the restart raises
        # "does not support recovering"), so the restart-safe form
        # appends the per-batch state log and dedupes on max n per key
        stream = (
            spark.readStream.schema(series.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        out = st.cusum_stateful(
            stream, "user_id", "event_id", "cents",
            target=5000, slack=500, threshold=50_000,
            output_mode="append",
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once()  # processes A, commits state
    series.filter(F.col("event_id") > mid).coalesce(1).write.parquet(f"{src}/b")
    run_once()  # must resume from A's state and add only B

    log = spark.read.parquet(sink)
    log.createOrReplaceTempView("cusum_rs_log")
    got = spark.sql(
        "select user_id, n, max_cusum, first_alarm_step from ("
        " select *, row_number() over (partition by user_id order by n desc) rn"
        " from cusum_rs_log) where rn = 1"
    ).toPandas().sort_values("user_id").reset_index(drop=True)
    exp = (
        bstats.cusum_detect(
            series, "user_id", "event_id", "cents",
            target=5000, slack=500, threshold=50_000,
        )
        .withColumnRenamed("group", "user_id")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # the appended log holds every key's latest state; each must carry
    # the FULL A+B detector state (n equal to the batch count proves
    # state resumed — no reset, no double-ingest of A)
    assert len(got) == len(exp) and len(got) > 0
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert (got["max_cusum"].to_numpy() == exp["max_cusum"].to_numpy()).all()
    ga = got["first_alarm_step"].fillna(-1).to_numpy()
    ea = exp["first_alarm_step"].fillna(-1).to_numpy()
    assert (ga == ea).all()


def test_page_hinkley_stateful_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming Page-Hinkley (applyInPandasWithState) vs the batch
    prefix-window detector (stats.page_hinkley): two microbatch files
    split by event id (the documented cross-batch ordering contract),
    availableNow, FINAL per-key state must be exactly the batch
    answer — including the per-row truncating running-mean DIV."""
    from hdinsight_pyspark_cntk_integration_spark.operators import stats as bstats

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    series = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    mid = series.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "ph_src")
    series.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(f"{src}/a")
    series.filter(F.col("event_id") > mid).coalesce(1).write.parquet(f"{src}/b")

    stream = (
        spark.readStream.schema(series.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = st.page_hinkley_stateful(
        stream, "user_id", "event_id", "cents",
        delta_micro=0, lambda_micro=50_000_000,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ph_st")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_ph"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select user_id, n, max_ph, first_alarm_step from ("
        " select *, row_number() over (partition by user_id order by n desc) rn"
        " from ph_st) where rn = 1"
    ).toPandas().sort_values("user_id").reset_index(drop=True)
    exp = (
        bstats.page_hinkley(
            series, "user_id", "event_id", "cents",
            delta_micro=0, lambda_micro=50_000_000,
        )
        .withColumnRenamed("group", "user_id")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert (got["max_ph"].to_numpy() == exp["max_ph"].to_numpy()).all()
    ga = got["first_alarm_step"].fillna(-1).to_numpy()
    ea = exp["first_alarm_step"].fillna(-1).to_numpy()
    assert (ga == ea).all()
    q.stop()


def test_page_hinkley_stateful_restart_resumes_state(spark, sf_dir, tmp_path):
    """Restart probe for the PH twin: process batch A, STOP, add batch
    B, restart on the SAME checkpoint into a parquet append log — state
    must resume and the final per-key answer must equal the one-shot
    batch detector over A+B (six-long state round-trips correctly)."""
    from hdinsight_pyspark_cntk_integration_spark.operators import stats as bstats

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    series = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    mid = series.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "ph_rs_src")
    ck = str(tmp_path / "ck_ph_rs")
    sink = str(tmp_path / "ph_rs_sink")
    series.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(f"{src}/a")

    def run_once():
        stream = (
            spark.readStream.schema(series.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        out = st.page_hinkley_stateful(
            stream, "user_id", "event_id", "cents",
            delta_micro=0, lambda_micro=50_000_000,
            output_mode="append",
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    series.filter(F.col("event_id") > mid).coalesce(1).write.parquet(f"{src}/b")
    run_once()

    log = spark.read.parquet(sink)
    log.createOrReplaceTempView("ph_rs_log")
    got = spark.sql(
        "select user_id, n, max_ph, first_alarm_step from ("
        " select *, row_number() over (partition by user_id order by n desc) rn"
        " from ph_rs_log) where rn = 1"
    ).toPandas().sort_values("user_id").reset_index(drop=True)
    exp = (
        bstats.page_hinkley(
            series, "user_id", "event_id", "cents",
            delta_micro=0, lambda_micro=50_000_000,
        )
        .withColumnRenamed("group", "user_id")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("n", "max_ph"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    ga = got["first_alarm_step"].fillna(-1).to_numpy()
    ea = exp["first_alarm_step"].fillna(-1).to_numpy()
    assert (ga == ea).all()


def test_heavy_hitters_stateful_exact_regime_matches_batch(
    spark, sf_dir, tmp_path
):
    """Sharded Misra-Gries stream vs exact batch counts in the EXACT
    regime (distinct items per shard <= n_counters -> no decrement ever
    fires, sketch == truth for any arrival order): stream event_type
    frequencies (5 distinct items) through two microbatch files with a
    generous counter budget and assert the final per-item count_min IS
    the exact groupBy count."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("event_type").alias("item")
    )
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "hh_src")
    ev.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(f"{src}/a")
    ev.filter(F.col("event_id") > mid).coalesce(1).write.parquet(f"{src}/b")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = st.heavy_hitters_stateful(
        stream, "item", n_counters=8, n_shards=3
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hh_st")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_hh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select item, count_min from ("
        " select *, row_number() over (partition by shard, item"
        " order by n_shard desc) rn from hh_st) where rn = 1"
    ).toPandas()
    exact = {
        r["item"]: r["c"]
        for r in ev.groupBy("item").agg(F.count("*").alias("c")).collect()
    }
    assert dict(zip(got["item"], got["count_min"])) == exact
    # shard totals partition the stream
    tot = spark.sql(
        "select sum(n_shard) s from ("
        " select shard, max(n_shard) n_shard from hh_st group by shard)"
    ).collect()[0]["s"]
    assert tot == ev.count()


def test_heavy_hitters_stateful_decrement_bounds(spark, tmp_path):
    """Overflow regime: 1 shard, 2 counters, adversarial tail of
    singletons around one dominant item. The MG bounds must hold
    (true - n/(k+1) <= count_min <= true) and the dominant item must
    survive as a candidate."""
    rows = [(i, "big") for i in range(60)] + [
        (100 + j, f"tail{j}") for j in range(30)
    ]
    df = spark.createDataFrame(rows, "event_id long, item string")
    src = str(tmp_path / "hh2_src")
    df.coalesce(1).write.parquet(f"{src}/a")
    stream = (
        spark.readStream.schema(df.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = st.heavy_hitters_stateful(stream, "item", n_counters=2, n_shards=1)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_bounds")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_hh2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["item"]: r["count_min"]
        for r in spark.sql(
            "select item, count_min from ("
            " select *, row_number() over (partition by item"
            " order by n_shard desc) rn from hh_bounds) where rn = 1"
        ).collect()
    }
    assert "big" in got
    n, k = 90, 2
    assert 60 - n // (k + 1) <= got["big"] <= 60
    for item, c in got.items():
        true = 60 if item == "big" else 1
        assert true - n // (k + 1) <= c <= true


def test_heavy_hitters_stateful_restart_resumes_state(spark, sf_dir, tmp_path):
    """Restart probe for the sharded Misra-Gries sketch: run over batch
    A, STOP, add batch B, restart on the same checkpoint — sketch state
    must resume (not reset, not re-ingest A), so in the exact regime the
    final counts equal the one-shot batch counts over A+B."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("event_type").alias("item")
    )
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "hh_rs_src")
    ck = str(tmp_path / "ck_hh_rs")
    sink = str(tmp_path / "hh_rs_sink")
    ev.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(f"{src}/a")

    def run_once():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        out = st.heavy_hitters_stateful(
            stream, "item", n_counters=8, n_shards=3, output_mode="append"
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    ev.filter(F.col("event_id") > mid).coalesce(1).write.parquet(f"{src}/b")
    run_once()

    log = spark.read.parquet(sink)
    log.createOrReplaceTempView("hh_rs_log")
    got = {
        r["item"]: r["count_min"]
        for r in spark.sql(
            "select item, count_min from ("
            " select *, row_number() over (partition by shard, item"
            " order by n_shard desc) rn from hh_rs_log) where rn = 1"
        ).collect()
    }
    exact = {
        r["item"]: r["c"]
        for r in ev.groupBy("item").agg(F.count("*").alias("c")).collect()
    }
    assert got == exact
