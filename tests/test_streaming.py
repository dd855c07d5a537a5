"""Structured Streaming layer: file-source stream == batch result parity,
watermarked windowed aggregation, sessionization, event->edge extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mirrorofmapgraph_spark.streaming.events import (
    event_edges,
    run_stream_to_memory,
    sessionize,
    stream_from_directory,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_windowed_counts_batch(spark, events):
    out = windowed_event_counts(events).collect()
    assert len(out) > 0
    total = sum(r["n_events"] for r in out)
    assert total == events.count()


def test_streaming_matches_batch(spark, events, tmp_path):
    # copy the events parquet into a stream-source dir
    src = str(tmp_path / "stream_src")
    events.write.parquet(src)
    stream = stream_from_directory(spark, src)
    assert stream.isStreaming
    agg = windowed_event_counts(stream)
    run_stream_to_memory(agg, "evt_counts", timeout_s=120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from evt_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(events).collect()
    }
    assert got == want


def test_sessionize(spark, events):
    sess = sessionize(events, gap_minutes=30)
    assert sess.count() > 0
    # session event counts must sum to total events
    assert sess.agg(F.sum("n_events")).collect()[0][0] == events.count()
    # each user's sessions are disjoint in time by construction; spot-check
    per_user = sess.groupBy("user_id").count()
    assert per_user.count() == events.select("user_id").distinct().count()


def test_sessionize_native_matches_lag_formulation(spark, events):
    """session_window grouping must split sessions exactly like the
    lag+cumsum formulation (same gap): compare the full
    (user, session_start, n_events, sum_value) multiset."""
    from mirrorofmapgraph_spark.streaming.events import sessionize, sessionize_native

    a = sessionize(events, gap_minutes=30).select(
        "user_id", "session_start", "n_events", "sum_value"
    )
    b = sessionize_native(events, gap_minutes=30)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_event_edges_activity_cap(spark):
    """The per-window cap keeps only the most-active users (count desc,
    id asc) so one hot window cannot go quadratic in corpus size."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    # users 0..9 in one window; user u emits u+1 events (user 9 most active)
    for u in range(10):
        for _ in range(u + 1):
            rows.append((eid, base, u, "click", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    edges = event_edges(ev, window="1 hour", max_users_per_window=4).collect()
    # top-4 active users = 9,8,7,6 -> C(4,2)=6 pairs among them only
    assert len(edges) == 6
    kept = {u for r in edges for u in (r["src"], r["dst"])}
    assert kept == {6, 7, 8, 9}


def test_event_edges_feed_gas(spark, events):
    from mirrorofmapgraph_spark.operators.cc import connected_components

    edges = event_edges(events, window="6 hours")
    assert edges.filter(F.col("src") >= F.col("dst")).count() == 0
    res = connected_components(spark, edges)
    assert res.converged
    assert res.vertices.count() == (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )


def test_event_edges_streaming_matches_batch_pairs(spark, events, tmp_path):
    """The streaming path (watermarked dropDuplicates + window-equality
    stream-stream self-join, append mode) must produce exactly the batch
    per-window pair set when no cap/sampling is applied."""
    src = str(tmp_path / "edges_stream_src")
    events.write.parquet(src)
    stream = stream_from_directory(spark, src)
    out = event_edges(stream, window="6 hours")
    assert out.isStreaming
    run_stream_to_memory(out, "evt_edges", timeout_s=180, output_mode="append")
    got = {
        (r["win_start"], r["src"], r["dst"])
        for r in spark.sql("select * from evt_edges").collect()
    }
    act = events.select(F.window("ts", "6 hours").alias("win"), "user_id").distinct()
    a = act.select("win", F.col("user_id").alias("src"))
    b = act.select("win", F.col("user_id").alias("dst"))
    want = {
        (r["win"]["start"], r["src"], r["dst"])
        for r in a.join(b, on="win").filter(F.col("src") < F.col("dst")).collect()
    }
    assert got == want


def test_user_running_totals_stateful_across_batches(spark, events, tmp_path):
    """applyInPandasWithState keeps per-user running totals in the state
    store ACROSS micro-batches: stream the events in two file batches and
    assert the final emitted totals equal the one-shot batch aggregation."""
    import shutil

    from mirrorofmapgraph_spark.streaming.events import user_running_totals

    # split the corpus into two files (two micro-batches via maxFilesPerTrigger)
    src = str(tmp_path / "totals_src")
    half = events.count() // 2
    events.filter(F.col("event_id") < half).coalesce(1).write.parquet(src)
    events.filter(F.col("event_id") >= half).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = user_running_totals(stream)
    assert out.isStreaming
    ckpt = str(tmp_path / "totals_ck")
    q = (
        out.writeStream.format("memory").queryName("running_totals")
        .outputMode("update").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from running_totals").collect()
    batches_seen = {}
    # update mode re-emits a user's row per touching batch; the LAST row
    # per user (max n_events — totals only grow) is the final state
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["sum_value"], r["last_ts"])
    want = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["last_ts"])
        for r in user_running_totals(events).collect()
    }
    assert set(final) == set(want)
    for u in want:
        assert final[u][0] == want[u][0], f"user {u} count"
        assert abs(final[u][1] - want[u][1]) < 1e-6, f"user {u} sum"
        assert final[u][2] == want[u][2], f"user {u} last_ts"
    # statefulness really exercised: at least one user spans both batches
    spanning = events.filter(F.col("event_id") < half).select("user_id").intersect(
        events.filter(F.col("event_id") >= half).select("user_id")
    ).count()
    assert spanning > 0


def test_stream_event_edges_rollup_matches_batch(spark, events, tmp_path):
    """End-to-end incremental feed: streaming event_edges appended to a
    parquet sink across TWO micro-batches, then rollup_event_edges over the
    sink must equal the batch event_edges on the SAME hash-sampled user
    subset (the streaming path's bound; batch input pre-filtered with the
    identical predicate so both sides see the same users)."""
    from mirrorofmapgraph_spark.streaming.events import (
        rollup_event_edges,
        stream_event_edges_to_parquet,
    )

    mod = 2
    src = str(tmp_path / "rollup_src")
    half = events.count() // 2
    events.filter(F.col("event_id") < half).coalesce(1).write.parquet(src)
    events.filter(F.col("event_id") >= half).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out_dir = str(tmp_path / "rollup_sink")
    ck = str(tmp_path / "rollup_ck")
    stream_event_edges_to_parquet(
        stream, out_dir, ck, window="6 hours", stream_user_mod=mod, timeout_s=180
    )
    rolled = rollup_event_edges(spark.read.parquet(out_dir))
    got = {(r["src"], r["dst"]): r["w"] for r in rolled.collect()}
    sampled = events.filter(F.pmod(F.xxhash64(F.col("user_id")), F.lit(mod)) == 0)
    want = {
        (r["src"], r["dst"]): r["w"]
        for r in event_edges(
            sampled, window="6 hours", max_users_per_window=10**9
        ).collect()
    }
    assert got == want
    assert len(got) > 0
