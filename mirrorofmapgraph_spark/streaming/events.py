"""Structured Streaming over the `events` table shape
(event_id, ts, user_id, event_type, value, props).

The reference has no streaming surface (SURVEY.md §2.6) — its loop is
iterative batch. This module adds the Spark-native streaming layer a
production link-graph/training pipeline needs: file-source ingestion,
watermarked tumbling-window aggregation, and incremental edge extraction
(event stream -> user->user interaction edges) that feeds the GAS engine
between supersteps. Every transformation also runs in plain batch mode
(same function, batch DataFrame in) — tested both ways.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type. Works on both a
    streaming and a batch DataFrame (watermark is a no-op in batch)."""
    src = events
    if src.isStreaming:
        # watermarks require TIMESTAMP (LTZ); parquet written with NTZ is
        # cast in the session timezone (UTC) — values are unchanged.
        if dict(src.dtypes)["ts"] == "timestamp_ntz":
            src = src.withColumn("ts", F.col("ts").cast("timestamp"))
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, *, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: per-user sessions split on inactivity gaps.
    (user_id, session_id, session_start, n_events, sum_value).

    One window-function pass (lag + cumulative sum) — the standard
    shuffle-once formulation.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # unix_timestamp handles both TIMESTAMP and TIMESTAMP_NTZ (Spark 4
    # forbids a direct cast of NTZ to numeric)
    epoch = F.unix_timestamp(F.col("ts"))
    gap = epoch - F.lag(epoch).over(w)
    marked = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = marked.withColumn(
        "session_seq", F.sum("_new_session").over(w)
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def sessionize_native(events: DataFrame, *, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via Spark's native ``session_window`` — the
    Structured-Streaming-capable formulation (state store + watermark
    handle late data incrementally; in batch it is equivalent grouping).
    Output: (user_id, session_start, n_events, sum_value).

    Note the session identity differs from ``sessionize`` (window struct
    vs running sequence number) but the session PARTITIONING of events is
    identical — asserted in tests by comparing (user, session_start,
    n_events, sum_value) sets."""
    src = events
    if src.isStreaming and dict(src.dtypes).get("ts") == "timestamp_ntz":
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        src.groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def event_edges(
    events: DataFrame,
    *,
    window: str = "1 hour",
    max_users_per_window: int = 1000,
    watermark: str = "2 hours",
    stream_user_mod: int = 1,
    user_pred: Column | None = None,
) -> DataFrame:
    """Incremental graph feed: co-occurrence edges between users active in
    the same window.

    Batch: returns (src, dst, w=co-occurrence count across windows). Scale
    bound: the per-window self-join is quadratic in window activity (one
    hour with 1M active users = 5*10^11 pairs), so each window keeps only
    its ``max_users_per_window`` MOST ACTIVE users (event count desc,
    user_id asc tiebreak — deterministic); the rest are dropped from that
    window's clique. Cost is bounded by windows * cap^2 regardless of
    corpus size. The ranking window is partitioned by `win`, so no global
    single-partition sort.

    Streaming: the exact top-k cap needs a per-window ranking, which
    Structured Streaming cannot do incrementally (a non-time row_number on
    a stream throws AnalysisException), so the streaming path is
    watermark-safe by construction instead: watermarked ``dropDuplicates``
    for the per-window activity set, an APPROXIMATE activity cap via
    deterministic hash sampling (keep users with
    ``xxhash64(user_id) % stream_user_mod == 0``; default 1 = keep all),
    and a window-equality stream-stream self-join. The output is the
    per-window pair stream (win_start, src, dst, w=1.0) in append mode;
    roll up w across windows in the sink or a downstream batch job — see
    ``rollup_event_edges`` / ``stream_event_edges_to_parquet`` for the
    runnable composition (a chained cross-window aggregation after a
    stream-stream join is not incrementally supported).

    The streaming path CANNOT honor ``max_users_per_window`` (no exact
    per-window top-k on a stream): with ``stream_user_mod`` left at 1 the
    window self-join is UNBOUNDED in window activity — one hot window with
    1M active users is 5*10^11 pairs. A loud warning fires in that
    configuration; pass ``stream_user_mod > 1`` (keep ~1/mod of users) to
    bound it, or acknowledge the risk knowingly.

    ``user_pred`` (optional, both paths): an explicit user-sampling
    predicate over the input columns that replaces the ``xxhash64``
    sampler — for callers that need the sample reproducible OUTSIDE Spark
    (e.g. a plain-arithmetic predicate a SQL oracle can mirror;
    ``xxhash64`` is Spark-specific). Supplying it counts as bounding the
    join, so the unbounded-config warning does not fire."""
    if user_pred is not None:
        events = events.filter(user_pred)
    if events.isStreaming:
        if stream_user_mod <= 1 and user_pred is None:
            import warnings

            warnings.warn(
                "event_edges on a STREAM ignores max_users_per_window (no "
                "exact per-window top-k incrementally); with "
                "stream_user_mod=1 the per-window self-join is unbounded — "
                "a hot window blows up quadratically. Pass stream_user_mod>1 "
                "to hash-sample users and bound the join.",
                RuntimeWarning,
                stacklevel=2,
            )
        src = events
        if dict(src.dtypes).get("ts") == "timestamp_ntz":
            src = src.withColumn("ts", F.col("ts").cast("timestamp"))
        act = (
            src.withWatermark("ts", watermark)
            .select(F.window("ts", window).alias("win"), "user_id")
        )
        if stream_user_mod > 1 and user_pred is None:
            act = act.filter(
                F.pmod(F.xxhash64(F.col("user_id")), F.lit(stream_user_mod)) == 0
            )
        act = act.dropDuplicates(["win", "user_id"])
        a = act.select("win", F.col("user_id").alias("src"))
        b = act.select("win", F.col("user_id").alias("dst"))
        return (
            a.join(b, on="win")
            .filter(F.col("src") < F.col("dst"))
            .select(
                F.col("win.start").alias("win_start"), "src", "dst",
                F.lit(1.0).alias("w"),
            )
        )
    act = events.select(F.window("ts", window).alias("win"), "user_id").groupBy(
        "win", "user_id"
    ).agg(F.count("*").alias("_n_ev"))
    from pyspark.sql.window import Window

    rk = F.row_number().over(
        Window.partitionBy("win").orderBy(F.desc("_n_ev"), F.asc("user_id"))
    )
    from pyspark.storagelevel import StorageLevel

    # BOTH sides of the pair self-join reference this frame — without a
    # persist the scan + activity groupBy + per-window ranking all run
    # twice (measured ~2x the query). Linear state: <= cap rows per
    # window, MEMORY_AND_DISK, LRU-evicted.
    act = (
        act.withColumn("_rk", rk)
        .filter(F.col("_rk") <= max_users_per_window)
        .select("win", "user_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = act.select("win", F.col("user_id").alias("src"))
    b = act.select("win", F.col("user_id").alias("dst"))
    return (
        a.join(b, on="win")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )


def rollup_event_edges(pair_batches: DataFrame) -> DataFrame:
    """Downstream rollup for the STREAMING ``event_edges`` output: collapse
    the per-window pair stream (win_start, src, dst, w) into the batch
    shape (src, dst, w = number of co-occurrence windows).

    This is the documented second half of the 100 TB incremental feed:
    the stream appends per-window pairs to a sink (parquet directory /
    table — see ``stream_event_edges_to_parquet``), and this one groupBy
    runs over the sink as a batch job (or inside ``foreachBatch`` against
    an idempotent MERGE target). Exactly one shuffle, keyed on (src, dst).
    A pair may appear at most once per window (the stream dedups activity
    per (win, user)), so SUM(w) == COUNT(*) == the batch path's count."""
    return pair_batches.groupBy("src", "dst").agg(
        F.sum("w").cast("double").alias("w")
    )


def stream_event_edges_to_parquet(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    stream_user_mod: int = 2,
    user_pred: Column | None = None,
    timeout_s: int = 120,
):
    """End-to-end incremental edge feed: streaming ``event_edges`` appended
    to a parquet directory; ``rollup_event_edges`` over that directory then
    yields the cross-window edge weights. Returns the StreamingQuery after
    draining all currently-available input (availableNow trigger).

    The append sink + batch rollup composition is the incrementally-safe
    factoring: the per-window pair stream is append-only past the
    watermark, and the rollup is a pure batch aggregation that can run at
    any cadence (or as foreachBatch MERGE into a keyed table)."""
    pairs = event_edges(
        events, window=window, watermark=watermark,
        stream_user_mod=stream_user_mod, user_pred=user_pred,
    )
    q = (
        pairs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def user_running_totals(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    RUNNING totals maintained in the state store across micro-batches —
    (user_id, n_events, sum_value, last_ts), one updated row per user per
    batch that touched them. The Spark-native analogue of a keyed
    incremental accumulator feeding the link-graph pipeline (e.g. activity
    scores refreshed as events stream in).

    State is one tiny tuple per user (count, sum, max-ts micros) — the
    state store scales with |users|, not |events|; each batch's events
    arrive Arrow-batched per key group. In batch mode the same function
    degrades to a plain groupBy aggregation (equivalence tested: a
    two-phase streamed run must equal the one-shot batch totals).
    """
    src = events
    if not src.isStreaming:
        return src.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
    if dict(src.dtypes).get("ts") == "timestamp_ntz":
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    src = src.withWatermark("ts", watermark)

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n, s, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdf_iter:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
            if len(pdf):
                # pandas Timestamp -> microseconds since epoch (state
                # stores primitives)
                mx = pdf["ts"].max()
                last_us = max(last_us, int(mx.value // 1000))
        state.update((n, s, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(s, 6)],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double, last_ts timestamp",
        stateStructType="n long, s double, last_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_from_directory(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """File-source stream over a directory of parquet event files."""
    reader = spark.readStream.format("parquet")
    if schema:
        reader = reader.schema(schema)
    else:
        static = spark.read.parquet(path)
        reader = reader.schema(static.schema)
    return reader.load(path)


def run_stream_to_memory(
    df: DataFrame, query_name: str, *, timeout_s: int = 60,
    output_mode: str = "complete",
) -> None:
    """Drive a streaming DataFrame into an in-memory sink until all
    available data is processed (test/bench harness)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
