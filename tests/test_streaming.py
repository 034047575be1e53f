"""Streaming-specific semantics beyond the hash-checked jobs."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_stateful_final_state_matches_batch(spark):
    """applyInPandasWithState per-user totals must converge to the
    batch groupBy aggregate (state correctness, independent of
    micro-batch boundaries)."""
    from database_scan_spark.catalog import load
    from database_scan_spark.streaming.jobs import stream_stateful_user_totals

    out = stream_stateful_user_totals(spark, SF_SMOKE)
    # the spec now returns the final state per user directly
    # (max_by over the monotone n_events across update emissions)
    rows = out.collect()
    final = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in rows
    }
    assert len(rows) == len(final), "final-state selection must be 1 row/user"
    batch = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in load(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert final == batch


def test_watermark_append_drops_open_windows(spark):
    """Append mode + watermark emits only finalized windows: the
    stream's append output must be a subset of the batch windows,
    missing exactly the windows not yet past the watermark at
    end-of-input."""
    import os
    import shutil

    from database_scan_spark.operators._helpers import workdir
    from database_scan_spark.operators.windows import win_tumbling
    from database_scan_spark.streaming.jobs import _events_stream

    ev = _events_stream(spark, SF_SMOKE).withWatermark("ts", "10 minutes")
    agg = ev.groupBy(F.window("ts", "5 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    ckpt = os.path.join(workdir(SF_SMOKE, "test_append"), "ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        agg.select(F.col("w.start").alias("w_start"), "n_events")
        .writeStream.format("memory")
        .queryName("test_append_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    appended = {
        (r["w_start"], r["n_events"]) for r in spark.table("test_append_sink").collect()
    }
    batch = {
        (r["w_start"], r["n_events"])
        for r in win_tumbling(spark, SF_SMOKE)
        .groupBy("w_start")
        .agg(F.sum("n_events").alias("n_events"))
        .collect()
    }
    assert appended <= batch
    # every batch window older than (max ts - watermark) must have been emitted
    missing = batch - appended
    if missing:
        max_start = max(w for w, _ in batch)
        assert all(w >= max_start for w, _ in missing) or len(missing) <= 4


def test_transform_with_state_matches_batch_aggregate(spark):
    """The Spark 4 arbitrary-state API end-to-end: the TWS ValueState
    totals must equal the batch groupBy aggregate exactly (int-cents
    accumulators make the comparison order-independent). Also proves
    the runtime protobuf staging (_ensure_tws_protobuf) works in this
    session."""
    from database_scan_spark.catalog import load
    from database_scan_spark.streaming.jobs import stream_stateful_running_total

    got = {
        (r["user_id"], r["n_events"], r["total_cents"])
        for r in stream_stateful_running_total(spark, SF_SMOKE).collect()
    }
    want = {
        (r["user_id"], r["n_events"], r["total_cents"])
        for r in load(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        )
        .collect()
    }
    assert got == want


def test_tws_list_and_map_state_match_batch(spark):
    """ListState (recent-k) and MapState (type counts) operators must
    equal their batch equivalents exactly."""
    from database_scan_spark.catalog import load
    from database_scan_spark.streaming.jobs import (
        stream_tws_recent_events,
        stream_tws_type_counts,
    )
    from pyspark.sql import Window

    ev = load(spark, SF_SMOKE, "events")
    got_recent = {
        (r["user_id"], r["rank"], r["event_id"])
        for r in stream_tws_recent_events(spark, SF_SMOKE).collect()
    }
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    want_recent = {
        (r["user_id"], r["rn"], r["event_id"])
        for r in ev.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    assert got_recent == want_recent

    got_counts = {
        (r["user_id"], r["event_type"], r["n_events"])
        for r in stream_tws_type_counts(spark, SF_SMOKE).collect()
    }
    want_counts = {
        (r["user_id"], r["event_type"], r["n"])
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got_counts == want_counts


def test_python_stream_source_pages_per_batch(spark):
    """src_python_stream_datasource must actually page: the staged
    layout has 4 response pages and the processing-time trigger must
    commit one offset per page (>= 4 committed batches; availableNow
    would coalesce them into one). Offset files in the checkpoint are
    the engine's own durable evidence."""
    import glob
    import os

    from database_scan_spark.operators._helpers import workdir
    from database_scan_spark.operators.sources_sinks import (
        src_python_stream_datasource,
    )

    out = src_python_stream_datasource(spark, SF_SMOKE)
    assert out.count() > 0
    ckpt = os.path.join(workdir(SF_SMOKE, "src_python_stream_datasource"), "checkpoint")
    offsets = [
        p for p in glob.glob(os.path.join(ckpt, "offsets", "*"))
        if os.path.basename(p).isdigit()
    ]
    n_pages = len(glob.glob(os.path.join(workdir(SF_SMOKE, "graphql_pages"), "page=*")))
    assert n_pages >= 4
    assert len(offsets) >= n_pages


def test_python_stream_source_replay_is_deterministic(spark):
    """Exactly-once recovery contract: `readBetweenOffsets(start, end)`
    must re-serve precisely the rows the original `read` calls produced
    for that offset range — asserted by driving the reader directly
    (it is plain Python over the page files; no Spark needed beyond
    staging the pages)."""
    from pyspark.sql.types import StructType

    from database_scan_spark.operators._helpers import workdir
    from database_scan_spark.sources.graphql_snapshot import materialize_pages
    from database_scan_spark.sources.page_stream import make_page_stream_source

    pages_dir = workdir(SF_SMOKE, "graphql_pages")
    materialize_pages(spark, SF_SMOKE, pages_dir)
    cls = make_page_stream_source()
    ds = cls(options={"path": pages_dir})
    schema = StructType.fromDDL(ds.schema())
    reader = ds.simpleStreamReader(schema)

    # walk the stream page by page, recording rows per offset step
    offset = reader.initialOffset()
    walked = []
    while True:
        rows, nxt = reader.read(offset)
        rows = list(rows)
        if nxt == offset:
            assert rows == []  # exhausted stream must be stable
            break
        walked.append((offset, nxt, rows))
        offset = nxt
    assert len(walked) >= 4  # one batch per staged page

    # any committed range must replay byte-identically
    for start, end, rows in walked:
        assert list(reader.readBetweenOffsets(start, end)) == rows
    full = [r for _, _, rows in walked for r in rows]
    assert list(reader.readBetweenOffsets(walked[0][0], walked[-1][1])) == full


def test_python_stream_source_checkpoint_resume_exactly_once(spark):
    """Exactly-once across a STOP/RESUME cycle: drain the staged pages
    into an append-mode sink, stop, stage two MORE pages, restart from
    the same checkpoint — the resumed query must deliver exactly the
    new pages' rows (no replay of committed pages, no loss), so the
    union of both runs equals the full corpus with no duplicates."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from database_scan_spark.operators._helpers import workdir
    from database_scan_spark.sources.graphql_snapshot import materialize_pages
    from database_scan_spark.sources.page_stream import make_page_stream_source

    base = workdir(SF_SMOKE, "page_stream_resume_test")
    pages_src = workdir(SF_SMOKE, "graphql_pages")
    materialize_pages(spark, SF_SMOKE, pages_src)
    all_pages = sorted(glob.glob(os.path.join(pages_src, "page=*")))
    assert len(all_pages) >= 4
    # wave 1: first half of the pages; wave 2 adds the rest
    stream_dir = os.path.join(base, "pages")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(stream_dir)
    half = len(all_pages) // 2
    for p in all_pages[:half]:
        shutil.copytree(p, os.path.join(stream_dir, os.path.basename(p)))

    try:
        spark.dataSource.register(make_page_stream_source())
    except Exception:
        pass

    out_dir = os.path.join(base, "out")

    def drain() -> None:
        # FILE sink: the one that actually supports checkpoint
        # recovery (memory sinks refuse to resume); its _spark_metadata
        # commit log is what makes the output exactly-once.
        q = (
            spark.readStream.format("page_stream")
            .option("path", stream_dir)
            .load()
            .writeStream.format("json")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    schema = "entity_id bigint, edge_id bigint, score double"
    drain()
    n1 = spark.read.schema(schema).json(out_dir).count()
    for p in all_pages[half:]:
        shutil.copytree(p, os.path.join(stream_dir, os.path.basename(p)))
    drain()  # same checkpoint: resumes at the committed offset
    committed = spark.read.schema(schema).json(out_dir)

    total_rows = (
        spark.read.schema(schema).json(os.path.join(pages_src, "page=*")).count()
    )
    run1_rows = (
        spark.read.schema(schema)
        .json([os.path.join(pages_src, os.path.basename(p)) for p in all_pages[:half]])
        .count()
    )
    assert n1 == run1_rows  # wave 1 delivered exactly its pages
    assert committed.count() == total_rows  # resume added ONLY the new pages
    # and nothing was double-counted
    assert committed.select("edge_id").distinct().count() == total_rows


def test_corpus_ingest_rerun_idempotent_and_ledger_monotone(spark):
    """stream_corpus_ingest: a re-run from a fresh checkpoint must
    reproduce the identical manifest (batchId-keyed sinks are
    idempotent), and the cross-batch ledger must make per-batch new
    docs disjoint: total new docs == distinct canonical hashes among
    gated docs (each content admitted exactly once)."""
    import pyspark.sql.functions as F

    from conftest import SF_SMOKE
    from database_scan_spark.catalog import load
    from database_scan_spark.operators._helpers import h32
    from database_scan_spark.streaming.jobs import (
        _SCI_MAX_WORD_LEN,
        _SCI_MIN_TOKENS,
        stream_corpus_ingest,
    )

    a = sorted(map(tuple, stream_corpus_ingest(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, stream_corpus_ingest(spark, SF_SMOKE).collect()))
    assert a == b

    docs = load(spark, SF_SMOKE, "documents")
    n_ws = F.size(F.split("text", " "))
    gated = docs.filter(
        (n_ws >= _SCI_MIN_TOKENS)
        & ((F.length("text") - n_ws + 1) / n_ws <= _SCI_MAX_WORD_LEN)
    )
    distinct_contents = (
        gated.select(h32(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias("h"))
        .distinct()
        .count()
    )
    assert sum(r[1] for r in a) == distinct_contents


def test_tws_protobuf_bootstrap_is_self_contained(spark):
    """VERDICT r3 item 4: the TWS protobuf shim must work from the
    repo's vendored runtime alone — no gcloud-SDK path, no pip
    protobuf. Asserts the vendored package is present and that the
    bootstrap hands workers exactly (a) the vendored dir on
    PYTHONPATH and (b) the version-skew escape hatch."""
    import importlib.util
    import os

    from database_scan_spark.streaming.jobs import (
        _PB_VENDORED,
        _ensure_tws_protobuf,
    )

    assert os.path.isfile(
        os.path.join(_PB_VENDORED, "google", "protobuf", "descriptor.py")
    )
    assert _PB_VENDORED.startswith(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ), "vendored runtime must live inside the repo"
    _ensure_tws_protobuf(spark)
    try:
        have_pb = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace at all
        have_pb = False
    if not have_pb:
        env = spark.sparkContext.environment
        assert _PB_VENDORED in env.get("PYTHONPATH", "").split(os.pathsep)
        assert env.get("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK") == "true"


def test_eventtime_timer_fires_on_exact_watermark_tie(spark, tmp_path):
    """Boundary regression (round-4 self-review): Spark's
    TimerStateImpl expires timers with timerTs <= watermark, so a
    deadline landing EXACTLY on the final watermark millisecond must
    be emitted — and the oracle must keep it too (its filter is <=,
    not <). Builds a fixture where one user's tier-13 deadline equals
    the corpus max event time to the millisecond."""
    import os

    import duckdb

    from database_scan_spark.catalog import TABLES
    from database_scan_spark.streaming.jobs import (
        STREAM_TWS_EVENTTIME_TIMER_ORACLE,
        stream_tws_eventtime_timer,
    )
    from database_scan_spark.testing import assert_match, run_oracle

    fix = tmp_path / "sf_tie"
    fix.mkdir()
    for name in TABLES:
        src = os.path.join(SF_SMOKE, f"{name}.parquet")
        if name != "events" and os.path.exists(src):
            os.symlink(src, fix / f"{name}.parquet")
    # user 10 (tier 13 + 10%5*4 = 13 days): first event on an exact
    # second; corpus max event = that second + exactly 13 days, so
    # deadline_ms == final watermark_ms to the millisecond. All events
    # predate the Jan-16 split (one data batch); the tie fires in the
    # trailing no-data batch. user 12's deadline lands 1 ms past the
    # watermark: never fires.
    duckdb.sql(
        f"""
        COPY (
            SELECT * FROM (VALUES
                (1, TIMESTAMP '2024-01-02 00:00:00',        10, 'click', 1.0, '{{}}'),
                (2, TIMESTAMP '2024-01-03 12:00:00',        10, 'click', 1.0, '{{}}'),
                (3, TIMESTAMP '2024-01-02 00:00:00.001',    12, 'view',  1.0, '{{}}'),
                (4, TIMESTAMP '2024-01-14 23:00:00',        11, 'view',  1.0, '{{}}'),
                (5, TIMESTAMP '2024-01-15 00:00:00',        13, 'view',  1.0, '{{}}'),
                (6, TIMESTAMP '2024-01-15 00:00:00',        10, 'buy',   1.0, '{{}}')
            ) AS t(event_id, ts, user_id, event_type, value, props)
        ) TO '{fix}/events.parquet' (FORMAT PARQUET)
        """
    )
    pdf = stream_tws_eventtime_timer(spark, str(fix)).toPandas()
    assert 10 in set(pdf.user_id), "tie deadline (== watermark) must fire"
    assert 12 not in set(pdf.user_id), "deadline 1ms past watermark must not"
    assert_match(
        pdf,
        run_oracle(STREAM_TWS_EVENTTIME_TIMER_ORACLE, str(fix)),
        "stream_tws_eventtime_timer/tie",
    )


def test_stateful_totals_boundary_independent(spark, tmp_path):
    """The r5 oracle for stream_stateful_user_totals claims the result
    is independent of micro-batch boundaries. Force a MULTI-batch run
    (events split into 4 files, maxFilesPerTrigger=1 under
    availableNow) and assert the final-state selection still equals
    the batch aggregate — the cross-batch GroupState path the
    single-file fixture never exercises."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from database_scan_spark.catalog import load
    from database_scan_spark.streaming.jobs import (
        _STATE_OUT_SCHEMA,
        _STATE_SCHEMA,
        _user_totals_fn,
    )

    ev = load(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _user_totals_fn(),
        outputStructType=_STATE_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("multi_batch_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.table("multi_batch_totals")
    n_batches = sink.select("user_id").count() / sink.select("user_id").distinct().count()
    final = (
        sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .collect()
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in final}
    want = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want
    # prove the run actually crossed batch boundaries (else vacuous)
    assert n_batches > 1.5, f"expected multiple update emissions, got {n_batches}"


def test_tws_running_total_boundary_independent(spark, tmp_path):
    """The TWS twin of test_stateful_totals_boundary_independent:
    transformWithStateInPandas ValueState must carry per-user totals
    across REAL micro-batch boundaries (4 files, maxFilesPerTrigger=1)
    — the final state per user equals the batch aggregate. The
    registered spec runs the single-file fixture (one batch, one row
    per user); this exercises the cross-batch state path the fixture
    never hits."""
    from pyspark.sql import functions as F

    from database_scan_spark.catalog import load
    from database_scan_spark.streaming.jobs import (
        _ensure_tws_protobuf,
        _running_total_processor,
    )

    _ensure_tws_protobuf(spark)
    ev = load(spark, SF_SMOKE, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, cents long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_running_total_processor(),
        outputStructType="user_id long, n_events long, total_cents long",
        outputMode="Update",
        timeMode="None",
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("tws_multi_batch")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    sink = spark.table("tws_multi_batch")
    n_rows = sink.count()
    final = sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_cents", "n_events").alias("total_cents"),
    )
    got = {
        (r["user_id"], r["n_events"], r["total_cents"]) for r in final.collect()
    }
    want = {
        (r["user_id"], r["n"], r["tc"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("tc"))
        .collect()
    }
    assert got == want
    assert n_rows > len(want), "expected multiple update emissions per user"


def test_tws_list_state_accumulates_across_batches(spark, tmp_path):
    """ListState across real micro-batch boundaries: the final top-3
    recent-events ranking per user depends on events spread over 4
    files (maxFilesPerTrigger=1), so it can only be emitted if the
    bounded list state survived and re-sorted across batches — assert
    every (user, rank, event) of the batch-computed truth appears in
    the update-mode sink."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_scan_spark.catalog import load
    from database_scan_spark.streaming.jobs import (
        _ensure_tws_protobuf,
        _recent_events_processor,
    )

    _ensure_tws_protobuf(spark)
    ev = load(spark, SF_SMOKE, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts_us long, event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_recent_events_processor(3),
        outputStructType="user_id long, rank int, event_id long",
        outputMode="Update",
        timeMode="None",
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("tws_list_multi_batch")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    sink_rows = {
        (r["user_id"], r["rank"], r["event_id"])
        for r in spark.table("tws_list_multi_batch").collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
    want = {
        (r["user_id"], r["rn"], r["event_id"])
        for r in ev.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    assert want <= sink_rows
    assert len(sink_rows) > len(want), "expected multiple update emissions"


def test_stream_chaos_kill_midbatch_exactly_once(spark, tmp_path):
    """Chaos drill (VERDICT r5 item 8): SIGKILL the whole streaming
    driver (python + JVM process group) BETWEEN a micro-batch's
    side-effect write and its checkpoint commit, restart from the same
    checkpoint, and prove exactly-once at the sink.

    stream_checkpoint_resume proves CLEAN stop/resume; this proves the
    crash case a 100 TB ingest actually fears: batch 1's output is
    durable but its commit is lost, so the restarted query MUST re-run
    batch 1 with the SAME epoch id (idempotent overwrite — no
    duplicates) and then process the remaining file (no loss). The
    attempt tag makes replay visible: after recovery, batch 0 rows
    still carry attempt=1 (committed work is never re-run) while batch
    1 and batch 2 rows carry attempt=2 (batch 1 recovered, batch 2
    fresh)."""
    import glob
    import os
    import signal
    import subprocess
    import sys

    from database_scan_spark.catalog import load
    from database_scan_spark.operators._helpers import h32

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    os.makedirs(out)
    # three single-file "arrivals" split by a deterministic hash
    ev = load(spark, SF_SMOKE, "events").select("event_id", "value")
    third = h32(F.concat(F.lit("chaos-"), F.col("event_id"))) % 3
    for i in range(3):
        part_dir = str(tmp_path / f"part{i}")
        ev.filter(third == i).coalesce(1).write.parquet(part_dir)
        os.replace(
            glob.glob(os.path.join(part_dir, "*.parquet"))[0],
            os.path.join(src, f"events_{i}.parquet"),
        )
    all_ids = {r["event_id"] for r in ev.collect()}

    runner = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "chaos_stream_runner.py")

    def run(mode: str, attempt: int):
        # own process group so the in-runner killpg cannot reach pytest,
        # and so we can reap any straggler JVM afterwards
        proc = subprocess.Popen(
            [sys.executable, runner, "stateless", mode, src, ckpt, out,
             str(attempt)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            start_new_session=True,
        )
        try:
            _, err = proc.communicate(timeout=240)
        finally:
            try:  # reap anything the group left behind (orphaned JVM)
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
        return proc.returncode, err

    crash_rc, crash_err = run("kill", attempt=1)
    assert crash_rc == -signal.SIGKILL.value, (
        f"run 1 should die by SIGKILL mid-batch, got {crash_rc}\n"
        f"stderr tail: {crash_err[-2000:]}"
    )
    assert os.path.exists(os.path.join(out, "_KILLED_MIDBATCH")), (
        "kill marker missing — the crash did not happen inside batch 1's "
        "foreachBatch (test would be vacuous)"
    )
    # the failure is BETWEEN side effect and commit: batch 1's data is
    # on disk, but the commit log records only batch 0
    assert os.path.exists(os.path.join(out, "batch=1"))
    committed = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(ckpt, "commits", "*"))
        if not os.path.basename(p).startswith(".")
    }
    assert committed == {"0"}, (
        f"expected exactly batch 0 committed before the crash: {committed}"
    )

    resume_rc, resume_err = run("resume", attempt=2)
    assert resume_rc == 0, (
        f"resume failed rc={resume_rc}\n"
        f"stderr tail: {resume_err[-2000:]}"
    )

    got = spark.read.option("basePath", out).parquet(
        *(os.path.join(out, f"batch={i}") for i in range(3))
    )
    rows = got.select("event_id", "batch", "attempt").collect()
    # exactly-once: every source row exactly once across all batches
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids)) == len(all_ids)
    assert set(ids) == all_ids
    # committed work never re-ran; uncommitted batch was recovered
    by_batch = {}
    for r in rows:
        by_batch.setdefault(int(r["batch"]), set()).add(r["attempt"])
    assert by_batch[0] == {1}, f"batch 0 re-ran after commit: {by_batch[0]}"
    assert by_batch[1] == {2}, (
        f"batch 1 not recovered by the restart (attempt tags {by_batch[1]})"
    )
    assert by_batch[2] == {2}


def test_stream_chaos_kill_midbatch_stateful_state_rewind(spark, tmp_path):
    """Stateful chaos twin: the same mid-batch SIGKILL, but on a
    complete-mode groupBy COUNT — so the restart must REWIND the state
    store to batch 0's committed version and re-apply batch 1 exactly
    once. Double-applied state (replaying batch 1 on top of its own
    uncommitted state update) would inflate the final counts; lost
    state would deflate them. The final complete-mode emission must
    equal the plain batch aggregate of all three files."""
    import glob
    import os
    import signal
    import subprocess
    import sys

    from database_scan_spark.catalog import load
    from database_scan_spark.operators._helpers import h32

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    os.makedirs(out)
    ev = load(spark, SF_SMOKE, "events").select("event_id", "event_type")
    third = h32(F.concat(F.lit("chaos2-"), F.col("event_id"))) % 3
    for i in range(3):
        part_dir = str(tmp_path / f"part{i}")
        ev.filter(third == i).coalesce(1).write.parquet(part_dir)
        os.replace(
            glob.glob(os.path.join(part_dir, "*.parquet"))[0],
            os.path.join(src, f"events_{i}.parquet"),
        )
    want = {
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    runner = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "chaos_stream_runner.py")

    def run(mode: str, attempt: int):
        proc = subprocess.Popen(
            [sys.executable, runner, "stateful", mode, src, ckpt, out,
             str(attempt)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            start_new_session=True,
        )
        try:
            _, err = proc.communicate(timeout=240)
        finally:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
        return proc.returncode, err

    crash_rc, crash_err = run("kill", attempt=1)
    assert crash_rc == -signal.SIGKILL.value, (
        f"run 1 should die by SIGKILL mid-batch, got {crash_rc}\n"
        f"stderr tail: {crash_err[-2000:]}"
    )
    assert os.path.exists(os.path.join(out, "_KILLED_MIDBATCH"))
    committed = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(ckpt, "commits", "*"))
        if not os.path.basename(p).startswith(".")
    }
    assert committed == {"0"}, f"expected only batch 0 committed: {committed}"

    resume_rc, resume_err = run("resume", attempt=2)
    assert resume_rc == 0, (
        f"resume failed rc={resume_rc}\nstderr tail: {resume_err[-2000:]}"
    )

    # the LAST batch's complete-mode emission is the final state
    last = max(
        int(os.path.basename(p).split("=")[1])
        for p in glob.glob(os.path.join(out, "batch=*"))
    )
    assert last == 2
    final = spark.read.parquet(os.path.join(out, f"batch={last}"))
    got = {(r["event_type"], r["n"]) for r in final.collect()}
    assert got == want, (
        f"state not exactly-once after mid-batch kill: got {sorted(got)} "
        f"want {sorted(want)}"
    )
    assert {r["attempt"] for r in final.collect()} == {2}
