"""Streaming engine tests: incremental clustering over micro-batches,
exactly-once output, checkpoint resume, watermark late-drop, native
windows, stateful applyInPandasWithState clustering."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mapping_analysis_spark.datagen.clips import clips_spark_df
from mapping_analysis_spark.pipeline import PipelineConfig, run_batch
from mapping_analysis_spark.streaming.engine import StreamingERConfig, StreamingERJob

N_CLUSTERS = 60


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """Clips corpus split into several source files (≈ micro-batches)."""
    root = str(tmp_path_factory.mktemp("stream_src"))
    df = clips_spark_df(spark, N_CLUSTERS, seed=7).orderBy("event_time")
    pdf = df.toPandas()
    n = len(pdf)
    chunks = 4
    step = (n + chunks - 1) // chunks
    for i in range(chunks):
        part = pdf.iloc[i * step : (i + 1) * step]
        spark.createDataFrame(part, df.schema).drop("gold_cluster").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(root, f"chunk={i}"))
    # flatten: file stream wants files under one dir
    flat = str(tmp_path_factory.mktemp("stream_flat"))
    idx = 0
    for sub in sorted(os.listdir(root)):
        for fn in os.listdir(os.path.join(root, sub)):
            if fn.endswith(".parquet"):
                shutil.copy(
                    os.path.join(root, sub, fn),
                    os.path.join(flat, f"part-{idx:04d}.parquet"),
                )
                idx += 1
    return flat, df


def _run_job(spark, source_dir, work_dir, max_files=1):
    cfg = StreamingERConfig(
        source_dir=source_dir,
        work_dir=work_dir,
        watermark_delay_sec=24 * 3600,  # generous: datagen has late rows
        max_files_per_trigger=max_files,
        pipeline=PipelineConfig(min_sim=0.7),
    )
    job = StreamingERJob(spark, cfg)
    q = job.start(available_now=True)
    q.awaitTermination(600)
    return job


def test_streaming_matches_batch(spark, corpus, tmp_path):
    """All micro-batches processed ⇒ same number of clusters and identical
    membership partition as one batch run (the reference's invariant:
    incremental output == batch output for the same input)."""
    source_dir, full_df = corpus
    job = _run_job(spark, source_dir, str(tmp_path / "work"))
    state = job.final_state()
    assert state is not None
    stream_members = sorted(
        tuple(sorted(r.members)) for r in state.select("members").collect()
    )
    batch = run_batch(
        full_df.drop("gold_cluster"), PipelineConfig(min_sim=0.7)
    )["state"]
    batch_members = sorted(
        tuple(sorted(r.members)) for r in batch.select("members").collect()
    )
    n_rows = full_df.count()
    # every clip appears exactly once in streaming output
    flat = [m for ms in stream_members for m in ms]
    assert len(flat) == len(set(flat)) == n_rows
    # incremental ordering can split/merge borderline pairs differently;
    # demand high agreement, not bit-identity, between the partitions
    sset, bset = set(stream_members), set(batch_members)
    agreement = len(sset & bset) / max(len(sset | bset), 1)
    assert agreement > 0.7, f"stream/batch cluster agreement {agreement:.2f}"


def test_exactly_once_replay(spark, corpus, tmp_path):
    """Re-processing a batch id (simulated replay after crash) leaves the
    output partition unchanged — idempotent commit."""
    source_dir, _ = corpus
    work = str(tmp_path / "work")
    job = _run_job(spark, source_dir, work)
    out_before = (
        job.output().groupBy("batch_id").count().orderBy("batch_id").collect()
    )
    state_rows_before = sorted(
        tuple(sorted(r.members)) for r in job.final_state().select("members").collect()
    )
    # replay the LAST batch: feed the same batch df to process_batch again
    versions = job._committed_versions()
    last = versions[-1]
    from mapping_analysis_spark.schema import CLIPS_SCHEMA

    files = sorted(os.listdir(source_dir))
    replay_df = spark.read.schema(CLIPS_SCHEMA).parquet(
        os.path.join(source_dir, files[last])
    )
    job.process_batch(replay_df, last)
    out_after = (
        job.output().groupBy("batch_id").count().orderBy("batch_id").collect()
    )
    state_rows_after = sorted(
        tuple(sorted(r.members)) for r in job.final_state().select("members").collect()
    )
    assert out_before == out_after
    assert state_rows_before == state_rows_after


def test_checkpoint_resume(spark, corpus, tmp_path):
    """Stop after some batches, restart from checkpoint: final state equals
    an uninterrupted run."""
    source_dir, _ = corpus
    work1 = str(tmp_path / "w1")
    cfg = StreamingERConfig(
        source_dir=source_dir,
        work_dir=work1,
        watermark_delay_sec=24 * 3600,
        max_files_per_trigger=1,
        pipeline=PipelineConfig(min_sim=0.7),
    )
    job = StreamingERJob(spark, cfg)
    # first run: only 2 triggers (availableNow processes all; instead run
    # processingTime and stop early)
    q = job.start(available_now=False)
    import time

    deadline = time.time() + 300
    while time.time() < deadline:
        if len(job._committed_versions()) >= 2:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(60)
    seen = len(job._committed_versions())
    assert seen >= 2
    # resume: same checkpoint dir picks up where it left off
    job2 = StreamingERJob(spark, cfg)
    q2 = job2.start(available_now=True)
    q2.awaitTermination(300)
    # all 4 chunks processed exactly once overall
    state = job2.final_state()
    flat = [m for r in state.select("members").collect() for m in r.members]
    total = spark.read.parquet(source_dir).count()
    assert len(flat) == len(set(flat)) == total
    # compare against uninterrupted run
    job_ref = _run_job(spark, source_dir, str(tmp_path / "w2"))
    ref_members = sorted(
        tuple(sorted(r.members)) for r in job_ref.final_state().select("members").collect()
    )
    got_members = sorted(
        tuple(sorted(r.members)) for r in state.select("members").collect()
    )
    assert got_members == ref_members


def test_delta_state_compaction(spark, corpus, tmp_path):
    """The state store is log-structured: non-compaction batches write only
    their touched clusters + tombstones (d=<batch>), every ``compact_every``
    batches folds the chain into a full snapshot (v=<batch>), and the
    reconstructed final state covers every clip exactly once."""
    source_dir, _ = corpus
    work = str(tmp_path / "work")
    cfg = StreamingERConfig(
        source_dir=source_dir,
        work_dir=work,
        watermark_delay_sec=24 * 3600,
        max_files_per_trigger=1,
        compact_every=2,
        pipeline=PipelineConfig(min_sim=0.7),
    )
    job = StreamingERJob(spark, cfg)
    q = job.start(available_now=True)
    q.awaitTermination(600)
    entries = job._state_entries()
    kinds = dict(entries)
    # batch 0 bootstraps a snapshot; with compact_every=2 the cadence is
    # full, delta, full, delta, ...
    assert kinds[0] == "full"
    for b, k in entries:
        assert k == ("full" if b % 2 == 0 else "delta")
    # a delta holds only the touched clusters, not the whole corpus
    assert any(k == "delta" for _, k in entries)
    # commit-marker bookkeeping equals the reconstructed state's size
    state = job.final_state()
    last_b, last_k = entries[-1]
    assert job._marker_total(last_b, last_k) == state.count()
    flat = [m for r in state.select("members").collect() for m in r.members]
    total = spark.read.parquet(source_dir).count()
    assert len(flat) == len(set(flat)) == total


def test_lineage_written(spark, corpus, tmp_path):
    source_dir, _ = corpus
    job = _run_job(spark, source_dir, str(tmp_path / "work"))
    lin = job.lineage()
    rows = lin.collect()
    assert len(rows) > 0
    cols = set(lin.columns)
    assert {
        "batch_id", "partition", "rows", "n_input", "n_late_dropped",
        "n_clusters_total", "wall_sec",
    } <= cols
    # lineage input counts sum to the corpus size minus late-dropped
    per_batch = (
        lin.select("batch_id", "n_input").distinct().agg(F.sum("n_input"))
    ).collect()[0][0]
    assert per_batch == spark.read.parquet(source_dir).count()


def test_watermark_drops_late_rows(spark, tmp_path):
    """A batch far older than the high-water mark is dropped and counted."""
    import pandas as pd
    from datetime import datetime, timezone

    from mapping_analysis_spark.schema import CLIPS_SCHEMA

    def mk(ts, cid):
        return {
            "clip_id": cid, "bytes": None, "sr_hz": 8000, "dur_ms": 1000,
            "codec": "pcm_s16le", "transcript": f"t {cid}", "source": "1",
            "event_time": ts,
        }

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    fresh = spark.createDataFrame(
        pd.DataFrame([mk(t0, "a1")]), CLIPS_SCHEMA
    )
    from datetime import timedelta

    stale = spark.createDataFrame(
        pd.DataFrame([mk(t0 - timedelta(hours=5), "b1"), mk(t0, "b2")]),
        CLIPS_SCHEMA,
    )
    cfg = StreamingERConfig(
        source_dir=str(tmp_path / "src"),
        work_dir=str(tmp_path / "work"),
        watermark_delay_sec=3600,
        pipeline=PipelineConfig(min_sim=0.7, use_audio=False),
    )
    job = StreamingERJob(spark, cfg)
    job.process_batch(fresh, 0)
    job.process_batch(stale, 1)
    lin = job.lineage().filter(F.col("batch_id") == 1).select("n_late_dropped")
    assert lin.first()[0] == 1
    state = job.final_state()
    members = {m for r in state.select("members").collect() for m in r.members}
    assert len(members) == 2  # a1 + b2; b1 dropped


def test_native_window_ops_stream(spark, corpus, tmp_path):
    """Tumbling/sliding/session windows + stream-stream join run as real
    streaming queries on the clips file stream."""
    source_dir, _ = corpus
    from mapping_analysis_spark.schema import CLIPS_SCHEMA
    from mapping_analysis_spark.streaming.windows import (
        session_arrivals,
        sliding_arrivals,
        stream_stream_block_join,
        tumbling_arrivals,
    )

    stream = spark.readStream.schema(CLIPS_SCHEMA).parquet(source_dir)
    outs = {}
    for name, dfn in {
        "tumbling": tumbling_arrivals(stream),
        "sliding": sliding_arrivals(stream),
        "session": session_arrivals(stream),
        "ssjoin": stream_stream_block_join(stream),
    }.items():
        path = str(tmp_path / name)
        q = (
            dfn.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", path + "_cp")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        outs[name] = spark.read.parquet(path)
    # append mode emits only watermark-closed windows; at least the join
    # must produce pairs, and the queries must run to completion
    assert outs["ssjoin"].count() > 0
    src_dst = outs["ssjoin"].select("src_clip_id", "dst_clip_id").collect()
    assert all(r.src_clip_id < r.dst_clip_id for r in src_dst)


def test_stateful_cluster_stream(spark, corpus, tmp_path):
    """applyInPandasWithState keyed clustering over micro-batches."""
    source_dir, full_df = corpus
    from mapping_analysis_spark.pipeline import PipelineConfig, prepare
    from mapping_analysis_spark.schema import CLIPS_SCHEMA
    from mapping_analysis_spark.streaming.stateful import stateful_cluster_stream

    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    prepared = prepare(stream, PipelineConfig(min_sim=0.7, use_audio=False))
    clustered = stateful_cluster_stream(prepared, threshold=0.7)
    path = str(tmp_path / "out")
    # update-mode stateful output → parquet via foreachBatch (append files,
    # stamped with batch id so the final state is reconstructible)
    q = (
        clustered.writeStream.foreachBatch(
            lambda df, bid: df.withColumn("batch_id", F.lit(bid))
            .write.mode("append")
            .parquet(path)
        )
        .option("checkpointLocation", path + "_cp")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    out = spark.read.parquet(path)
    assert out.count() > 0
    # each batch's emission for a key REPLACES that key's clusters, so the
    # final state = rows of the latest batch per blocking_key; every clip
    # must then appear in exactly one cluster
    from pyspark.sql import Window

    w = Window.partitionBy("blocking_key").orderBy(F.desc("batch_id"))
    final = (
        out.withColumn("_mb", F.max("batch_id").over(w))
        .filter(F.col("batch_id") == F.col("_mb"))
    )
    flat = [m for r in final.select("members").collect() for m in r.members]
    assert len(flat) == len(set(flat))
    total = spark.read.parquet(source_dir).count()
    assert len(flat) == total


def test_observe_metrics_and_progress_log(spark, corpus, tmp_path):
    """df.observe counters land in lineage; the StreamingQueryListener
    appends per-batch progress lines (SURVEY §2.4 accumulators + §2.11
    metrics)."""
    import json

    source_dir, _ = corpus
    work = str(tmp_path / "work")
    job = _run_job(spark, source_dir, work, max_files=2)
    lin = job.lineage()
    assert "n_input_observed" in lin.columns
    # the observed count must equal the driver-side count for every batch
    bad = lin.filter(F.col("n_input") != F.col("n_input_observed")).count()
    assert bad == 0
    log_path = os.path.join(work, "progress.jsonl")
    expected = spark.read.parquet(source_dir).count()
    # the StreamingQueryListener bus is asynchronous — progress lines can
    # trail awaitTermination; poll briefly
    import time as _time

    progress = []
    for _ in range(60):
        if os.path.exists(log_path):
            events = [json.loads(l) for l in open(log_path)]
            progress = [e for e in events if e["event"] == "progress"]
            if sum(p["numInputRows"] for p in progress) >= expected:
                break
        _time.sleep(0.5)
    assert progress and all("numInputRows" in p for p in progress)
    assert sum(p["numInputRows"] for p in progress) >= expected


def test_batch_observations(spark):
    """run_batch exposes input/output Observations readable after an
    action."""
    from mapping_analysis_spark.datagen.clips import clips_spark_df
    from mapping_analysis_spark.pipeline import PipelineConfig, run_batch

    clips = clips_spark_df(spark, 20, seed=11).drop("gold_cluster")
    res = run_batch(clips, PipelineConfig(min_sim=0.7))
    n_clusters = res["clusters"].count()  # fires both observations
    obs_in = res["observations"]["pipeline_input"].get
    obs_out = res["observations"]["pipeline_output"].get
    assert obs_in["rows"] == clips.count()
    assert obs_in["blocking_keys"] > 0
    assert obs_out["clusters"] == n_clusters
    assert obs_out["members_total"] == obs_in["rows"]


def test_band_key_index_rebuild_on_format_change(spark, corpus, tmp_path):
    """The band-key secondary index is versioned: resuming a state store
    whose stored format token differs from the current BAND_KEY_FORMAT must
    rebuild the index from the state's trigram sets (and force a compaction
    to persist it) instead of silently matching zero stored keys."""
    import json
    import time

    from mapping_analysis_spark.operators.blocking import (
        BAND_KEY_FORMAT,
        minhash_band_keys,
    )
    from mapping_analysis_spark.operators.clustering import ClusterRoundConfig

    source_dir, _ = corpus
    work = str(tmp_path / "w")
    cfg = StreamingERConfig(
        source_dir=source_dir,
        work_dir=work,
        watermark_delay_sec=24 * 3600,
        max_files_per_trigger=1,
        pipeline=PipelineConfig(min_sim=0.7),
    )
    job = StreamingERJob(spark, cfg)
    q = job.start(available_now=False)
    deadline = time.time() + 300
    while time.time() < deadline:
        if len(job._committed_versions()) >= 2:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(60)
    entries_before = job._state_entries()
    assert len(entries_before) >= 2
    # simulate a checkpoint written by an older engine: stale format token
    with open(job._band_format_path(), "w") as f:
        json.dump({"format": "murmur-v0"}, f)
    # resume: the first batch must detect the mismatch, rebuild, and force a
    # full snapshot (compact_every=8 would otherwise leave it a delta)
    job2 = StreamingERJob(spark, cfg)
    q2 = job2.start(available_now=True)
    q2.awaitTermination(300)
    entries_after = job2._state_entries()
    resumed = [e for e in entries_after if e not in entries_before]
    assert resumed, "resume processed no batches"
    assert resumed[0][1] == "full", "format mismatch must force compaction"
    assert job2._stored_band_format() == BAND_KEY_FORMAT
    # every persisted band_keys row equals a fresh recomputation from its
    # trigram set (i.e. the index is in the CURRENT format everywhere)
    rcfg = ClusterRoundConfig(min_sim=0.7)
    state = job2.final_state()
    recomputed = state.withColumn(
        "_fresh",
        minhash_band_keys(
            F.col("trigram_set"), rcfg.lsh_bands, rcfg.lsh_rows_per_band, rcfg.lsh_seed
        ),
    )
    bad = recomputed.filter(F.col("band_keys") != F.col("_fresh")).count()
    assert bad == 0
    # and membership still covers every clip exactly once
    flat = [m for r in state.select("members").collect() for m in r.members]
    total = spark.read.parquet(source_dir).count()
    assert len(flat) == len(set(flat)) == total


def test_state_fs_contract(spark, tmp_path):
    """Both StateFS implementations must satisfy the same contract the
    commit protocol relies on — LocalStateFS (POSIX) and HadoopStateFS
    driven against a file:// URI through the session JVM (the identical
    code path a cluster resolves for hdfs:// and s3a://)."""
    from mapping_analysis_spark.streaming.fs import (
        HadoopStateFS,
        LocalStateFS,
        state_fs_for,
    )

    local_root = str(tmp_path / "local")
    hd_root = "file://" + str(tmp_path / "hadoop")
    for fs, root in (
        (state_fs_for(local_root), local_root),
        (state_fs_for(hd_root, spark), hd_root),
    ):
        d = fs.join(root, "state", "d=3")
        assert not fs.exists(d)
        assert fs.listdir(fs.join(root, "state")) == []
        fs.makedirs(d)
        assert fs.exists(d)
        marker = fs.join(d, "_COMMITTED")
        fs.write_text(marker, '{"batch_id": 3}')
        assert fs.read_text(marker) == '{"batch_id": 3}'
        fs.write_text(marker, '{"batch_id": 4}')  # overwrite
        assert fs.read_text(marker) == '{"batch_id": 4}'
        fs.makedirs(fs.join(root, "state", "v=5"))
        assert sorted(fs.listdir(fs.join(root, "state"))) == ["d=3", "v=5"]
        fs.rmtree(fs.join(root, "state", "d=3"))
        assert not fs.exists(d)
        fs.rmtree(fs.join(root, "state", "d=3"))  # idempotent
        assert fs.listdir(fs.join(root, "state")) == ["v=5"]
    # scheme routing
    assert isinstance(state_fs_for(local_root), LocalStateFS)
    assert isinstance(state_fs_for(hd_root, spark), HadoopStateFS)


def test_streaming_job_runs_through_hadoop_fs(spark, corpus, tmp_path):
    """The whole exactly-once protocol must work when work_dir is a URI
    resolved through HadoopStateFS (file:// here; hdfs:// or s3a:// on a
    cluster) — final clusters identical to the POSIX-path run."""
    from mapping_analysis_spark.streaming.fs import HadoopStateFS

    source_dir, _df = corpus
    job_posix = _run_job(spark, source_dir, str(tmp_path / "wp"), max_files=2)
    job_uri = _run_job(
        spark, source_dir, "file://" + str(tmp_path / "wu"), max_files=2
    )
    assert isinstance(job_uri.fs, HadoopStateFS)
    a = job_posix.final_state().select("id", "members")
    b = job_uri.final_state().select("id", "members")
    ka = {(r.id, tuple(r.members)) for r in a.collect()}
    kb = {(r.id, tuple(r.members)) for r in b.collect()}
    assert ka == kb and len(ka) > 0


# ---------------------------------------------------------------------------
# round 4: long-horizon soak + state-store failure injection
# ---------------------------------------------------------------------------


def _make_many_file_corpus(spark, tmp_path_factory, n_clusters=160, files=50):
    """Corpus split into ``files`` single-file micro-batches."""
    root = str(tmp_path_factory.mktemp("soak_flat"))
    df = clips_spark_df(spark, n_clusters, seed=11).orderBy("event_time")
    pdf = df.toPandas().drop(columns=["gold_cluster"])
    step = max(1, len(pdf) // files)  # floor: guarantees >= `files` files
    for i in range((len(pdf) + step - 1) // step):
        part = pdf.iloc[i * step : (i + 1) * step]
        if len(part) == 0:
            break
        part.to_parquet(
            os.path.join(root, f"part-{i:04d}.parquet"),
            index=False,
            coerce_timestamps="us",  # Spark reads TIMESTAMP(MICROS)
            allow_truncated_timestamps=True,
        )
    return root


def _state_dir_stats(work):
    state = os.path.join(work, "state")
    fulls = [d for d in os.listdir(state) if d.startswith("v=")]
    deltas = [d for d in os.listdir(state) if d.startswith("d=")]
    size = 0
    for r, _d, fs in os.walk(state):
        size += sum(os.path.getsize(os.path.join(r, f)) for f in fs)
    return fulls, deltas, size


def test_soak_50_batches_bounded_state_and_midstream_restart(
    spark, tmp_path_factory, tmp_path
):
    """100-TB operation is a months-long stream: drive 50 micro-batches
    through the engine and assert (a) the state directory stays bounded by
    the compaction/retirement policy, (b) watermark metadata does not
    grow, (c) a kill at ~batch 40 + restart replays to the IDENTICAL final
    state as an uninterrupted run."""
    import json as _json
    import time as _time

    source = _make_many_file_corpus(spark, tmp_path_factory)
    n_files = len([f for f in os.listdir(source) if f.endswith(".parquet")])
    assert n_files >= 50

    def cfg_for(work):
        return StreamingERConfig(
            source_dir=source,
            work_dir=work,
            watermark_delay_sec=24 * 3600,
            max_files_per_trigger=1,
            compact_every=8,
            pipeline=PipelineConfig(min_sim=0.7, use_audio=False),
        )

    # --- uninterrupted reference run over all 50 batches
    ref_work = str(tmp_path / "ref")
    ref_job = StreamingERJob(spark, cfg_for(ref_work))
    q = ref_job.start(available_now=True)
    q.awaitTermination(1200)
    # "all batches processed" is read off the PERSISTENT output partitions
    # (one per micro-batch) — _committed_versions() intentionally shrinks
    # as retirement prunes superseded state history
    def n_out(work):
        out = os.path.join(work, "output")
        return len([d for d in os.listdir(out) if d.startswith("batch_id=")])

    ref_batches = n_out(ref_work)
    assert ref_batches >= 50
    # retirement pruned: the live version list stays a bounded window
    assert len(ref_job._committed_versions()) <= 2 * 8 + 2
    # state dir bounded: retirement keeps <=2 snapshots and only the
    # deltas at/after the older one (< 2 compaction generations)
    fulls, deltas, size = _state_dir_stats(ref_work)
    assert len(fulls) <= 2
    assert len(deltas) <= 2 * 8
    assert size < 200 * 1024 * 1024
    # watermark metadata is one fixed-size blob, not a growing log
    wm = os.path.join(ref_work, "state", "_watermark.json")
    assert os.path.getsize(wm) < 1024
    assert set(_json.loads(open(wm).read())) == {"max_event_time"}

    # --- soak with mid-stream kill at ~batch 40 + restart
    work = str(tmp_path / "soak")
    job = StreamingERJob(spark, cfg_for(work))
    q = job.start(available_now=False)  # processingTime: stoppable mid-run
    deadline = _time.time() + 900
    while _time.time() < deadline:
        if n_out(work) >= 40:
            break
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    assert n_out(work) >= 40
    job2 = StreamingERJob(spark, cfg_for(work))
    q2 = job2.start(available_now=True)
    q2.awaitTermination(1200)
    assert n_out(work) == ref_batches
    ref_members = sorted(
        tuple(sorted(r.members))
        for r in ref_job.final_state().select("members").collect()
    )
    got_members = sorted(
        tuple(sorted(r.members))
        for r in job2.final_state().select("members").collect()
    )
    assert got_members == ref_members
    fulls, deltas, _size = _state_dir_stats(work)
    assert len(fulls) <= 2 and len(deltas) <= 2 * 8


def test_truncated_delta_with_marker_is_recovered(spark, corpus, tmp_path):
    """Failure injection (rename-race / partial write): a delta whose
    commit marker landed but whose parquet write is truncated (_SUCCESS
    missing) must read as UNCOMMITTED — recovery rebuilds from the last
    good version and the deterministic replay rewrites the batch."""
    source_dir, _ = corpus
    work = str(tmp_path / "w")
    job = _run_job(spark, source_dir, work)
    versions = job._committed_versions()
    assert len(versions) >= 3
    last = versions[-1]
    state_before = sorted(
        tuple(sorted(r.members))
        for r in job.final_state().select("members").collect()
    )
    # truncate the last delta's rows write but leave its commit marker
    droot = os.path.join(work, "state", f"d={last}")
    if not os.path.isdir(droot):
        pytest.skip("last batch compacted — delta folded away")
    os.remove(os.path.join(droot, "rows", "_SUCCESS"))
    for fn in os.listdir(os.path.join(droot, "rows")):
        if fn.endswith(".parquet"):
            # physically truncate one data file too
            p = os.path.join(droot, "rows", fn)
            with open(p, "r+b") as f:
                f.truncate(os.path.getsize(p) // 2)
            break
    job_r = StreamingERJob(spark, job.cfg)
    assert job_r._committed_versions() == versions[:-1]
    # deterministic replay of the damaged batch (what Spark's checkpoint
    # does on restart for an uncommitted epoch)
    from mapping_analysis_spark.schema import CLIPS_SCHEMA

    files = sorted(os.listdir(source_dir))
    replay_df = spark.read.schema(CLIPS_SCHEMA).parquet(
        os.path.join(source_dir, files[last])
    )
    job_r.process_batch(replay_df, last)
    assert job_r._committed_versions() == versions
    state_after = sorted(
        tuple(sorted(r.members))
        for r in job_r.final_state().select("members").collect()
    )
    assert state_after == state_before


def test_truncated_snapshot_with_marker_is_recovered(spark, corpus, tmp_path):
    """Same injection against a full snapshot (v=) version."""
    source_dir, _ = corpus
    work = str(tmp_path / "w")
    job = _run_job(spark, source_dir, work)
    entries = job._state_entries()
    fulls = [b for b, k in entries if k == "full"]
    assert fulls
    # capture the healthy final state BEFORE injecting the damage
    state_expected = sorted(
        tuple(sorted(r.members))
        for r in job.final_state().select("members").collect()
    )
    all_versions = job._committed_versions()
    # damage the NEWEST snapshot: with one compaction generation kept
    # behind it, recovery must fall back to the older snapshot + deltas
    target = fulls[-1]
    vroot = os.path.join(work, "state", f"v={target}")
    os.remove(os.path.join(vroot, "_SUCCESS"))
    job_r = StreamingERJob(spark, job.cfg)
    entries_r = job_r._state_entries()
    assert (target, "full") not in entries_r
    remaining_fulls = [b for b, k in entries_r if k == "full"]
    # recovery = deterministic replay from the newest still-valid base
    # (or from scratch when none remains — the damaged snapshot was the
    # initial compaction)
    start = max(remaining_fulls) + 1 if remaining_fulls else 0
    from mapping_analysis_spark.schema import CLIPS_SCHEMA

    files = sorted(os.listdir(source_dir))
    for b in [b for b in all_versions if b >= start]:
        replay_df = spark.read.schema(CLIPS_SCHEMA).parquet(
            os.path.join(source_dir, files[b])
        )
        job_r.process_batch(replay_df, b)
    state_after = sorted(
        tuple(sorted(r.members))
        for r in job_r.final_state().select("members").collect()
    )
    assert state_after == state_expected


def test_state_fs_copytree_contract(spark, tmp_path):
    """StateFS.copytree must publish a directory byte-identically on both
    implementations (POSIX hardlink path + Hadoop FileUtil.copy path)."""
    from mapping_analysis_spark.streaming.fs import state_fs_for

    for scheme in ("", "file://"):
        root = str(tmp_path / ("h" if scheme else "p"))
        fs = state_fs_for(scheme + root if scheme else root, spark)
        src = fs.join(scheme + root if scheme else root, "src")
        dst = fs.join(scheme + root if scheme else root, "dst")
        fs.makedirs(src)
        fs.write_text(fs.join(src, "_SUCCESS"), "")
        fs.write_text(fs.join(src, "a.parquet"), "AAA")
        fs.copytree(src, dst)
        assert fs.exists(fs.join(dst, "_SUCCESS"))
        assert fs.read_text(fs.join(dst, "a.parquet")) == "AAA"
        # idempotent re-publish after rmtree (the replay path)
        fs.rmtree(dst)
        assert not fs.exists(dst)
        fs.copytree(src, dst)
        assert fs.read_text(fs.join(dst, "a.parquet")) == "AAA"


def test_source_format_seam_routes_to_format(spark, tmp_path):
    """The Iceberg/format seam (StreamingERConfig.source_format) must route
    the stream reader to the named data source. This image carries no
    iceberg jar, so the expected outcome HERE is a data-source-not-found
    error naming 'iceberg' — proof the flag reaches readStream.format();
    on a cluster with the runtime jar (docs/ICEBERG.md) the same flag
    loads the table."""
    from mapping_analysis_spark.streaming.engine import (
        StreamingERConfig,
        StreamingERJob,
    )

    cfg = StreamingERConfig(
        source_dir=str(tmp_path / "no_such_table"),
        work_dir=str(tmp_path / "w"),
        source_format="iceberg",
        source_options={"streaming-max-files-per-micro-batch": "4"},
    )
    job = StreamingERJob(spark, cfg)
    try:
        q = job.start(available_now=True)
    except Exception as e:  # noqa: BLE001
        assert "iceberg" in str(e).lower()
        return
    q.stop()  # environment actually provides iceberg — the seam worked
