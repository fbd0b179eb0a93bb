"""Streaming entity-resolution engine (foreachBatch micro-batch driver).

Re-creates the reference's incremental clustering protocol
(clusterstrategies/MultiIncrementalClusteringFunction.java:55-138 —
INITIAL_CLUSTERING / VERTEX_ADDITION) as a Structured Streaming job:

* source: file stream over the clips table directory (on a cluster this is
  ``spark.readStream.format("iceberg")`` — the file-stream source keeps the
  sandbox dependency-free; the engine only assumes an append-only table).
* per micro-batch (``foreachBatch``): union the state clusters of the
  AFFECTED blocking keys with the new arrivals, re-run the bounded
  max-both merge on those keys only, emit updated clusters + match pairs.
  Keys without arrivals are untouched — the micro-batch cost scales with
  the batch, not the corpus (the reference recomputes per affected key
  group too: VERTEX_ADDITION unions representatives ∪ new vertices).
* state: log-structured parquet versions — per batch a DELTA
  ``state_dir/d=<batch_id>`` holding only the updated clusters (``rows/``)
  plus the ids consumed from prior state (``removed/`` tombstones), with a
  periodic full-snapshot compaction ``state_dir/v=<batch_id>`` every
  ``compact_every`` batches. Per-batch state I/O therefore scales with the
  BATCH (touched clusters), not the corpus — at 10^12 clips a full-state
  rewrite per micro-batch would dwarf the actual work. Readers reconstruct
  ``state = base ∘ deltas`` (anti-join tombstones, union rows; tombstone
  sets are batch-sized → broadcast anti-joins). Every version stays
  invisible until its commit marker lands; a replayed batch finds the
  previous versions intact and — the pipeline being deterministic —
  rewrites byte-identical output (exactly-once effect on the sink).
* sink: output partitioned by ``batch_id``; a replay overwrites its own
  partition only (idempotent commit keyed by batchId — the Iceberg
  overwrite-by-filter pattern).
* watermark: rows older than (max event time seen − delay) are dropped and
  counted (late-data policy of ``withWatermark`` enforced explicitly since
  foreachBatch bypasses Spark's aggregation-level filtering).
* lineage/metrics: one row per (batch, input partition) — files, rows,
  late rows, clusters touched, wall time — appended under
  ``lineage_dir/batch_id=<id>`` (same idempotent scheme).

Checkpoint/resume: Spark's own ``checkpointLocation`` replays uncommitted
batches after a crash; the state-version scheme makes the replay
deterministic. Kill → restart ⇒ identical final state/output (tested in
tests/test_streaming.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import PipelineConfig, prepare
from ..operators.clustering import (
    ClusterRoundConfig,
    _cluster_state,
    iterative_max_both_clustering,
)


@dataclass
class StreamingERConfig:
    source_dir: str
    work_dir: str                      # holds state/, output/, lineage/, checkpoint/
    watermark_delay_sec: int = 600
    max_files_per_trigger: int = 4
    # streaming source format seam: "parquet" (default — schema supplied
    # from CLIPS_SCHEMA, maxFilesPerTrigger applies) or any registered
    # streaming source, e.g. "iceberg" with the iceberg-spark runtime on
    # the classpath — then ``source_dir`` is the table path/identifier and
    # the table supplies its own schema. Exact cluster config in
    # docs/ICEBERG.md; this sandbox has no iceberg jar, so the non-parquet
    # branch is wiring-tested only (tests/test_streaming.py).
    source_format: str = "parquet"
    source_options: dict = field(default_factory=dict)
    # full-snapshot compaction cadence: every Nth committed batch folds the
    # delta chain into a new base (amortized O(state/N) write per batch);
    # between compactions a batch writes only its touched clusters
    compact_every: int = 8
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)

    @property
    def state_dir(self) -> str:
        return _urljoin(self.work_dir, "state")

    @property
    def output_dir(self) -> str:
        return _urljoin(self.work_dir, "output")

    @property
    def lineage_dir(self) -> str:
        return _urljoin(self.work_dir, "lineage")

    @property
    def checkpoint_dir(self) -> str:
        return _urljoin(self.work_dir, "checkpoint")


def _parquet_footer_rows(path: str) -> int | None:
    """Row count of a local parquet directory from file footers — a
    driver-side metadata read replacing a Spark count job on the per-batch
    serial path. Returns None (caller falls back to .count()) for remote
    URIs, empty globs, or any pyarrow failure."""
    if "://" in path:
        return None
    try:
        import glob as _glob

        import pyarrow.parquet as _pq

        files = _glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            return None
        return sum(_pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


def _urljoin(base: str, *parts: str) -> str:
    """Path join that is also URI-correct for hdfs://... work dirs."""
    if "://" in base:
        out = base.rstrip("/")
        for p in parts:
            out = f"{out}/{p.strip('/')}"
        return out
    return os.path.join(base, *parts)


class StreamingERJob:
    """Micro-batch incremental clustering over a clips file stream.

    All state-store metadata IO (listing committed versions, commit
    markers, watermark/band-format blobs, retiring history) goes through
    the ``fs.StateFS`` seam — ``work_dir`` may be a plain path (POSIX
    impl) or an ``hdfs://``/``s3a://`` URI (Hadoop FileSystem via the
    session JVM); Spark's own parquet reads/writes are URI-native either
    way."""

    def __init__(self, spark: SparkSession, cfg: StreamingERConfig):
        from .fs import state_fs_for

        self.spark = spark
        self.cfg = cfg
        self.fs = state_fs_for(cfg.work_dir, spark)
        self.fs.makedirs(cfg.state_dir)
        self.fs.makedirs(cfg.output_dir)
        self.fs.makedirs(cfg.lineage_dir)

    # -- state store (log-structured: deltas + periodic compaction) --------

    def _state_entries(self) -> list[tuple[int, str]]:
        """Committed state entries as (batch_id, kind), kind ∈ {'full',
        'delta'}, ascending by batch. A compaction batch leaves only its
        ``v=`` dir (its scratch delta is removed at commit).

        A version counts as committed only if BOTH its commit marker AND
        its data files' ``_SUCCESS`` markers are present: the marker is
        written strictly after the data, but a filesystem without atomic
        visibility ordering (object stores, a crash mid-rename-race) can
        surface the marker while the parquet write is still partial —
        requiring ``_SUCCESS`` makes a truncated version read as
        uncommitted, so recovery rebuilds from the previous committed
        version and the deterministic replay rewrites it (tested in
        tests/test_streaming.py failure-injection cases)."""
        out = []
        for d in self.fs.listdir(self.cfg.state_dir):
            if not (d.startswith("v=") or d.startswith("d=")):
                continue
            root = self.fs.join(self.cfg.state_dir, d)
            if not self.fs.exists(self.fs.join(root, "_COMMITTED")):
                continue
            if d.startswith("v="):
                data_ok = self.fs.exists(self.fs.join(root, "_SUCCESS"))
            else:
                data_ok = self.fs.exists(
                    self.fs.join(root, "rows", "_SUCCESS")
                ) and self.fs.exists(self.fs.join(root, "removed", "_SUCCESS"))
            if data_ok:
                out.append((int(d[2:]), "full" if d.startswith("v=") else "delta"))
        return sorted(out)

    def _committed_versions(self) -> list[int]:
        return [b for b, _ in self._state_entries()]

    def _marker_total(self, batch_id: int, kind: str) -> int | None:
        prefix = "v" if kind == "full" else "d"
        path = self.fs.join(
            self.cfg.state_dir, f"{prefix}={batch_id}", "_COMMITTED"
        )
        try:
            return int(json.loads(self.fs.read_text(path))["n_clusters_total"])
        except (OSError, ValueError, KeyError, TypeError):
            return None

    def _load_state(self, before_batch: int) -> DataFrame | None:
        """Reconstruct the cluster state as of just before ``before_batch``:
        latest full snapshot, then each newer delta applied in batch order
        (drop its tombstoned ids, union its rows). Tombstone sets are
        batch-sized, so the anti-joins broadcast."""
        entries = [(b, k) for b, k in self._state_entries() if b < before_batch]
        if not entries:
            return None
        fulls = [b for b, k in entries if k == "full"]
        if not fulls:
            raise RuntimeError(
                "state store has deltas but no base snapshot — compaction "
                "retirement removed too much"
            )
        base = max(fulls)
        state = self.spark.read.parquet(
            self.fs.join(self.cfg.state_dir, f"v={base}")
        )
        for b, kind in entries:
            if kind != "delta" or b <= base:
                continue
            droot = self.fs.join(self.cfg.state_dir, f"d={b}")
            tomb = self.spark.read.parquet(self.fs.join(droot, "removed"))
            rows = self.spark.read.parquet(self.fs.join(droot, "rows"))
            state = state.join(tomb, "id", "left_anti").unionByName(rows)
        return state

    def _write_checked(self, df: DataFrame, path: str) -> DataFrame:
        """``materialize`` with an empty-plan guard: a parquet dir written
        from an EMPTY plan can end up with zero part files (AQE coalesces
        an empty shuffle to no partitions), leaving only ``_SUCCESS`` —
        nothing for readers (state reconstruction, the copy-publish sink,
        ``output()``) to infer a schema from. Such a dir is rewritten as
        one empty part file carrying the plan's schema before the
        read-back (``repartition(1)`` forces exactly one writer task,
        which always emits a footer). Same 8 MB-rowgroup write options as
        ``util.materialize`` (read-back parallelism)."""
        opts = {"parquet.block.size": str(8 * 1024 * 1024)}
        df.write.mode("overwrite").options(**opts).parquet(path)
        if not any(f.endswith(".parquet") for f in self.fs.listdir(path)):
            df.limit(0).repartition(1).write.mode("overwrite").options(
                **opts
            ).parquet(path)
        return self.spark.read.parquet(path)

    def _write_delta(
        self, rows: DataFrame, tombstone_ids: DataFrame, batch_id: int
    ) -> tuple[DataFrame, DataFrame]:
        """Write this batch's state delta (uncommitted) and return the
        (rows, removed) read-backs — the write doubles as the lineage cut
        over the clustering plan, so downstream consumers (output sink,
        counts, compaction) never re-execute it."""
        droot = self.fs.join(self.cfg.state_dir, f"d={batch_id}")
        self.fs.rmtree(droot)  # replay: half-written delta is discarded
        removed = self._write_checked(
            tombstone_ids, self.fs.join(droot, "removed")
        )
        return self._write_checked(rows, self.fs.join(droot, "rows")), removed

    def _write_full(self, state: DataFrame, batch_id: int) -> None:
        """Compaction: write the fully reconstructed state (uncommitted)."""
        path = self.fs.join(self.cfg.state_dir, f"v={batch_id}")
        self.fs.rmtree(path)
        state.write.mode("overwrite").parquet(path)

    def _verify_success_markers(self, batch_id: int, compacted: bool) -> None:
        """Fail LOUDLY at commit time if the data ``_SUCCESS`` markers that
        ``_state_entries`` requires are absent. Two distinct failure modes
        would otherwise be silent: (a) the deployment disabled success
        markers (``mapreduce.fileoutputcommitter.marksuccessfuljobs=false``,
        a common object-store tuning) — then EVERY committed version reads
        as uncommitted, ``_load_state`` returns None and a restarted job
        reprocesses batches as initial clustering while Spark's checkpoint
        skips already-committed epochs, i.e. silent state loss; (b) a
        truncated write. Verifying here, immediately after our own write
        completed, distinguishes them: the writes above just finished, so
        an absent marker means the committer writes none — abort before
        the version is ever published."""
        if compacted:
            missing = [
                p
                for p in (
                    self.fs.join(self.cfg.state_dir, f"v={batch_id}", "_SUCCESS"),
                )
                if not self.fs.exists(p)
            ]
        else:
            droot = self.fs.join(self.cfg.state_dir, f"d={batch_id}")
            missing = [
                p
                for p in (
                    self.fs.join(droot, "rows", "_SUCCESS"),
                    self.fs.join(droot, "removed", "_SUCCESS"),
                )
                if not self.fs.exists(p)
            ]
        if missing:
            raise RuntimeError(
                "state commit aborted: data _SUCCESS marker(s) missing "
                f"after a completed write: {missing}. The state store's "
                "commit protocol requires success markers — if this "
                "deployment sets mapreduce.fileoutputcommitter."
                "marksuccessfuljobs=false, re-enable it for the state "
                "directory (otherwise every committed version would "
                "silently read back as uncommitted)."
            )

    def _commit_state(
        self, batch_id: int, compacted: bool, n_clusters_total: int
    ) -> None:
        self._verify_success_markers(batch_id, compacted)
        marker = json.dumps(
            {"batch_id": batch_id, "n_clusters_total": n_clusters_total}
        )
        if compacted:
            self.fs.write_text(
                self.fs.join(self.cfg.state_dir, f"v={batch_id}", "_COMMITTED"),
                marker,
            )
            # the scratch delta is folded into the snapshot
            self.fs.rmtree(self.fs.join(self.cfg.state_dir, f"d={batch_id}"))
        else:
            self.fs.write_text(
                self.fs.join(self.cfg.state_dir, f"d={batch_id}", "_COMMITTED"),
                marker,
            )
        # retire superseded history: keep the last two snapshots plus every
        # delta at/after the older of them (enough to replay the last batch
        # and debug one compaction generation back)
        entries = self._state_entries()
        fulls = [b for b, k in entries if k == "full"]
        if len(fulls) >= 2:
            keep_from = fulls[-2]
            for b, kind in entries:
                if b < keep_from:
                    prefix = "v" if kind == "full" else "d"
                    self.fs.rmtree(
                        self.fs.join(self.cfg.state_dir, f"{prefix}={b}")
                    )

    @staticmethod
    def _band_keys_expr(rcfg: ClusterRoundConfig):
        """LSH band keys of the cluster label's trigram set (the state's
        secondary index for affected-cluster lookup)."""
        from ..operators.blocking import minhash_band_keys

        return minhash_band_keys(
            F.col("trigram_set"),
            rcfg.lsh_bands,
            rcfg.lsh_rows_per_band,
            rcfg.lsh_seed,
        )

    # -- band-key index versioning ------------------------------------------
    # band_keys are PERSISTED in state and equi-joined against freshly
    # computed arrival keys; if the key derivation ever changes (it did in
    # round 2: murmur → fold-mix), resuming an old checkpoint would silently
    # match zero stored keys and degrade affected-cluster lookup to
    # blocking-key-only. The format token is stored next to the state; on
    # mismatch the index is rebuilt from the state's trigram sets and a
    # compaction is forced so the rebuilt keys persist.

    def _band_format_path(self) -> str:
        return self.fs.join(self.cfg.state_dir, "_band_format.json")

    def _stored_band_format(self) -> str | None:
        try:
            return json.loads(self.fs.read_text(self._band_format_path()))[
                "format"
            ]
        except (OSError, ValueError, KeyError):
            return None

    def _save_band_format(self) -> None:
        from ..operators.blocking import BAND_KEY_FORMAT

        self.fs.write_text(
            self._band_format_path(), json.dumps({"format": BAND_KEY_FORMAT})
        )

    # -- watermark bookkeeping --------------------------------------------

    def _max_event_time(self) -> float | None:
        path = self.fs.join(self.cfg.state_dir, "_watermark.json")
        if not self.fs.exists(path):
            return None
        return json.loads(self.fs.read_text(path))["max_event_time"]

    def _save_max_event_time(self, value: float) -> None:
        path = self.fs.join(self.cfg.state_dir, "_watermark.json")
        self.fs.write_text(path, json.dumps({"max_event_time": value}))

    # -- the micro-batch ---------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        _dbg = os.environ.get("SPARK_GRAFT_DEBUG_BATCH")
        _tp = time.time()

        def _phase(name: str) -> None:
            nonlocal _tp
            if _dbg:
                print(
                    f"[batch {batch_id}] {name}: {time.time() - _tp:.1f}s",
                    flush=True,
                )
            _tp = time.time()

        cfg = self.cfg
        pcfg = cfg.pipeline
        # df.observe piggybacks input-row count, event-time high-water mark
        # AND the late-row count onto the FIRST action (the count below) —
        # no separate agg/count jobs (SURVEY §2.4 accumulators / §2.11
        # metrics). The watermark threshold is known before any action: it
        # derives from the PREVIOUS batches' max event time on disk.
        from pyspark.sql import Observation

        prev_max = self._max_event_time()
        threshold = None
        if prev_max is not None:
            threshold = prev_max - cfg.watermark_delay_sec
        obs_cols = [
            F.count(F.lit(1)).alias("rows"),
            F.max(F.unix_timestamp("event_time")).alias("max_ts"),
        ]
        if threshold is not None:
            obs_cols.append(
                F.sum(
                    (F.unix_timestamp("event_time") < F.lit(threshold)).cast("long")
                ).alias("late")
            )
        obs = Observation(f"batch_{batch_id}")
        observed_df = batch_df.observe(obs, *obs_cols)

        # ---- watermark filter first (late rows are counted by the observe
        # upstream, so they never reach the fingerprint UDF), then prepare.
        # Persisting PREPARED — audio bytes already consumed and dropped —
        # instead of the raw batch means the multi-GB binary column is
        # scanned exactly once per batch and never cached or re-read.
        on_time = observed_df
        if threshold is not None:
            on_time = observed_df.filter(
                F.unix_timestamp("event_time") >= F.lit(threshold)
            )
        prepared = prepare(on_time, pcfg).persist()
        prepared.count()  # one action: scan + fingerprints + observation
        _phase("scan+fingerprint+cache")
        observed = obs.get
        n_in = int(observed["rows"] or 0)
        if n_in == 0:
            prepared.unpersist()
            return
        batch_max = (
            float(observed["max_ts"]) if observed.get("max_ts") is not None else None
        )
        n_late = int(observed.get("late") or 0) if threshold is not None else 0
        candidates = [v for v in (prev_max, batch_max) if v is not None]
        new_max = max(candidates) if candidates else None

        # ---- load state of AFFECTED clusters only: same prefix blocking
        # key OR any shared LSH band key (so a new clip can bridge into a
        # state cluster whose prefix key diverged)
        rcfg = ClusterRoundConfig(
            min_sim=pcfg.min_sim,
            max_sources=pcfg.max_sources,
            max_block_rows=pcfg.max_block_rows,
            use_audio=pcfg.use_audio,
        )
        arrivals = _cluster_state(prepared, rcfg.use_audio)
        band_expr = self._band_keys_expr(rcfg)
        state = self._load_state(batch_id)
        index_rebuilt = False
        if state is not None:
            from ..operators.blocking import BAND_KEY_FORMAT

            stored_fmt = self._stored_band_format()
            if stored_fmt != BAND_KEY_FORMAT:
                print(
                    f"[batch {batch_id}] band-key index format "
                    f"{stored_fmt!r} != {BAND_KEY_FORMAT!r}: rebuilding "
                    "state index from trigram sets",
                    flush=True,
                )
                state = state.withColumn("band_keys", band_expr)
                index_rebuilt = True
        if state is not None:
            arr_keys = arrivals.select("blocking_key").distinct()
            arr_bands = (
                arrivals.select(F.explode(band_expr).alias("_bk")).distinct()
            )
            by_key = state.join(arr_keys, "blocking_key", "left_semi").select("id")
            by_band = (
                state.select("id", F.explode("band_keys").alias("_bk"))
                .join(arr_bands, "_bk", "left_semi")
                .select("id")
            )
            touched_ids = by_key.unionByName(by_band).distinct()
            touched = state.join(touched_ids, "id", "left_semi").drop("band_keys")
            working = touched.unionByName(arrivals, allowMissingColumns=True)
        else:
            touched_ids = None
            working = arrivals

        # ---- cluster the working set: same decomposition + reciprocal-
        # best rounds as batch mode (cluster_rounds), so streaming output
        # converges to the batch result for the same input
        from ..operators.clustering import cluster_rounds

        _phase("state-join-plan")
        clusters = cluster_rounds(working, rcfg)
        _phase("cluster-rounds(decomposition)")
        clusters_with_bands = clusters.withColumn("band_keys", band_expr)
        # ---- delta state write: only this batch's updated clusters plus
        # the tombstones of the state rows pulled into the working set —
        # per-batch state I/O scales with the batch, never the corpus. The
        # write doubles as the lineage cut over the clustering plan.
        tomb = (
            touched_ids
            if touched_ids is not None
            else arrivals.select("id").limit(0)
        )
        new_rows, removed = self._write_delta(clusters_with_bands, tomb, batch_id)
        _phase("merge+delta-write")
        # cluster-count bookkeeping rides the commit markers: total' =
        # total − |tombstones| + |new rows|. Counts come from the
        # just-written parquet FOOTERS (driver-side metadata read, no
        # Spark job) when the state dir is driver-local; remote/URI state
        # falls back to the two tiny count jobs.
        droot = self.fs.join(self.cfg.state_dir, f"d={batch_id}")
        n_new = _parquet_footer_rows(self.fs.join(droot, "rows"))
        n_removed = _parquet_footer_rows(self.fs.join(droot, "removed"))
        if n_new is None:
            n_new = new_rows.count()
        if n_removed is None:
            n_removed = removed.count()
        prev_entries = [
            (b, k) for b, k in self._state_entries() if b < batch_id
        ]
        if prev_entries:
            prev_total = self._marker_total(*prev_entries[-1])
            if prev_total is None and state is not None:
                prev_total = state.count()
            prev_total = prev_total or 0
        else:
            prev_total = 0
        n_clusters = prev_total - n_removed + n_new
        # ---- periodic compaction: fold the delta chain into a snapshot
        fulls_before = [b for b, k in prev_entries if k == "full"]
        deltas_since = [
            b
            for b, k in prev_entries
            if k == "delta" and (not fulls_before or b > fulls_before[-1])
        ]
        compacted = (
            state is None
            or index_rebuilt  # persist the rebuilt band-key index
            or len(deltas_since) + 1 >= cfg.compact_every
        )
        if compacted:
            full = (
                new_rows
                if state is None
                else state.join(removed, "id", "left_anti").unionByName(new_rows)
            )
            self._write_full(full, batch_id)
            _phase("compaction-write")
        # ---- exactly-once sink: overwrite THIS batch's partition only.
        # The output rows ARE the just-written delta rows, so publishing is
        # a filesystem copy (hardlink locally, FileUtil.copy on Hadoop FS)
        # of the delta parquet instead of a second Spark re-encode job —
        # the band_keys index column rides along and output() drops it.
        # Visibility is still gated by the commit marker; a replayed batch
        # rmtrees its own partition first (idempotent).
        out_path = self.fs.join(cfg.output_dir, f"batch_id={batch_id}")
        self.fs.rmtree(out_path)
        self.fs.copytree(self.fs.join(droot, "rows"), out_path)
        _phase("output-write")

        # ---- state commit + watermark + lineage
        self._commit_state(batch_id, compacted, n_clusters)
        self._save_band_format()
        if new_max is not None:
            self._save_max_event_time(new_max)
        lineage_path = self.fs.join(cfg.lineage_dir, f"batch_id={batch_id}")
        self.fs.rmtree(lineage_path)
        part_counts = (
            prepared.groupBy(F.spark_partition_id().alias("partition"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("n_input", F.lit(n_in))
            .withColumn("n_input_observed", F.lit(int(observed["rows"])))
            .withColumn("n_late_dropped", F.lit(n_late))
            .withColumn("n_clusters_total", F.lit(n_clusters))
            .withColumn("wall_sec", F.lit(round(time.time() - t0, 3)))
        )
        part_counts.write.mode("overwrite").parquet(lineage_path)
        prepared.unpersist()
        _phase("lineage+commit")

    # -- query lifecycle ---------------------------------------------------

    def start(self, available_now: bool = True):
        from ..schema import CLIPS_SCHEMA
        from .metrics import ProgressLogListener

        # engine-level rate/duration log, one JSON line per micro-batch.
        # The listener appends line-by-line — a driver-LOCAL file by design
        # (it is diagnostics, not state); with a remote work_dir it lands
        # under the driver's tmp instead.
        if "://" in self.cfg.work_dir:
            import hashlib
            import tempfile

            log_path = os.path.join(
                tempfile.gettempdir(),
                "spark_graft_progress_"
                + hashlib.md5(self.cfg.work_dir.encode()).hexdigest()[:8]
                + ".jsonl",
            )
        else:
            log_path = os.path.join(self.cfg.work_dir, "progress.jsonl")
        self._listener = ProgressLogListener(log_path)
        self.spark.streams.addListener(self._listener)
        if self.cfg.source_format == "parquet":
            reader = self.spark.readStream.schema(CLIPS_SCHEMA).option(
                "maxFilesPerTrigger", self.cfg.max_files_per_trigger
            )
            for k, v in self.cfg.source_options.items():
                reader = reader.option(k, v)
            stream = reader.parquet(self.cfg.source_dir)
        else:
            # e.g. "iceberg": the table supplies its own schema; rate
            # limiting uses the source's own options (for iceberg:
            # streaming-max-files-per-micro-batch — see docs/ICEBERG.md)
            reader = self.spark.readStream.format(self.cfg.source_format)
            for k, v in self.cfg.source_options.items():
                reader = reader.option(k, v)
            stream = reader.load(self.cfg.source_dir)
        stream = stream.withWatermark(
            "event_time", f"{self.cfg.watermark_delay_sec} seconds"
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.cfg.checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # -- results -----------------------------------------------------------

    def final_state(self) -> DataFrame | None:
        versions = self._committed_versions()
        if not versions:
            return None
        return self._load_state(versions[-1] + 1)

    def output(self) -> DataFrame:
        out = self.spark.read.option("basePath", self.cfg.output_dir).parquet(
            self.cfg.output_dir + "/batch_id=*"
        )
        # the sink publishes the delta parquet verbatim (hardlink/copy);
        # the band-key index column is state-internal — hide it here
        return out.drop("band_keys")

    def lineage(self) -> DataFrame:
        return self.spark.read.option("basePath", self.cfg.lineage_dir).parquet(
            self.cfg.lineage_dir + "/batch_id=*"
        )
