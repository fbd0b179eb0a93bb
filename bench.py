"""Benchmark driver — prints ONE JSON line.

Runs (a) the headline end-to-end ER pipeline over a deterministic synthetic
clips corpus (the BASELINE.json metric: clips/sec matched+clustered) and
(b) a set of operator queries from ``__spark_entry__`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

The clips corpus is generated once per (sf, seed) into /tmp and reused
(generation is not part of the measured time). Scaling evidence (N vs 4N
cores) is produced by scripts/bench_scaling.py, reported in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _clips_corpus(spark, n_clusters: int, seed: int = 42) -> str:
    from mapping_analysis_spark.datagen.clips import write_clips_parquet

    path = f"/tmp/spark_graft_bench_clips_{n_clusters}_{seed}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        write_clips_parquet(spark, path, n_clusters, seed=seed, partitions=32)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    from mapping_analysis_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)

    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}

    # -- headline: end-to-end clips matched+clustered ----------------------
    n_clusters = max(int(10000 * sf), 200)
    corpus = _clips_corpus(spark, n_clusters)
    clips = spark.read.parquet(corpus).drop("gold_cluster")
    n_clips = clips.count()

    from mapping_analysis_spark.pipeline import PipelineConfig, run_batch

    t0 = time.time()
    res = run_batch(clips, PipelineConfig(min_sim=0.7))
    n_clusters_out = res["clusters"].count()
    t_pipeline = time.time() - t0
    timings["er_clips_pipeline"] = round(t_pipeline, 3)
    clips_per_sec = n_clips / t_pipeline if t_pipeline > 0 else 0.0
    res["prepared"].unpersist()

    # -- operator queries over the sf tables -------------------------------
    bench_queries = [
        "trigram_cosine_pairs",
        "word_jaccard_pairs",
        "minhash_lsh_pairs",
        "simhash_pairs",
        "embedding_near_dup",
        "geo_er",
        "exact_dedup",
        "token_stats",
        "quality_score",
        "language_id",
        "embedding_topk",
        "ivf_topk",
        "image_meta",
        "video_frames",
        "cc_orders",
        "max_both",
        "session_window",
        "tumbling_window",
        "pricing_summary",
        "levenshtein_pairs",
        "cep_funnel",
        "soundex_keys",
    ]
    qs = entrymod.queries()
    for name in bench_queries:
        t0 = time.time()
        try:
            # count() forces the full plan without collecting payloads
            qs[name](spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
        except Exception:  # noqa: BLE001
            timings[name] = -1.0

    total = round(sum(v for v in timings.values() if v > 0), 3)
    print(
        json.dumps(
            {
                "metric": "clips_per_sec_matched_clustered",
                "value": round(clips_per_sec, 2),
                "unit": "clips/sec",
                "total_sec": total,
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "n_clips": n_clips,
                "n_clusters_out": n_clusters_out,
            }
        )
    )


if __name__ == "__main__":
    main()
