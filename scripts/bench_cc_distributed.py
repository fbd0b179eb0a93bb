"""Distributed connected-components timing at a FORCING scale.

Every committed bench resolves CC through the driver-local union-find fast
path (edge counts at bench scale sit far below the 4M-edge threshold).
This script times the distributed label-propagation + pointer-jumping loop
(`operators/graph.py:connected_components`, `local_edges_threshold=0`) on
a deterministic synthetic graph big enough that the local path would be
the wrong choice on a real driver — the code path a 100 TB corpus's
support/candidate graphs actually take — and checks its labels EXACTLY:

* graph: `CC_FORCE_VERTS` vertices (default 12.8M) in disjoint chains of
  `CC_FORCE_CHAIN` (default 64) → ~12.6M undirected edges. Chains are the
  propagation worst case (component diameter = chain length); min-id label
  of vertex i is the closed form i − (i mod chain), so parity is checked
  against an exact oracle on every vertex, and (optionally) against the
  driver-local union-find path's labels on the same edges.
* timings exclude corpus synthesis (spark.range is free) but include the
  loop's per-round materialize round-trips — that IS the operator.

Usage:
  python scripts/bench_cc_distributed.py            # ~12.6M edges, 16 cores
  CC_FORCE_VERTS=25600000 SPARK_GRAFT_CPUS=32 ...   # bigger forcing run

Prints one JSON summary line; per-round progress lines (n_changed, wall)
come from SPARK_GRAFT_DEBUG_CC which this script enables.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
if os.path.isdir("/dev/shm"):
    os.environ.setdefault("SPARK_GRAFT_TMP", "/dev/shm/cc_force_mat")
os.environ["SPARK_GRAFT_DEBUG_CC"] = "1"

N_VERT = int(os.environ.get("CC_FORCE_VERTS", str(12_800_000)))
CHAIN = int(os.environ.get("CC_FORCE_CHAIN", "64"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
RUN_LOCAL_TOO = os.environ.get("CC_FORCE_SKIP_LOCAL", "") == ""


def main() -> None:
    from pyspark.sql import functions as F

    from mapping_analysis_spark.operators.graph import connected_components
    from mapping_analysis_spark.session import get_spark

    spark = get_spark("cc-distributed-bench", cpus=CPUS)
    verts = spark.range(N_VERT).select(F.col("id"))
    edges = (
        spark.range(N_VERT)
        .filter((F.col("id") % CHAIN) != CHAIN - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    oracle_bad = F.col("cc") != (F.col("id") - F.col("id") % CHAIN)

    # ---- distributed loop (forced) ----
    buf = io.StringIO()
    t0 = time.time()
    with contextlib.redirect_stdout(buf):
        cc = connected_components(
            edges, vertices=verts, id_col="id", cc_col="cc",
            local_edges_threshold=0,
        )
        bad = cc.filter(oracle_bad).count()
        n_rows = cc.count()
    t_dist = time.time() - t0
    rounds_log = buf.getvalue()
    sys.stdout.write(rounds_log)
    rounds = len(re.findall(r"^\[cc\] round ", rounds_log, re.M))
    assert bad == 0, f"distributed CC labels wrong for {bad} vertices"
    assert n_rows == N_VERT

    # ---- driver-local union-find on the SAME edges (path parity + the
    # cost the fast path would pay here — its ResourceWarning fires) ----
    t_local = None
    local_parity = None
    if RUN_LOCAL_TOO:
        t0 = time.time()
        cc_l = connected_components(
            edges, vertices=verts, id_col="id", cc_col="cc",
            local_edges_threshold=1 << 40,
        )
        bad_l = cc_l.filter(oracle_bad).count()
        t_local = round(time.time() - t0, 1)
        local_parity = bad_l == 0  # same closed-form labels ⇒ same labels

    summary = {
        "n_vertices": N_VERT,
        "chain_len": CHAIN,
        "n_undirected_edges": N_VERT - N_VERT // CHAIN,
        "cpus": CPUS,
        "distributed_rounds": rounds,
        "distributed_wall_sec": round(t_dist, 1),
        "label_oracle_mismatches": bad,
        "local_union_find_wall_sec": t_local,
        "local_path_same_labels": local_parity,
    }
    print("CCBENCH " + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
