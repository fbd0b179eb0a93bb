"""Hardware scaling ceiling for this sandbox — engine-free calibration.

The north rule's criterion is throughput scaling efficiency >= 0.8 from N
to 4N EXECUTORS. The sandbox proxy maps executors to local[N] task slots,
but every slot then shares ONE VM's cores and memory bus — and this VM is
a shared-host guest whose per-core throughput DEGRADES as more cores are
used (frequency/bandwidth throttling), a penalty a real cluster — which
adds whole machines with their own sockets and memory buses — does not
have.

This script measures that ceiling with perfectly parallel, engine-free
workloads in separate processes (no shared state, no I/O, no shuffle) —
three kernel classes spanning the engine's op/memory mix:

* ``fft``  — cache-resident numpy FFT pipelines (the MFCC stage's op mix).
* ``ss``   — cache-resident searchsorted + gather (the block scorer's op
  mix at LLC-sized working sets — the post-round-5 kernel shape).
* ``dram`` — DRAM-resident searchsorted + gather + stream over a working
  set far beyond LLC: 200 MB per process (25M int64). The round-4 version
  used 800 MB per process ≈ 13+ GB RSS at 16 procs — big enough that the
  calibration kernel itself could induce the memory pressure it was
  trying to measure (consistent with its 0.53→1.0 swings). 200 MB/proc is
  still ≫ LLC (so the kernel class is unchanged: every access misses to
  DRAM) while RSS stays ≤ ~3.2 GB + sort scratch at 16 procs, and the
  per-proc slice is IDENTICAL at every level, so a unit is equal work and
  efficiencies compare cleanly.

Whatever efficiency a kernel shows at a given core window is the maximum
ANY job with that kernel's memory profile can measure there; an engine
whose measured efficiency matches its kernel-class ceiling scales
perfectly as far as this sandbox can observe.

Interleaved reps with best-of-N per level (the host is visibly noisy;
noise only ever adds time).

Usage: python scripts/bench_hw_ceiling.py [levels ...] (default 4 16)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

# fixed PER-PROCESS working set for the dram kernel: 25M int64 = 200 MB
# (see module docstring — bounded RSS, equal work per unit at every level)
_DRAM_PROC_ELEMS = 25_000_000


def _work(args: tuple) -> float:
    iters, _ = args
    x = np.random.default_rng(0).standard_normal((400, 2048)).astype(np.float32)
    t0 = time.time()
    win = np.hanning(2048).astype(np.float32)
    for _ in range(iters):
        y = np.fft.rfft(x * win, axis=1)
        (np.abs(y) ** 2).sum()
    return time.time() - t0


def _work_ss(args: tuple) -> float:
    """Cache-resident searchsorted-intersection kernel (the block scorer's
    op mix at LLC-sized working sets): sorted search + gather + compare
    over a ~2 MB array. This is the kernel class the round-5 chunked
    scorer rewrite targets — measured 0.94x 4→16 on this sandbox where the
    DRAM-resident variant swung 0.53-1.0 with memory pressure."""
    iters, _ = args
    rng = np.random.default_rng(2)
    big = rng.integers(0, 1 << 62, size=250_000, dtype=np.int64)
    big.sort()
    q = rng.integers(0, 1 << 62, size=250_000, dtype=np.int64)
    t0 = time.time()
    for _ in range(iters):
        idx = np.searchsorted(big, q)
        hit = big[np.minimum(idx, len(big) - 1)] == q
        hit.sum()
    return time.time() - t0


def _work_dram(args: tuple) -> float:
    """DRAM-resident kernel (aggregate working set ≫ LLC): sorted binary
    search + random gather + streaming reduction — the memory profile of
    the PRE-round-5 flattened token-intersection kernels. On a shared-bus
    VM this is the kernel class that saturates first. Per-proc working
    set fixed at 200 MB across levels (module docstring)."""
    iters, n_elems = args
    rng = np.random.default_rng(1)
    big = rng.integers(0, 1 << 62, size=n_elems, dtype=np.int64)
    big.sort()
    q = rng.integers(0, 1 << 62, size=max(n_elems // 50, 1), dtype=np.int64)
    t0 = time.time()
    for _ in range(iters):
        idx = np.searchsorted(big, q)
        big[np.minimum(idx, len(big) - 1)].sum()
        (big[::16].astype(np.float64)).sum()
    return time.time() - t0


_KERNELS = {"fft": (_work, 20), "ss": (_work_ss, 100), "dram": (_work_dram, 12)}


def _run(procs: int, kernel: str = "fft") -> float:
    fn, iters = _KERNELS[kernel]
    n_elems = _DRAM_PROC_ELEMS if kernel == "dram" else 0
    with mp.Pool(procs) as pool:
        t0 = time.time()
        pool.map(fn, [(iters, n_elems)] * procs)
        elapsed = time.time() - t0
    return procs * iters / elapsed


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [4, 16]
    reps = 3
    out = {"reps_best_of": reps, "dram_proc_elems": _DRAM_PROC_ELEMS, "kernels": {}}
    for kernel in _KERNELS:
        best: dict[int, float] = {}
        for _ in range(reps):
            for procs in levels:
                best[procs] = max(best.get(procs, 0.0), _run(procs, kernel))
        out["kernels"][kernel] = {
            "units_per_sec": {str(p): round(v, 1) for p, v in best.items()},
            "per_proc": {str(p): round(v / p, 2) for p, v in best.items()},
            "ceiling_efficiency": {
                f"{n}->{4 * n}": round(best[4 * n] / best[n] / 4.0, 3)
                for n in levels
                if 4 * n in best
            },
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
