"""Benchmark runner (driver contract).

Default mode: run the headline flagship transcript pipeline
(parse → enrich → route → write sinks → two-phase aggregate) over a
cached deterministic synthetic transcript table scaled by
``$GRAFT_SF_DIR``'s sf, plus representative operator queries over the
sf tables, and print ONE JSON line.

``--scaling``: run the headline pipeline in two FRESH processes at the
GRAFT_SCALING_CPUS levels (default 8,32; use "2,8" for the
unsaturated-hardware pairing — see BASELINE.md) on the SAME cached
input and report throughput at both plus scaling efficiency (sandbox
stand-in for the N vs 4N-node criterion).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32),
     GRAFT_SCALING_CPUS, GRAFT_SCALING_CONVS.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SEED = 42
BENCH_TMP = os.environ.get("GRAFT_BENCH_TMP", "/tmp/vrl_ray_bench")


def _sf() -> float:
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return float(m.group(1)) if m else 0.1


def _membw_probe() -> float:
    """Single-threaded memcpy bandwidth in GB/s (256 MiB copy).

    Box-state evidence recorded with every bench line: this sandbox
    has a bursty co-tenant that consumes most of the machine's memory
    bandwidth while leaving loadavg near zero — the SAME code swings
    2-3× wall-clock with it active (BASELINE.md round-2/3 notes;
    quiet-box reference is ~15 GB/s, observed as low as 0.02 GB/s).
    A low value here means the numbers measure the neighbor.

    Buffers are touched BEFORE timing and the copy repeats 3×
    (best-of): a cold ``np.zeros`` is lazily allocated, so an untimed
    warm-up is required or the probe measures page-fault cost and
    reads ~0.05 GB/s even on an idle box."""
    import numpy as np
    a = np.empty(1 << 28, dtype=np.uint8)
    a[:] = 1  # touch pages
    b = np.empty(1 << 28, dtype=np.uint8)
    b[:] = 0
    best = float("inf")
    for _ in range(3):
        t = time.time()
        np.copyto(b, a)
        best = min(best, time.time() - t)
    return round(0.5 / best, 2)  # 256 MiB read + 256 MiB write


def _bench_queries():
    """Representative operator queries (subset of __ray_entry__)."""
    import __ray_entry__ as E

    return {
        "q1_pricing": E.q1_pricing,
        "events_parse_json": E.events_parse_json,
        "events_sessionize": E.events_sessionize,
        "events_cumulative": E.events_cumulative,
        "events_vrl_logpipe": E.events_vrl_logpipe,
        "orders_top_per_customer": E.orders_top_per_customer,
        "docs_token_stats": E.docs_token_stats,
        "docs_dedup_exact": E.docs_dedup_exact,
        "docs_minhash_pairs": E.docs_minhash_pairs,
        "embeddings_knn": E.embeddings_knn,
    }


def _consume(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        # count() executes the pipeline distributed and ships only
        # per-block row counts — pulling batches through the driver
        # (iter_batches) serializes the whole job on one core
        return res.count()
    return len(res)


def run_once() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from vrl_ray.sources.transcripts import ensure_transcripts_parquet
    from vrl_ray.pipelines.transcript import run_flagship

    sf = _sf()
    n_convs = max(200, int(200_000 * sf))
    tdir = os.path.join(BENCH_TMP, f"transcripts_n{n_convs}_s{SEED}")
    ensure_transcripts_parquet(tdir, n_convs, SEED)

    # warm the page cache so we measure compute+shuffle, not cold disk
    import pyarrow.parquet as pq
    total_rows = 0
    for f in os.listdir(tdir):
        if f.endswith(".parquet"):
            total_rows += pq.read_metadata(os.path.join(tdir, f)).num_rows

    out_dir = os.path.join(BENCH_TMP, f"out_n{n_convs}_c{NUM_CPUS}")
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.time()
    res = run_flagship(tdir, out_dir, write_sinks=True)
    headline = time.time() - t0

    # per-query: best of 2 runs — the sandbox has a bursty co-tenant
    # (identical code swings 2-3× run to run; BASELINE.md round-2
    # section); min-of-2 measures the code, not the neighbor
    queries = {}
    for name, fn in _bench_queries().items():
        best = None
        for _ in range(2):
            tq = time.time()
            _consume(fn(SF_DIR))
            dt = time.time() - tq
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)

    ray.shutdown()
    return {
        "metric": "flagship_transcript_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "rows": total_rows,
        "rows_per_sec": round(total_rows / headline, 1),
        "membw_gbps": _membw_probe(),
    }


#: rows for the scaling measurement: the N-vs-4N criterion measures
#: STEADY-STATE throughput, so the job must run long enough that the
#: session-fixed ~4 s startup (executor spin-up, worker warm-up, file
#: listing) is amortized — exactly as on a real cluster where the
#: 10^12-turn job runs for hours. ~250k convs ≈ 60M turns ≈ 60-90 s at
#: 8 CPUs. Override with GRAFT_SCALING_CONVS.
SCALING_CONVS = int(os.environ.get("GRAFT_SCALING_CONVS", "600000"))


#: the two parallelism levels for the N-vs-4N proxy. Override with
#: GRAFT_SCALING_CPUS="2,8". NOTE this sandbox's aggregate memory
#: bandwidth saturates at ~8 cores (15.3 GB/s @8 vs 10.5 @32 measured
#: with a pure-memcpy ray workload), so the 8→32 pairing conflates
#: hardware saturation with software scaling; 2→8 measures software
#: scaling on unsaturated hardware. A real 4N-node cluster scales
#: memory bandwidth with the nodes. Both pairings are reported in
#: BASELINE.md.
SCALING_CPUS = [int(x) for x in
                os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")]


def run_scaling() -> dict:
    """Same job, fresh processes, at the two SCALING_CPUS levels
    (N vs 4N stand-in)."""

    def sub(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_FORCE_CONVS=str(SCALING_CONVS))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # generate (once, cached) OUTSIDE the timed subprocesses so the
    # first timed run does not pay synthesis
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from vrl_ray.sources.transcripts import ensure_transcripts_parquet
    ensure_transcripts_parquet(
        os.path.join(BENCH_TMP, f"transcripts_n{SCALING_CONVS}_s{SEED}"),
        SCALING_CONVS, SEED)
    ray.shutdown()

    n_lo, n_hi = SCALING_CPUS
    lo, hi = sub(n_lo), sub(n_hi)
    eff = (lo["value"] / hi["value"]) / (n_hi / n_lo)
    return {
        "metric": f"scaling_efficiency_{n_lo}_to_{n_hi}",
        f"sec_{n_lo}": lo["value"], f"sec_{n_hi}": hi["value"],
        "rows": lo["rows"],
        f"rows_per_sec_{n_lo}": lo["rows_per_sec"],
        f"rows_per_sec_{n_hi}": hi["rows_per_sec"],
        "scaling_efficiency": round(eff, 3),
        f"membw_gbps_{n_lo}": lo.get("membw_gbps"),
        f"membw_gbps_{n_hi}": hi.get("membw_gbps"),
    }


def run_headline_only() -> dict:
    """Headline pipeline only (used by --scaling subprocesses)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from vrl_ray.sources.transcripts import ensure_transcripts_parquet
    from vrl_ray.pipelines.transcript import run_flagship

    sf = _sf()
    n_convs = int(os.environ.get("GRAFT_FORCE_CONVS", 0)) or \
        max(200, int(200_000 * sf))
    tdir = os.path.join(BENCH_TMP, f"transcripts_n{n_convs}_s{SEED}")
    ensure_transcripts_parquet(tdir, n_convs, SEED)
    import pyarrow.parquet as pq
    total_rows = sum(
        pq.read_metadata(os.path.join(tdir, f)).num_rows
        for f in os.listdir(tdir) if f.endswith(".parquet"))
    out_dir = os.path.join(BENCH_TMP, f"out_n{n_convs}_c{NUM_CPUS}")
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    run_flagship(tdir, out_dir, write_sinks=True)
    dt = time.time() - t0
    ray.shutdown()
    return {"value": round(dt, 3), "rows": total_rows,
            "rows_per_sec": round(total_rows / dt, 1),
            "num_cpus": NUM_CPUS, "membw_gbps": _membw_probe()}


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--headline-only" in sys.argv:
        print(json.dumps(run_headline_only()))
    else:
        print(json.dumps(run_once()))
