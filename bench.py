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

``--resume``: kill-and-resume proof for the shard-manifest checkpoint
path (VERDICT r4 item 9): run `run_resumable` clean in a fresh
process, run it again and SIGKILL the whole process group mid-job,
then resume over the same output dir. Reports clean/killed/resume
walls, shards skipped, the resume overhead vs the clean run, and
asserts the resumed aggregates hash-match the clean run's.

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32),
     GRAFT_SCALING_CPUS, GRAFT_SCALING_CONVS, GRAFT_RESUME_CONVS.
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


def _warm_input(tdir: str) -> int:
    """Warm the page cache so the timed region measures
    compute+shuffle, not cold disk: /tmp is ext4 on /dev/vda and the
    box's cache gets dropped between runs (observed 14.8 s vs 8.9 s
    for IDENTICAL fresh-process headline runs — the first re-read
    ~0.5 GB of input from disk). Reading the raw bytes (not just
    footers) is required. Returns total input rows."""
    import pyarrow.parquet as pq

    total_rows = 0
    for f in os.listdir(tdir):
        if f.endswith(".parquet"):
            p = os.path.join(tdir, f)
            total_rows += pq.read_metadata(p).num_rows
            with open(p, "rb") as fh:
                while fh.read(1 << 24):
                    pass
    return total_rows


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

    total_rows = _warm_input(tdir)

    out_dir = os.path.join(BENCH_TMP, f"out_n{n_convs}_c{NUM_CPUS}")
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)

    # headline: best of 2, same co-tenant policy as the per-query
    # lines (identical code swings 2-3× run to run on this box)
    headline = None
    for _ in range(2):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        res = run_flagship(tdir, out_dir, write_sinks=True)
        dt = time.time() - t0
        headline = dt if headline is None else min(headline, dt)

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

    mm = _run_multimodal(sf)

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
        "multimodal_decode": mm,
        "membw_gbps": _membw_probe(),
    }


def _ensure_media_parquet(n: int, seed: int = 5) -> str:
    """Cache the synthetic binary-media table as partitioned Parquet so
    generation cost never pollutes the decode measurement."""
    import pyarrow.parquet as pq

    mdir = os.path.join(BENCH_TMP, f"media_n{n}_s{seed}")
    marker = os.path.join(mdir, "_COMPLETE")
    if os.path.exists(marker):
        return mdir
    from vrl_ray.stages.multimodal import synthetic_media_table

    t = synthetic_media_table(n, seed=seed)
    os.makedirs(mdir, exist_ok=True)
    per = max(1, len(t) // 8)
    for i in range(0, len(t), per):
        pq.write_table(t.slice(i, per),
                       os.path.join(mdir, f"part-{i // per:03d}.parquet"))
    with open(marker, "w") as f:
        f.write(f"n={n} seed={seed}\n")
    return mdir


def _run_multimodal(sf: float) -> dict:
    """Multimodal decode throughput (VERDICT r4 item 10): real PPM /
    WAV / Y4M decode over binary payload columns, kind-routed to three
    fixed actor pools, consumed as ONE union job. Best of 2 (co-tenant
    policy, same as the per-query lines)."""
    import ray
    import ray.data as rd
    from vrl_ray.stages.multimodal import (decode_image_batch,
                                           decode_audio_batch,
                                           sample_frames_batch)

    n = max(600, int(30_000 * sf))
    mdir = _ensure_media_parquet(n)
    # task pools: the three decode lanes share the session's workers —
    # no per-lane pool sizing (three fixed pools used to need explicit
    # ncpu/3 splits to avoid deadlocking the streaming executor)
    best = None
    out_rows = 0
    for _ in range(2):
        t0 = time.time()
        ds = rd.read_parquet(mdir)
        img = ds.filter(expr="kind == 'image'").map_batches(
            decode_image_batch, batch_format="pyarrow", batch_size=64,
            ).select_columns(["media_id", "decode_err"])
        aud = ds.filter(expr="kind == 'audio'").map_batches(
            decode_audio_batch, batch_format="pyarrow", batch_size=64,
            ).select_columns(["media_id", "decode_err"])
        vid = ds.filter(expr="kind == 'video'").map_batches(
            sample_frames_batch, batch_format="pyarrow", batch_size=32,
            ).select_columns(["media_id", "decode_err"])
        out_rows = img.union(aud).union(vid).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return {
        "media_items": n,
        "out_rows": out_rows,
        "sec": round(best, 3),
        "media_per_sec": round(n / best, 1),
        "rows_per_sec": round(out_rows / best, 1),
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
    total_rows = _warm_input(tdir)
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


#: conversations for the kill-and-resume proof. Defaults to the
#: scaling input (already cached): the run must be long enough that
#: the one extra session startup + the redone in-flight shard stay
#: under the 10 % overhead bar — exactly the real-cluster regime where
#: a resumed 100-TB job re-does one shard out of thousands.
RESUME_CONVS = int(os.environ.get("GRAFT_RESUME_CONVS", "600000"))
RESUME_SHARDS = int(os.environ.get("GRAFT_RESUME_SHARDS", "32"))


def run_resume_child(tdir: str, out_dir: str) -> dict:
    """One resumable run (fresh process): ray.init → run_resumable →
    JSON with wall, shard accounting and an order-independent hash of
    both aggregate frames (parent compares clean vs crash+resume)."""
    import hashlib

    import ray

    t_start = time.time()
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from vrl_ray.pipelines.transcript import run_resumable

    t_job = time.time()
    res = run_resumable(tdir, out_dir, num_shards=RESUME_SHARDS)

    def frame_hash(df) -> str:
        rows = sorted(map(str, df.itertuples(index=False, name=None)))
        return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]

    out = {
        "wall_total": round(time.time() - t_start, 3),
        "wall_job": round(time.time() - t_job, 3),
        "shards_done": len(res["shards_done"]),
        "shards_skipped": len(res["shards_skipped"]),
        "agg_hash": frame_hash(res["agg_tool"]) + ":"
        + frame_hash(res["agg_conv"]),
    }
    ray.shutdown()
    return out


def run_resume() -> dict:
    """Kill-and-resume proof (VERDICT r4 item 9). Three subprocess
    runs on the same cached input: (1) clean baseline, (2) fresh
    output dir SIGKILLed (whole process group — raylet included)
    mid-job, (3) resume over the killed run's output. Overhead =
    (killed wall + resume wall) / clean wall − 1; the resumed
    aggregates must hash-match the clean run's."""
    import shutil
    import signal

    # input cache (outside every timed region)
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from vrl_ray.sources.transcripts import ensure_transcripts_parquet
    tdir = os.path.join(BENCH_TMP, f"transcripts_n{RESUME_CONVS}_s{SEED}")
    ensure_transcripts_parquet(tdir, RESUME_CONVS, SEED)
    import pyarrow.parquet as pq
    total_rows = sum(
        pq.read_metadata(os.path.join(tdir, f)).num_rows
        for f in os.listdir(tdir) if f.endswith(".parquet"))
    ray.shutdown()

    out_clean = os.path.join(BENCH_TMP, "resume_clean")
    out_crash = os.path.join(BENCH_TMP, "resume_crash")
    shutil.rmtree(out_clean, ignore_errors=True)
    shutil.rmtree(out_crash, ignore_errors=True)

    def child(out_dir: str) -> tuple[float, dict]:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--resume-child",
             tdir, out_dir],
            capture_output=True, text=True, check=True)
        return time.time() - t0, json.loads(p.stdout.strip().splitlines()[-1])

    t_clean, clean = child(out_clean)

    # crash run: own process group so SIGKILL takes the raylet with it
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--resume-child",
         tdir, out_crash],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)
    try:
        proc.wait(timeout=max(1.0, 0.45 * t_clean))
        crashed = False          # finished before the kill landed
    except subprocess.TimeoutExpired:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
        crashed = True
    t_kill = time.time() - t0
    time.sleep(2)                # let killed raylet sockets drain

    t_resume, resumed = child(out_crash)

    overhead = (t_kill + t_resume) / t_clean - 1
    return {
        "metric": "resume_overhead_pct",
        "value": round(100 * overhead, 1),
        "unit": "pct",
        "rows": total_rows,
        "num_shards": RESUME_SHARDS,
        "sec_clean": round(t_clean, 3),
        "sec_killed_partial": round(t_kill, 3),
        "sec_resume": round(t_resume, 3),
        "crash_simulated": crashed,
        "shards_skipped_on_resume": resumed["shards_skipped"],
        "shards_redone_on_resume": resumed["shards_done"],
        "agg_hash_clean": clean["agg_hash"],
        "agg_hash_resumed": resumed["agg_hash"],
        "agg_match": clean["agg_hash"] == resumed["agg_hash"],
        "num_cpus": NUM_CPUS,
        "membw_gbps": _membw_probe(),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--headline-only" in sys.argv:
        print(json.dumps(run_headline_only()))
    elif "--resume-child" in sys.argv:
        i = sys.argv.index("--resume-child")
        print(json.dumps(run_resume_child(sys.argv[i + 1], sys.argv[i + 2])))
    elif "--resume" in sys.argv:
        print(json.dumps(run_resume()))
    else:
        print(json.dumps(run_once()))
