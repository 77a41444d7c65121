"""Cluster job entry point — the `ray job submit` target.

On a real multi-node cluster (north_rule: fixed N / 4N nodes):

    ray job submit --working-dir . -- \
        python -m vrl_ray.job --input s3://bucket/transcripts \
            --output s3://bucket/out --resumable

In this sandbox the same module runs against a local session (the
driver owns ray.init elsewhere; standalone runs guard with
is_initialized). Prints ONE JSON line of metrics; per-stage stats and
per-shard lineage land next to the output.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="vrl_ray transcript pipeline job")
    p.add_argument("--input", required=True,
                   help="parquet directory of transcript turns")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--batch-size", type=int, default=65536)
    p.add_argument("--resumable", action="store_true",
                   help="shard-checkpointed run (skips completed shards)")
    p.add_argument("--num-shards", type=int, default=16)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    from .pipelines.transcript import run_flagship, run_resumable

    t0 = time.time()
    if args.resumable:
        res = run_resumable(args.input, args.output,
                            num_shards=args.num_shards,
                            batch_size=args.batch_size)
        out = {
            "mode": "resumable",
            "shards_done": res["shards_done"],
            "shards_skipped": res["shards_skipped"],
            "rows": int(res["agg_tool"]["n"].sum()),
            "wall_sec": round(time.time() - t0, 3),
        }
    else:
        res = run_flagship(args.input, args.output,
                           batch_size=args.batch_size)
        out = {
            "mode": "flagship",
            "rows": res["metrics"]["rows"],
            "wall_sec": round(res["metrics"]["wall_sec"], 3),
            "sinks": res["metrics"].get("sink_dir"),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
