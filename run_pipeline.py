#!/usr/bin/env python
"""CLI entry point for the flagship pipeline — the ``ray job submit``
surface (north_star: "runs end-to-end via ray job submit ... resumable
from per-partition checkpoints").

    ray job submit -- python run_pipeline.py --sf-dir /root/testdata/sf0.1 \
        --checkpoint-root /tmp/scel_ckpt
    # or directly:
    python run_pipeline.py --sf-dir /root/testdata/sf0.001

Owns its Ray session (the library never calls ray.init); re-running with
the same checkpoint root skips completed partitions via the manifests.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--checkpoint-root", default="/tmp/scel_ckpt")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="default: all visible CPUs")
    ap.add_argument("--query", default=None,
                    help="run a named __ray_entry__.queries() pipeline "
                         "instead of the checkpointed flagship; prints "
                         "row count + wall time as JSON")
    ap.add_argument("--output", default=None,
                    help="with --query: write the result as parquet to this "
                         "directory (Dataset results stream straight to a "
                         "multi-file partitioned write; never one giant file)")
    ap.add_argument("--stats", action="store_true",
                    help="with --query: print the executed Dataset's "
                         "per-operator ds.stats() report to stderr — the "
                         "per-stage wall-time/throughput surface used to "
                         "tune batch sizes and concurrency")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    t0 = time.time()
    if args.query:
        import __ray_entry__ as entrymod

        qs = entrymod.queries()
        if args.query not in qs:
            raise SystemExit(
                f"unknown query {args.query!r}; one of: {', '.join(sorted(qs))}"
            )
        res = qs[args.query](args.sf_dir)
        metrics = {"query": args.query}
        if args.output and isinstance(res, ray.data.Dataset):
            res.write_parquet(args.output)  # streaming multi-file sink
            metrics["output"] = args.output
        elif args.output:
            import os

            os.makedirs(args.output, exist_ok=True)
            out = os.path.join(args.output, "part-0.parquet")
            res.to_parquet(out, index=False)
            metrics["output"] = out
            metrics["rows"] = int(len(res))
        else:
            n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
            metrics["rows"] = int(n)
        if args.stats and isinstance(res, ray.data.Dataset):
            import sys

            print(res.stats(), file=sys.stderr)
    else:
        from snomed_ct_entity_linking_ray.pipelines.entity_link import (
            run_entity_link_checkpointed,
        )

        metrics = run_entity_link_checkpointed(args.sf_dir, args.checkpoint_root)
        metrics["checkpoint_root"] = args.checkpoint_root
    metrics["total_wall_s"] = round(time.time() - t0, 3)
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
