"""Cluster job entrypoint: the checkpoint-resumable KG compile, shaped
for ``ray job submit``.

On a real cluster::

    ray job submit --address http://<head>:8265 --working-dir . -- \
        python tools/ray_job.py --pages /data/pages --out /data/kg \
        --files-per-shard 4

Locally (smoke)::

    python tools/ray_job.py --pages <dir-of-parquet> --out /tmp/kg_out

The job connects to whatever cluster ``RAY_ADDRESS`` points at (the
job-server sets it; standalone falls back to local mode), runs
``CheckpointedCompile`` over the input shards (per-shard manifest
lineage — a resubmitted job skips completed shards), and prints one
JSON metrics line: shards done/skipped, rows, triples, wall seconds.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

# the job's working dir is the repo root (ray job submit --working-dir .);
# when invoked as `python tools/ray_job.py` make the package importable too
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True,
                    help="directory of input Parquet page files")
    ap.add_argument("--out", required=True, help="output/checkpoint dir")
    ap.add_argument("--files-per-shard", type=int, default=1)
    ap.add_argument("--synthetic-registry", action="store_true",
                    help="use the synthetic namespace registry (tests)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS is set by the job server;
        # standalone runs fall back to local mode
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True)

    from pybel_ray.pipeline import CheckpointedCompile

    files = sorted(glob.glob(os.path.join(args.pages, "*.parquet")))
    if not files:
        print(json.dumps({"error": "no parquet files in --pages"}))
        return 2

    registry = None
    if args.synthetic_registry:
        from pybel_ray.pages import default_registry

        registry = default_registry()

    cc = CheckpointedCompile(
        args.out, registry=registry,
        files_per_shard=args.files_per_shard,
    )
    skipped = len(cc.completed_shards())
    t0 = time.time()
    tables = cc.run(files)
    wall = time.time() - t0
    done = cc.completed_shards()
    triples = tables.triples().count()
    print(json.dumps({
        "shards_total": len(done),
        "shards_skipped_resume": skipped,
        "triples": int(triples),
        "wall_sec": round(wall, 3),
        "manifest": cc.manifest_path,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
