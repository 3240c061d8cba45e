"""Flagship box-ceiling probes (BASELINE.md §Measured, round 3 stretch).

The flagship's single-box scaling tops out ≈1.1 M turns/s regardless of
core count (BASELINE.md round-2 analysis: the shared memory subsystem, not
the cores, saturates). Each probe here perturbs ONE memory-subsystem lever
and reruns the identical 16-CPU flagship job in a fresh process, so the
deltas attribute the ceiling:

  control     bench.py defaults (object store ~43% of RAM, /tmp sinks, zstd)
  bigstore    object store sized to 70% of RAM (plasma pressure probe)
  shm-sink    sink writes to /dev/shm (page-cache/disk write-path probe)
  nocompress  parquet sinks uncompressed (CPU↔bytes trade probe)
  snappy      parquet sinks snappy (lighter codec point)
  dictnarrow  int8-code low-cardinality narrow columns (bytes/row probe,
              round 4 — adopted as the default; `nodict` disables it)

Usage: python tools/ceiling_probe.py --variant control [--cpus 16]
Prints one JSON line; run each variant in its own process (fresh Ray).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=["control", "bigstore", "shm-sink", "nocompress",
                             "snappy", "dictnarrow", "nodict"])
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--repeat", type=int, default=96)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    if args.variant == "nocompress":
        os.environ["GRAFT_SINK_COMPRESSION"] = "none"
    elif args.variant == "snappy":
        os.environ["GRAFT_SINK_COMPRESSION"] = "snappy"
    elif args.variant == "dictnarrow":
        # round-4 lever (now the DEFAULT): int8-code the low-cardinality
        # narrow strings before materialization (route.EnrichWriteProject)
        os.environ["GRAFT_NARROW_DICT"] = "1"
    elif args.variant == "nodict":
        os.environ["GRAFT_NARROW_DICT"] = "0"

    import ray

    init_kw = dict(address="local", num_cpus=args.cpus,
                   include_dashboard=False, logging_level="ERROR",
                   log_to_driver=False)
    if args.variant == "bigstore":
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        init_kw["object_store_memory"] = int(total * 0.7)
    ray.init(**init_kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import bench
    from log_parser_ray.pipelines import flagship

    bench._warmup(args.cpus)
    path = bench._corpus_path(args.sf, args.repeat)
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    import ray.data

    tr = ray.data.read_parquet(path, override_num_blocks=max(n_files, 1))
    sink_base = "/dev/shm" if args.variant == "shm-sink" else "/tmp"
    out_dir = tempfile.mkdtemp(prefix=f"probe_{args.variant}_", dir=sink_base)
    t0 = time.perf_counter()
    res = flagship.run(tr, out_dir=out_dir)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "variant": args.variant, "cpus": args.cpus, "rows": res["rows"],
        "wall_s": round(wall, 3),
        "turns_per_sec": round(res["rows"] / wall, 1),
    }))
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
