"""Dedup-at-scale probe: minhash_clusters_ds end-to-end over the documents
table replicated ×K with UNIQUE doc_ids per replica (doc_id + k·10⁷), so the
near-dup structure multiplies instead of collapsing. Large K pushes the
verified edge count past CC_SINGLE_TASK_MAX_EDGES and exercises the
distributed label-propagation regime end-to-end.

Usage: python tools/dedup_scale_probe.py [--k 64] [--cpus 32]
Prints one JSON line (docs, edges regime, wall_s, docs/s).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from log_parser_ray.stages import dedup as D

    n_blocks = args.cpus * 4
    docs = ray.data.read_parquet(
        f"{args.sf}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=n_blocks,
    )

    def replicate(t: pa.Table, k=args.k) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for i in range(k):
            parts.append(
                pa.table(
                    {
                        "doc_id": pc.add(t["doc_id"], i * 10_000_000),
                        "text": t["text"],
                    }
                )
            )
        return pa.concat_tables(parts)

    reps = docs.map_batches(
        replicate, batch_format="pyarrow", zero_copy_batch=True, batch_size=64
    ).materialize()
    n_docs = reps.count()
    t0 = time.perf_counter()
    out = D.minhash_clusters_ds(reps, threshold=0.9).materialize()
    wall = time.perf_counter() - t0
    n = out.count()
    assert n == n_docs, (n, n_docs)
    print(json.dumps({
        "k": args.k, "docs": n_docs, "cpus": args.cpus,
        "wall_s": round(wall, 2), "docs_per_sec": round(n_docs / wall, 1),
        "cc_single_task_max_edges": D.CC_SINGLE_TASK_MAX_EDGES,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
