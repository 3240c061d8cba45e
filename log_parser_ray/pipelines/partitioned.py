"""Partitioned, resumable flagship runs — checkpoint manifest + lineage.

The north rule requires the pipeline to resume mid-run without recomputing
completed partitions, with per-partition lineage + metrics. Shape:

* The input is processed as named partitions (here: conv_id hash buckets;
  on a real corpus the natural partitions are input files / date dirs, which
  avoids re-scanning — the bucket filter stands in for a partitioned read).
* Each partition's routed output is written ATOMICALLY: into
  ``<root>/<partition>.tmp.<pid>`` then renamed to ``<root>/<partition>``
  (state.manifest.atomic_output_dir) — the reference's `mv temp → report`
  commit point (webAccessLogParser.sh:1518-1557) made crash-safe.
* After the rename, one JSON line with lineage + metrics (rows in/routed,
  per-sink counts, wall time) is appended to the run manifest. A partition
  that died mid-write left only a .tmp dir and no manifest line, so a resume
  reruns it and the rename overwrites — idempotent, exactly-once output.
* ``resume=True`` (default) skips partitions whose manifest status is done.

tests/test_resume.py kills a run partway and checks resumed == uninterrupted.
"""

from __future__ import annotations

import hashlib
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from log_parser_ray.pipelines.flagship import build
from log_parser_ray.stages.aggregate import grouped_count
from log_parser_ray.stages.route import write_sinks
from log_parser_ray.state.manifest import (
    PartitionRecord,
    RunManifest,
    atomic_output_dir,
)


def conv_bucket_filter(n_buckets: int, bucket: int):
    """Vectorized deterministic conv_id → bucket filter.

    dictionary-encodes the column so the md5 hash runs once per UNIQUE
    conv_id per batch, then a C-speed take/filter selects the bucket."""

    def fn(t: pa.Table) -> pa.Table:
        enc = t["conv_id"].combine_chunks().dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        ub = pa.array(
            [
                int.from_bytes(hashlib.md5(u.encode()).digest()[:4], "little")
                % n_buckets
                == bucket
                for u in uniq
            ],
            pa.bool_(),
        )
        mask = ub.take(enc.indices)
        return t.filter(pc.fill_null(mask, False))

    return fn


def run_partitioned(
    transcripts: "ray.data.Dataset",
    out_root: str,
    *,
    n_buckets: int = 4,
    resume: bool = True,
    fail_after: int | None = None,
    enrich_concurrency=None,
) -> dict:
    """Run the flagship fan-out per conv-bucket partition, resumably.

    fail_after=k injects a crash after k completed partitions (tests only).
    Returns {partition: sink_counts} for completed partitions this run +
    previously completed ones."""
    manifest = RunManifest(out_root)
    done = manifest.completed() if resume else {}
    results: dict[str, dict] = {
        p: rec["sink_counts"] for p, rec in done.items()
    }
    completed_this_run = 0
    for b in range(n_buckets):
        name = f"bucket={b}"
        if name in done:
            continue
        if fail_after is not None and completed_this_run >= fail_after:
            raise RuntimeError(f"injected failure before {name}")
        t0 = time.perf_counter()
        part = transcripts.map_batches(
            conv_bucket_filter(n_buckets, b),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
        routed = build(part, enrich_concurrency=enrich_concurrency)
        final_dir = os.path.join(out_root, name)
        with atomic_output_dir(final_dir) as tmp:
            write_sinks(routed, tmp)
        counts_df = grouped_count(
            ray.data.read_parquet(final_dir, columns=["sink"]), ["sink"], alias="n"
        ).to_pandas()
        sink_counts = {r["sink"]: int(r["n"]) for _, r in counts_df.iterrows()}
        rows = int(sum(sink_counts.values()))
        manifest.append(
            PartitionRecord(
                partition=name,
                status="done",
                input=f"conv_bucket {b}/{n_buckets}",
                rows_in=rows,
                rows_routed=rows,
                sink_counts=sink_counts,
                wall_s=time.perf_counter() - t0,
            )
        )
        results[name] = sink_counts
        completed_this_run += 1
    return results
