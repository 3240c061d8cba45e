"""Partitioned, resumable flagship runs — checkpoint manifest + lineage.

The north rule requires the pipeline to resume mid-run without recomputing
completed partitions, with per-partition lineage + metrics. Shape:

* **Partitions are defined AT THE READ**, not by post-read filtering: the
  input parquet's row groups are grouped into contiguous ``event_id`` ranges
  (row-group statistics give the ranges for free), and each partition is a
  ``read_parquet(path, filter=event_id ∈ [lo, hi])`` whose predicate pushes
  down to row-group pruning. Total bytes read across all partitions ≈ 1×
  input — the round-1 design (conv-hash bucket filter over n full scans)
  read n× input and is gone. On a date-partitioned corpus the same helper
  would enumerate date dirs/files instead of row-group ranges.
* Each partition's routed output is written ATOMICALLY: into
  ``<root>/<partition>.tmp.<pid>`` then renamed to ``<root>/<partition>``
  (state.manifest.atomic_output_dir) — the reference's `mv temp → report`
  commit point (webAccessLogParser.sh:1518-1557) made crash-safe.
* After the rename, one JSON line with lineage + metrics (rows in/routed,
  per-sink counts, wall time) is appended to the run manifest. A partition
  that died mid-write left only a .tmp dir and no manifest line, so a resume
  reruns it and the rename overwrites — idempotent, exactly-once output.
* ``resume=True`` (default) skips partitions whose manifest status is done.

Routing is row-local (the sink column is a function of the row), so range
partitions that split a conversation across partitions still produce exact
routed rows and per-sink counts — only the per-conversation ORDERED
operators (sessions.py) need conv-complete inputs, and they run on the
unpartitioned pipeline.

tests/test_resume.py kills a run partway and checks resumed == uninterrupted.
"""

from __future__ import annotations

import os
import time

import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data

from log_parser_ray.stages.aggregate import grouped_count
from log_parser_ray.stages.route import write_sinks
from log_parser_ray.state.manifest import (
    PartitionRecord,
    RunManifest,
    atomic_output_dir,
)


def discover_event_partitions(
    events_path: str, n_partitions: int
) -> list[tuple[str, int, int]]:
    """(name, lo, hi) inclusive event_id ranges aligned to row-group stats.

    With ≥ n_partitions row groups, partitions are contiguous row-group
    runs — each read decodes ONLY its own row groups (statistics pruning).
    With fewer row groups (tiny inputs), falls back to even event_id ranges;
    pruning then happens at the decode filter instead of the group level."""
    md = pq.ParquetFile(events_path).metadata
    names = [md.row_group(0).column(i).path_in_schema
             for i in range(md.row_group(0).num_columns)]
    col = names.index("event_id")
    bounds = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(col).statistics
        bounds.append((int(st.min), int(st.max)))
    if md.num_row_groups >= n_partitions:
        per = -(-md.num_row_groups // n_partitions)  # ceil
        parts = []
        for s in range(0, md.num_row_groups, per):
            chunk = bounds[s : s + per]
            lo = min(b[0] for b in chunk)
            hi = max(b[1] for b in chunk)
            parts.append((f"events-{lo}-{hi}", lo, hi))
        return parts
    lo_all = min(b[0] for b in bounds)
    hi_all = max(b[1] for b in bounds)
    span = hi_all - lo_all + 1
    step = -(-span // n_partitions)
    return [
        (f"events-{lo}-{min(lo + step - 1, hi_all)}", lo, min(lo + step - 1, hi_all))
        for lo in range(lo_all, hi_all + 1, step)
    ]


def run_partitioned(
    sf_dir: str,
    out_root: str,
    *,
    n_partitions: int = 4,
    resume: bool = True,
    fail_after: int | None = None,
    enrich_concurrency=None,
) -> dict:
    """Run the flagship fan-out per input-range partition, resumably.

    fail_after=k injects a crash after k completed partitions (tests only).
    Returns {partition: sink_counts} for completed partitions this run +
    previously completed ones."""
    from log_parser_ray.pipelines.flagship import build
    from log_parser_ray.sources.transcripts import transcripts_from_events

    events_path = os.path.join(sf_dir, "events.parquet")
    manifest = RunManifest(out_root)
    done = manifest.completed() if resume else {}
    results: dict[str, dict] = {p: rec["sink_counts"] for p, rec in done.items()}
    completed_this_run = 0
    for name, lo, hi in discover_event_partitions(events_path, n_partitions):
        if name in done:
            continue
        if fail_after is not None and completed_this_run >= fail_after:
            raise RuntimeError(f"injected failure before {name}")
        t0 = time.perf_counter()
        flt = (pads.field("event_id") >= lo) & (pads.field("event_id") <= hi)
        part = transcripts_from_events(sf_dir, filter=flt)
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
                input=f"{events_path} event_id [{lo}, {hi}]",
                rows_in=rows,
                rows_routed=rows,
                sink_counts=sink_counts,
                wall_s=time.perf_counter() - t0,
            )
        )
        results[name] = sink_counts
        completed_this_run += 1
    return results
