"""Router / fan-out sinks.

The reference routes lines to per-category side files: `.process`, `.filter`,
`.tto`, `.hung`, discarded records, unknown user-agents (SURVEY.md IO4/IO7 —
webAccessLogParser.sh:652,683,1518-1557; websphereLogParser.sh:866-868).

Ray-native shape: routing is a *column* (`sink`, derived in the parse stage as
a strict partition of rows), and the fan-out is ONE streaming
``write_parquet(partition_cols=["sink"])`` pass — one Hive-partitioned
directory per sink, no per-sink rescans of the input.  Per-sink files are
bounded with ``min_rows_per_file`` so a 100 TB run emits a resumable layout
(out/sink=errors/part-*.parquet), never one giant file.
"""

from __future__ import annotations

import ray.data


def write_sinks(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    min_rows_per_file: int = 100_000,
    max_rows_per_file: int = 2_000_000,
) -> None:
    """Single-pass fan-out of routed rows to per-sink Parquet directories."""
    ds.write_parquet(
        out_dir,
        partition_cols=["sink"],
        min_rows_per_file=min_rows_per_file,
        max_rows_per_file=max_rows_per_file,
    )


def sink_filter(ds: "ray.data.Dataset", sink: str) -> "ray.data.Dataset":
    """One routed sink as a Dataset (vectorized Arrow filter, streams)."""
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["sink"], sink)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
