"""History sinks — append-only cross-run state (IO5).

The reference appends one summary row per day to long-lived CSVs when run
with ``--rpttype daily`` (create-with-header on first run; headers at
webAccessLogParser.sh:55-126, appends at e.g. webAccessLogParser.sh:823,845) —
incremental materialized views keyed by date.

Ray-native shape: each history report is a directory of date-partitioned
Parquet — ``<root>/<report>/date=YYYY-MM-DD/part.parquet`` — and an append is
an IDEMPOTENT per-date overwrite (write tmp, rename over the date dir). A
rerun of the same day replaces that day's row(s) exactly, so retries and
resumes never double-append — the property the reference lacks (a crashed
daily run leaves a half-appended CSV). Reading the full history is a plain
partitioned ``read_parquet`` with the date as a partition column.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from log_parser_ray.state.manifest import atomic_output_dir


def append_history(root: str, report: str, date: str, rows: pd.DataFrame) -> str:
    """Idempotently (over)write one date partition of one history report.

    An EMPTY frame still replaces the partition (a rerun of a day whose
    corrected logs produce no rows must remove the stale rows) but writes
    no parquet file: an all-object empty pandas frame would otherwise infer
    ``null``-typed columns, and one null-typed partition makes the whole
    report unreadable next to a dated partition with real values."""
    final_dir = os.path.join(root, report, f"date={date}")
    os.makedirs(os.path.dirname(final_dir), exist_ok=True)
    with atomic_output_dir(final_dir) as tmp:
        if len(rows):
            pq.write_table(
                pa.Table.from_pandas(rows, preserve_index=False),
                os.path.join(tmp, "part-0.parquet"),
            )
    return final_dir


def read_history(root: str, report: str) -> pd.DataFrame:
    """Full history of one report, date partition column included."""
    import pyarrow.dataset as pads

    dataset = pads.dataset(
        os.path.join(root, report), format="parquet", partitioning="hive"
    )
    df = dataset.to_table().to_pandas()
    if "date" in df.columns:
        df["date"] = df["date"].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)
