"""Flagship pipeline — the reference's webAccessLogParser end-to-end shape
(SURVEY.md §3.1/§3.4): read → parse → enrich → route → aggregate → alerts,
with per-partition lineage metrics.

    read_parquet(transcripts)                 # pruned scan
      → parse_dataset (stateless maps)       # grok/regex extract + sink column
      → enrich_dataset (actor pool)          # broadcast lookups — Ray fuses the
                                             #   parse maps into this pool
      → materialize routed table ONCE        # object-store blocks, spill-backed
      → CONCURRENTLY from those blocks:      # driver threads; zero-copy reads
          write_sinks (partitioned fan-out)  # routed rows, one dir per sink
          aggregate suite (two-phase shuffles)  # per-sink counts, hourly, top-k
      → threshold alerts (broadcast join)
      → optional history append + manifest   # IO5/S5

The input is parsed EXACTLY ONCE — the reference's shape (one AWK pass emits
the parsed table + side files; sort/top-k passes read the temp files,
webAccessLogParser.sh:1300-1513) — and at 100 TB you never re-run the regex
pass per report: every report consumes the same materialized blocks with a
column-pruned projection.
"""

from __future__ import annotations

import tempfile
import time

import pyarrow.compute as pc

import ray.data

from log_parser_ray.schema import THRESHOLDS
from log_parser_ray.stages.aggregate import (
    grouped_count,
    threshold_alerts,
    top_k,
)
from log_parser_ray.stages.enrich import enrich_dataset
from log_parser_ray.stages.parse import parse_dataset
from log_parser_ray.stages.route import write_sinks
from log_parser_ray.state.manifest import PartitionRecord, RunManifest


def build(transcripts: "ray.data.Dataset", *, enrich_concurrency=None) -> "ray.data.Dataset":
    """transcripts → parsed+enriched routed Dataset (lazy, streams)."""
    return enrich_dataset(parse_dataset(transcripts), concurrency=enrich_concurrency)


def _not_null(col: str):
    return lambda t: t.filter(pc.is_valid(t[col]))


def run(
    transcripts: "ray.data.Dataset",
    out_dir: str | None = None,
    *,
    partition: str = "all",
    manifest: RunManifest | None = None,
    enrich_concurrency=None,
    history_root: str | None = None,
    run_date: str | None = None,
) -> dict:
    """Execute the full DAG; returns small pandas aggregate tables + row count.

    The parsed+routed table is materialized ONCE (object-store blocks; Ray
    spills past memory), then the sink write and all five aggregate reports
    run CONCURRENTLY from it on driver threads — the aggregates are
    independent shuffles, and serializing them would stack their barrier
    latencies into a fixed cost that caps scaling efficiency. (The
    alternative write-then-rescan layout pays a second parquet decode; with
    spilling, sharing the materialized blocks is strictly cheaper.)"""
    t0 = time.perf_counter()
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="logpipe_run_")
    routed = build(transcripts, enrich_concurrency=enrich_concurrency).materialize()

    narrow = routed.select_columns(
        ["conv_id", "turn_idx", "category", "hour", "tool_name", "rt_us", "sink"]
    )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=6) as ex:
        f_write = ex.submit(write_sinks, routed, out_dir)
        f_sink = ex.submit(lambda: grouped_count(narrow, ["sink"], alias="n").to_pandas())
        f_convcat = ex.submit(
            lambda: grouped_count(narrow, ["conv_id", "category"], alias="n").to_pandas()
        )
        f_hourly = ex.submit(
            lambda: grouped_count(narrow, ["hour", "sink"], alias="n").to_pandas()
        )
        f_topk = ex.submit(
            lambda: top_k(
                narrow.map_batches(
                    _not_null("rt_us"), batch_format="pyarrow", zero_copy_batch=True,
                    batch_size=None,
                ).select_columns(["conv_id", "turn_idx", "tool_name", "rt_us"]),
                by=["rt_us", "conv_id", "turn_idx"],
                descending=[True, False, False],
                k=10,
            ).to_pandas()
        )
        f_errconv = ex.submit(
            lambda: grouped_count(
                narrow.map_batches(
                    lambda t: t.filter(pc.equal(t["sink"], "errors")),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=None,
                ),
                ["conv_id"],
                alias="n",
            ).to_pandas()
        )
        f_write.result()
        sink_counts = f_sink.result()
        conv_category = f_convcat.result()
        hourly = f_hourly.result()
        topk_slow = f_topk.result()
        errors_per_conv = f_errconv.result()

    alerts = threshold_alerts(
        errors_per_conv,
        rule="conv.errCntTh",
        key_col="conv_id",
        value_col="n",
        threshold=THRESHOLDS["conv.errCntTh"],
    )

    rows = int(sink_counts["n"].sum())
    result = {
        "out_dir": out_dir,
        "sink_counts": sink_counts.sort_values("sink").reset_index(drop=True),
        "conv_category": conv_category.sort_values(["conv_id", "category"]).reset_index(drop=True),
        "hourly": hourly.sort_values(["hour", "sink"]).reset_index(drop=True),
        "topk_slow": topk_slow,
        "alerts": alerts.sort_values("key").reset_index(drop=True) if len(alerts) else alerts,
        "rows": rows,
    }

    if history_root is not None and run_date is not None:
        # IO5: append this run's summary rows to the long-lived history
        # sinks, idempotently per date (a rerun of the same day replaces it)
        from log_parser_ray.state.history import append_history

        append_history(history_root, "sink_counts", run_date, result["sink_counts"])
        append_history(history_root, "hourly", run_date, result["hourly"])
        append_history(history_root, "alerts", run_date, result["alerts"])

    if manifest is not None:
        manifest.append(
            PartitionRecord(
                partition=partition,
                status="done",
                rows_in=rows,
                rows_routed=rows,
                sink_counts={r["sink"]: int(r["n"]) for _, r in sink_counts.iterrows()},
                wall_s=time.perf_counter() - t0,
            )
        )
    return result
