"""Flagship pipeline — the reference's webAccessLogParser end-to-end shape
(SURVEY.md §3.1/§3.4): read → parse → enrich → route → aggregate → alerts,
with per-partition lineage metrics.

    read_parquet(transcripts)                 # pruned scan
      → parse_dataset (stateless maps)       # grok/regex extract + sink column
      → enrich_write_project (fused FUNCTION # broadcast lookups + sink write +
        stage — NOT an actor pool, so it     #   narrow projection, ONE fused
        fuses into the read tasks)           #   chain (parse maps fuse in)
      → materialize NARROW columns only      # text never enters the store
      → CONCURRENTLY from those blocks:      # driver threads; zero-copy reads
          aggregate suite (two-phase shuffles)  # per-sink counts, hourly, top-k
      → threshold alerts (broadcast join)
      → optional history append + manifest   # IO5/S5

The input is parsed EXACTLY ONCE — the reference's shape (one AWK pass emits
the parsed table + side files; sort/top-k passes read the temp files,
webAccessLogParser.sh:1300-1513) — and at 100 TB you never re-run the regex
pass per report: every report consumes the same materialized narrow blocks.
"""

from __future__ import annotations

import os
import tempfile
import time

import pyarrow.compute as pc

import ray.data

from log_parser_ray.schema import THRESHOLDS
from log_parser_ray.stages.aggregate import (
    grouped_count,
    grouped_stats,
    threshold_alerts_ds,
    top_k,
)
from log_parser_ray.stages.enrich import enrich_dataset
from log_parser_ray.stages.parse import parse_dataset
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

    ONE fused pass (read → compose → parse → enrich+write+project actor pool)
    writes the routed rows to the per-sink layout as a side effect and
    materializes ONLY the 7 narrow aggregate columns — the full-width rows
    (text included) never transit or pin the object store (round-1 scaling
    postmortem). The five aggregate reports then run CONCURRENTLY from the
    narrow blocks on driver threads — independent shuffles whose barrier
    latencies would otherwise stack into a fixed cost that caps scaling
    efficiency."""
    from log_parser_ray.stages.route import enrich_write_project

    t0 = time.perf_counter()
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="logpipe_run_")
    else:
        # rerun into an existing out_dir must REPLACE the routed sinks and
        # alerts, not accumulate stale content-named parts next to them
        # (state.manifest.fresh_dir contract; fresh tempdir path skips it)
        import glob as _glob

        from log_parser_ray.state.manifest import fresh_dir

        for d in _glob.glob(os.path.join(out_dir, "sink=*")):
            fresh_dir(d)
        fresh_dir(os.path.join(out_dir, "alerts"))
    narrow_cols = ["conv_id", "turn_idx", "category", "hour", "tool_name", "rt_us", "sink"]
    # A plain-function stage (NOT an actor pool) so Ray fuses
    # read → parse → enrich+write+project into ONE task per input block:
    # full-width text blocks never transit the object store at all (the
    # actor-pool form still paid one read-task → store → actor round-trip,
    # the dominant shared-memory traffic on a single box — BASELINE.md).
    # An explicit enrich_concurrency caps concurrent tasks (tests / small
    # runs); by default the streaming executor sizes tasks to the cluster.
    mb_kwargs = {}
    if enrich_concurrency is not None:
        mb_kwargs["concurrency"] = enrich_concurrency
    narrow = (
        parse_dataset(transcripts, batch_size=None)
        .map_batches(
            enrich_write_project,
            fn_kwargs={"out_dir": out_dir, "narrow_cols": tuple(narrow_cols)},
            batch_format="pyarrow",
            zero_copy_batch=True,
            # batch_size intentionally UNSET: a batch_size pins
            # min_rows_per_bundled_input on the stage, and Ray refuses to fuse
            # a Read (can_modify_num_rows) into a stage with a row floor —
            # which forces every full-width text block through the object
            # store once. Unset, the batch is the whole input block (the
            # corpus writer bounds files to 200-400k rows), and the plan is
            # ReadParquet->parse->enrich_write_project in ONE task.
            **mb_kwargs,
        )
        .materialize()
    )

    from concurrent.futures import ThreadPoolExecutor

    import pandas as pd
    import pyarrow as pa

    # Three shuffles cover the five reports (SURVEY §7.5 "very wide aggregate
    # inventory — fuse same-key aggs into shared shuffles"): the
    # (conv_id, category, sink) count is the common refinement from which
    # conv_category, errors-per-conv and sink_counts all derive by summing
    # out a column. Conv-keyed tables STAY DISTRIBUTED — at 10¹² turns the
    # conv_id cardinality is ~10⁹, so a (conv_id, …) table is tens of GB and
    # never belongs on the driver (round-3 verdict #1); only the genuinely
    # bounded frames are collected (sink counts: ≤ #sinks rows; hourly:
    # ≤ 24 × #sinks; top-k: 10).
    with ThreadPoolExecutor(max_workers=3) as ex:
        f_ccs = ex.submit(
            lambda: grouped_count(
                narrow, ["conv_id", "category", "sink"], alias="n"
            ).materialize()
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
        ccs = f_ccs.result()
        hourly = f_hourly.result()
        topk_slow = f_topk.result()

    ccs_empty = ccs.count() == 0  # metadata-only: ccs is materialized

    # GRAFT_NARROW_DICT lever: the narrow blocks carry int8 CODES for
    # sink/category (route.EnrichWriteProject). Decode ONCE, eagerly: the
    # downstream derivations run through group_safe_map, which MATERIALIZES
    # its input — a lazy decode would therefore re-execute AND re-pin one
    # decoded copy per consumer (3×), where a single decoded materialize is
    # shared by all of them; rebinding `ccs` releases the coded blocks.
    sch = ccs.schema()
    if sch is not None and "sink" in sch.names and pa.types.is_integer(
        sch.base_schema.field("sink").type
    ):
        from log_parser_ray.stages.route import CATEGORY_ORDER, SINK_ORDER

        def _decode(t: pa.Table) -> pa.Table:
            for c, order in (("sink", SINK_ORDER), ("category", CATEGORY_ORDER)):
                i = t.column_names.index(c)
                t = t.set_column(
                    i, c,
                    pc.take(pa.array(order, pa.string()),
                            pc.cast(t[c], pa.int32())),
                )
            return t

        ccs = ccs.map_batches(
            _decode, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        if "sink" in hourly.columns:
            hourly["sink"] = hourly["sink"].map(dict(enumerate(SINK_ORDER)))

    from log_parser_ray.stages.aggregate import ALERT_SCHEMA

    if ccs_empty:
        # an empty partition (a date slice matching no rows) yields
        # schema-less empty aggregates — normalize every report to its
        # schema instead of KeyError'ing downstream
        sink_counts = pd.DataFrame(columns=["sink", "n"])
        hourly = pd.DataFrame(columns=["hour", "sink", "n"])
        conv_category = ray.data.from_arrow(
            pa.schema([("conv_id", pa.string()), ("category", pa.string()),
                       ("n", pa.int64())]).empty_table()
        )
        alerts = ray.data.from_arrow(ALERT_SCHEMA.empty_table())
    else:
        # bounded collect: one row per sink
        sink_counts = (
            grouped_stats(ccs, ["sink"], "n", count=None, sum_="n")
            .to_pandas()
            .sort_values("sink")
            .reset_index(drop=True)
        )
        # conv-keyed derivations: post-aggregate shuffles over the (already
        # combined) count table; conv_category remains a lazy Dataset over
        # the materialized ccs blocks
        conv_category = grouped_stats(ccs, ["conv_id", "category"], "n",
                                      count=None, sum_="n")
        errors_per_conv = grouped_stats(
            ccs.map_batches(
                lambda t: t.filter(pc.equal(t["sink"], "errors")),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            ["conv_id"], "n", count=None, sum_="n",
        )

        # J5 as a distributed filter: alert rows are produced inside
        # map_batches against the closure threshold and land in an alerts/
        # parquet sink — the reference streams alerts to a file
        # (websphereLogParser.sh:345-379)
        from log_parser_ray.stages.aggregate import conform_schema

        # conform_schema: a map task that emits no alert rows leaves a
        # schema-less empty block that would poison the collected frame
        alerts = conform_schema(
            threshold_alerts_ds(
                errors_per_conv,
                rule="conv.errCntTh",
                key_col="conv_id",
                value_col="n",
                threshold=THRESHOLDS["conv.errCntTh"],
            ),
            ALERT_SCHEMA,
        )
        if alerts.count() > 0:
            alerts.write_parquet(f"{out_dir}/alerts")

    rows = int(sink_counts["n"].sum()) if len(sink_counts) else 0
    result = {
        "out_dir": out_dir,
        "sink_counts": sink_counts,
        "conv_category": conv_category,
        "hourly": hourly.sort_values(["hour", "sink"]).reset_index(drop=True),
        "topk_slow": topk_slow,
        "alerts": alerts,
        "rows": rows,
    }

    if history_root is not None and run_date is not None:
        # IO5: append this run's summary rows to the long-lived history
        # sinks, idempotently per date (a rerun of the same day replaces it).
        # The alert collect here is the bounded contract edge: history rows
        # are exceedances, not per-key aggregates.
        from log_parser_ray.state.history import append_history

        alerts_df = alerts.to_pandas()
        if alerts_df.empty:
            # Ray's to_pandas drops the schema of an all-empty dataset;
            # rebuild TYPED from ALERT_SCHEMA so the history partition never
            # carries null-typed columns
            alerts_df = ALERT_SCHEMA.empty_table().to_pandas()
        alerts_df = alerts_df.sort_values("key").reset_index(drop=True)
        append_history(history_root, "sink_counts", run_date, result["sink_counts"])
        append_history(history_root, "hourly", run_date, result["hourly"])
        append_history(history_root, "alerts", run_date, alerts_df)

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
