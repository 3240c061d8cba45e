"""Master orchestrator — the masterLogParser.sh analogue (S4) over REAL
log files.

The reference runs its four parsers sequentially with the same CLI args
(masterLogParser.sh:30-42). Here one Ray session dispatches each log family
by filename pattern to its parse pack and writes per-family parsed parquet
plus a combined run manifest line per family (S5 lineage):

    access_log*      → stages/accesslog   (+ weblog report suite)
    error_log*       → stages/errorlog    (error rows + mpmstats join)
    SystemOut*       → stages/waslog      (rows + tto correlation)
    native_stdout*   → stages/gclog       (GC rows)

Families with no matching files are skipped (the reference's parsers each
no-op on empty discovery). Returns per-family row counts.
"""

from __future__ import annotations

import os
import time

import ray.data

from log_parser_ray.state.manifest import (
    PartitionRecord,
    RunManifest,
    fresh_dir,
)

FAMILIES = {
    "access": "access_log",
    "error": "error_log",
    "was": "SystemOut",
    "gc": "native_stdout",
}


def _has_files(root: str, pattern: str) -> bool:
    if os.path.isfile(root):
        return pattern in os.path.basename(root)
    return any(pattern in n for n in os.listdir(root))


def run(
    log_dir: str,
    out_dir: str,
    *,
    record_date: str | None = None,
    rpt_type: str = "ondemand",
    history_root: str | None = None,
    perf_baseline: str | None = None,
    clone_map: dict[str, str] | None = None,
) -> dict:
    """Run every applicable parser family over ``log_dir``; returns
    {family: rows}.

    ``rpt_type="daily"`` (the reference's `-t daily`, usage.sh:121-135)
    additionally appends each family's daily summary rows to the
    date-partitioned history sinks under ``history_root`` (defaults to
    ``out_dir``/history), keyed by ``record_date``. NOTE record_date KEYS
    the history partitions here; it does not filter rows (the per-family
    date predicate is the rotated-file pattern — pass weblog.run's
    ``record_date`` directly for a per-record predicate).
    ``perf_baseline`` is the access family's perfBaseLine.csv path
    (webAccessLogParser.sh:37) feeding the per-URI bart/diff columns;
    ``clone_map`` overrides the cloneID→WAS topology (WAS_CloneIDs.csv,
    loadable via ``accesslog.load_clone_map``)."""
    import pandas as pd

    from log_parser_ray.pipelines import weblog
    from log_parser_ray.pipelines.reports import (
        gc_summary_tables,
        render_gc_summary,
        render_was_summary,
        was_summary_tables,
        _prefix_alerts,
    )
    from log_parser_ray.sources.rawlogs import read_raw_logs
    from log_parser_ray.stages.errorlog import (
        parse_error_families,
        split_error_families,
    )
    from log_parser_ray.stages.gclog import parse_gc_lines
    from log_parser_ray.stages.waslog import parse_was_lines, tto_correlate

    os.makedirs(out_dir, exist_ok=True)
    manifest = RunManifest(out_dir)
    results: dict[str, int] = {}
    all_alerts: list["pd.DataFrame"] = []
    daily = rpt_type == "daily" and record_date is not None
    if daily and history_root is None:
        history_root = os.path.join(out_dir, "history")

    def hist(report: str, rows) -> None:
        # always append when daily — an EMPTY frame must still replace the
        # date partition (append_history handles the empty write safely)
        if daily:
            from log_parser_ray.state.history import append_history

            append_history(history_root, report, record_date, rows)

    def lines_for(pattern: str) -> "ray.data.Dataset":
        ds = read_raw_logs(log_dir, file_pattern=pattern)
        # line_id for the packs' per-line outputs: the per-file line number
        import pyarrow as pa

        def ids(t: pa.Table) -> pa.Table:
            return t.append_column(
                "line_id", pa.compute.cast(t["turn_idx"], pa.int64())
            )

        return ds.map_batches(ids, batch_format="pyarrow", zero_copy_batch=True)

    def record(family: str, rows: int, t0: float) -> None:
        results[family] = rows
        manifest.append(
            PartitionRecord(
                partition=f"family={family}",
                status="done",
                input=f"{log_dir} ({FAMILIES[family]}*)",
                rows_in=rows,
                rows_routed=rows,
                sink_counts={family: rows},
                wall_s=time.perf_counter() - t0,
            )
        )

    def run_access() -> None:
        t0 = time.perf_counter()
        res = weblog.run(
            log_dir, os.path.join(out_dir, "access"),
            file_pattern=FAMILIES["access"],
            clone_map=clone_map,
            history_root=history_root if daily else None,
            run_date=record_date if daily else None,
            perf_baseline_us=(
                weblog.load_perf_baseline(perf_baseline)
                if perf_baseline else None
            ),
        )
        all_alerts.append(res["alerts"])
        record("access", int(res["hourly"]["irc"].sum()), t0)

    def run_error() -> None:
        from log_parser_ray.stages.aggregate import argmax_by
        from log_parser_ray.stages.errorlog import referrer_error_ranking

        t0 = time.perf_counter()
        # ONE read, fused parse: the error-row and mpmstats families both
        # come from a single tagged-union pass over the raw lines — only the
        # narrow PARSED rows are materialized; raw text never pins the
        # object store (it used to: a full `.materialize()` of the line
        # stream, exactly the traffic route.py's fused design avoids)
        tagged = parse_error_families(lines_for(FAMILIES["error"])).materialize()
        errs, mpm = split_error_families(tagged)
        errs = errs.materialize()
        # fresh_dir: a rerun must REPLACE each family's parquet rows, not
        # accumulate a second uuid-named file set next to the stale one
        errs.write_parquet(fresh_dir(os.path.join(out_dir, "error", "rows")))
        mpm = mpm.materialize()
        mpm.write_parquet(
            fresh_dir(os.path.join(out_dir, "error", "mpmstats")))
        # report edges (small aggregates): the reference's errCntByRef
        # ranking (webErrorLogParser.sh:341-347) and the per-server max-bsy
        # mpmstats record that feeds WebErrorLogMpmStatsRpt_all.csv
        # (:361-379) — both rendered from the already-parsed Datasets.
        # Either family can be absent from a given error_log (mpmstats is
        # IHS-specific; a pure-mpmstats log has no error lines) — skip the
        # report, don't crash on a column-less empty frame.
        if errs.count() > 0:
            # K8 is an UNLIMITED ranking (distinct referrers grow with the
            # corpus) — stream the sorted Dataset batch by batch instead of
            # collecting it to driver pandas
            from log_parser_ray.pipelines.reports import _ordered_execution

            ref_csv = os.path.join(out_dir, "error", "errCntByRef.csv")
            os.makedirs(os.path.dirname(ref_csv), exist_ok=True)
            ref_tmp = os.path.join(out_dir, "error", ".tmp-errCntByRef.csv")
            # ordered window (iter_batches yields in completion order
            # otherwise — a multi-block ranking would interleave) +
            # tmp/rename commit, like reports._stream_csv
            with _ordered_execution():
                with open(ref_tmp, "w") as fh:
                    fh.write("referrer,err_det,n\n")
                    for b in referrer_error_ranking(errs).iter_batches(
                            batch_format="pandas"):
                        b.to_csv(fh, index=False, header=False)
            os.replace(ref_tmp, ref_csv)
            # 03_WebErrorLogSummaryRpt: count-by-server / by-detail /
            # by-referrer sections (webErrorLogParser.sh:321-347 render)
            from log_parser_ray.pipelines.reports import (
                error_summary_tables,
                render_error_summary,
            )

            et = error_summary_tables(errs)
            with open(os.path.join(out_dir, "error",
                                   "03_WebErrorLogSummaryRpt.txt"), "w") as fh:
                fh.write(render_error_summary(et, record_date=record_date or ""))
            all_alerts.append(et["alerts"])
        if mpm.count() > 0:
            # WebErrorLogMpmStatsRpt_all.csv is the FULL record stream in
            # the reference (webErrorLogParser.sh:40,353-360 — every
            # mpmstats row in the ws/date/time/hr/... layout); only the
            # per-server daily max goes to history (:361-379)
            from log_parser_ray.pipelines.reports import _stream_csv

            def _mpm_fmt(r) -> str:
                # "Mon Jan 01 00:09:58 2024" → "Jan-01-2024" like the
                # golden sample_reports/WebErrorLogMpmStatsRpt_all.csv
                p = str(r.dtm).split()
                date = f"{p[1]}-{p[2]}-{p[4]}" if len(p) == 5 else str(r.dtm)
                tm = p[3] if len(p) == 5 else ""
                return "\t".join(
                    [f"{r.srv:<15}", f"{date:<11}", f"{tm:<8}",
                     f"{tm[:2]:>4}"]
                    + [f"{int(v):4d}" for v in
                       (r.rdy, r.bsy, r.rd, r.wr, r.ka, r.log, r.dns,
                        r.cls, r.was_bsy, r.wbg_bsy)]
                )

            _stream_csv(
                mpm.select_columns(
                    ["srv", "line_id", "dtm", "rdy", "bsy", "rd", "wr",
                     "ka", "log", "dns", "cls", "was_bsy", "wbg_bsy"]),
                os.path.join(out_dir, "error",
                             "WebErrorLogMpmStatsRpt_all.csv"),
                "\t".join([f"{'ws':<15}", f"{'date':<11}", f"{'time':<8}",
                           f"{'hr':>4}"]
                          + [f"{c:>4}" for c in
                             ("rdy", "bsy", "rd", "wr", "ka", "log", "dns",
                              "cls", "mwas", "mwgt")]),
                _mpm_fmt, ["srv", "line_id"], [False, False],
            )
            mx = argmax_by(
                mpm.select_columns(
                    ["srv", "line_id", "dtm", "rdy", "bsy", "rd", "wr", "ka",
                     "log", "dns", "cls", "was_bsy", "wbg_bsy"]
                ),
                ["srv"], ["bsy", "line_id"], [True, False],
            ).to_pandas().sort_values("srv")
            all_alerts.append(_prefix_alerts(
                mx, family="http", prop="httpMpmStBsyCountTh",
                key_col="srv", value_col="bsy"))
        else:
            mx = pd.DataFrame(columns=["srv", "line_id", "dtm", "rdy", "bsy",
                                       "rd", "wr", "ka", "log", "dns", "cls",
                                       "was_bsy", "wbg_bsy"])
        # per-server daily max-bsy record → date-partitioned history
        # (webErrorLogParser.sh:361-379). UNCONDITIONAL like the recycle
        # append below: a rerun whose corrected logs carry no mpmstats rows
        # must still clear that date's partition
        hist("mpmstats_daily_max", mx)
        # IHS recycle notices: one alert row per restart + the
        # RecycleHistoryRpt date|srv daily rows (webErrorLogParser.sh:
        # 45-49,248-253); bounded — restarts per day, not request traffic
        from log_parser_ray.stages.errorlog import recycle_rows

        rcy = recycle_rows(tagged).to_pandas()
        if len(rcy):
            rcy = rcy.sort_values("line_id").reset_index(drop=True)
            all_alerts.append(pd.DataFrame({
                "rule": "http.recycle",
                "key": rcy["srv"].astype(str) + " recycled at: "
                + rcy["dtm"].astype(str),
                "value": 1.0, "threshold": 0.0,
            }))
        # UNCONDITIONAL: a daily rerun of a date whose corrected logs show
        # no recycles must still replace (clear) that date's partition —
        # append_history's documented contract
        hist("error_recycles",
             rcy[["srv", "dtm"]] if len(rcy)
             else pd.DataFrame({"srv": pd.Series(dtype=str),
                                "dtm": pd.Series(dtype=str)}))
        record("error", int(errs.count()), t0)

    def run_was() -> None:
        t0 = time.perf_counter()
        parsed = parse_was_lines(lines_for(FAMILIES["was"])).materialize()
        parsed.write_parquet(fresh_dir(os.path.join(out_dir, "was", "rows")))
        tto_correlate(parsed).write_parquet(
            fresh_dir(os.path.join(out_dir, "was", "tto")))
        # 01_WASLogSummaryRpt: the reference's top-10×8-dimension summary
        # plus hung/tto/starvation/OOM sections, rendered from the same
        # distributed aggregates (websphereLogParser.sh:440-900)
        wt = was_summary_tables(parsed, out_dir=os.path.join(out_dir, "was"))
        with open(os.path.join(out_dir, "was",
                               "01_WASLogSummaryRpt.txt"), "w") as fh:
            fh.write(render_was_summary(wt, record_date=record_date or "",
                                        out_dir=os.path.join(out_dir, "was")))
        all_alerts.append(wt["alerts"])
        # daily history: hung-thread per-server summary, tto daily total,
        # JVM recycles and last-OOM rows (websphereLogParser.sh:68-89
        # rptHungThreadHstFile / rptTranTimeOutHstFile / rptRecycleHstFile /
        # rptOomHstFile)
        hist("was_hung_threads", wt["hung_summary"])
        hist("was_tto_by_jvm", wt["tto_by_jvm"])
        hist("was_oom", wt["oom"])
        if daily:
            # the recycle scan + collect only feeds the history append —
            # skip it entirely on ondemand runs
            from log_parser_ray.stages.waslog import recycle_events

            rec = recycle_events(parsed).to_pandas()
            hist("was_recycles",
                 rec.sort_values("line_id").reset_index(drop=True)
                 if len(rec) else rec)
        record("was", int(parsed.count()), t0)

    def run_gc() -> None:
        from log_parser_ray.stages.gclog import (
            parse_gc_invocations,
            reassemble_gc_blocks,
        )

        t0 = time.perf_counter()
        # single-line `[GC [...] ...]` records AND real multi-line
        # `{Heap before GC …}` … `}` invocation blocks (PrintHeapAtGC).
        # Two LAZY passes = two pruned re-reads of the raw files — the
        # multi-line reassembly needs whole text lines shuffled per JVM, so
        # there is no one-pass fusion that keeps text out of the object
        # store; re-reading beats pinning the full line stream (what a
        # `.materialize()` of `raw` did) at any scale where it matters
        gc = parse_gc_lines(lines_for(FAMILIES["gc"])).materialize()
        gc.write_parquet(fresh_dir(os.path.join(out_dir, "gc", "rows")))
        inv = parse_gc_invocations(
            reassemble_gc_blocks(lines_for(FAMILIES["gc"]))
        ).materialize()
        n_inv = int(inv.count())
        # unconditional clear: a rerun whose corrected logs carry no
        # multi-line blocks must drop the stale invocations too
        inv_dir = fresh_dir(os.path.join(out_dir, "gc", "invocations"))
        if n_inv:
            inv.write_parquet(inv_dir)
        # 04_GCSummaryRpt: per-(jvm, date) × type aggregate + last record
        # per JVM (javaGCStatsParser.sh:455-541,556-622)
        gt = gc_summary_tables(gc if gc.count() else None,
                               inv if n_inv else None)
        with open(os.path.join(out_dir, "gc",
                               "04_GCSummaryRpt.txt"), "w") as fh:
            fh.write(render_gc_summary(gt, record_date=record_date or ""))
        all_alerts.append(gt["alerts"])
        hist("gc_daily_summary", gt["daily"])
        record("gc", int(gc.count()) + n_inv, t0)

    # the four family pipelines are independent — run them CONCURRENTLY on
    # driver threads (the reference runs its parsers sequentially,
    # masterLogParser.sh:30-42; Ray interleaves their stages across the
    # cluster). results/all_alerts mutations and manifest appends are
    # GIL-/O_APPEND-safe; a family failure propagates.
    #
    # Neutralize Ray's lazy fsspec-http probe first: with aiohttp absent,
    # `fsspec.implementations.http` FAILS on every import (a failed module
    # is never cached), so each family thread's first read re-executes it
    # and two concurrent imports race — the loser sees the partially
    # initialized module and raises a bare ImportError that Ray's
    # `except ModuleNotFoundError` misses. Pre-seeding a stub module (with
    # a sentinel HTTPFileSystem no filesystem is an instance of) makes the
    # probe a cached no-op; semantics are unchanged — without aiohttp no
    # HTTP filesystem can exist.
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        _stub = types.ModuleType("fsspec.implementations.http")

        class _NoHTTPFileSystem:  # sentinel: nothing is an instance
            pass

        _stub.HTTPFileSystem = _NoHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = _stub
    except Exception:
        pass

    from concurrent.futures import ThreadPoolExecutor

    family_fns = [
        fn
        for fam, fn in (("access", run_access), ("error", run_error),
                        ("was", run_was), ("gc", run_gc))
        if _has_files(log_dir, FAMILIES[fam])
    ]
    # GRAFT_MASTER_SEQ=1 forces sequential families (A/B probe knob)
    workers = 1 if os.environ.get("GRAFT_MASTER_SEQ") == "1" else 4
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futures = [ex.submit(fn) for fn in family_fns]
        for f in futures:
            f.result()

    # combined alert sink — the reference appends every family's alert
    # lines to ONE alert file per run (websphereLogParser.sh alrtF)
    alerts = (
        pd.concat([a for a in all_alerts if len(a)], ignore_index=True)
        if any(len(a) for a in all_alerts)
        else pd.DataFrame(columns=["rule", "key", "value", "threshold"])
    )
    alerts = alerts.sort_values(["rule", "key"]).reset_index(drop=True)
    alerts.to_csv(os.path.join(out_dir, "alerts.csv"), index=False)
    # the reference's human-readable 00_Alert.txt next to the csv
    # (webErrorLogParser.sh:38, javaGCStatsParser.sh:47,
    # websphereLogParser.sh alrtF): one prose line per alert row
    with open(os.path.join(out_dir, "00_Alert.txt"), "w") as fh:
        for r in alerts.itertuples(index=False):
            if r.threshold > 0:
                fh.write(f"[{r.rule}] {r.key}: value {r.value} exceeds "
                         f"threshold of {r.threshold}. "
                         "Investigate further ...\n")
            else:
                fh.write(f"[{r.rule}] {r.key}\n")
    hist("alerts", alerts)

    return results
