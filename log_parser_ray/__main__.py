"""Job entry point — ``ray job submit -- python -m log_parser_ray …``.

The S1 CLI analogue (usage.sh:59-183): argument parsing/validation lives in
the driver; the pipeline itself is the flagship DAG or its partitioned,
resumable variant. Owns the Ray session (guarded init — under ``ray job
submit`` the cluster connection already exists).

    python -m log_parser_ray --input /data/transcripts --out /out/run1
    python -m log_parser_ray --events-sf /root/testdata/sf0.01 --out /tmp/r \
        --partitioned --buckets 8 --resume
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="log_parser_ray")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="transcript Parquet path/dir (conv_id, turn_idx, role, text, tool, ts)")
    src.add_argument("--events-sf", help="testdata sf dir: derive transcripts from events.parquet")
    src.add_argument("--raw-logs", help="dir (or file) of plain/.gz text logs — the reference's input format")
    src.add_argument("--access-logs", help="dir (or file) of Apache/IHS access_log files: "
                     "full webAccessLogParser-shape run (routed sinks + summary report)")
    src.add_argument("--master-logs", help="dir of mixed real log files: run every "
                     "applicable parser family (masterLogParser.sh analogue)")
    src.add_argument("--jsonl-in", help="dir (or file) of NDJSON *.jsonl/*.jsonl.gz "
                     "shards: bulk-convert to Parquet under --out/parquet (the "
                     "once-at-the-edge step — JSON can't prune columns or "
                     "row-groups, so downstream pipelines read the parquet)")
    src.add_argument("--csv-in", help="dir (or file) of CSV *.csv/*.csv.gz "
                     "shards: bulk-convert to Parquet under --out/parquet "
                     "(same once-at-the-edge step as --jsonl-in; use "
                     "--csv-delimiter for TSV)")
    ap.add_argument("--csv-delimiter", default=",",
                    help="--csv-in: field delimiter (e.g. $'\\t' for TSV)")
    ap.add_argument("--file-pattern", default=None,
                    help="--raw-logs: substring filter on file names (date-rotation predicate)")
    ap.add_argument("--record-date", default=None, metavar="YYYY-MM-DD",
                    help="the reference's `-d recorddate` (usage.sh:121-135): "
                         "filter input to that date — a pushed-down ts "
                         "predicate at the parquet read — and key the daily "
                         "history append")
    ap.add_argument("--procoption", choices=["full", "partial"], default="partial",
                    help="the reference's `-o procoption` (usage.sh:24-38; GC "
                         "semantics javaGCStatsParser.sh:446-454): with "
                         "--record-date, `partial` keeps only that date "
                         "(ts == recorddate, the default) while `full` keeps "
                         "everything UP TO AND INCLUDING it (cumulative "
                         "ts <= recorddate) — both pushed down to the read")
    ap.add_argument("--rpttype", choices=["daily", "ondemand"], default="ondemand",
                    help="the reference's `-t`: daily additionally appends "
                         "this run's summary rows to the date-partitioned "
                         "history sinks, idempotently per --record-date")
    ap.add_argument("--history-root", default=None,
                    help="history sink root (default: <out>/history)")
    ap.add_argument("--perf-baseline", default=None, metavar="CSV",
                    help="--access-logs/--master-logs: perfBaseLine.csv "
                         "(`Transaction|AverageResponseTimeInSec`, "
                         "webAccessLogParser.sh:37,1003-1023) feeding the "
                         "per-URI detail report's bart/diff columns")
    ap.add_argument("--thresholds", default=None, metavar="CSV",
                    help="thresholdValues.csv (`property|value|target|"
                         "comment`, the reference's fTh file) — overrides "
                         "the built-in per-family alert thresholds for "
                         "this run")
    ap.add_argument("--clone-map", default=None, metavar="CSV",
                    help="--access-logs/--master-logs: WAS_CloneIDs.csv "
                         "(`cloneID|WASname|host`, webAccessLogParser.sh:"
                         "36,196-201) — the cloneID→WAS topology map; "
                         "default is the built-in test topology")
    ap.add_argument("--custom-filter", default=None, metavar="TXT",
                    help="WASCustomFilter.txt (one keyword/regex per line, "
                         "# comments; websphereLogParser.sh:99-101) — "
                         "REPLACES the built-in critical-keyword filter "
                         "patterns for this run, matched case-insensitively "
                         "like the reference's egrep -i")
    ap.add_argument("--out", required=True, help="output root for routed sinks + reports")
    ap.add_argument("--partitioned", action="store_true",
                    help="resumable per-input-range run with lineage manifest "
                         "(requires --events-sf: partitions come from parquet "
                         "row-group ranges at the read)")
    ap.add_argument("--partitions", "--buckets", dest="partitions", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true",
                    help="partitioned mode: recompute even completed partitions")
    ap.add_argument("--enrich-concurrency", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    daily = args.rpttype == "daily"
    if args.record_date:
        # the reference validates -d as YYYY-MM-DD and rejects future dates
        # (usage.sh:124-129 format egrep, :160-164 future-date check) — a
        # usage error, not a traceback mid-run
        import datetime as _dt
        import re as _re

        if not _re.fullmatch(r"[0-9]{4}-[0-1][0-9]-[0-3][0-9]",
                             args.record_date):
            ap.error(f"invalid --record-date {args.record_date!r}: "
                     "use YYYY-MM-DD")
        try:
            _rd = _dt.date.fromisoformat(args.record_date)
        except ValueError:
            ap.error(f"invalid --record-date {args.record_date!r}: "
                     "not a real calendar date")
        if _rd > _dt.date.today():
            ap.error(f"--record-date {args.record_date} is a future date; "
                     "use the current or a previous date")
    if daily and not args.record_date:
        # the reference's default: a daily run without -d processes
        # yesterday's entries (usage.sh:31-33 "defaults to 'date - 1 day'")
        import datetime as _dt

        args.record_date = (
            _dt.date.today() - _dt.timedelta(days=1)).isoformat()
    if args.procoption == "full" and not args.record_date:
        ap.error("--procoption full requires --record-date")
    if args.partitioned and (args.record_date or daily):
        # the partitioned mode builds its own event_id-range reads; silently
        # ignoring the date/daily flags would produce an unfiltered run
        ap.error("--record-date/--rpttype daily are not supported with "
                 "--partitioned (partition by date via separate daily runs)")
    history_root = args.history_root or (args.out.rstrip("/") + "/history")

    if args.thresholds:
        # in-place update: every pipeline reads the same dict object at
        # alert-evaluation time, so the override covers the whole run
        from log_parser_ray import schema

        schema.FAMILY_THRESHOLDS.update(schema.load_thresholds(args.thresholds))

    clone_map = None
    if args.clone_map:
        from log_parser_ray.stages.accesslog import load_clone_map

        clone_map = load_clone_map(args.clone_map)

    if args.custom_filter:
        # in-place slice assignment: parse.py / reports.py hold the same
        # list object, so the replacement covers every consumer this run
        from log_parser_ray import schema

        schema.FILTER_PATTERNS[:] = schema.load_filter_patterns(
            args.custom_filter)

    if args.jsonl_in:
        # streaming shard-by-shard convert; row count comes from the written
        # parquet footers (metadata only), never a second data scan
        from log_parser_ray.sources.jsonl import read_documents_jsonl
        from log_parser_ray.state.manifest import fresh_dir

        # run-owned sink: rerun REPLACES (uuid-named parquet parts would
        # otherwise accumulate next to stale ones)
        out_dir = fresh_dir(args.out.rstrip("/") + "/parquet")
        read_documents_jsonl(args.jsonl_in).write_parquet(out_dir)
        n = ray.data.read_parquet(out_dir).count()
        print(json.dumps({"rows": int(n), "out": out_dir}, sort_keys=True))
        return 0

    if args.csv_in:
        from log_parser_ray.sources.csvsrc import read_documents_csv
        from log_parser_ray.state.manifest import fresh_dir

        out_dir = fresh_dir(args.out.rstrip("/") + "/parquet")
        read_documents_csv(
            args.csv_in, delimiter=args.csv_delimiter
        ).write_parquet(out_dir)
        n = ray.data.read_parquet(out_dir).count()
        print(json.dumps({"rows": int(n), "out": out_dir}, sort_keys=True))
        return 0

    if args.master_logs:
        from log_parser_ray.pipelines import master

        results = master.run(
            args.master_logs, args.out,
            record_date=args.record_date, rpt_type=args.rpttype,
            history_root=history_root if daily else None,
            perf_baseline=args.perf_baseline,
            clone_map=clone_map,
        )
        print(json.dumps({"families": results}, sort_keys=True))
        return 0

    if args.access_logs:
        from log_parser_ray.pipelines import weblog

        res = weblog.run(
            args.access_logs, args.out, file_pattern=args.file_pattern,
            clone_map=clone_map,
            history_root=history_root if daily else None,
            run_date=args.record_date if daily else None,
            # the reference's per-record date grep (webAccessLogParser.sh:
            # 151-155) — --record-date must FILTER here, not just key the
            # history; `-o full` is the cumulative dt <= recorddate variant
            record_date=args.record_date,
            cumulative=args.procoption == "full",
            perf_baseline_us=(
                weblog.load_perf_baseline(args.perf_baseline)
                if args.perf_baseline else None
            ),
        )
        print(json.dumps({
            "total": res["total"],
            "report": res["report_path"],
            "hours": int(len(res["hourly"])),
        }, sort_keys=True))
        return 0

    # --record-date → ts predicate PUSHED DOWN to the parquet scan
    # (row-group pruning) where the source is parquet; raw text logs filter
    # post-read (their date predicate is the file pattern, IO1). partial =
    # ts ∈ [date, date+1d); full = ts < date+1d (the reference's cumulative
    # `-o full`, javaGCStatsParser.sh:446-454 dt <= recDate)
    ts_filter = None
    if args.record_date:
        import datetime as _dt

        import pyarrow.dataset as pads

        d0 = _dt.datetime.fromisoformat(args.record_date)
        d1 = d0 + _dt.timedelta(days=1)
        if args.procoption == "full":
            d0 = None
            ts_filter = pads.field("ts") < d1
        else:
            ts_filter = (pads.field("ts") >= d0) & (pads.field("ts") < d1)

    if args.input:
        from log_parser_ray.sources.transcripts import read_transcripts

        transcripts = read_transcripts(
            args.input, **({"filter": ts_filter} if ts_filter is not None else {})
        )
    elif args.raw_logs:
        from log_parser_ray.sources.rawlogs import read_raw_logs

        transcripts = read_raw_logs(args.raw_logs, file_pattern=args.file_pattern)
        if ts_filter is not None:
            import pyarrow.compute as _pc

            lo, hi = d0, d1

            def _date_filter(t, lo=lo, hi=hi):
                import pyarrow as _pa

                ts = t["ts"]
                keep = _pc.less(ts, _pa.scalar(hi, _pa.timestamp("us")))
                if lo is not None:  # --procoption full: no lower bound
                    keep = _pc.and_(
                        keep,
                        _pc.greater_equal(ts, _pa.scalar(lo, _pa.timestamp("us"))),
                    )
                # lines whose timestamp failed to parse carry epoch 0
                # (rawlogs.extract_line_ts fallback) — keep them: they
                # belong to the day's file (continuation lines, unknown-UA
                # notes); dropping them would silently empty the unparsed
                # sink whenever --record-date is combined with --raw-logs
                keep = _pc.or_(
                    keep, _pc.equal(ts, _pa.scalar(0, _pa.timestamp("us")))
                )
                return t.filter(keep)

            transcripts = transcripts.map_batches(
                _date_filter, batch_format="pyarrow", zero_copy_batch=True
            )
    else:
        from log_parser_ray.sources.transcripts import transcripts_from_events

        transcripts = transcripts_from_events(args.events_sf, filter=ts_filter)

    if args.partitioned:
        if not args.events_sf:
            ap.error("--partitioned requires --events-sf (partitioned read)")
        from log_parser_ray.pipelines.partitioned import run_partitioned

        results = run_partitioned(
            args.events_sf,
            args.out,
            n_partitions=args.partitions,
            resume=not args.no_resume,
            enrich_concurrency=args.enrich_concurrency,
        )
        print(json.dumps({"partitions": results}, sort_keys=True))
    else:
        from log_parser_ray.pipelines import flagship

        res = flagship.run(
            transcripts, args.out, enrich_concurrency=args.enrich_concurrency,
            history_root=history_root if daily else None,
            run_date=args.record_date if daily else None,
        )
        print(
            json.dumps(
                {
                    "rows": res["rows"],
                    "out_dir": res["out_dir"],
                    "sink_counts": dict(
                        zip(res["sink_counts"]["sink"], map(int, res["sink_counts"]["n"]))
                    ),
                    "n_alerts": int(res["alerts"].count()),
                },
                sort_keys=True,
            )
        )
        if args.raw_logs:
            sc = dict(zip(res["sink_counts"]["sink"], map(int, res["sink_counts"]["n"])))
            if res["rows"] and sc.get("unparsed", 0) / res["rows"] > 0.9:
                print(
                    "note: >90% of lines routed to the 'unparsed' sink — "
                    "--raw-logs treats lines as transcript turns; for real "
                    "Apache/WAS/GC log files use --access-logs or "
                    "--master-logs (per-family parsers).",
                    file=sys.stderr,
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
