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
    ap.add_argument("--file-pattern", default=None,
                    help="--raw-logs: substring filter on file names (date-rotation predicate)")
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

    if args.master_logs:
        from log_parser_ray.pipelines import master

        results = master.run(args.master_logs, args.out)
        print(json.dumps({"families": results}, sort_keys=True))
        return 0

    if args.access_logs:
        from log_parser_ray.pipelines import weblog

        res = weblog.run(args.access_logs, args.out, file_pattern=args.file_pattern)
        print(json.dumps({
            "total": res["total"],
            "report": res["report_path"],
            "hours": int(len(res["hourly"])),
        }, sort_keys=True))
        return 0

    if args.input:
        from log_parser_ray.sources.transcripts import read_transcripts

        transcripts = read_transcripts(args.input)
    elif args.raw_logs:
        from log_parser_ray.sources.rawlogs import read_raw_logs

        transcripts = read_raw_logs(args.raw_logs, file_pattern=args.file_pattern)
    else:
        from log_parser_ray.sources.transcripts import transcripts_from_events

        transcripts = transcripts_from_events(args.events_sf)

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
            transcripts, args.out, enrich_concurrency=args.enrich_concurrency
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
