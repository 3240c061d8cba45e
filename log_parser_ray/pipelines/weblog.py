"""Web-access-log pipeline — the reference's webAccessLogParser end to end
over REAL access_log files, reports included.

    read_raw_logs(files)                       # IO1/IO2: discovery + .gz
      → parse_access_log                       # M4–M13 + UA cascade
      → routed parquet sinks (parsed/discarded/unparsed)
      → report suite:
          hourly statistics (uuc/usc/art/range%/xrc/irc)    # golden table
          overall-daily row                                 # AG7
          response-code counts + %                          # A12
          top-10 slowest URIs by avg                        # K2
          method × server pivot                             # A10
      → 02_WebAccessLogSummaryRpt.txt-shaped text render    # report edge

The text render mirrors the reference's column layout and %.3f formatting
(sample_reports/02_WebAccessLogSummaryRpt.txt) — rendering happens at the
EDGE over already-small aggregate frames; every number comes from the same
distributed aggregates the parquet sinks carry (SURVEY §2.8: printf
formatting is presentation, not computation).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.compute as pc

import ray.data

from log_parser_ray.stages.accesslog import RT_RANGE_OVER, RT_RANGES, parse_access_log
from log_parser_ray.stages.aggregate import (
    distinct_count,
    grouped_count,
    grouped_stats,
    top_k,
)

STATIC_EXTS = ["jpg", "gif", "png", "ico", "js", "cgi", "css", "htm", "html",
               "pdf", "txt"]
RANGE_LABELS = [r[0] for r in RT_RANGES] + [RT_RANGE_OVER]


def run(
    paths,
    out_dir: str,
    *,
    file_pattern: str | None = None,
    clone_map=None,
    history_root: str | None = None,
    run_date: str | None = None,
) -> dict:
    """Parse real access_log files → routed sinks + report tables + text
    report. Returns the small report frames."""
    from log_parser_ray.sources.rawlogs import read_raw_logs

    os.makedirs(out_dir, exist_ok=True)
    lines = read_raw_logs(paths, file_pattern=file_pattern)
    parsed = parse_access_log(lines, clone_map=clone_map).materialize()

    parsed.write_parquet(os.path.join(out_dir, "routed"), partition_cols=["sink"])

    ok = parsed.map_batches(
        lambda t: t.filter(pc.equal(t["sink"], "parsed")),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def app_only(t):
        import pyarrow as pa

        is_static = pc.is_in(t["ext"], value_set=pa.array(STATIC_EXTS))
        return t.append_column("is_app", pc.cast(pc.invert(is_static), pa.int64()))

    okx = ok.map_batches(app_only, batch_format="pyarrow", zero_copy_batch=True)

    # hourly: unique users / sessions, avg rt, range %, xcl + incl counts
    hourly_n = grouped_stats(okx, ["hour"], "is_app", count="irc", sum_="xrc").to_pandas()
    hourly_rt = grouped_stats(okx, ["hour"], "rt_us", count="_n", sum_="sum_rt_us").to_pandas()
    uuc = distinct_count(okx, ["hour"], "uid", alias="uuc").to_pandas()
    usc = distinct_count(okx, ["hour"], "jsession", alias="usc").to_pandas()
    rng = grouped_count(okx, ["hour", "resp_range"], alias="n").to_pandas()
    hourly = hourly_n.merge(hourly_rt[["hour", "sum_rt_us"]], on="hour")
    hourly = hourly.merge(uuc, on="hour").merge(usc, on="hour")
    hourly["art"] = (hourly["sum_rt_us"] / hourly["irc"] / 1e6).round(3)
    wide = rng.pivot_table(index="hour", columns="resp_range", values="n",
                           aggfunc="sum", fill_value=0)
    for lbl in RANGE_LABELS:
        col = wide[lbl] if lbl in wide.columns else 0
        pct = (100.0 * col / wide.sum(axis=1)).round(3)
        hourly = hourly.merge(
            pct.rename(lbl).reset_index(), on="hour", how="left"
        )
        hourly[lbl] = hourly[lbl].fillna(0.0)
    hourly = hourly.sort_values("hour").reset_index(drop=True)

    # response-code table (A12)
    rc = grouped_count(ok, ["response"], alias="cnt").to_pandas().sort_values("response")
    total = int(rc["cnt"].sum())
    rc["pc"] = (100.0 * rc["cnt"] / total).round(3)
    rc = rc.reset_index(drop=True)

    # top-10 slowest URIs by avg (K2)
    slow = grouped_stats(ok, ["uri_path"], "rt_us", count="n", sum_="s").to_pandas()
    slow["art"] = (slow["s"] / slow["n"] / 1e6).round(3)
    slow = slow.sort_values(["art", "uri_path"], ascending=[False, True]).head(10)
    slow = slow[["uri_path", "n", "art"]].reset_index(drop=True)

    # method × server pivot (A10)
    methods = grouped_count(ok, ["websrvr", "request"], alias="n").to_pandas()

    if history_root is not None and run_date is not None:
        # IO5: the reference's daily history CSVs (hourly avg, per-code,
        # perf) as idempotent date-partitioned parquet appends
        from log_parser_ray.state.history import append_history

        append_history(history_root, "access_hourly", run_date, hourly)
        append_history(history_root, "access_response_codes", run_date, rc)
        append_history(history_root, "access_top_slow", run_date, slow)

    report = _render_report(hourly, rc, total, slow)
    rpt_path = os.path.join(out_dir, "02_WebAccessLogSummaryRpt.txt")
    with open(rpt_path, "w") as fh:
        fh.write(report)
    for name, df in [("hourly", hourly), ("response_codes", rc),
                     ("top_slow", slow), ("methods", methods)]:
        df.to_csv(os.path.join(out_dir, f"{name}.csv"), index=False)
    return {"hourly": hourly, "response_codes": rc, "top_slow": slow,
            "methods": methods, "total": total, "report_path": rpt_path}


def _render_report(hourly: pd.DataFrame, rc: pd.DataFrame, total: int,
                   slow: pd.DataFrame) -> str:
    """The reference's summary-report layout (sample_reports/02_*.txt)."""
    bar = "=" * 53
    out = [bar, "===== Http Access log analysis report =====", bar, "",
           bar, "===== Hourly Statistics =====", bar, ""]
    hdr = ["hr", "uuc", "usc", "art"] + RANGE_LABELS + ["xrc", "irc"]
    out.append("\t".join(f"{h:>7}" for h in hdr))
    for _, r in hourly.iterrows():
        row = [int(r["hour"]), int(r["uuc"]), int(r["usc"]), f"{r['art']:.3f}"]
        row += [f"{r[l]:.3f}" for l in RANGE_LABELS]
        row += [int(r["xrc"]), int(r["irc"])]
        out.append("\t".join(f"{v:>7}" for v in row))
    out += ["", bar, "===== Statistics by HTTP response code =====", bar, ""]
    out.append("rsp\tcnt\tpc")
    for _, r in rc.iterrows():
        out.append(f"{int(r['response'])}\t{int(r['cnt'])}\t{r['pc']:7.3f}")
    out.append(f"Total response count: {total}")
    out += ["", bar, "===== Top 10 (slowest) URIs by avg response time =====",
            bar, ""]
    out.append("uri\tcnt\tart")
    for _, r in slow.iterrows():
        out.append(f"{r['uri_path']}\t{int(r['n'])}\t{r['art']:.3f}")
    out.append("")
    return "\n".join(out)
