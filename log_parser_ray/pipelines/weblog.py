"""Web-access-log pipeline — the reference's webAccessLogParser end to end
over REAL access_log files, reports included.

    read_raw_logs(files)                       # IO1/IO2: discovery + .gz
      → FUSED parse → sink-write → narrow projection (one task chain —
        the full-width 26-col + text rows are written to the routed hive
        layout INSIDE the read/parse task and never enter the object
        store; only the narrow report columns do)
      → report suite over SHARED shuffles (concurrent driver threads):
          hourly statistics (uuc/usc/art/range%/xrc/irc)    # golden table
            · counts + rt sums + range indicators: ONE grouped pass
            · uuc + usc: ONE two-phase distinct over (hour, kind, val)
          Overall-Daily row (app-only art + ranges)         # AG7
          per-WS / per-WAS statistics (+ distincts)         # A18
          response-code counts + %                          # A12
          top-10 slowest raw responses                      # K1
          top-10 400+ URLs                                  # K3
          domain top-5 / UID top-5 by avg (app-only)        # K4/K5
          extension summary                                 # A15
          browser / OS usage by distinct user               # D3
          method × server pivot                             # A10
      → 02_WebAccessLogSummaryRpt.txt full-layout render    # report edge

This is the flagship's shape (route.py: fused
read→parse→enrich→write→project) applied to the real-file pack. The text
render mirrors the reference's FULL section list and %.3f formatting
(sample_reports/02_WebAccessLogSummaryRpt.txt; render order
webAccessLogParser.sh:700-1290) — rendering happens at the EDGE over
already-small aggregate frames; every number comes from a distributed
aggregate (SURVEY §2.8: printf formatting is presentation, not
computation). Per-dimension tables collect only bounded frames (hours ≤24,
servers/was/domains/exts are low-cardinality, top-ks ≤10); the per-UID
ranking stays a distributed top_k — uid cardinality is unbounded.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from log_parser_ray.stages.accesslog import (
    RT_RANGE_OVER,
    RT_RANGES,
    make_access_parser,
)
from log_parser_ray.stages.aggregate import (
    _mb,
    _partial,
    COMBINE_ROWS,
    conform_schema,
    grouped_count,
    grouped_stats,
    pivot_counts,
    sorted_combine,
    top_k,
)

STATIC_EXTS = ["jpg", "gif", "png", "ico", "js", "cgi", "css", "htm", "html",
               "pdf", "txt"]
RANGE_LABELS = [r[0] for r in RT_RANGES] + [RT_RANGE_OVER]

# the reference's whereuid login/logout markers (webAccessLogParser.sh:715-719)
LOGIN_URI = "/SecurityWeb/roleSelect/loginRoleSelect.xhtml"
LOGOUT_URI = "/SecurityWeb/Portal"
LOGOUT_PARAM_RE = r"logout=true"

# the whereuid session key (webAccessLogParser.sh:716: webSrvr was cloneID
# jsession uid)
WU_KEY = ["websrvr", "was", "clone_id", "jsession", "uid"]

# narrow projection carried to the report aggregates (everything else —
# raw text, params, cookies — exists only inside the fused task). The
# was/dt/tm/size/browser/os_name/domain columns exist to serve the
# reference's full 02 section list (raw top-10, WS/WAS stats, browser/OS
# usage, domain rollup).
NARROW_COLS = ["sink", "hour", "uid", "jsession", "rt_us", "resp_range",
               "response", "uri_path", "websrvr", "request", "ext",
               "was", "dt", "tm", "size", "browser", "os_name", "domain",
               "clone_id", "wu_evt"]

# single-slot per-worker cache of the compiled parser (same economics as
# route._FUSED_CACHE: one run's parameters at a time, no growth)
_PARSE_CACHE: list = [None, None]


def _parse_write_project(batch: pa.Table, *, out_dir: str, clone_items,
                         record_date=None, cumulative=False) -> pa.Table:
    """Fused stage: parse the raw lines, write the FULL routed rows to the
    per-sink hive layout, emit only the narrow report columns. A plain
    FUNCTION so Ray fuses it into the read tasks — full-width blocks never
    transit the object store (see route.enrich_write_project).

    ``record_date`` is the reference's per-record date predicate (the
    ``grep -F "[$rec0DD/$recLM/$recYYYY"`` pre-filter,
    webAccessLogParser.sh:151-155): keep only rows of that ISO date
    (``cumulative=True`` = the `-o full` ``dt <= record_date`` variant).
    Applied BEFORE the sink writes so filtered-out records never route.
    Rows with an unparseable timestamp (null dt) are KEPT — same choice as
    the --raw-logs epoch-0 note in __main__: dropping them would silently
    empty the unparsed sink whenever a date predicate is active."""
    from log_parser_ray.stages.route import write_batch_sinks

    key = (out_dir, clone_items)
    if _PARSE_CACHE[0] != key:
        # construct first, publish after (see route._FUSED_CACHE)
        _PARSE_CACHE[1] = make_access_parser(
            dict(clone_items) if clone_items is not None else None
        )
        _PARSE_CACHE[0] = key
    full = _PARSE_CACHE[1](batch)
    if record_date is not None:
        # dt is %Y-%m-%d (accesslog.py), so the date compare is a plain
        # string compare — vectorized, no timestamp round-trip
        cmp = (pc.less_equal if cumulative else pc.equal)(
            full["dt"], record_date
        )
        full = full.filter(pc.fill_null(cmp, True))
    write_batch_sinks(full, out_dir)
    # unknown-UA review side output (webAccessLogParser.sh:652: every
    # well-formed record whose agent missed the cascade) — written HERE so
    # the raw line never leaves the task; idempotent content-named parquet
    from log_parser_ray.stages.route import write_batch_parquet

    unk = full.filter(
        pc.and_(full["ua_unknown"],
                pc.invert(pc.equal(full["sink"], "unparsed")))
    )
    if unk.num_rows:
        write_batch_parquet(
            unk.select(["conv_id", "turn_idx", "text"]),
            os.path.join(os.path.dirname(out_dir), "unknownua"),
        )
    # whereuid login/logout flag derives from params+uri HERE so the narrow
    # projection stays narrow (webAccessLogParser.sh:715-719)
    full = full.append_column("wu_evt", whereuid_marker(full))
    return full.select(NARROW_COLS)


def load_perf_baseline(path: str) -> dict[str, float]:
    """Parse the reference's perfBaseLine.csv (webAccessLogParser.sh:37,
    214-223: `Transaction|AverageResponseTimeInSec` header then
    ``uri|seconds`` rows) into the uri → MICROSECONDS map weblog.run's
    ``perf_baseline_us`` expects. Tiny file, read once on the driver and
    broadcast by closure into the per-URI detail derive."""
    out: dict[str, float] = {}
    with open(path) as fh:
        for i, line in enumerate(fh):
            line = line.strip()
            if not line or (i == 0 and line.lower().startswith("transaction")):
                continue
            uri, _, secs = line.partition("|")
            try:
                out[uri] = float(secs) * 1e6
            except ValueError:
                continue  # malformed row — reference's split() skips it too
    return out


def _prep(t: pa.Table) -> pa.Table:
    """Derive the indicator columns every dimension shuffle shares:
    is_app (static-ext exclusion), rt_app (app-only rt), per-range
    indicators and their app-only twins."""
    is_static = pc.is_in(t["ext"], value_set=pa.array(STATIC_EXTS))
    is_app = pc.cast(pc.invert(is_static), pa.int64())
    t = t.append_column("is_app", is_app)
    t = t.append_column(
        "rt_app", pc.multiply(pc.fill_null(t["rt_us"], 0), is_app)
    )
    for lbl in RANGE_LABELS:
        ind = pc.cast(
            pc.fill_null(pc.equal(t["resp_range"], lbl), False), pa.int64()
        )
        t = t.append_column(lbl, ind)
        t = t.append_column(f"{lbl}_app", pc.multiply(ind, is_app))
    return t


def _dim_stats_ds(prepped: "ray.data.Dataset", dim: str) -> "ray.data.Dataset":
    """Per-``dim``: irc (all rows), xrc (app rows), app-only rt sum and
    app-only range counts — ONE fused two-phase shuffle per dimension."""
    aggs = [("is_app", "sum"), ("rt_app", "sum"), ("", "count_all")] + [
        (f"{lbl}_app", "sum") for lbl in RANGE_LABELS
    ]
    part = _mb(prepped, _partial([dim], aggs), batch_size=COMBINE_ROWS)
    return sorted_combine(
        part, [dim],
        [("is_app_sum", "sum"), ("rt_app_sum", "sum"), ("count_all", "sum")]
        + [(f"{lbl}_app_sum", "sum") for lbl in RANGE_LABELS],
        renames={"is_app_sum_sum": "xrc", "rt_app_sum_sum": "sum_rt_app",
                 "count_all_sum": "irc"}
        | {f"{lbl}_app_sum_sum": f"_n_{lbl}" for lbl in RANGE_LABELS},
        keep=[dim, "xrc", "sum_rt_app", "irc"]
        + [f"_n_{lbl}" for lbl in RANGE_LABELS],
    )


def _finish_dim(df: pd.DataFrame) -> pd.DataFrame:
    """art + per-range % (app-only) from a collected _dim_stats frame."""
    df = df.copy()
    df["art"] = (df["sum_rt_app"] / df["xrc"].where(df["xrc"] > 0) / 1e6).fillna(0.0).round(3)
    denom = df["xrc"].where(df["xrc"] > 0)
    for lbl in RANGE_LABELS:
        df[lbl] = (100.0 * df[f"_n_{lbl}"] / denom).fillna(0.0).round(3)
    return df.drop(columns=[f"_n_{lbl}" for lbl in RANGE_LABELS])


def _dim_distincts(ok: "ray.data.Dataset", dim: str,
                   specs: tuple = (("uuc", "uid"), ("jsc", "jsession"))
                   ) -> pd.DataFrame:
    """COUNT(DISTINCT val) per (dim, kind) — per-block dedup, global dedup,
    tiny count, pivoted wide (one shuffle family per dimension)."""

    def partial(t: pa.Table) -> pa.Table:
        parts = []
        for kind, col in specs:
            parts.append(
                pa.table(
                    {
                        dim: t[dim],
                        "kind": pa.array([kind] * t.num_rows, pa.string()),
                        "val": pc.cast(t[col], pa.string()),
                    }
                ).group_by([dim, "kind", "val"]).aggregate([])
            )
        return pa.concat_tables(parts)

    dedup = sorted_combine(
        _mb(ok, partial, batch_size=COMBINE_ROWS),
        [dim, "kind", "val"], [], keep=[dim, "kind", "val"],
    )
    counts = grouped_count(dedup, [dim, "kind"], alias="n").to_pandas()
    if counts.empty:
        return pd.DataFrame(columns=[dim] + [k for k, _ in specs])
    wide = counts.pivot_table(index=dim, columns="kind", values="n",
                              aggfunc="sum", fill_value=0).reset_index()
    for k, _ in specs:
        if k not in wide.columns:
            wide[k] = 0
    return wide[[dim] + [k for k, _ in specs]]


HOUR_COLS = [f"H{i}" for i in range(24)]


def uid_detail_ds(prepped: "ray.data.Dataset") -> "ray.data.Dataset":
    """FULL per-UID perf table (app rows only, like the reference's
    arrUidRange/arrUidSum/arrUidCnt accumulated inside the static-exclusion
    branch, webAccessLogParser.sh:758-760,970-979): per uid the five range
    percentages, app count (xrc) and average response seconds. Output stays
    a distributed Dataset — uid cardinality is unbounded; the CSV render
    streams it (WebAccessLogSummaryByUIDRpt.csv)."""
    stats = _dim_stats_ds(prepped, "uid")

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["xrc"], 0))
        xrc = pc.cast(t["xrc"], pa.float64())
        cols = {"uid": t["uid"]}
        for lbl in RANGE_LABELS:
            cols[lbl] = pc.round(
                pc.divide(pc.multiply(
                    pc.cast(t[f"_n_{lbl}"], pa.float64()), 100.0), xrc),
                ndigits=6,
            )
        cols["xrc"] = t["xrc"]
        cols["art"] = pc.round(
            pc.divide(pc.divide(
                pc.cast(t["sum_rt_app"], pa.float64()), xrc), 1e6),
            ndigits=6,
        )
        return pa.table(cols)

    return _mb(stats, derive)


def uri_detail_ds(
    prepped: "ray.data.Dataset",
    perf_baseline_us: dict[str, float] | None = None,
) -> "ray.data.Dataset":
    """FULL per-URI perf table over ALL parsed rows (arrURIRange/arrURICnt
    accumulate outside the exclusion branch, webAccessLogParser.sh:723-727,
    1001-1022): range percentages, count, min/max/avg response seconds, and
    the perfBaseLine comparison (bart + diff; null without a baseline row).
    One fused two-phase shuffle; the baseline map is a closure constant
    (shipped once per task). Distributed output — the CSV render streams it
    (WebAccessLogSummaryByTransactionRpt.csv)."""
    base_items = tuple(sorted((perf_baseline_us or {}).items()))

    aggs = [(lbl, "sum") for lbl in RANGE_LABELS] + [
        ("rt_us", "sum"), ("rt_us", "min"), ("rt_us", "max"),
        ("", "count_all"),
    ]
    part = _mb(prepped, _partial(["uri_path"], aggs), batch_size=COMBINE_ROWS)
    agg = sorted_combine(
        part, ["uri_path"],
        [(f"{lbl}_sum", "sum") for lbl in RANGE_LABELS]
        + [("rt_us_sum", "sum"), ("rt_us_min", "min"), ("rt_us_max", "max"),
           ("count_all", "sum")],
        renames={f"{lbl}_sum_sum": f"_n_{lbl}" for lbl in RANGE_LABELS}
        | {"rt_us_sum_sum": "_s", "rt_us_min_min": "_mn",
           "rt_us_max_max": "_mx", "count_all_sum": "cnt"},
        keep=["uri_path", "cnt", "_s", "_mn", "_mx"]
        + [f"_n_{lbl}" for lbl in RANGE_LABELS],
    )

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["cnt"], 0))
        cnt = pc.cast(t["cnt"], pa.float64())
        cols = {"uri_path": t["uri_path"]}
        for lbl in RANGE_LABELS:
            cols[lbl] = pc.round(
                pc.divide(pc.multiply(
                    pc.cast(t[f"_n_{lbl}"], pa.float64()), 100.0), cnt),
                ndigits=6,
            )
        cols["cnt"] = t["cnt"]
        cols["mnrt"] = pc.round(
            pc.divide(pc.cast(t["_mn"], pa.float64()), 1e6), ndigits=6)
        cols["mxrt"] = pc.round(
            pc.divide(pc.cast(t["_mx"], pa.float64()), 1e6), ndigits=6)
        art = pc.round(
            pc.divide(pc.divide(pc.cast(t["_s"], pa.float64()), cnt), 1e6),
            ndigits=6,
        )
        cols["art"] = art
        # baseline lookup over the URI dictionary (tiny map, broadcast by
        # closure), in SECONDS like the file's bart column
        enc = t["uri_path"].combine_chunks().dictionary_encode()
        bmap = dict(base_items)
        bvals = pa.array(
            [bmap[u] / 1e6 if u in bmap else None
             for u in enc.dictionary.to_pylist()],
            pa.float64(),
        )
        bart = bvals.take(enc.indices)
        cols["bart"] = bart
        cols["diff"] = pc.round(pc.subtract(art, bart), ndigits=6)
        return pa.table(cols)

    return _mb(agg, derive)


def domain_hour_usage(ok: "ray.data.Dataset", val_col: str) -> "ray.data.Dataset":
    """Per-domain hourly DISTINCT-``val_col`` counts pivoted H0..H23 — the
    WebHourlyDomainUsageByUid/BySess tables (webAccessLogParser.sh:692-694,
    700-703 distinct sets; :1246-1267 pivoted emit). Two-phase distinct over
    (domain, hour, val) then a tiny grouped count + fixed-wide pivot;
    jsession rows guard on a valid session like the reference."""

    def prep(t: pa.Table) -> pa.Table:
        v = t[val_col]
        keep = pc.and_(
            pc.fill_null(pc.not_equal(v, "-"), False),
            pc.fill_null(pc.not_equal(v, ""), False),
        )
        t = t.filter(keep)
        h = pc.binary_join_element_wise(
            "H", pc.cast(t["hour"], pa.string()), ""
        )
        sub = pa.table({"domain": t["domain"], "h": h, "v": t[val_col]})
        return sub.group_by(["domain", "h", "v"]).aggregate([])

    dedup = sorted_combine(
        _mb(ok, prep, batch_size=COMBINE_ROWS),
        ["domain", "h", "v"], [], keep=["domain", "h", "v"],
    )
    counts = grouped_count(dedup, ["domain", "h"], alias="n")
    # conform: when NO row carries a valid uid/jsession (e.g. a session-less
    # app), every block upstream is empty and schema-less — without this the
    # consumer's to_pandas() yields a COLUMN-LESS frame and sort_values
    # ("domain") KeyErrors (domain_daily_usage guards the same case inline)
    return conform_schema(
        pivot_counts(counts, "domain", "h", "n", HOUR_COLS),
        pa.schema([("domain", pa.string())]
                  + [(h, pa.int64()) for h in HOUR_COLS]),
    )


def domain_daily_usage(ok: "ray.data.Dataset") -> pd.DataFrame:
    """Per-domain daily distinct users (uuc) and distinct (cloneID, jsession)
    sessions (usc) — WebDlyDomainUsage.csv (webAccessLogParser.sh:692,707,
    1249-1263). Domain cardinality is low; the distinct shuffles are the
    heavy part and stay two-phase."""

    def prep(t: pa.Table) -> pa.Table:
        uidv = pc.and_(
            pc.fill_null(pc.not_equal(t["uid"], "-"), False),
            pc.fill_null(pc.not_equal(t["uid"], ""), False),
        )
        u = t.filter(uidv)
        uid_part = pa.table(
            {
                "domain": u["domain"],
                # explicit type: ["uuc"] * 0 would infer NULL and poison the
                # concat when a batch has no valid uids
                "kind": pa.array(["uuc"] * u.num_rows, pa.string()),
                "v": u["uid"],
            }
        )
        jsv = pc.and_(
            pc.fill_null(pc.not_equal(t["jsession"], "-"), False),
            pc.fill_null(pc.not_equal(t["jsession"], ""), False),
        )
        s = t.filter(jsv)
        sess_part = pa.table(
            {
                "domain": s["domain"],
                "kind": pa.array(["usc"] * s.num_rows, pa.string()),
                "v": pc.binary_join_element_wise(
                    s["clone_id"], s["jsession"], ","
                ),
            }
        )
        both = pa.concat_tables([uid_part, sess_part])
        return both.group_by(["domain", "kind", "v"]).aggregate([])

    dedup = sorted_combine(
        _mb(ok, prep, batch_size=COMBINE_ROWS),
        ["domain", "kind", "v"], [], keep=["domain", "kind", "v"],
    )
    counts = grouped_count(dedup, ["domain", "kind"], alias="n").to_pandas()
    if counts.empty:
        return pd.DataFrame(columns=["domain", "uuc", "usc"])
    wide = counts.pivot_table(index="domain", columns="kind", values="n",
                              aggfunc="sum", fill_value=0).reset_index()
    for k in ("uuc", "usc"):
        if k not in wide.columns:
            wide[k] = 0
    return wide[["domain", "uuc", "usc"]].sort_values("domain").reset_index(drop=True)


def _write_domain_usage(hr_uid: pd.DataFrame, hr_sess: pd.DataFrame,
                        daily: pd.DataFrame, out_dir: str) -> None:
    """The reference's three domain-usage CSVs with its printf layouts
    (dmHrlyHdFmt/dmDlyHdFmt, webAccessLogParser.sh:1242-1267,1548-1557)."""

    def hourly(df: pd.DataFrame, path: str) -> None:
        if "domain" not in df.columns:
            # all-empty Dataset.to_pandas() drops the schema (Ray empty-block
            # gotcha) — a session-less/uid-less day renders header-only
            df = pd.DataFrame(columns=["domain"] + HOUR_COLS)
        with open(path, "w") as fh:
            fh.write("\t".join(["Domain".ljust(35)]
                               + [f"{h:>5}" for h in HOUR_COLS]) + "\n")
            for _, r in df.sort_values("domain").iterrows():
                fh.write("\t".join([str(r["domain"]).ljust(35)]
                                   + [f"{int(r[h]):5d}" for h in HOUR_COLS])
                         + "\n")

    hourly(hr_uid, os.path.join(out_dir, "WebHourlyDomainUsageByUid.csv"))
    hourly(hr_sess, os.path.join(out_dir, "WebHourlyDomainUsageBySess.csv"))
    with open(os.path.join(out_dir, "WebDlyDomainUsage.csv"), "w") as fh:
        fh.write("\t".join(["Domain".ljust(35), f"{'uuc':>5}", f"{'usc':>5}"])
                 + "\n")
        for _, r in daily.iterrows():
            fh.write("\t".join([str(r["domain"]).ljust(35),
                                f"{int(r['uuc']):5d}", f"{int(r['usc']):5d}"])
                     + "\n")


def _stream_detail(ds: "ray.data.Dataset", path: str, header: str,
                   fmt_row, sort_by, descending) -> str:
    """Stream a (possibly unbounded) detail Dataset to a report file in the
    reference's sorted printf layout — sorted distributedly, rendered batch
    by batch, never a full driver collect. Thin alias of reports._stream_csv
    (ONE maintained implementation — it owns the materialize-once-then-sort
    shape that keeps a lazy input from executing twice)."""
    from log_parser_ray.pipelines.reports import _stream_csv

    return _stream_csv(ds, path, header, fmt_row, sort_by, descending)


def write_uid_detail(detail: "ray.data.Dataset", out_dir: str) -> str:
    """WebAccessLogSummaryByUIDRpt.csv: FULL per-UID table sorted by avg
    desc (webAccessLogParser.sh:47,1413-1436 uidHdFmt/uidBdFmt layout)."""
    hdr = "\t".join(["uid".ljust(40)] + [f"{l:>7}" for l in RANGE_LABELS]
                    + [f"{'xrc':>9}", f"{'art':>7}"])

    def fmt(r) -> str:
        vals = [str(r.uid).ljust(40)]
        vals += [f"{getattr(r, f'_{i + 1}'):7.3f}" for i in range(5)]
        return "\t".join(vals + [f"{int(r.xrc):9d}", f"{r.art:7.3f}"])

    return _stream_detail(
        detail, os.path.join(out_dir, "WebAccessLogSummaryByUIDRpt.csv"),
        hdr, fmt, ["art", "uid"], [True, False],
    )


def write_uri_detail(detail: "ray.data.Dataset", out_dir: str) -> str:
    """WebAccessLogSummaryByTransactionRpt.csv: FULL per-URI table sorted by
    avg desc (webAccessLogParser.sh:46,1331-1354: ranges, cnt, mnrt, mxrt,
    art, bart, diff, trn; bart/diff blank without a baseline row)."""
    hdr = "\t".join([f"{l:>7}" for l in RANGE_LABELS]
                    + [f"{'cnt':>9}", f"{'mnrt':>7}", f"{'mxrt':>9}",
                       f"{'art':>7}", f"{'bart':>7}", f"{'diff':>7}", "trn"])

    def fmt(r) -> str:
        import math

        vals = [f"{getattr(r, f'_{i + 1}'):7.3f}" for i in range(5)]
        vals += [f"{int(r.cnt):9d}", f"{r.mnrt:7.3f}", f"{r.mxrt:9.3f}",
                 f"{r.art:7.3f}"]
        blank = r.bart is None or (isinstance(r.bart, float) and math.isnan(r.bart))
        vals += ["" if blank else f"{r.bart:7.3f}",
                 "" if blank else f"{r.diff:7.3f}", str(r.uri_path)]
        return "\t".join(vals)

    return _stream_detail(
        detail,
        os.path.join(out_dir, "WebAccessLogSummaryByTransactionRpt.csv"),
        hdr, fmt, ["art", "uri_path"], [True, False],
    )


def whereuid_marker(
    t: pa.Table,
    *,
    login_uri: str = LOGIN_URI,
    logout_uri: str = LOGOUT_URI,
    logout_param_re: str = LOGOUT_PARAM_RE,
) -> pa.Array:
    """Per-row whereuid event flag over FULL parsed access rows: 1 = login
    (uri == login page), 2 = logout (uri == portal AND params ~ logout
    marker), 0 = neither; rows without a valid jsession never mark
    (webAccessLogParser.sh:700,715-719). Computed inside the fused parse
    task so the narrow report projection needs neither `params` nor the
    full uri set."""
    js = t["jsession"]
    js_ok = pc.and_(
        pc.fill_null(pc.not_equal(js, "-"), False),
        pc.fill_null(pc.not_equal(js, ""), False),
    )
    login = pc.and_(
        js_ok, pc.fill_null(pc.equal(t["uri_path"], login_uri), False)
    )
    logout = pc.and_(
        js_ok,
        pc.and_(
            pc.fill_null(pc.equal(t["uri_path"], logout_uri), False),
            pc.fill_null(
                pc.match_substring_regex(t["params"], logout_param_re), False
            ),
        ),
    )
    out = pc.if_else(login, pa.scalar(1, pa.int8()),
                     pc.if_else(logout, pa.scalar(2, pa.int8()),
                                pa.scalar(0, pa.int8())))
    return out


def user_sessions_ds(marked: "ray.data.Dataset") -> "ray.data.Dataset":
    """The whereuid login→logout session table (webAccessLogParser.sh:
    715-719 accumulate, 1273-1295 emit): per (websrvr, was, cloneID,
    jsession, uid) the LATEST login stamp, the LATEST logout stamp (or
    'na'), and their difference in seconds; keys that never logged in drop.

    ``marked`` carries WU_KEY + wu_evt (whereuid_marker) + dt + tm. Shape:
    the marker filter runs per block (markers are rare), then one two-phase
    max per key — the awk's last-assignment-wins over a time-ordered file IS
    max(dt:tm); the output stays a distributed Dataset (session cardinality
    is unbounded), columns named as the reference's header row
    ws|was|clnid|js|uid|strtm|endtm|diff."""

    def prep_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["wu_evt"], 0))
        stamp = pc.binary_join_element_wise(t["dt"], t["tm"], ":")
        none = pa.nulls(t.num_rows, pa.string())
        sub = pa.table(
            {k: t[k] for k in WU_KEY}
            | {
                "s_login": pc.if_else(pc.equal(t["wu_evt"], 1), stamp, none),
                "s_logout": pc.if_else(pc.equal(t["wu_evt"], 2), stamp, none),
            }
        )
        return sub.group_by(WU_KEY).aggregate(
            [("s_login", "max"), ("s_logout", "max")]
        )

    part = _mb(marked, prep_partial, batch_size=COMBINE_ROWS)
    agg = sorted_combine(
        part, WU_KEY,
        [("s_login_max", "max"), ("s_logout_max", "max")],
        renames={"s_login_max_max": "strtm", "s_logout_max_max": "_endtm"},
        keep=WU_KEY + ["strtm", "_endtm"],
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["strtm"]))

        def epoch(col):
            ts = pc.strptime(col, format="%Y-%m-%d:%H:%M:%S", unit="s",
                             error_is_null=True)
            return pc.cast(ts, pa.int64())

        diff = pc.subtract(epoch(t["_endtm"]), epoch(t["strtm"]))
        return pa.table(
            {
                "ws": t["websrvr"], "was": t["was"], "clnid": t["clone_id"],
                "js": t["jsession"], "uid": t["uid"], "strtm": t["strtm"],
                "endtm": pc.fill_null(t["_endtm"], "na"),
                "diff": diff,
            }
        )

    return _mb(agg, finish)


def write_user_sessions(sessions: "ray.data.Dataset", out_dir: str) -> str | None:
    """Stream the whereuid table to the reference's
    WebAccessLogSummaryByUidSessionRpt.csv (space-separated, header row,
    sorted by uid — webAccessLogParser.sh:49,168,1273-1295). Streaming write
    (never a full driver collect); no file when no session logged in,
    mirroring the reference's length(arrWhereUidStart)>0 guard."""
    from log_parser_ray.pipelines.reports import _ordered_execution

    path = os.path.join(out_dir, "WebAccessLogSummaryByUidSessionRpt.csv")
    tmp = os.path.join(out_dir, ".tmp-WebAccessLogSummaryByUidSessionRpt.csv")
    rows = 0
    # _ordered_execution: iter_batches yields blocks in COMPLETION order
    # unless preserve_order is set — a multi-block sorted file would
    # interleave (same hazard _stream_csv guards)
    with _ordered_execution():
        srt = sessions.sort(["uid", "ws", "was", "clnid", "js"])
        with open(tmp, "w") as fh:
            fh.write("ws was clnid js uid strtm endtm diff\n")
            for b in srt.iter_batches(batch_format="pyarrow"):
                if b.num_rows == 0:
                    continue
                d = pc.fill_null(
                    pc.cast(b["diff"], pa.string()), "na").to_pylist()
                cols = [b[c].to_pylist()
                        for c in ("ws", "was", "clnid", "js", "uid",
                                  "strtm", "endtm")]
                for vals in zip(*cols, d):
                    fh.write(" ".join(vals) + "\n")
                    rows += 1
    if rows == 0:
        os.remove(tmp)
        # a rerun whose corrected logs show no sessions must also drop the
        # previous run's file, or a stale report survives next to fresh ones
        if os.path.exists(path):
            os.remove(path)
        return None
    os.replace(tmp, path)
    return path


def _write_unknown_ua(out_dir: str) -> str | None:
    """Stream the unknown-UA side sink (written inside the fused parse
    tasks) to the reference's WebAccessLogSummaryUnknowUARpt.csv — raw
    lines, no header (webAccessLogParser.sh:50,652,1544-1546); no file when
    every agent classified."""
    from log_parser_ray.pipelines.reports import _ordered_execution

    src = os.path.join(out_dir, "unknownua")
    path = os.path.join(out_dir, "WebAccessLogSummaryUnknowUARpt.csv")
    if not os.path.isdir(src) or not any(
            f.endswith(".parquet") for f in os.listdir(src)):
        # every agent classified this run — also drop a previous run's file
        # (rerun-into-same-out_dir replaces, never leaves stale reports)
        if os.path.exists(path):
            os.remove(path)
        return None
    tmp = os.path.join(out_dir, ".tmp-WebAccessLogSummaryUnknowUARpt.csv")
    # ordered window + tmp/rename commit, like every other sorted stream
    with _ordered_execution():
        ds = ray.data.read_parquet(src).sort(["conv_id", "turn_idx"])
        with open(tmp, "w") as fh:
            for b in ds.iter_batches(batch_format="pyarrow"):
                for txt in b["text"].to_pylist():
                    fh.write(txt + "\n")
    os.replace(tmp, path)
    return path


def run(
    paths,
    out_dir: str,
    *,
    file_pattern: str | None = None,
    clone_map=None,
    history_root: str | None = None,
    run_date: str | None = None,
    record_date: str | None = None,
    cumulative: bool = False,
    perf_baseline_us: dict[str, float] | None = None,
) -> dict:
    """Parse real access_log files → routed sinks + report tables + text
    report. Returns the small report frames.

    ``record_date`` (ISO) activates the reference's per-record date
    predicate inside the fused parse task (see _parse_write_project);
    ``run_date`` only KEYS the daily history append. The CLI passes both
    from --record-date; library callers can key history without filtering.
    """
    from log_parser_ray.sources.rawlogs import read_raw_logs
    from log_parser_ray.state.manifest import fresh_dir

    os.makedirs(out_dir, exist_ok=True)
    # clear the run-owned parquet sinks: a rerun over corrected logs must
    # REPLACE the routed rows and the unknown-UA side sink, not accumulate
    # stale content-named parts next to them (history.append_history gives
    # the date-partitioned sinks the same contract)
    fresh_dir(os.path.join(out_dir, "routed"))
    fresh_dir(os.path.join(out_dir, "unknownua"))
    lines = read_raw_logs(paths, file_pattern=file_pattern)
    narrow = lines.map_batches(
        _parse_write_project,
        fn_kwargs={
            "out_dir": os.path.join(out_dir, "routed"),
            # `is not None`: clone_map={} means "no clone collapsing", which
            # must NOT fall back to the default CLONE_MAP
            "clone_items": (
                tuple(sorted(clone_map.items())) if clone_map is not None else None
            ),
            "record_date": record_date,
            "cumulative": cumulative,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        # batch_size intentionally UNSET: a row floor blocks Read fusion
        # (flagship.py note) and would force the full-width text lines
        # through the object store once; unset, the plan fuses
        # read → parse → sink-write → project into one task per file
    )
    # ONE materialize, narrow columns only, ALL sinks (the discarded-count
    # alert needs the sink histogram); `ok` stays a LAZY filter over the
    # materialized blocks — each report aggregate re-runs the cheap per-row
    # filter instead of pinning a second near-full copy of the narrow table
    narrow = narrow.materialize()
    sink_hist = grouped_count(narrow, ["sink"], alias="n").to_pandas()
    n_parsed = (
        int(sink_hist.loc[sink_hist["sink"] == "parsed", "n"].sum())
        if "sink" in sink_hist.columns else 0
    )
    if n_parsed == 0:
        # a file with no parseable access lines (everything routed to the
        # unparsed/discarded sinks): emit an empty-but-typed report set
        # instead of KeyError'ing on column-less aggregate frames
        return _empty_result(out_dir, sink_hist, history_root, run_date)
    ok = narrow.map_batches(
        lambda t: t.filter(pc.equal(t["sink"], "parsed")),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    prepped = _mb(ok, _prep)

    # hourly pass 1: counts + BOTH all-row and app-only sums, ONE shuffle
    h_aggs = [("is_app", "sum"), ("rt_us", "sum"), ("rt_app", "sum"),
              ("", "count_all")] \
        + [(lbl, "sum") for lbl in RANGE_LABELS] \
        + [(f"{lbl}_app", "sum") for lbl in RANGE_LABELS]

    def hourly_fn() -> pd.DataFrame:
        part = _mb(prepped, _partial(["hour"], h_aggs), batch_size=COMBINE_ROWS)
        return sorted_combine(
            part, ["hour"],
            [("is_app_sum", "sum"), ("rt_us_sum", "sum"),
             ("rt_app_sum", "sum"), ("count_all", "sum")]
            + [(f"{lbl}_sum", "sum") for lbl in RANGE_LABELS]
            + [(f"{lbl}_app_sum", "sum") for lbl in RANGE_LABELS],
            renames={"is_app_sum_sum": "xrc", "rt_us_sum_sum": "sum_rt_us",
                     "rt_app_sum_sum": "_sum_rt_app", "count_all_sum": "irc"}
            | {f"{lbl}_sum_sum": f"_n_{lbl}" for lbl in RANGE_LABELS}
            | {f"{lbl}_app_sum_sum": f"_na_{lbl}" for lbl in RANGE_LABELS},
            keep=["hour", "xrc", "sum_rt_us", "_sum_rt_app", "irc"]
            + [f"_n_{lbl}" for lbl in RANGE_LABELS]
            + [f"_na_{lbl}" for lbl in RANGE_LABELS],
        ).to_pandas()

    # hourly pass 2: uuc + usc distincts over (hour, kind, val)
    def uu_fn() -> pd.DataFrame:
        return _dim_distincts(ok, "hour", (("uid", "uid"), ("usc", "jsession")))

    def topslow_raw_fn() -> pd.DataFrame:
        # K1: the 10 slowest raw responses with their render columns
        # (block-pruned local top-k before the global sort)
        cols = ["websrvr", "dt", "tm", "jsession", "was", "request",
                "response", "rt_us", "resp_range", "size", "uid",
                "uri_path", "browser"]
        return top_k(
            ok.map_batches(lambda t: t.select(cols), batch_format="pyarrow",
                           zero_copy_batch=True),
            by=["rt_us", "uri_path", "tm"], descending=[True, False, False],
            k=10,
        ).to_pandas()

    def top400_fn() -> pd.DataFrame:
        # K3: top-10 400+ URLs by count
        filt = ok.map_batches(
            lambda t: t.filter(
                pc.fill_null(pc.greater_equal(t["response"], 400), False)
            ).select(["response", "uri_path"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        counts = grouped_count(
            filt, ["response", "uri_path"], alias="cnt").materialize()
        # the FULL 400+ list CSV the 02 render's "for detail review file"
        # line points at (webAccessLogParser.sh:48,1357-1382,1537) —
        # unbounded URI cardinality, so a streaming sorted write
        _stream_detail(
            counts,
            os.path.join(out_dir, "WebAccessLogSummaryByRC400PlusURLRpt.csv"),
            f"{'rsp':>3}\t{'cnt':>10}\t{'url':<95}",
            lambda r: f"{r.response:>3}\t{int(r.cnt):10d}\t"
                      f"{str(r.uri_path):<95}",
            ["cnt", "uri_path", "response"], [True, False, False],
        )
        return top_k(counts, by=["cnt", "uri_path", "response"],
                     descending=[True, False, False], k=10).to_pandas()

    def top_slow_uri_fn() -> pd.DataFrame:
        # K2: top-10 slowest URIs by avg — uri_path cardinality is unbounded
        # (millions at crawl scale), so derive art per URI in a map_batches
        # over the per-URI aggregate Dataset and take a DISTRIBUTED top_k
        # (the uid_top5_fn shape) instead of collecting the full frame
        stats = grouped_stats(ok, ["uri_path"], "rt_us", count="n", sum_="s")

        def derive(t: pa.Table) -> pa.Table:
            art = pc.round(
                pc.divide(
                    pc.divide(pc.cast(t["s"], pa.float64()),
                              pc.cast(t["n"], pa.float64())),
                    1e6,
                ),
                ndigits=3,
            )
            return t.append_column("art", art)

        df = top_k(
            stats.map_batches(derive, batch_format="pyarrow",
                              zero_copy_batch=True),
            by=["art", "uri_path"], descending=[True, False], k=10,
        ).to_pandas()
        return df[["uri_path", "n", "art"]].reset_index(drop=True)

    def uid_top5_fn() -> pd.DataFrame:
        # K5: top-5 UIDs by app-only avg — uid cardinality is unbounded, so
        # the ranking is a DISTRIBUTED top_k over the per-uid aggregate
        stats = _dim_stats_ds(prepped, "uid")

        def derive(t: pa.Table) -> pa.Table:
            xrc = t["xrc"]
            keep = pc.greater(xrc, 0)
            t = t.filter(keep)
            art = pc.round(
                pc.divide(
                    pc.divide(pc.cast(t["sum_rt_app"], pa.float64()),
                              pc.cast(t["xrc"], pa.float64())),
                    1e6,
                ),
                ndigits=3,
            )
            return t.append_column("art", art)

        derived = stats.map_batches(derive, batch_format="pyarrow",
                                    zero_copy_batch=True)
        df = top_k(derived, by=["art", "uid"], descending=[True, False],
                   k=5).to_pandas()
        return _finish_dim(df.drop(columns=["art"])) if len(df) else df

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=12) as ex:
        f_hourly = ex.submit(hourly_fn)
        f_uu = ex.submit(uu_fn)
        f_rc = ex.submit(
            lambda: grouped_count(ok, ["response"], alias="cnt")
            .to_pandas().sort_values("response").reset_index(drop=True)
        )
        f_slow = ex.submit(top_slow_uri_fn)
        f_methods = ex.submit(
            lambda: grouped_count(ok, ["websrvr", "request"], alias="n").to_pandas()
        )
        f_ws = ex.submit(lambda: _dim_stats_ds(prepped, "websrvr").to_pandas())
        f_ws_d = ex.submit(lambda: _dim_distincts(ok, "websrvr"))
        f_was = ex.submit(lambda: _dim_stats_ds(prepped, "was").to_pandas())
        f_was_d = ex.submit(lambda: _dim_distincts(ok, "was"))
        f_ext = ex.submit(lambda: _dim_stats_ds(prepped, "ext").to_pandas())
        f_dom = ex.submit(lambda: _dim_stats_ds(prepped, "domain").to_pandas())
        f_raw10 = ex.submit(topslow_raw_fn)
        f_top400 = ex.submit(top400_fn)
        f_uid5 = ex.submit(uid_top5_fn)
        f_bw = ex.submit(
            lambda: _dim_distincts(ok, "browser", (("cnt", "uid"),))
        )
        f_os = ex.submit(
            lambda: _dim_distincts(ok, "os_name", (("cnt", "uid"),))
        )
        # whereuid user-session report (webAccessLogParser.sh:1273-1295,
        # 1540-1541) — distributed pairing + streaming CSV write
        f_wu = ex.submit(
            lambda: write_user_sessions(user_sessions_ds(ok), out_dir)
        )
        # domain-usage tables (webAccessLogParser.sh:1242-1267); the reindex
        # restores the typed columns an ALL-EMPTY Dataset's to_pandas drops
        # (session-less / uid-less day)
        def _usage_df(val_col: str) -> pd.DataFrame:
            df = domain_hour_usage(ok, val_col).to_pandas()
            return (df if "domain" in df.columns
                    else pd.DataFrame(columns=["domain"] + HOUR_COLS))

        f_dm_uid = ex.submit(lambda: _usage_df("uid"))
        f_dm_sess = ex.submit(lambda: _usage_df("jsession"))
        f_dm_daily = ex.submit(lambda: domain_daily_usage(ok))
        # FULL per-UID / per-URI detail files — distributed derive +
        # streaming sorted write (webAccessLogParser.sh:1331-1436)
        f_uid_csv = ex.submit(
            lambda: write_uid_detail(uid_detail_ds(prepped), out_dir)
        )
        f_uri_csv = ex.submit(
            lambda: write_uri_detail(
                uri_detail_ds(prepped, perf_baseline_us), out_dir
            )
        )
        hourly = f_hourly.result()
        uu_wide = f_uu.result()
        rc = f_rc.result()
        slow = f_slow.result()
        methods = f_methods.result()
        ws_stats = f_ws.result()
        ws_dist = f_ws_d.result()
        was_stats = f_was.result()
        was_dist = f_was_d.result()
        ext_stats = f_ext.result()
        dom_stats = f_dom.result()
        topslow_raw = f_raw10.result()
        top400 = f_top400.result()
        uid_top5 = f_uid5.result()
        browser_usage = f_bw.result()
        os_usage = f_os.result()
        user_sessions_path = f_wu.result()
        dm_uid = f_dm_uid.result()
        dm_sess = f_dm_sess.result()
        dm_daily = f_dm_daily.result()
        uid_detail_path = f_uid_csv.result()
        uri_detail_path = f_uri_csv.result()
    _write_domain_usage(dm_uid, dm_sess, dm_daily, out_dir)

    # ---- hourly table + daily totals --------------------------------------
    hourly = hourly.merge(uu_wide, on="hour", how="left")
    hourly["uuc"] = hourly["uid"].fillna(0).astype(int)
    hourly["usc"] = hourly["usc"].fillna(0).astype(int)
    hourly["art"] = (hourly["sum_rt_us"] / hourly["irc"] / 1e6).round(3)
    denom = sum(hourly[f"_n_{lbl}"] for lbl in RANGE_LABELS)
    for lbl in RANGE_LABELS:
        hourly[lbl] = (100.0 * hourly[f"_n_{lbl}"] / denom).round(3).fillna(0.0)
    day_totals = {
        "irc": int(hourly["irc"].sum()) if len(hourly) else 0,
        "xrc": int(hourly["xrc"].sum()) if len(hourly) else 0,
        "sum_rt_app": float(hourly["_sum_rt_app"].sum()) if len(hourly) else 0.0,
        "n_1s": float(hourly[f"_n_{RANGE_LABELS[0]}"].sum()) if len(hourly) else 0.0,
        "n_over": float(hourly[f"_n_{RANGE_LABELS[-1]}"].sum()) if len(hourly) else 0.0,
    }
    # app-only daily range counts for the Overall-Daily row
    day_app = {lbl: float(hourly[f"_na_{lbl}"].sum()) if len(hourly) else 0.0
               for lbl in RANGE_LABELS}
    hourly = (
        hourly.drop(columns=[f"_n_{lbl}" for lbl in RANGE_LABELS]
                    + [f"_na_{lbl}" for lbl in RANGE_LABELS]
                    + ["uid", "_sum_rt_app"])
        .sort_values("hour")
        .reset_index(drop=True)
    )

    # Overall-Daily row (app-only art + ranges, webAccessLogParser.sh:823).
    # Day-level distincts are NOT the hourly sums (a user active in two
    # hours counts once) — one more distinct pass keyed by the constant
    # sink column ('parsed' for every ok row ⇒ a single day-level group)
    day_distinct = _dim_distincts(ok, "sink", (("uuc", "uid"), ("usc", "jsession")))
    daily = {
        "date": run_date or "NA",
        "uuc": int(day_distinct["uuc"].sum()) if len(day_distinct) else 0,
        "usc": int(day_distinct["usc"].sum()) if len(day_distinct) else 0,
        "art": round(day_totals["sum_rt_app"] / day_totals["xrc"] / 1e6, 3)
        if day_totals["xrc"] else 0.0,
        "xrc": day_totals["xrc"],
        "irc": day_totals["irc"],
    }
    for lbl in RANGE_LABELS:
        daily[lbl] = (
            round(100.0 * day_app[lbl] / day_totals["xrc"], 3)
            if day_totals["xrc"] else 0.0
        )

    # ---- per-WS / per-WAS statistics --------------------------------------
    def srv_table(stats: pd.DataFrame, dist: pd.DataFrame, dim: str) -> pd.DataFrame:
        if stats.empty:
            return pd.DataFrame(
                columns=[dim, "uuc", "jsc", "art"] + RANGE_LABELS
                + ["xrpc", "irpc"])
        df = _finish_dim(stats)
        df = df.merge(dist, on=dim, how="left")
        df["uuc"] = df["uuc"].fillna(0).astype(int)
        df["jsc"] = df["jsc"].fillna(0).astype(int)
        df["xrpc"] = (100.0 * df["xrc"] / max(day_totals["xrc"], 1)).round(3)
        df["irpc"] = (100.0 * df["irc"] / max(day_totals["irc"], 1)).round(3)
        return df.sort_values(dim).reset_index(drop=True)

    ws_table = srv_table(ws_stats, ws_dist, "websrvr")
    was_table = srv_table(was_stats, was_dist, "was")

    # ---- response codes ----------------------------------------------------
    total = int(rc["cnt"].sum()) if len(rc) else 0
    if len(rc):
        rc["pc"] = (100.0 * rc["cnt"] / total).round(3)

    # ---- domain table: full CSV (bounded dim) + top-5 for the 02 render ---
    dom_full = _finish_dim(dom_stats) if len(dom_stats) else dom_stats
    if len(dom_full):
        dom_full = dom_full[dom_full["xrc"] > 0].sort_values(
            ["art", "domain"], ascending=[False, True]).reset_index(drop=True)
    # WebAccessLogSummaryByDomainRpt.csv (webAccessLogParser.sh:45,
    # 1025-1035,1383-1410: name|art|xrc sorted by avg desc)
    with open(os.path.join(out_dir, "WebAccessLogSummaryByDomainRpt.csv"),
              "w") as fh:
        fh.write("\t".join(["name".ljust(20), f"{'art':>7}", f"{'xrc':>8}"])
                 + "\n")
        for _, r in dom_full.iterrows():
            fh.write(f"{str(r['domain']):<20}\t{r['art']:7.3f}\t"
                     f"{int(r['xrc']):8d}\n")
    dom5 = dom_full.head(5)[["domain", "art", "xrc"]].reset_index(drop=True) \
        if len(dom_full) else dom_full

    # ---- extension summary (app rows only — static exts have no app rows) -
    exts = _finish_dim(ext_stats) if len(ext_stats) else ext_stats
    if len(exts):
        exts = exts[exts["xrc"] > 0].sort_values(
            ["art", "ext"], ascending=[False, True]).reset_index(drop=True)
        exts = exts[["ext"] + RANGE_LABELS + ["xrc", "art"]]

    # ---- browser / OS usage by distinct user ------------------------------
    for usage in (browser_usage, os_usage):
        if len(usage):
            usage["pc"] = (100.0 * usage["cnt"] / max(daily["uuc"], 1)).round(3)
    browser_usage = browser_usage.sort_values(
        ["cnt", "browser"], ascending=[False, True]).reset_index(drop=True) \
        if len(browser_usage) else browser_usage
    os_usage = os_usage.sort_values(
        ["cnt", "os_name"], ascending=[False, True]).reset_index(drop=True) \
        if len(os_usage) else os_usage

    # ---- alerts (shared rule helper, also behind the access_alerts oracle)
    from log_parser_ray.pipelines.reports import global_http_alerts

    n_disc = int(
        sink_hist.loc[sink_hist["sink"] == "discarded", "n"].sum()
    ) if len(sink_hist) else 0
    alerts = global_http_alerts({
        "n_ok": day_totals["irc"],
        "n_app": day_totals["xrc"],
        "sum_rt_app": day_totals["sum_rt_app"],
        "n_1s": day_totals["n_1s"],
        "n_over": day_totals["n_over"],
        "n_400": int(rc.loc[rc["response"] >= 400, "cnt"].sum()) if total else 0,
        "n_disc": n_disc,
    })
    # per-hour + per-domain avg-resp-time alerts (webAccessLogParser.sh:912,
    # 1031-1034): the same threshold key applied to the hourly all-rows avg
    # and the per-domain app-only avg — both frames are bounded (≤24 hours,
    # low-cardinality domains)
    from log_parser_ray.schema import FAMILY_THRESHOLDS

    th_avg = float(FAMILY_THRESHOLDS["http.httpAvgRespTimeTh"])
    extra = [
        {"rule": "http.httpAvgRespTimeTh", "key": f"hour:{int(r['hour'])}",
         "value": float(r["art"]), "threshold": th_avg}
        for _, r in hourly.iterrows() if r["art"] > th_avg
    ] + [
        {"rule": "http.httpAvgRespTimeTh", "key": f"domain:{r['domain']}",
         "value": float(r["art"]), "threshold": th_avg}
        for _, r in dom_full.iterrows() if r["art"] > th_avg
    ]
    if extra:
        alerts = (
            pd.concat([alerts, pd.DataFrame(extra)], ignore_index=True)
            .sort_values(["rule", "key"]).reset_index(drop=True)
        )

    if history_root is not None and run_date is not None:
        # IO5: the reference's daily history CSVs (hourly avg, per-code,
        # perf) as idempotent date-partitioned parquet appends
        from log_parser_ray.state.history import append_history

        append_history(history_root, "access_hourly", run_date, hourly)
        append_history(history_root, "access_response_codes", run_date, rc)
        append_history(history_root, "access_top_slow", run_date, slow)
        append_history(history_root, "access_alerts", run_date, alerts)
        append_history(history_root, "access_daily",
                       run_date, pd.DataFrame([daily]))
        # the remaining per-day reference histories: request types by host
        # (webAccessLogParser.sh:85,823 — long form of the GET|POST|… pivot),
        # per-IHS and per-WAS daily stats rows
        # (webAccessLogParser.sh:107,1104 and :125,1158)
        append_history(history_root, "access_request_types", run_date, methods)
        append_history(history_root, "access_stats_by_ihs",
                       run_date, ws_table)
        append_history(history_root, "access_stats_by_was",
                       run_date, was_table)

    tables = {
        "hourly": hourly, "daily": daily, "ws": ws_table, "was": was_table,
        "response_codes": rc, "topslow_raw": topslow_raw, "top400": top400,
        "domain_top5": dom5, "uid_top5": uid_top5, "extensions": exts,
        "browser_usage": browser_usage, "os_usage": os_usage,
        "top_slow": slow, "methods": methods, "total": total,
        "alerts": alerts, "sink_counts": sink_hist,
        "user_sessions_path": user_sessions_path,
        "unknown_ua_path": _write_unknown_ua(out_dir),
        "domain_hourly_uid": dm_uid, "domain_hourly_sess": dm_sess,
        "domain_daily": dm_daily, "domain_full": dom_full,
        "uid_detail_path": uid_detail_path,
        "uri_detail_path": uri_detail_path,
    }
    report = _render_report(tables)
    rpt_path = os.path.join(out_dir, "02_WebAccessLogSummaryRpt.txt")
    with open(rpt_path, "w") as fh:
        fh.write(report)
    for name in ("hourly", "response_codes", "top_slow", "methods", "alerts",
                 "ws", "was", "top400", "extensions", "browser_usage",
                 "os_usage"):
        df = tables[name]
        if isinstance(df, pd.DataFrame):
            df.to_csv(os.path.join(out_dir, f"{name}.csv"), index=False)
    tables["report_path"] = rpt_path
    return tables


def _render_report(t: dict) -> str:
    """The reference's FULL 02 summary-report layout
    (sample_reports/02_WebAccessLogSummaryRpt.txt, all sections)."""
    bar = "=" * 53
    hourly, rc, slow = t["hourly"], t["response_codes"], t["top_slow"]
    # header + the golden's abbreviation legend (sample 02:1-45)
    ext_note = "|".join(STATIC_EXTS)
    legend = [
        ("hr", "Hour"), ("date", "Date"), ("time", "Time"),
        ("uid", "User ID"), ("js", "jSession"),
        ("was", "WebSphere Application Server or App Server"),
        ("ws", "Web Server like Apache or IBM HTTP Server (IHS)"),
        ("jvm", "Java Virtual Machine (JVM)"),
        ("req", "HTTP Request like GET, POST etc."),
        ("rsp", "HTTP Response code like 200, 400 etc."),
        ("sz", "Size - HTTP response size"),
        ("uuc", "Unique User Count"),
        ("uupc", "Unique User Count in Percentage"),
        ("usc", "Unique jSession Count"),
        ("uspc", "Unique jSession Count in Percentage"),
        ("art", "Average Response Time in Second"),
        ("bart", "Baseline Average Response Time in Second"),
        ("rt", "(HTTP) Response Time in Second"),
        ("mnrt", "Minimum Response Time in Second for the given access "
                 "request or transaction"),
        ("mxrt", "Maximum Response Time in Second for the given access "
                 "request or Transaction"),
        ("rng", "Response Range (second). What range like 1 second, "
                "5 second etc. range the response falls."),
        ("<=1", "Less than or eaual to One Second response range in "
                "percentage"),
        ("<=5", "Greater than One Second and less than or equal to Five "
                "Seconds response range in percentage"),
        ("<=10", "Greater than Five Seconds and less than or equal to Ten "
                 "Seconds response range in percentage"),
        ("<=20", "Greater than Ten seconds and less than or equal to "
                 "Twenty Seconds response range in percentage"),
        (">20", "More than Twenty Seconds in Percentage"),
        ("xrc", "Total Record (Request,Response or Transaction) Count - "
                f"that excludes static contents like {ext_note}."),
        ("xrpc", "Total Record (Request,Response or Transaction) Count in "
                 f"Percentage - that excludes static contents like "
                 f"{ext_note}."),
        ("irc", "Total Record (Request,Response or Transaction) Count - "
                "that includes static contents."),
        ("irpc", "Total Record (Request,Response or Transaction) Count in "
                 "Percentage - that includes static contents."),
        ("cnt", "(Any) Count like jSession count, User count etc."),
        ("pc", "(Any) Count or measure represented in Percentage"),
        ("srv", "Server - like Web Server(IHS), App Server etc."),
        ("url", "URL"), ("bwsr", "Browser"),
    ]
    out = [bar, "===== Http Access log analysis report =====",
           "===== based on access logs dated: "
           f"{(t.get('daily') or {}).get('date', 'NA')}  =====",
           bar, "",
           "===== Summary table contains short heading title. See below "
           "for their description =====",
           "Note: Hourly statistics excludes the following static contents "
           "from calculation:",
           f"excludes with these extensions: {ext_note}"]
    out += [f"{k:<5}\t: {v}" for k, v in legend]
    out += [bar, "",
            bar, "===== Hourly Statistics =====", bar, ""]
    hdr = ["hr", "uuc", "usc", "art"] + RANGE_LABELS + ["xrc", "irc"]
    out.append("\t".join(f"{h:>7}" for h in hdr))
    for _, r in hourly.iterrows():
        row = [int(r["hour"]), int(r["uuc"]), int(r["usc"]), f"{r['art']:.3f}"]
        row += [f"{r[l]:.3f}" for l in RANGE_LABELS]
        row += [int(r["xrc"]), int(r["irc"])]
        out.append("\t".join(f"{v:>7}" for v in row))

    d = t["daily"]
    out += ["", bar, "===== Overall-Daily Statistics =====",
            "Note: Overall response range and average response time excludes "
            "static contents from calculation:",
            f"excludes with these extensions: {'|'.join(STATIC_EXTS)}", bar, ""]
    out.append("\t".join(f"{h:>7}" for h in
                         ["date", "uuc", "usc", "art"] + RANGE_LABELS
                         + ["xrc", "irc"]))
    drow = [d["date"], d["uuc"], d["usc"], f"{d['art']:.3f}"]
    drow += [f"{d[l]:.3f}" for l in RANGE_LABELS]
    drow += [d["xrc"], d["irc"]]
    out.append("\t".join(f"{v:>7}" for v in drow))

    out += ["", bar, "===== Statistics by Web Server(IHS)  and WebSphere "
                     "App Server (WAS) =====", bar, ""]
    out.append("\t".join(
        ["srv".ljust(28)] + [f"{h:>5}" for h in ["uuc", "jsc", "art"]
                             + RANGE_LABELS + ["xrpc", "irpc"]]))
    for frame, dim in ((t["ws"], "websrvr"), (t["was"], "was")):
        for _, r in frame.iterrows():
            row = [str(r[dim]).ljust(28), int(r["uuc"]), int(r["jsc"]),
                   f"{r['art']:.3f}"]
            row += [f"{r[l]:.3f}" for l in RANGE_LABELS]
            row += [f"{r['xrpc']:.3f}", f"{r['irpc']:.3f}"]
            out.append("\t".join(str(v) for v in row))
        out.append("")

    out += [bar, "===== Statistics by HTTP response code =====", bar, ""]
    out.append("rsp\tcnt\tpc")
    for _, r in rc.iterrows():
        out.append(f"{int(r['response'])}\t{int(r['cnt'])}\t{r['pc']:7.3f}")
    out.append(f"Total response count: {t['total']}")

    out += ["", bar, "===== Top 10 (slowest) responses by Response Time =====",
            bar, ""]
    out.append("ws         \tdate      \ttime    \tjs                  \twas     "
               "\treq   \trsp\t       rt\t  rng\t      sz\tuid               \turl")
    for _, r in t["topslow_raw"].iterrows():
        out.append(
            f"{r['websrvr']:<11}\t{r['dt']:<10}\t{r['tm']:<8}\t"
            f"{str(r['jsession']):<20}\t{str(r['was']):<8}\t{r['request']:<6}\t"
            f"{int(r['response']) if pd.notna(r['response']) else 0}\t"
            f"{r['rt_us'] / 1e6:>9.3f}\t"
            f"{str(r['resp_range']):>5}\t"
            f"{int(r['size']) if pd.notna(r['size']) else 0:>8}\t"
            f"{str(r['uid']):<18}\t{r['uri_path']}"
        )

    # the golden's "for detail review file" pointer lines name the full
    # detail CSVs this run wrote next to the report (sample 02:138,156,171)
    rpt_dir = os.path.dirname(t["uid_detail_path"] or "") \
        if t.get("uid_detail_path") else ""

    def _rf(name: str) -> str:
        return ("===== for detail review file: "
                f"{os.path.join(rpt_dir, name) if rpt_dir else name} =====")

    out += ["", bar, "===== Top 10 (by count) URL ending with HTTP response "
                     "code 400 and higher =====",
            _rf("WebAccessLogSummaryByRC400PlusURLRpt.csv"), bar, ""]
    out.append("rsp\t       cnt\turl")
    for _, r in t["top400"].iterrows():
        out.append(f"{int(r['response'])}\t{int(r['cnt']):>10}\t{r['uri_path']}")

    out += ["", bar, "===== Summary by Domain - Top 5 (slowest) by average "
                     "response time =====",
            _rf("WebAccessLogSummaryByDomainRpt.csv"),
            "Note: Domain response range and average response time excludes "
            "the following static contents from calculation:",
            f"excludes with these extensions: {'|'.join(STATIC_EXTS)}",
            bar, ""]
    out.append("name                \t    art\t     xrc")
    for _, r in t["domain_top5"].iterrows():
        out.append(f"{str(r['domain']):<20}\t{r['art']:>7.3f}\t{int(r['xrc']):>8}")

    out += ["", bar, "===== Top 5 (slowest) UIDs by Average Response Time "
                     "=====", _rf("WebAccessLogSummaryByUIDRpt.csv"), bar, ""]
    out.append("uid                           " + "\t".join(
        [f"{l:>8}" for l in RANGE_LABELS] + ["     xrc", "    art"]))
    for _, r in t["uid_top5"].iterrows():
        row = [str(r["uid"]).ljust(30)]
        row += [f"{r[l]:>8.3f}" for l in RANGE_LABELS]
        row += [f"{int(r['xrc']):>8}", f"{r['art']:>7.3f}"]
        out.append("\t".join(row))

    out += ["", bar, "===== Summary by Extension =====", bar, ""]
    out.append("Ext                 " + "\t".join(
        [f"{l:>8}" for l in RANGE_LABELS] + ["     cnt", "    art"]))
    for _, r in t["extensions"].iterrows():
        row = [str(r["ext"]).ljust(20)]
        row += [f"{r[l]:>8.3f}" for l in RANGE_LABELS]
        row += [f"{int(r['xrc']):>8}", f"{r['art']:>7.3f}"]
        out.append("\t".join(row))

    out += ["", bar, "===== Browser Usage Statistics =====",
            "cnt - total number of unique user using this browser",
            "pc   - percentage usage of this browser", bar, ""]
    out.append("Browser                                      \t      cnt\t     pc")
    for _, r in t["browser_usage"].iterrows():
        out.append(f"{str(r['browser']):<45}\t{int(r['cnt']):>9}\t{r['pc']:>7.3f}")

    out += ["", bar, "===== OS Usage Statistics =====",
            "cnt - total number of unique user using this OS",
            "pc   - percentage usage of this OS", bar, ""]
    out.append("OS                                           \t      cnt\t     pc")
    for _, r in t["os_usage"].iterrows():
        out.append(f"{str(r['os_name']):<45}\t{int(r['cnt']):>9}\t{r['pc']:>7.3f}")

    out += ["", bar, "===== Top 10 (slowest) URIs by avg response time =====",
            bar, ""]
    out.append("uri\tcnt\tart")
    for _, r in slow.iterrows():
        out.append(f"{r['uri_path']}\t{int(r['n'])}\t{r['art']:.3f}")
    out.append("")
    return "\n".join(out)


def _empty_result(out_dir: str, sink_hist: pd.DataFrame,
                  history_root: str | None, run_date: str | None) -> dict:
    """Typed empty report set for a run whose input had no parseable access
    lines — same keys/columns as the normal result so callers never branch."""
    hourly = pd.DataFrame(
        columns=["hour", "xrc", "sum_rt_us", "irc", "uuc", "usc", "art"]
        + RANGE_LABELS)
    rc = pd.DataFrame(columns=["response", "cnt", "pc"])
    daily = {"date": run_date or "NA", "uuc": 0, "usc": 0, "art": 0.0,
             "xrc": 0, "irc": 0} | {lbl: 0.0 for lbl in RANGE_LABELS}
    dim_cols = ["uuc", "jsc", "art"] + RANGE_LABELS + ["xrpc", "irpc"]
    empty = pd.DataFrame
    tables = {
        "hourly": hourly, "daily": daily,
        "ws": empty(columns=["websrvr"] + dim_cols),
        "was": empty(columns=["was"] + dim_cols),
        "response_codes": rc,
        "topslow_raw": empty(columns=["websrvr", "dt", "tm", "jsession",
                                      "was", "request", "response", "rt_us",
                                      "resp_range", "size", "uid",
                                      "uri_path", "browser"]),
        "top400": empty(columns=["response", "uri_path", "cnt"]),
        "domain_top5": empty(columns=["domain", "art", "xrc"]),
        "uid_top5": empty(columns=["uid", "xrc", "sum_rt_app", "irc", "art"]
                          + RANGE_LABELS),
        "extensions": empty(columns=["ext"] + RANGE_LABELS + ["xrc", "art"]),
        "browser_usage": empty(columns=["browser", "cnt", "pc"]),
        "os_usage": empty(columns=["os_name", "cnt", "pc"]),
        "top_slow": empty(columns=["uri_path", "n", "art"]),
        "methods": empty(columns=["websrvr", "request", "n"]),
        "total": 0,
        "sink_counts": sink_hist,
        "user_sessions_path": None,
        "unknown_ua_path": _write_unknown_ua(out_dir),
        "domain_hourly_uid": empty(columns=["domain"] + HOUR_COLS),
        "domain_hourly_sess": empty(columns=["domain"] + HOUR_COLS),
        "domain_daily": empty(columns=["domain", "uuc", "usc"]),
        "domain_full": empty(columns=["domain", "art", "xrc"]),
        "uid_detail_path": None,
        "uri_detail_path": None,
    }
    from log_parser_ray.pipelines.reports import global_http_alerts

    n_disc = int(
        sink_hist.loc[sink_hist["sink"] == "discarded", "n"].sum()
    ) if "sink" in sink_hist.columns else 0
    tables["alerts"] = global_http_alerts(
        {"n_ok": 0, "n_app": 0, "sum_rt_app": 0.0, "n_1s": 0, "n_over": 0,
         "n_400": 0, "n_disc": n_disc})
    if history_root is not None and run_date is not None:
        from log_parser_ray.state.history import append_history

        # ALL EIGHT families the normal path appends — a daily rerun whose
        # corrected logs parse nothing must replace (clear) every family's
        # date partition, not just two of them
        append_history(history_root, "access_hourly", run_date, hourly)
        append_history(history_root, "access_response_codes", run_date, rc)
        append_history(history_root, "access_top_slow", run_date,
                       tables["top_slow"])
        append_history(history_root, "access_alerts", run_date, tables["alerts"])
        append_history(history_root, "access_daily",
                       run_date, pd.DataFrame([daily]))
        append_history(history_root, "access_request_types", run_date,
                       tables["methods"])
        append_history(history_root, "access_stats_by_ihs", run_date,
                       tables["ws"])
        append_history(history_root, "access_stats_by_was", run_date,
                       tables["was"])
    rpt_path = os.path.join(out_dir, "02_WebAccessLogSummaryRpt.txt")
    with open(rpt_path, "w") as fh:
        fh.write(_render_report(tables))
    tables["report_path"] = rpt_path
    return tables
