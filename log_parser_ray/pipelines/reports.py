"""01_WAS and 04_GC summary-report renders + per-family threshold alerts.

The reference renders its WAS report from ~8 top-10 dimensions plus the
hung-thread / transaction-timeout / CPU-starvation / OOM sections
(websphereLogParser.sh:255-439 gather, :440-900 render; golden
sample_reports/01_WASLogSummaryRpt.txt) and its GC report from the
per-(jvm, date) × gcType aggregate plus the last record per JVM
(javaGCStatsParser.sh:455-541,556-622; golden 04_GCSummaryRpt.txt).

Shape here: every number comes from a DISTRIBUTED aggregate over the parsed
Datasets (grouped_count / grouped_stats / argmax_by / top_k — the same
two-phase toolkit as every other report); rendering happens at the EDGE over
the collected frames, all of which are bounded (per-server ≤ #servers,
top-10s ≤ 10, per-(jvm, date) ≤ jvms × days, alert/hung/tto details are
exceedance sets the reference itself prints in full).

Threshold alerts resolve rules by the server name's 3-char prefix against
``schema.FAMILY_THRESHOLDS`` — `<family>.<prefix>.<property>` — exactly the
reference's arrTh lookup (websphereLogParser.sh:345-379,416-439;
webErrorLogParser.sh:175-190; javaGCStatsParser.sh:474-489).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from log_parser_ray.schema import FAMILY_THRESHOLDS
from log_parser_ray.stages.aggregate import (
    argmax_by,
    grouped_count,
    grouped_stats,
    top_k,
)

BAR = "=" * 53

# real WSVR0605W / WSVR0606W hung-thread grammar (websphereLogParser.sh
# :289-310 — awk positional fields re-derived as anchored RE2 groups)
HUNG_RE = (
    r'WSVR0605W: Thread "(?P<woct>[^"]+)" \((?P<thid>[0-9a-fA-F]+)\) '
    r"has been active for (?P<ms>\d+) milliseconds and may be hung"
    r".*?(?P<chtc>\d+) thread\(s\) in total"
)
RELEASED_RE = (
    r'WSVR0606W: Thread "(?P<woct>[^"]+)" \((?P<thid>[0-9a-fA-F]+)\) '
    r"was previously reported to be hung but has completed"
    r".*?approximately (?P<ms>\d+) milliseconds"
    r".*?(?P<chtc>\d+) thread\(s\) in total"
)

# message-derived dimensions: the reference's positional $8/$9/$10 tokens
# (websphereLogParser.sh:218-227) — sCmp = first msg token (class/msgId),
# expNm = second, msg body = the rest
S_CMP_RE = r"^(?P<v>\S+)"
EXP_RE = r"^\S+ (?P<v>\S+)"
MSG_TAIL_RE = r"^\S+ \S+ (?P<v>.*)$"


def _df(ds: "ray.data.Dataset", columns: list[str]) -> pd.DataFrame:
    """Collect a (possibly empty) Dataset: an all-empty map output loses its
    block schema entirely, so normalize to the expected columns."""
    df = ds.to_pandas()
    if df.empty and list(df.columns) != columns:
        return pd.DataFrame(columns=columns)
    return df


def _dtm_parts(dtm: pa.ChunkedArray):
    """'6/13/15 10:32:04:123 EDT' → (date, time, tz, hour)."""
    parts = pc.split_pattern(dtm, " ")
    dt = pc.list_element(parts, 0)
    tm = pc.list_element(parts, 1)
    tz = pc.list_element(parts, 2)
    hr = pc.list_element(pc.split_pattern(tm, ":"), 0)
    return dt, tm, tz, hr


def hung_thread_events(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """WSVR0605W/0606W notifications → (line_id, srv, dt, tm, tz, hr, woct,
    thid, htm_s, chtc, sts) rows — the reference's .hung stream."""

    def fn(t: pa.Table) -> pa.Table:
        out = []
        for msg_id, rx, sts in (
            ("WSVR0605W", HUNG_RE, "Hung"),
            ("WSVR0606W", RELEASED_RE, "Released"),
        ):
            sub = t.filter(pc.equal(t["msg_id"], msg_id))
            m = pc.extract_regex(sub["msg"], rx)
            sub = sub.filter(pc.is_valid(m))
            if sub.num_rows == 0:
                continue
            m = pc.extract_regex(sub["msg"], rx)

            def f(n):
                return pc.struct_field(m, n)

            dt, tm, tz, hr = _dtm_parts(sub["dtm"])
            # woct = the container-thread NUMBER (the reference's
            # substr($12,…) slice of 'WebContainer : 24'); fall back to the
            # full quoted name when it carries no trailing number
            woct_full = f("woct")
            woct_num = pc.struct_field(
                pc.extract_regex(woct_full, r"(?P<d>\d+)$"), "d"
            )
            out.append(
                pa.table(
                    {
                        "line_id": sub["line_id"],
                        "srv": sub["srv"],
                        "dt": dt, "tm": tm, "tz": tz, "hr": hr,
                        "woct": pc.coalesce(woct_num, woct_full),
                        "thid": f("thid"),
                        "htm_s": pc.round(
                            pc.divide(pc.cast(f("ms"), pa.float64()), 1000.0),
                            ndigits=3,
                        ),
                        "chtc": pc.cast(f("chtc"), pa.int64()),
                        "sts": pa.array([sts] * sub.num_rows, pa.string()),
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "line_id": pa.array([], pa.int64()),
                    "srv": pa.array([], pa.string()),
                    "dt": pa.array([], pa.string()),
                    "tm": pa.array([], pa.string()),
                    "tz": pa.array([], pa.string()),
                    "hr": pa.array([], pa.string()),
                    "woct": pa.array([], pa.string()),
                    "thid": pa.array([], pa.string()),
                    "htm_s": pa.array([], pa.float64()),
                    "chtc": pa.array([], pa.int64()),
                    "sts": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(out)

    return parsed.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _msg_dim(parsed: "ray.data.Dataset", rx: str, alias: str) -> "ray.data.Dataset":
    """(alias, evt_type) rows for one message-derived dimension, excluding
    I/A lines (the reference's gather branch, websphereLogParser.sh:259-279)."""

    def fn(t: pa.Table) -> pa.Table:
        sub = t.filter(
            pc.invert(pc.is_in(t["evt_type"], value_set=pa.array(["I", "A"])))
        )
        v = pc.struct_field(pc.extract_regex(sub["msg"], rx), "v")
        keep = pc.is_valid(v)
        return pa.table(
            {alias: pc.drop_null(v), "evt_type": sub.filter(keep)["evt_type"]}
        )

    return parsed.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _top10(counts: "ray.data.Dataset", dim: str, evts: list[str]) -> pd.DataFrame:
    """Top-10 rows of one (dim, evt_type, cnt) table restricted to evts."""
    filt = counts.map_batches(
        lambda t, e=tuple(evts): t.filter(
            pc.is_in(t["evt_type"], value_set=pa.array(list(e)))
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return top_k(
        filt, by=["cnt", dim, "evt_type"], descending=[True, False, False], k=10
    ).to_pandas()


def _prefix_alerts(
    df: pd.DataFrame, *, family: str, prop: str, key_col: str, value_col: str
) -> pd.DataFrame:
    """Per-key threshold alerts via the 3-char-prefix rule lookup — a
    vectorized rule-table join (each `{family}.{pfx}.{prop}` rule maps to
    exactly one prefix, so the inner merge never duplicates rows)."""
    out_cols = ["rule", "key", "value", "threshold"]
    if not len(df):
        return pd.DataFrame(columns=out_cols)
    rules = pd.DataFrame(
        [(rule, rule.split(".")[1], float(th))
         for rule, th in FAMILY_THRESHOLDS.items()
         if rule.count(".") == 2
         and rule.startswith(f"{family}.") and rule.endswith(f".{prop}")],
        columns=["rule", "_pfx", "threshold"],
    )
    keys = df[key_col].astype(str)
    left = pd.DataFrame({"key": keys, "_pfx": keys.str[:3],
                         "value": df[value_col].astype(float)})
    hits = left.merge(rules, on="_pfx", how="inner")
    hits = hits[hits["value"] > hits["threshold"]]
    return hits[out_cols].reset_index(drop=True)


def filtered_error_counts(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """ST4 on the real WAS pack: per-(srv, msg) counts of lines matching the
    WASCustomFilter patterns (websphereLogParser.sh:99-101,619-650 — the
    .filter stream and its Critical-or-Filtered-Error summary)."""
    import re as _re

    from log_parser_ray.schema import FILTER_PATTERNS

    union_rx = "|".join(f"(?:{p})" for p in FILTER_PATTERNS)

    def fn(t: pa.Table) -> pa.Table:
        hit = pc.is_valid(pc.extract_regex(t["msg"], f"(?P<v>{union_rx})"))
        sub = t.filter(hit)
        return pa.table({"srv": sub["srv"], "msg": sub["msg"]})

    rows = parsed.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count(rows, ["srv", "msg"], alias="cnt")


import contextlib
import threading

# refcounted preserve_order window: detail writers run in CONCURRENT report
# threads, and the streaming executor yields task outputs in COMPLETION
# order unless preserve_order is set — a multi-block sorted file would
# interleave. A plain save/restore would race (thread A restoring False
# while thread B's ordered iteration still executes), so the flag goes up
# with the first ordered writer and down with the last.
_ORDER_LOCK = threading.Lock()
_ORDER_STATE = {"depth": 0, "prev": False}


@contextlib.contextmanager
def _ordered_execution():
    from ray.data.context import DataContext

    opts = DataContext.get_current().execution_options
    with _ORDER_LOCK:
        if _ORDER_STATE["depth"] == 0:
            _ORDER_STATE["prev"] = opts.preserve_order
            opts.preserve_order = True
        _ORDER_STATE["depth"] += 1
    try:
        yield
    finally:
        with _ORDER_LOCK:
            _ORDER_STATE["depth"] -= 1
            if _ORDER_STATE["depth"] == 0:
                opts.preserve_order = _ORDER_STATE["prev"]


def _stream_csv(ds: "ray.data.Dataset", path: str, header: str | None,
                fmt_row, sort_by, descending) -> str:
    """Stream a Dataset to a CSV report file in the reference's sorted
    printf layout — sorted distributedly, FORMATTED distributedly, the
    driver only appends pre-rendered line blocks to the file.

    The input is materialized ONCE before the emptiness probe: on a lazy
    input, ``count()`` would otherwise execute the whole upstream pipeline
    just to return a number and the sort would then execute it AGAIN —
    double-running every two-phase shuffle feeding a detail file. The
    blocks land in the object store (spillable) and are freed when the
    materialized handle goes out of scope; the empty guard itself stays
    (Ray's sort rejects the schema-less blocks an all-empty map chain
    produces).

    Row → text runs INSIDE ``map_batches`` (the per-row printf closure is
    unavoidable — the layouts are positional printf templates — but it
    parallelizes across blocks instead of serializing on the driver); the
    driver's loop is one ``"\\n".join`` + write per batch. Order holds
    because map_batches preserves within-block order and iter_batches
    yields blocks in dataset order."""
    import os

    import pandas as pd

    os.makedirs(os.path.dirname(path), exist_ok=True)
    ds = ds.materialize()
    n = ds.count()
    srt = ds.sort(sort_by, descending=descending) if n else ds

    def render(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {"line": [fmt_row(r) for r in df.itertuples(index=False)]}
        )

    # tmp + os.replace commit like the parquet sinks (route.py) and the
    # reference's own mv-commit (webAccessLogParser.sh:1518-1557) — a crash
    # mid-stream never leaves a truncated file at the final path
    tmp = os.path.join(os.path.dirname(path),
                       f".tmp-{os.path.basename(path)}")
    with _ordered_execution():
        with open(tmp, "w") as fh:
            if header is not None:
                fh.write(header + "\n")
            if n:
                lines = srt.map_batches(render, batch_format="pandas")
                for b in lines.iter_batches(batch_format="pandas"):
                    if len(b):
                        fh.write("\n".join(b["line"]) + "\n")
    os.replace(tmp, path)
    return path


# per-dimension (err_file, warn_file, header, row formatter) — the
# reference's weJHfmt/weJBfmt printf layouts (websphereLogParser.sh:
# cmp :682-691,707-716; cls :730-739,753-762; exp :776-785,799-808;
# msg :822-831,845-854), each sorted by count desc
_WAS_RANK_LAYOUTS: dict[str, tuple] = {
    "component": (
        "WASLogSummaryByErrCmpRpt.csv", "WASLogSummaryByWarnCmpRpt.csv",
        f"{'cmp':<25}\t{'evt':<3}\t{'cnt':>6}",
        lambda d, e, c: f"{d:<25}\t{e:<3}\t{c:6d}",
    ),
    "cls": (
        "WASLogSummaryByErrClassRpt.csv", "WASLogSummaryByWarnClassRpt.csv",
        f"{'evt':<3}\t{'cnt':>6}\t{'cmp':<50}",
        lambda d, e, c: f"{e:<3}\t{c:6d}\t{d:<50}",
    ),
    "exp": (
        "WASLogSummaryByErrExpRpt.csv", "WASLogSummaryByWarnExpRpt.csv",
        f"{'exp':<25}\t{'evt':<3}\t{'cnt':>6}",
        lambda d, e, c: f"{d:<25}\t{e:<3}\t{c:6d}",
    ),
    "msg": (
        "WASLogSummaryByErrMsgRpt.csv", "WASLogSummaryByWarnMsgRpt.csv",
        f"{'cnt':>6}\t{'evt':<3}\t{'msg':<25}",
        lambda d, e, c: f"{c:6d}\t{e:<3}\t{d:<25}",
    ),
}


def write_was_rank_csvs(counts: dict[str, "ray.data.Dataset"],
                        out_dir: str) -> list[str]:
    """The reference's eight FULL-ranking CSVs next to the 01 render — the
    01 report shows each dimension's top-10 and points at these files for
    the complete list (websphereLogParser.sh:56-64,867-874). ``counts``
    maps dim → the materialized (dim, evt_type, cnt) Dataset the top-10s
    were cut from, so this is render-only work."""
    import os

    paths = []
    for dim, (err_name, warn_name, hdr, fmt) in _WAS_RANK_LAYOUTS.items():
        ds = counts[dim]
        for fname, evts in ((err_name, ("E", "F")), (warn_name, ("W",))):
            filt = ds.map_batches(
                lambda t, e=evts, d=dim: t.filter(pc.and_(
                    pc.is_in(t["evt_type"], value_set=pa.array(list(e))),
                    pc.is_valid(t[d]),
                )),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            paths.append(_stream_csv(
                filt, os.path.join(out_dir, fname), hdr,
                lambda r, f=fmt, d=dim: f(str(getattr(r, d)), r.evt_type,
                                          int(r.cnt)),
                ["cnt", dim, "evt_type"], [True, False, False],
            ))
    return paths


def write_was_filtered_detail(parsed: "ray.data.Dataset",
                              out_dir: str) -> str:
    """WASLogFilteredErrRpt.csv — every record matching the WASCustomFilter
    patterns, in full (the reference's .filter stream committed verbatim,
    websphereLogParser.sh:123,618-650,867). Distributed filter + streaming
    sorted write; no header line, like the reference's raw stream."""
    import os

    from log_parser_ray.schema import FILTER_PATTERNS

    union_rx = "|".join(f"(?:{p})" for p in FILTER_PATTERNS)

    def fn(t: pa.Table) -> pa.Table:
        sub = t.filter(
            pc.is_valid(pc.extract_regex(t["msg"], f"(?P<v>{union_rx})"))
        )
        return pa.table({
            "line_id": sub["line_id"], "srv": sub["srv"], "dtm": sub["dtm"],
            "thread": sub["thread"], "component": sub["component"],
            "evt_type": sub["evt_type"], "msg": sub["msg"],
        })

    rows = parsed.map_batches(fn, batch_format="pyarrow",
                              zero_copy_batch=True)
    return _stream_csv(
        rows, os.path.join(out_dir, "WASLogFilteredErrRpt.csv"), None,
        lambda r: f"{r.srv} {r.dtm} {r.thread} {r.component} "
                  f"{r.evt_type} {r.msg}",
        ["srv", "line_id"], [False, False],
    )


def was_summary_tables(parsed: "ray.data.Dataset",
                       out_dir: str | None = None) -> dict:
    """All 01-report tables as collected (bounded) frames + alert rows.

    ``parsed`` is the parse_was_lines output; every aggregate below is a
    distributed two-phase pass over it."""
    from log_parser_ray.stages.aggregate import conform_schema
    from log_parser_ray.stages.waslog import (
        cpu_starvation_summary,
        oom_last_event,
        tto_correlate,
    )

    # one parse feeds the ~10 aggregates; conform_schema drops the
    # schema-less empty blocks Ray manufactures for no-match read tasks —
    # they would otherwise surface as zero-column frames at the collect edges
    parsed = conform_schema(
        parsed,
        pa.schema(
            [("line_id", pa.int64()), ("srv", pa.string()),
             ("dtm", pa.string()), ("thread", pa.string()),
             ("component", pa.string()), ("evt_type", pa.string()),
             ("msg_id", pa.string()), ("msg", pa.string()),
             ("is_severe", pa.bool_())]
        ),
    )
    if parsed.count() == 0:
        # no parseable SystemOut lines at all: empty-but-typed tables
        # (column-less frames would KeyError at the sort/render edges)
        e = pd.DataFrame
        t10 = ["cnt", "evt_type"]
        return {
            "srv_evt": e(columns=["srv", "evt_type", "cnt"]),
            "top_err_cmp": e(columns=["component"] + t10),
            "top_warn_cmp": e(columns=["component"] + t10),
            "top_err_cls": e(columns=["cls"] + t10),
            "top_warn_cls": e(columns=["cls"] + t10),
            "top_err_exp": e(columns=["exp"] + t10),
            "top_warn_exp": e(columns=["exp"] + t10),
            "top_err_msg": e(columns=["msg"] + t10),
            "top_warn_msg": e(columns=["msg"] + t10),
            "hung_detail": e(columns=["line_id", "srv", "dt", "tm", "tz",
                                      "hr", "woct", "thid", "htm_s", "chtc",
                                      "sts"]),
            "hung_summary": e(columns=["srv", "nhtc", "mhtc", "rhtc"]),
            "tto_detail": e(columns=["line_id", "srv", "thread", "tran_id",
                                     "timeout_s", "declare_line"]),
            "tto_by_jvm": e(columns=["srv", "cnt"]),
            "starv_detail": e(columns=["srv", "dt", "tm", "tz", "line_id",
                                       "dly"]),
            "starv_summary": e(columns=["srv", "n", "total_delay_s"]),
            "oom": e(columns=["srv", "dt", "line_id", "dtm", "thread",
                              "component", "msg"]),
            "filtered": e(columns=["srv", "msg", "cnt"]),
            "alerts": e(columns=["rule", "key", "value", "threshold"]),
        }

    # per-server event counts (excluding the reference's I/A info branch)
    nonx = parsed.map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t["evt_type"], value_set=pa.array(["I", "A"])))
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # CPU starvation detail extractor (submitted below)
    from log_parser_ray.stages.waslog import CPU_STARV_RE

    def starv_detail_fn(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["msg_id"], "HMGR0152W"))
        d = pc.struct_field(pc.extract_regex(sub["msg"], CPU_STARV_RE), "d")
        dt, tm, tz, _ = _dtm_parts(sub["dtm"])
        return pa.table(
            {"srv": sub["srv"], "dt": dt, "tm": tm, "tz": tz,
             "line_id": sub["line_id"],
             "dly": pc.cast(d, pa.float64())}
        )

    # the ~9 independent aggregates run CONCURRENTLY on driver threads from
    # the same materialized parsed blocks (the flagship pattern — their
    # shuffle barriers would otherwise serialize into the report wall time)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=10) as ex:
        f_srv = ex.submit(
            lambda: grouped_count(nonx, ["srv", "evt_type"], alias="cnt")
            .to_pandas()
        )
        f_cmp = ex.submit(
            lambda: grouped_count(
                nonx, ["component", "evt_type"], alias="cnt").materialize()
        )
        f_cls = ex.submit(
            lambda: grouped_count(
                _msg_dim(parsed, S_CMP_RE, "cls"), ["cls", "evt_type"],
                alias="cnt").materialize()
        )
        f_exp = ex.submit(
            lambda: grouped_count(
                _msg_dim(parsed, EXP_RE, "exp"), ["exp", "evt_type"],
                alias="cnt").materialize()
        )
        f_msg = ex.submit(
            lambda: grouped_count(
                _msg_dim(parsed, MSG_TAIL_RE, "msg"), ["msg", "evt_type"],
                alias="cnt").materialize()
        )
        f_hung = ex.submit(lambda: hung_thread_events(parsed).materialize())
        f_tto = ex.submit(lambda: tto_correlate(parsed).materialize())
        f_starv_d = ex.submit(
            lambda: _df(
                parsed.map_batches(starv_detail_fn, batch_format="pyarrow",
                                   zero_copy_batch=True),
                ["srv", "dt", "tm", "tz", "line_id", "dly"],
            )
        )
        f_starv_s = ex.submit(
            lambda: _df(cpu_starvation_summary(parsed),
                        ["srv", "n", "total_delay_s"])
        )
        f_oom = ex.submit(
            lambda: _df(
                oom_last_event(parsed),
                ["srv", "dt", "line_id", "dtm", "thread", "component", "msg"],
            )
        )
        f_filt = ex.submit(
            lambda: _df(filtered_error_counts(parsed), ["srv", "msg", "cnt"])
        )
        srv_evt = f_srv.result().sort_values(
            ["srv", "evt_type"]).reset_index(drop=True)
        cmp_counts = f_cmp.result()
        cls_counts = f_cls.result()
        exp_counts = f_exp.result()
        msg_counts = f_msg.result()
        hung = f_hung.result()
        tto = f_tto.result()
        starv_detail = f_starv_d.result().sort_values(
            ["srv", "line_id"]).reset_index(drop=True)
        starv_summary = f_starv_s.result().sort_values(
            ["total_delay_s", "srv"], ascending=[False, True]
        ).reset_index(drop=True)
        oom = f_oom.result().sort_values(["srv", "dt"]).reset_index(drop=True)
        filt = f_filt.result().sort_values(["srv", "msg"]).reset_index(drop=True)

    # hung threads: details + per-server nhtc/mhtc/rhtc
    HUNG_COLS = ["line_id", "srv", "dt", "tm", "tz", "hr", "woct", "thid",
                 "htm_s", "chtc", "sts"]
    hung_detail = _df(hung, HUNG_COLS).sort_values(
        ["srv", "dt", "line_id"]).reset_index(drop=True)
    if len(hung_detail):
        only_hung = hung.map_batches(
            lambda t: t.filter(pc.equal(t["sts"], "Hung")),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        nh = grouped_stats(
            only_hung, ["srv"], "chtc", count="nhtc", max_="mhtc"
        ).to_pandas()
        last = argmax_by(
            hung.select_columns(["srv", "line_id", "chtc"]),
            ["srv"], ["line_id"], [True],
        ).to_pandas()[["srv", "chtc"]].rename(columns={"chtc": "rhtc"})
        hung_summary = nh.merge(last, on="srv", how="left").sort_values(
            "srv").reset_index(drop=True)
    else:
        hung_summary = pd.DataFrame(columns=["srv", "nhtc", "mhtc", "rhtc"])

    # transaction timeouts: correlated pairs + per-JVM counts
    tto_detail = _df(
        tto, ["line_id", "srv", "thread", "tran_id", "timeout_s",
              "declare_line"],
    ).sort_values(["srv", "line_id"]).reset_index(drop=True)
    tto_by_jvm = _df(
        grouped_count(tto, ["srv"], alias="cnt"), ["srv", "cnt"]
    ).sort_values("srv").reset_index(drop=True)

    if out_dir is not None:
        # the standalone full-ranking CSVs + the filtered-error detail file
        # (websphereLogParser.sh:56-64,867-874) — written from the SAME
        # materialized count Datasets the top-10s are cut from
        write_was_rank_csvs(
            {"component": cmp_counts, "cls": cls_counts,
             "exp": exp_counts, "msg": msg_counts}, out_dir)
        write_was_filtered_detail(parsed, out_dir)

    tables = {
        "srv_evt": srv_evt,
        "top_err_cmp": _top10(cmp_counts, "component", ["E", "F"]),
        "top_warn_cmp": _top10(cmp_counts, "component", ["W"]),
        "top_err_cls": _top10(cls_counts, "cls", ["E", "F"]),
        "top_warn_cls": _top10(cls_counts, "cls", ["W"]),
        "top_err_exp": _top10(exp_counts, "exp", ["E", "F"]),
        "top_warn_exp": _top10(exp_counts, "exp", ["W"]),
        "top_err_msg": _top10(msg_counts, "msg", ["E", "F"]),
        "top_warn_msg": _top10(msg_counts, "msg", ["W"]),
        "hung_detail": hung_detail,
        "hung_summary": hung_summary,
        "tto_detail": tto_detail,
        "tto_by_jvm": tto_by_jvm,
        "starv_detail": starv_detail,
        "starv_summary": starv_summary,
        "oom": oom,
        "filtered": filt,
    }

    # per-family threshold alerts (websphereLogParser.sh:345-379,416-439)
    alerts = []
    for evt, prop in (("E", "wasECntTh"), ("W", "wasWCntTh"), ("F", "wasFCntTh")):
        sub = srv_evt[srv_evt["evt_type"] == evt]
        alerts.append(_prefix_alerts(sub, family="was", prop=prop,
                                     key_col="srv", value_col="cnt"))
    alerts.append(_prefix_alerts(tto_by_jvm, family="was",
                                 prop="wasTranTmOutCntTh",
                                 key_col="srv", value_col="cnt"))
    if len(starv_summary):
        alerts.append(_prefix_alerts(starv_summary, family="was",
                                     prop="wasCPUStarvCntTh",
                                     key_col="srv", value_col="n"))
    if len(hung_summary):
        alerts.append(_prefix_alerts(hung_summary, family="was",
                                     prop="wasHungThrdCntTh",
                                     key_col="srv", value_col="mhtc"))
    if len(filt):
        # every filtered/critical hit alerts unconditionally, like the
        # reference's per-entry alrtF line (websphereLogParser.sh:645-648)
        alerts.append(pd.DataFrame({
            "rule": "was.filter.criticalError",
            "key": filt["srv"].astype(str) + " | " + filt["msg"].astype(str),
            "value": filt["cnt"].astype(float),
            "threshold": 0.0,
        }))
    nonempty = [a for a in alerts if len(a)]
    tables["alerts"] = (
        pd.concat(nonempty, ignore_index=True)
        if nonempty
        else pd.DataFrame(columns=["rule", "key", "value", "threshold"])
    )
    return tables


def _legend(entries: list[tuple[str, str]], width: int = 5) -> list[str]:
    """The goldens' abbreviation glossary block (every sample report opens
    with one — sample_reports/0{1,2,3,4}_*.txt)."""
    lines = ["===== Summary table contains short heading title. See below "
             "for their description ====="]
    lines += [f"{k:<{width}}\t: {v}" for k, v in entries]
    lines += [BAR, ""]
    return lines


_WAS_LEGEND = [
    ("hr", "Hour"), ("date", "Date"), ("time", "Time"), ("tz", "Time Zone"),
    ("woct", "Web or ORB Container Thread"),
    ("awoct", "Affected Web or ORB Container Thread(s), may be because of "
              "CPU Starvation scheduling dealy"),
    ("thid", "Thread ID"), ("uid", "User ID"), ("js", "jSession"),
    ("rt", "Response Time in Second"),
    ("dly", "Delay in second, may be because of CPU Starvation or other "
            "causes."),
    ("tdly", "Total Delay in second, may be because of CPU Starvation or "
             "other causes."),
    ("ttov", "Transaction TimeOut Value."),
    ("htm", "Hung Thread Hung time in second"),
    ("chtc", "Current Hung Thread Count"),
    ("nhtc", "Number of NEW Hung Thread Count"),
    ("mhtc", "Maximum number of Hung Thread Count"),
    ("rhtc", "Remaining number of Hung Thread Count"),
    ("cnt", "(Any) Count like jSession count, User count etc."),
    ("trn", "Transaction"), ("tid", "Transaction ID"),
    ("sts", "Status - Transaction or any status in context"),
    ("pc", "(Any) Count or measure represented in Percentage"),
    ("jvm", "Java Virtual Machine, may be interchangeably used with was or "
            "srv in reports."),
    ("was", "WebSphere Application Server"),
    ("srv", "server - like web server(IHS), App Server etc."),
    ("cmp", "Component"), ("fnc", "function"), ("exp", "Exception"),
    ("evt", "Event Type like WARNING, ERROR, FATAL etc."),
    ("msg", "Message"), ("lmdl", "Log module"),
]


def render_was_summary(t: dict, *, record_date: str = "",
                       out_dir: str = "") -> str:
    """The reference's 01_WASLogSummaryRpt.txt layout over the collected
    tables (sample_reports/01_*.txt; printf widths re-derived)."""
    out = [BAR, "===== WAS log analysis report =====",
           f"===== based on SystemOut logs dated: {record_date}  =====",
           BAR, ""]
    out += _legend(_WAS_LEGEND)

    if len(t["hung_detail"]):
        out += [BAR, "===== Hung Thread Details =====", BAR, ""]
        out.append("was            \tdate      \ttime        \ttz \thr\twoct\tthid      \t      htm\t chtc\tsts     ")
        for _, r in t["hung_detail"].iterrows():
            out.append(
                f"{r['srv']:<15}\t{r['dt']:<10}\t{r['tm']:<12}\t{r['tz']:<3}\t"
                f"{r['hr']:<2}\t{r['woct']:<3}\t{r['thid']:<10}\t"
                f"{r['htm_s']:>9.3f}\t{int(r['chtc']):>5}\t{r['sts']:<8}"
            )
        out += ["", BAR, "===== Hung Thread Summary By Server =====", BAR, ""]
        out.append("was            \tnhtc\tmhtc\trhtc")
        for _, r in t["hung_summary"].iterrows():
            out.append(
                f"{r['srv']:<15}\t{int(r['nhtc']):>4}\t{int(r['mhtc']):>4}\t"
                f"{int(r['rhtc']):>4}"
            )
        out.append(BAR)
        out.append(f"Total New Hung Threads in the system: {int(t['hung_summary']['nhtc'].sum())}")
        out.append(f"Total Max Hung Threads in the system: {int(t['hung_summary']['mhtc'].sum())}")
        out.append(f"Total Hung Threads still remaining in the system: {int(t['hung_summary']['rhtc'].sum())}")
        out.append("")

    if len(t["tto_detail"]):
        out += [BAR, "===== Transaction Timeout =====", BAR, ""]
        out.append("was            \tthid    \tttov \ttid")
        for _, r in t["tto_detail"].iterrows():
            # a completion with no prior declare prints blanks, like the
            # reference's empty arrTto[key] lookup
            ttov = "" if pd.isna(r["timeout_s"]) else f"{int(r['timeout_s'])}"
            tid = "" if pd.isna(r["tran_id"]) else str(r["tran_id"])
            out.append(
                f"{r['srv']:<15}\t{r['thread']:<8}\t{ttov:<5}\t{tid}"
            )
        out += ["", "Transaction timeout by JVM:"]
        for _, r in t["tto_by_jvm"].iterrows():
            out.append(f"{r['srv']}:{int(r['cnt'])}")
        out.append("")
        out.append(
            f"total Transaction timeout on all JVMs:{int(t['tto_by_jvm']['cnt'].sum())}"
        )
        out.append("")

    if len(t["starv_detail"]):
        out += [BAR, "===== CPU Starvation Warnings =====", BAR, ""]
        out.append("was            \tdate      \ttime        \ttz \t  dly")
        for _, r in t["starv_detail"].iterrows():
            out.append(
                f"{r['srv']:<15}\t{r['dt']:<10}\t{r['tm']:<12}\t{r['tz']:<3}\t"
                f"{r['dly']:5.3f}"
            )
        out += ["", "Summary of Scheduling delays:", ""]
        out.append("was            \tcnt\ttdly ")
        for _, r in t["starv_summary"].iterrows():
            out.append(
                f"{r['srv']:<15}\t{int(r['n']):<3}\t{float(r['total_delay_s']):.3f}"
            )
        out.append("")

    if len(t["oom"]):
        out += [BAR, "===== Out of Memory Error =====", BAR, ""]
        out.append("was            \tdate      \tthid    \tcmp          \tmsg")
        for _, r in t["oom"].iterrows():
            out.append(
                f"{r['srv']:<15}\t{r['dt']:<10}\t{r['thread']:<8}\t"
                f"{r['component']:<13}\t{r['msg']}"
            )
        out.append("")

    if len(t["filtered"]):
        out += [BAR, "===== Critical or Filtere Error Summary =====", BAR, ""]
        out.append("was            \t    cnt\tmsg")
        for _, r in t["filtered"].iterrows():
            out.append(f"{r['srv']:<15}\t{int(r['cnt']):>7}\t{r['msg']}")
        out.append(
            "Total critical or filtered error for all servers:"
            f"{int(t['filtered']['cnt'].sum())}"
        )
        out.append("")

    out += [BAR, "===== Summary of Error and Warning count by Server =====",
            BAR, ""]
    out.append("was            \tevt\t   cnt")
    for _, r in t["srv_evt"].iterrows():
        out.append(f"{r['srv']:<15}\t{r['evt_type']:<3}\t{int(r['cnt']):>6}")
    out.append(f"Total for all servers:{int(t['srv_evt']['cnt'].sum())}")
    out.append("")

    def dim_section(title: str, df: pd.DataFrame, dim: str,
                    order=("cmp_first",), review: tuple[str, str] | None = None):
        out.append(BAR)
        out.append(f"===== {title} =====")
        if review is not None:
            # the golden's pointer at the standalone full-ranking CSV
            # (websphereLogParser.sh:679,703,727,...)
            import os as _os

            fname, what = review
            path = _os.path.join(out_dir, fname) if out_dir else fname
            out.append(f"===== Review file: {path} for {what} =====")
        out.append(BAR)
        out.append("")
        if order == "cnt_first":
            out.append("   cnt\tevt\tmsg                      ")
            for _, r in df.iterrows():
                out.append(f"{int(r['cnt']):>6}\t{r['evt_type']:<3}\t{r[dim]}")
        else:
            out.append("cmp                      \tevt\t   cnt")
            for _, r in df.iterrows():
                out.append(f"{r[dim]:<25}\t{r['evt_type']:<3}\t{int(r['cnt']):>6}")
        out.append("")

    dim_section("Summary of (Top 10 by total count) ERROR and FATAL events by component",
                t["top_err_cmp"], "component",
                review=("WASLogSummaryByErrCmpRpt.csv",
                        "all Errors and Fatal events"))
    dim_section("Summary of (Top 10 by total count) WARN events by component",
                t["top_warn_cmp"], "component",
                review=("WASLogSummaryByWarnCmpRpt.csv",
                        "all Errors and Fatal events"))
    dim_section("Summary of Top 10 by total count) Error and Fatal events by Error class",
                t["top_err_cls"], "cls",
                review=("WASLogSummaryByErrClassRpt.csv",
                        "all Error and Fatal events by Error class"))
    dim_section("Summary of Top 10 (by total count) WARN events by WARN class",
                t["top_warn_cls"], "cls",
                review=("WASLogSummaryByWarnClassRpt.csv",
                        "all WARN events by WARN class"))
    dim_section("Summary of Top 10 (by total count) Error and Fatal events by Exception",
                t["top_err_exp"], "exp",
                review=("WASLogSummaryByErrExpRpt.csv",
                        "all Error and Fatal events by Exception"))
    dim_section("Summary of Top 10 (by total count) WARN events by Exception",
                t["top_warn_exp"], "exp",
                review=("WASLogSummaryByWarnExpRpt.csv",
                        "all WARN events by Exception"))
    dim_section("Summary of Top 10 (by total count) ERROR and FATAL events by Message",
                t["top_err_msg"], "msg", order="cnt_first",
                review=("WASLogSummaryByErrMsgRpt.csv",
                        "all ERROR and FATAL events by Message"))
    dim_section("Summary of Top 10 (by total count) WARN events by Message",
                t["top_warn_msg"], "msg", order="cnt_first",
                review=("WASLogSummaryByWarnMsgRpt.csv",
                        "all WARN events by Message"))
    return "\n".join(out)


# ---------------------------------------------------------------------------
# 04 GC summary


def gc_summary_tables(
    gc_rows: "ray.data.Dataset | None",
    inv_rows: "ray.data.Dataset | None",
) -> dict:
    """Per-(jvm, date) × type aggregate + last record per JVM + alerts.

    ``gc_rows`` = parse_gc_lines output (single-line grammar, no timestamp →
    date 'NA'); ``inv_rows`` = parse_gc_invocations output (multi-line
    PrintHeapAtGC blocks with dt/tm). Either may be None/empty."""
    from log_parser_ray.stages.aggregate import conform_schema

    # drop Ray's schema-less empty blocks before the collect edges
    if gc_rows is not None:
        gc_rows = conform_schema(gc_rows, pa.schema([("jvm", pa.string())]))
        if gc_rows.count() == 0:
            gc_rows = None
    if inv_rows is not None:
        inv_rows = conform_schema(inv_rows, pa.schema([("jvm", pa.string())]))
        if inv_rows.count() == 0:
            inv_rows = None
    parts = []
    if gc_rows is not None:
        def norm_single(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "jvm": t["jvm"],
                    "dt": pa.array(["NA"] * t.num_rows, pa.string()),
                    "is_full": pc.not_equal(t["gc_type"], "GC"),
                    "real_s": pc.divide(
                        pc.cast(t["pause_us"], pa.float64()), 1e6
                    ),
                }
            )

        parts.append(gc_rows.map_batches(
            norm_single, batch_format="pyarrow", zero_copy_batch=True))
    if inv_rows is not None:
        def norm_inv(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "jvm": t["jvm"],
                    "dt": t["dt"],
                    "is_full": pc.not_equal(t["gc_type"], "GC"),
                    "real_s": pc.divide(
                        pc.cast(t["real_us"], pa.float64()), 1e6
                    ),
                }
            )

        parts.append(inv_rows.map_batches(
            norm_inv, batch_format="pyarrow", zero_copy_batch=True))
    if not parts:
        return {"daily": pd.DataFrame(), "last": pd.DataFrame(),
                "alerts": pd.DataFrame(columns=["rule", "key", "value", "threshold"])}
    uni = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

    def split_kind(t: pa.Table) -> pa.Table:
        f = pc.cast(t["is_full"], pa.int64())
        mn = pc.subtract(1, f)
        return pa.table(
            {
                "jvm": t["jvm"], "dt": t["dt"],
                "gccnt": mn, "fgccnt": f,
                "rt_gc": pc.multiply(t["real_s"], pc.cast(mn, pa.float64())),
                "rt_fgc": pc.multiply(t["real_s"], pc.cast(f, pa.float64())),
            }
        )

    wide = uni.map_batches(split_kind, batch_format="pyarrow", zero_copy_batch=True)
    # ONE shared shuffle for all four sums (weblog's fused-hourly pattern)
    from log_parser_ray.stages.aggregate import (
        COMBINE_ROWS,
        _mb,
        _partial,
        sorted_combine,
    )

    aggs = [("gccnt", "sum"), ("fgccnt", "sum"),
            ("rt_gc", "sum"), ("rt_fgc", "sum")]
    part = _mb(wide, _partial(["jvm", "dt"], aggs), batch_size=COMBINE_ROWS)
    daily = sorted_combine(
        part, ["jvm", "dt"],
        [("gccnt_sum", "sum"), ("fgccnt_sum", "sum"),
         ("rt_gc_sum", "sum"), ("rt_fgc_sum", "sum")],
        renames={"gccnt_sum_sum": "gccnt", "fgccnt_sum_sum": "fgccnt",
                 "rt_gc_sum_sum": "trtgc", "rt_fgc_sum_sum": "trtfgc"},
        keep=["jvm", "dt", "gccnt", "fgccnt", "trtgc", "trtfgc"],
    ).to_pandas()
    daily["tgccnt"] = daily["gccnt"] + daily["fgccnt"]
    daily["trt"] = (daily["trtgc"] + daily["trtfgc"]).round(3)
    daily["artgc"] = (daily["trtgc"] / daily["gccnt"].where(daily["gccnt"] > 0)).fillna(0.0).round(3)
    daily["artfgc"] = (daily["trtfgc"] / daily["fgccnt"].where(daily["fgccnt"] > 0)).fillna(0.0).round(3)
    daily["trtgc"] = daily["trtgc"].round(3)
    daily["trtfgc"] = daily["trtfgc"].round(3)
    daily = daily[["jvm", "dt", "artgc", "artfgc", "trtgc", "trtfgc", "trt",
                   "gccnt", "fgccnt", "tgccnt"]].sort_values(
        ["jvm", "dt"]).reset_index(drop=True)

    # last verbose-GC record per JVM (javaGCStatsParser.sh:556-622 renders
    # the carried-forward last row per JVM) — argmax on (dt, tm)
    if inv_rows is not None:
        inv = inv_rows.materialize()
        last = (
            argmax_by(inv, ["jvm"], ["dt", "tm"], [True, True]).to_pandas()
            .sort_values("jvm").reset_index(drop=True)
            if inv.count() > 0 else pd.DataFrame()
        )
    else:
        last = pd.DataFrame()

    # alerts: daily minor/full counts + old-gen-used-after full GC
    alerts = [
        _prefix_alerts(daily, family="jvm", prop="gcDlyCountTh",
                       key_col="jvm", value_col="gccnt"),
        _prefix_alerts(daily, family="jvm", prop="fgcDlyCountTh",
                       key_col="jvm", value_col="fgccnt"),
    ]
    if len(last):
        alerts.append(_prefix_alerts(
            last.rename(columns={"old_after_k": "ogua"}),
            family="jvm", prop="fgcOldGenAfTh", key_col="jvm",
            value_col="ogua"))
    nonempty = [a for a in alerts if len(a)]
    return {
        "daily": daily,
        "last": last,
        "alerts": (
            pd.concat(nonempty, ignore_index=True)
            if nonempty
            else pd.DataFrame(columns=["rule", "key", "value", "threshold"])
        ),
    }


def render_gc_summary(t: dict, *, record_date: str = "") -> str:
    """04_GCSummaryRpt.txt layout (golden sample_reports/04_*.txt)."""
    out = [BAR, "===== Verbose GC analysis report =====",
           f"===== based on native_stdout.log dated: {record_date}  =====",
           BAR, ""]
    out += _legend([
        ("date", "Date"), ("time", "Time"), ("tz", "Time Zone"),
        ("jvm", "Java Virtual Machine, may be interchangeably used with "
                "was or srv in reports."),
        ("artgc", "Average Real Time for Minor GC"),
        ("artfgc", "Average Real Time for Full or Major GC"),
        ("trtgc", "Total Real Time for Minor GC"),
        ("trtfgc", "Total Real Time for Full or Major GC"),
        ("rt", "Real Time for GC or Full or Major GC"),
        ("trt", "Total Real Time - includes both Minor GC and Major GC"),
        ("gccnt", "Total Minor GC count for a given period (date)"),
        ("gccntsr", "Total Minor GC count since restart of JVM"),
        ("fgccnt", "Total Full or Major GC count for a given period (date)"),
        ("fgccntsr", "Total Full or Major GC count since restart of JVM"),
        ("tgccnt", "Total All (Minor GC plus Major GC) count for a given "
                   "period (date)"),
        ("tgccntsr", "Total All (Minor GC plus Major GC) count since "
                     "restart of JVM"),
        ("gctp", "Garbage Collection (GC) Type - (Minor)GC or FULLGC"),
        ("ygub(K)", "Young Generation Used Before GC (K)"),
        ("ygua(K)", "Young Generation Used After GC (K)"),
        ("ygdf(K)", "Young Generation Difference Before and After GC"),
        ("ygta(K)", "Young Generation Total Allocated  After GC"),
        ("ygua%", "Young Generation Used Percentage After GC"),
        ("ogub(K)", "Old Generation Used Before GC (K)"),
        ("ogua(K)", "Old Generation Used After GC (K)"),
        ("ogdf(K)", "Old Generation Difference Before and After GC"),
        ("ogta(K)", "Old Generation Total Allocated  After GC"),
        ("ogua%", "Old Generation Used Percentage After GC"),
    ], width=8)
    out.append(
        "jvm            \tdate      \t  artgc\t artfgc\t  trtgc\t    trtfgc\t       trt\tgccnt\tfgccnt\ttgccnt"
    )
    for _, r in t["daily"].iterrows():
        out.append(
            f"{r['jvm']:<15}\t{r['dt']:<10}\t{r['artgc']:>7.3f}\t"
            f"{r['artfgc']:>7.3f}\t{r['trtgc']:>7.3f}\t{r['trtfgc']:>10.3f}\t"
            f"{r['trt']:>10.3f}\t{int(r['gccnt']):>4}\t{int(r['fgccnt']):>4}\t"
            f"{int(r['tgccnt']):>4}"
        )
    out.append("")
    if len(t["last"]):
        out += ["", "", "========= Last Verbose GC  record for each JVM "
                        "parsed and extracted from native_stdout.log =========", ""]
        out.append(
            "jvm            \tgctp\tdate      \ttime        \ttz   \t"
            "   ygub(K)\t   ygua(K)\t   ygta(K)\t  ygua%\t"
            "   ogub(K)\t   ogua(K)\t   ogta(K)\t  ogua%\t"
            "   pgub(K)\t   pgua(K)\t   pgta(K)\t  pgua%\t"
            "   hgub(K)\t   hgua(K)\t   hgta(K)\t  hgua%\t"
            "rt(sec)\tgccntsr\tfgccntsr\ttgccntsr"
        )
        for _, r in t["last"].iterrows():
            gctp = "GC" if r["gc_type"] == "GC" else "FULLGC"
            out.append(
                f"{r['jvm']:<15}\t{gctp:<4}\t{r['dt']:<10}\t{r['tm']:<12}\t"
                f"{r['tz']:<5}\t"
                f"{int(r['yng_before_k']):>10}\t{int(r['yng_after_k']):>10}\t"
                f"{int(r['yng_total_k']):>10}\t{r['yng_pct']:>7.3f}\t"
                f"{int(r['old_before_k']):>10}\t{int(r['old_after_k']):>10}\t"
                f"{int(r['old_total_k']):>10}\t{r['old_pct']:>7.3f}\t"
                f"{int(r['perm_before_k']):>10}\t{int(r['perm_after_k']):>10}\t"
                f"{int(r['perm_total_k']):>10}\t{r['perm_pct']:>7.3f}\t"
                f"{int(r['heap_before_k']):>10}\t{int(r['heap_after_k']):>10}\t"
                f"{int(r['heap_total_k']):>10}\t{r['heap_pct']:>7.3f}\t"
                f"{r['real_us'] / 1e6:.3f}\t{int(r['gcs']):>5}\t"
                f"{int(r['fgcs']):>5}\t{int(r['all_gcs']):>5}"
            )
        out.append("")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# 03 Http Error log summary


def error_summary_tables(parsed: "ray.data.Dataset") -> dict:
    """03-report tables (webErrorLogParser.sh:321-347 accumulators): error
    count by web server, by error detail, by referrer — all two-phase
    grouped counts; ranked collects happen at the report edge."""
    from log_parser_ray.stages.errorlog import referrer_error_ranking

    parsed = parsed.materialize()
    by_ws = _df(
        grouped_count(parsed, ["srv"], alias="cnt"), ["srv", "cnt"]
    ).sort_values("srv").reset_index(drop=True)

    def det(t: pa.Table) -> pa.Table:
        return pa.table(
            {"err": pc.binary_join_element_wise(t["evt_type"], t["err"], " : ")}
        )

    by_err = _df(
        grouped_count(
            parsed.map_batches(det, batch_format="pyarrow", zero_copy_batch=True),
            ["err"], alias="cnt",
        ),
        ["err", "cnt"],
    ).sort_values(["cnt", "err"], ascending=[False, True]).reset_index(drop=True)
    by_ref = _df(
        referrer_error_ranking(parsed), ["referrer", "err_det", "n"]
    ).reset_index(drop=True)

    alerts = _prefix_alerts(by_ws, family="http", prop="httpErrorCountTh",
                            key_col="srv", value_col="cnt")
    return {"by_ws": by_ws, "by_err": by_err, "by_ref": by_ref,
            "alerts": alerts}


def render_error_summary(t: dict, *, record_date: str = "") -> str:
    """03_WebErrorLogSummaryRpt.txt layout (golden sample_reports/03_*.txt)."""
    out = [BAR, "===== Http Error log analysis report =====",
           f"===== based on error logs dated: {record_date}  =====", BAR, ""]
    out += _legend([
        ("hr", "Hour"), ("date", "Date"), ("time", "Time"),
        ("rdy", "Ready thread(s)"), ("bsy", "Busy threads(s)"),
        ("rd", "Read - number of threads currently reading request from "
               "user"),
        ("wr", "Write - number of threads currently writing or "
               "communicating to App Server or back-end"),
        ("ka", "Keep Alive - number of threads holding keep alive session"),
        ("log", "Log - number of threads busy in logging"),
        ("dns", "DNS - number of threads busy in DNS related activities"),
        ("cls", "CLS - number of threads busy in house cleaning related "
                "activities"),
        ("mwas", "Number of threads busy with mod_was_ap22_http.c"),
        ("mwgt", "Number of threads busy with apache2entry_web_gate.cpp"),
        ("was", "WebSphere Application Server or App Server"),
        ("ws", "Web Server like Apache or IBM HTTP Server (IHS)"),
        ("req", "HTTP Request like GET, POST etc."),
        ("rsp", "HTTP Response code like 200, 400 etc."),
        ("err", "Error message"), ("dtl", "Detail - detail message"),
        ("ref", "Http referrer"),
        ("cnt", "(Any) Count like jSession count, User count etc."),
        ("url", "URL"),
    ])
    out += [BAR, "===== Http Error Count by Web Server =====", BAR, ""]
    out.append("ws            cnt")
    for _, r in t["by_ws"].iterrows():
        out.append(f"{r['srv']:<10} \t{int(r['cnt']):>5}")
    out.append(f"Total http error count: {int(t['by_ws']['cnt'].sum())}")
    out += ["", BAR, "===== Http Error Count by Http Error Detail =====",
            BAR, ""]
    out.append("cnt  \terr                                               ")
    for _, r in t["by_err"].iterrows():
        out.append(f"{int(r['cnt']):>5}\t{r['err']:<50}")
    out += ["", BAR, "===== Http Error Count by Http Referrer =====", BAR, ""]
    out.append("cnt  \tref                                               \tdtl")
    for _, r in t["by_ref"].iterrows():
        out.append(f"{int(r['n']):>5}\t{r['referrer']:<50}\t{r['err_det']}")
    out.append("")
    return "\n".join(out)


def global_http_alerts(totals: dict) -> pd.DataFrame:
    """The five GLOBAL http daily rules (thresholdValues.csv target 'http';
    webAccessLogParser.sh alert rows) evaluated on day totals — the ONE
    shared implementation for the weblog pipeline and the oracle-checked
    query, so the rule arithmetic cannot drift: values are rounded 6dp
    (round-half-even, matching the SQL twin's round_even) BEFORE the
    threshold compare, and an unknown rule name raises (a typo must not
    silently disable an alert).

    ``totals`` keys: n_ok, n_app, sum_rt_app (µs), n_1s, n_over, n_400,
    n_disc."""
    rows = []

    def rule(prop: str, value: float, *, below: bool = False) -> None:
        th = FAMILY_THRESHOLDS[f"http.{prop}"]
        if (value < th) if below else (value > th):
            rows.append({"rule": f"http.{prop}", "key": "all",
                         "value": float(value), "threshold": float(th)})

    if totals["n_app"]:
        rule("httpAvgRespTimeTh",
             round(totals["sum_rt_app"] / totals["n_app"] / 1e6, 6))
    if totals["n_ok"]:
        rule("httpDly1SecRangeTh",
             round(100.0 * totals["n_1s"] / totals["n_ok"], 6), below=True)
        rule("httpDly20SecRangeTh",
             round(100.0 * totals["n_over"] / totals["n_ok"], 6))
        rule("http400PlusRespCountTh",
             round(100.0 * totals["n_400"] / totals["n_ok"], 6))
    rule("httpDiscRcdCountTh", float(totals["n_disc"]))
    return (
        pd.DataFrame(rows, columns=["rule", "key", "value", "threshold"])
        .sort_values("rule")
        .reset_index(drop=True)
    )
