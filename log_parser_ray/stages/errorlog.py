"""Apache/IHS error-log + mpmstats parse pack (M14–M16, J3, A19, AG2).

The reference's webErrorLogParser.sh handles two line families:

* error lines  `[Sun Jun 14 00:00:48 2015] [error] [client 10.0.0.9] File
  does not exist: …, referer: http://…` — split on `"] "`, extracting date
  parts, event type, client, error text and referrer
  (webErrorLogParser.sh:148-154,254-268)
* mpmstats     `… mpmstats: rdy 50 bsy 10 rd 1 wr 5 ka 3 log 0 dns 0 cls 1`
  (8 k/v counters, :157-171) and the bsy-by-plugin continuation
  `… bsy: 5 in mod_was_ap22_http.c, 3 in mod_webgate.c` (:192-232,
  order-insensitive plugin match, absent → 0), joined per exact
  (server, date, time) key with LEFT semantics (:171,232,280-288 — J3).

Vectorized Arrow RE2 throughout; the synthesizer composes real-format lines
from the shared events table and ``ERROR_TRUTH_CTE`` derives ground truth
directly from events, so every operator is oracle-checkable.

Synthesis grammar per event (eid = event_id, uidn = user_id):
  srv = 'ihs' || uidn%4
  eid%2==0 → error line, evtType = 'error' if eid%4==0 else 'warn',
             client 10.0.<uidn%256>.<eid%256>, err 'E<eid%50>: lookup failed',
             referer 'http://site/p<eid%20>'
  eid%2==1 → mpmstats rdy line with counters rdy=eid%50 bsy=eid%20 rd=eid%5
             wr=eid%7 ka=eid%3 log=eid%2 dns=eid%11 cls=eid%13;
             PLUS (same srv/ts) a bsy-by-plugin line when eid%3!=0 with
             was_bsy=eid%6, wbg_bsy=eid%4 — eid%3==0 exercises the
             absent-side → 0 left-join case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

ERROR_RE = (
    r"^(?P<srv>\S+) \[(?P<dtm>[^\]]+)\] \[(?P<evt>\w+)\] "
    r"\[client (?P<client>[\d.]+)\] (?P<err>[^,]+), referer: (?P<ref>\S+)$"
)
RDY_RE = (
    r"^(?P<srv>\S+) \[(?P<dtm>[^\]]+)\] \[notice\] mpmstats: "
    r"rdy (?P<rdy>\d+) bsy (?P<bsy>\d+) rd (?P<rd>\d+) wr (?P<wr>\d+) "
    r"ka (?P<ka>\d+) log (?P<log>\d+) dns (?P<dns>\d+) cls (?P<cls>\d+)$"
)
# order-insensitive plugin extraction (webErrorLogParser.sh:192-232)
BSY_LINE_RE = r"^(?P<srv>\S+) \[(?P<dtm>[^\]]+)\] \[notice\] bsy: (?P<body>.*)$"
WAS_BSY_RE = r"(?P<v>\d+) in mod_was_ap22_http\.c"
WBG_BSY_RE = r"(?P<v>\d+) in mod_webgate\.c"
# IHS restart marker (webErrorLogParser.sh:248-253: alert line + the
# RecycleHistoryRpt_all.csv date|srv daily row)
RECYCLE_RE = (
    r"^(?P<srv>\S+) \[(?P<dtm>[^\]]+)\] \[notice\] IBM_HTTP_Server\S* "
    r".*configured -- resuming normal operations$"
)


def _compose(batch: pa.Table) -> pa.Table:
    eid = batch["event_id"].to_numpy()
    uidn = batch["user_id"].to_numpy()

    ts_s = pc.cast(pc.floor_temporal(batch["ts"], unit="second"), pa.timestamp("s"))
    dtm = pc.strftime(ts_s, format="%a %b %d %H:%M:%S %Y")

    def istr(a):
        return pc.cast(pa.array(a), pa.string())

    def j(*parts):
        return pc.binary_join_element_wise(*parts, "")

    srv = j("ihs", istr(uidn % 4))
    is_err = eid % 2 == 0
    evt = pc.if_else(pa.array(eid % 4 == 0), "error", "warn")
    client = j("10.0.", istr(uidn % 256), ".", istr(eid % 256))

    err_line = j(
        srv, " [", dtm, "] [", evt, "] [client ", client, "] E",
        istr(eid % 50), ": lookup failed, referer: http://site/p",
        istr(eid % 20),
    )
    rdy_line = j(
        srv, " [", dtm, "] [notice] mpmstats: rdy ", istr(eid % 50),
        " bsy ", istr(eid % 20), " rd ", istr(eid % 5), " wr ", istr(eid % 7),
        " ka ", istr(eid % 3), " log ", istr(eid % 2), " dns ", istr(eid % 11),
        " cls ", istr(eid % 13),
    )
    line = pc.if_else(pa.array(is_err), err_line, rdy_line)
    main = pa.table({"line_id": pa.array(eid * 2, pa.int64()), "text": line})

    # bsy continuation lines (plugin order varies with (eid//2)%2 —
    # matching must be order-insensitive); only for mpm rows with eid%3!=0
    # (eid%3==0 exercises the absent-side → 0 left-join case)
    has_bsy = (~is_err) & (eid % 3 != 0)
    bi = eid[has_bsy]
    a_part = pc.binary_join_element_wise(
        istr(bi % 6), " in mod_was_ap22_http.c", ""
    )
    b_part = pc.binary_join_element_wise(istr(bi % 4), " in mod_webgate.c", "")
    a_first = pa.array((bi // 2) % 2 == 0)
    body = pc.if_else(
        a_first,
        pc.binary_join_element_wise(a_part, b_part, ", "),
        pc.binary_join_element_wise(b_part, a_part, ", "),
    )
    mask_bsy = pa.array(has_bsy)
    bsy_line = j(
        srv.filter(mask_bsy), " [", dtm.filter(mask_bsy),
        "] [notice] bsy: ", body
    )
    bsy = pa.table(
        {"line_id": pa.array(bi * 2 + 1, pa.int64()), "text": bsy_line}
    )

    # occasional IHS restart notices (the err branch leaves eid*2+1 free)
    has_rcy = is_err & (eid % 40 == 0)
    ri = eid[has_rcy]
    mask_rcy = pa.array(has_rcy)
    rcy_line = j(
        srv.filter(mask_rcy), " [", dtm.filter(mask_rcy),
        "] [notice] IBM_HTTP_Server/8.5.5.0 (Unix) configured -- "
        "resuming normal operations",
    )
    rcy = pa.table(
        {"line_id": pa.array(ri * 2 + 1, pa.int64()), "text": rcy_line}
    )
    return pa.concat_tables([main, bsy, rcy])


def synth_error_lines(sf_dir: str) -> "ray.data.Dataset":
    """events.parquet → (line_id, text) error_log-format lines."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return ds.map_batches(
        _compose, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768
    )


def _err_extract(t: pa.Table) -> pa.Table:
    m = pc.extract_regex(t["text"], ERROR_RE)
    sub = t.filter(pc.is_valid(m))
    ms = pc.extract_regex(sub["text"], ERROR_RE)

    def f(n):
        return pc.struct_field(ms, n)

    return pa.table(
        {
            "line_id": sub["line_id"],
            "srv": f("srv"),
            "dtm": f("dtm"),
            "evt_type": f("evt"),
            "client": f("client"),
            "err": f("err"),
            "referrer": f("ref"),
        }
    )


def parse_error_lines(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """M14: error lines → (line_id, srv, dtm, evt_type, client, err, referrer)."""
    return ds.map_batches(_err_extract, batch_format="pyarrow", zero_copy_batch=True)


def referrer_error_ranking(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """K8: error count per (referrer, 'evtType : err') detail, ranked
    descending — the reference's errCntByRef accumulator
    (webErrorLogParser.sh:321,341-347). Two-phase grouped count; the final
    sort ranges over the (small) aggregate only."""
    from log_parser_ray.stages.aggregate import grouped_count

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "referrer": t["referrer"],
                "err_det": pc.binary_join_element_wise(
                    t["evt_type"], t["err"], " : "
                ),
            }
        )

    counts = grouped_count(
        parsed.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["referrer", "err_det"],
        alias="n",
    )
    return counts.sort(["n", "referrer", "err_det"], descending=[True, False, False])


_MPM_COUNTERS = ("rdy", "bsy", "rd", "wr", "ka", "log", "dns", "cls")

_RDY_SCHEMA = pa.schema(
    [("line_id", pa.int64()), ("srv", pa.string()), ("dtm", pa.string())]
    + [(c, pa.int64()) for c in _MPM_COUNTERS]
)
_BSY_SCHEMA = pa.schema(
    [("srv", pa.string()), ("dtm", pa.string()),
     ("was_bsy", pa.int64()), ("wbg_bsy", pa.int64())]
)


def _rdy_extract(t: pa.Table) -> pa.Table:
    m = pc.extract_regex(t["text"], RDY_RE)
    sub = t.filter(pc.is_valid(m))
    ms = pc.extract_regex(sub["text"], RDY_RE)

    def f(n):
        return pc.struct_field(ms, n)

    cols = {"line_id": sub["line_id"], "srv": f("srv"), "dtm": f("dtm")}
    for c in _MPM_COUNTERS:
        cols[c] = pc.cast(f(c), pa.int64())
    return pa.table(cols)


def _bsy_extract(t: pa.Table) -> pa.Table:
    m = pc.extract_regex(t["text"], BSY_LINE_RE)
    sub = t.filter(pc.is_valid(m))
    ms = pc.extract_regex(sub["text"], BSY_LINE_RE)
    body = pc.struct_field(ms, "body")
    wasb = pc.struct_field(pc.extract_regex(body, WAS_BSY_RE), "v")
    wbgb = pc.struct_field(pc.extract_regex(body, WBG_BSY_RE), "v")
    return pa.table(
        {
            "srv": pc.struct_field(ms, "srv"),
            "dtm": pc.struct_field(ms, "dtm"),
            "was_bsy": pc.cast(pc.fill_null(wasb, "0"), pa.int64()),
            "wbg_bsy": pc.cast(pc.fill_null(wbgb, "0"), pa.int64()),
        }
    )


def _join_mpm(rdy: "ray.data.Dataset", bsy: "ray.data.Dataset") -> "ray.data.Dataset":
    """rdy ⟕ bsy on exact (srv, dtm) via the task-based sort-merge join;
    missing bsy side → 0 (webErrorLogParser.sh:280-288 left semantics)."""
    from log_parser_ray.stages.aggregate import merge_join

    joined = merge_join(
        rdy, bsy, on=("srv", "dtm"), how="left_outer",
        left_schema=_RDY_SCHEMA, right_schema=_BSY_SCHEMA,
    )

    def fill(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("was_bsy"), "was_bsy",
            pc.fill_null(t["was_bsy"], 0),
        )
        return t.set_column(
            t.schema.get_field_index("wbg_bsy"), "wbg_bsy",
            pc.fill_null(t["wbg_bsy"], 0),
        )

    return joined.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def parse_mpmstats(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """M15+M16+J3: rdy lines ⟕ bsy-by-plugin lines on exact (srv, dtm).

    Both sides are extracted vectorized; the join is a task-based sort-merge
    join on the composite key (aggregate.merge_join — no per-call
    hash-shuffle actor spawn); a missing bsy side yields 0
    (webErrorLogParser.sh:280-288 left semantics). Plugin matching is
    order-insensitive regex (absent plugin → 0, :192-232)."""
    rdy = ds.map_batches(_rdy_extract, batch_format="pyarrow", zero_copy_batch=True)
    bsy = ds.map_batches(_bsy_extract, batch_format="pyarrow", zero_copy_batch=True)
    return _join_mpm(rdy, bsy)


# tagged-union schema of the three error_log line families — the fused
# one-read parse master uses (kind ∈ {err, rdy, bsy}; absent fields null)
ERRFAM_SCHEMA = pa.schema(
    [("kind", pa.string()), ("line_id", pa.int64()), ("srv", pa.string()),
     ("dtm", pa.string()), ("evt_type", pa.string()), ("client", pa.string()),
     ("err", pa.string()), ("referrer", pa.string())]
    + [(c, pa.int64()) for c in _MPM_COUNTERS + ("was_bsy", "wbg_bsy")]
)


def _rcy_extract(t: pa.Table) -> pa.Table:
    m = pc.extract_regex(t["text"], RECYCLE_RE)
    sub = t.filter(pc.is_valid(m))
    ms = pc.extract_regex(sub["text"], RECYCLE_RE)
    return pa.table({
        "line_id": sub["line_id"],
        "srv": pc.struct_field(ms, "srv"),
        "dtm": pc.struct_field(ms, "dtm"),
    })


def recycle_rows(tagged: "ray.data.Dataset") -> "ray.data.Dataset":
    """IHS restart events out of the tagged union — feeds the reference's
    per-recycle alert line and the RecycleHistoryRpt_all.csv daily row
    (webErrorLogParser.sh:45-49,248-253)."""
    return tagged.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "rcy"))
        .select(["line_id", "srv", "dtm"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def parse_error_families(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """ONE pass over the raw error_log lines: classify/extract every line as
    err / rdy / bsy / rcy and emit a tagged union of the parsed schemas.

    This is the fused stage master's error family materializes INSTEAD of
    the raw line stream (the reference makes one awk pass over the file too,
    webErrorLogParser.sh:148-232): raw text is read and parsed inside the
    read task and never pins the object store; only the narrow tagged rows
    do. ``split_error_families`` filters the union back apart."""

    def fn(t: pa.Table) -> pa.Table:
        parts = []
        for kind, sub in (("err", _err_extract(t)), ("rdy", _rdy_extract(t)),
                          ("bsy", _bsy_extract(t)),
                          ("rcy", _rcy_extract(t))):
            n = sub.num_rows
            cols = {}
            for f in ERRFAM_SCHEMA:
                if f.name == "kind":
                    cols["kind"] = pa.array([kind] * n, pa.string())
                elif f.name in sub.column_names:
                    cols[f.name] = sub[f.name]
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def split_error_families(tagged: "ray.data.Dataset"):
    """Tagged union → (error rows, mpmstats joined rows), both lazy filters
    over the (already-parsed, narrow) union blocks."""

    def pick(kind: str, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["kind"], kind)).select(cols)

        return fn

    def sel(kind, cols):
        return tagged.map_batches(
            pick(kind, cols), batch_format="pyarrow", zero_copy_batch=True
        )

    errs = sel("err", ["line_id", "srv", "dtm", "evt_type", "client", "err",
                       "referrer"])
    rdy = sel("rdy", [f.name for f in _RDY_SCHEMA])
    bsy = sel("bsy", [f.name for f in _BSY_SCHEMA])
    return errs, _join_mpm(rdy, bsy)


# Ground truth for the mpmstats join, straight from events.
MPMSTATS_TRUTH_CTE = """
mpm_truth AS (
  SELECT
    event_id * 2 AS line_id,
    'ihs' || CAST(user_id % 4 AS VARCHAR) AS srv,
    strftime(ts, '%a %b %d %H:%M:%S %Y') AS dtm,
    CAST(event_id % 50 AS BIGINT) AS rdy,
    CAST(event_id % 20 AS BIGINT) AS bsy,
    CAST(event_id % 5 AS BIGINT) AS rd,
    CAST(event_id % 7 AS BIGINT) AS wr,
    CAST(event_id % 3 AS BIGINT) AS ka,
    CAST(event_id % 2 AS BIGINT) AS log,
    CAST(event_id % 11 AS BIGINT) AS dns,
    CAST(event_id % 13 AS BIGINT) AS cls,
    CAST(CASE WHEN event_id % 3 = 0 THEN 0 ELSE event_id % 6 END AS BIGINT) AS was_bsy,
    CAST(CASE WHEN event_id % 3 = 0 THEN 0 ELSE event_id % 4 END AS BIGINT) AS wbg_bsy
  FROM events WHERE event_id % 2 = 1
)
""".strip()

ERRLOG_TRUTH_CTE = """
errlog_truth AS (
  SELECT
    event_id * 2 AS line_id,
    'ihs' || CAST(user_id % 4 AS VARCHAR) AS srv,
    strftime(ts, '%a %b %d %H:%M:%S %Y') AS dtm,
    CASE WHEN event_id % 4 = 0 THEN 'error' ELSE 'warn' END AS evt_type,
    '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR) AS client,
    'E' || CAST(event_id % 50 AS VARCHAR) || ': lookup failed' AS err,
    'http://site/p' || CAST(event_id % 20 AS VARCHAR) AS referrer
  FROM events WHERE event_id % 2 = 0
)
""".strip()

RECYCLE_TRUTH_CTE = """
recycle_truth AS (
  SELECT
    event_id * 2 + 1 AS line_id,
    'ihs' || CAST(user_id % 4 AS VARCHAR) AS srv,
    strftime(ts, '%a %b %d %H:%M:%S %Y') AS dtm
  FROM events WHERE event_id % 40 = 0
)
""".strip()
