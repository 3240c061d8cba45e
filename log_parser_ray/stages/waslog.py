"""WebSphere SystemOut real-format parse pack (M3, M2, A1/A3, J2/ST6).

The reference's first parser (websphereLogParser.sh) consumes
`SystemOut*.log` lines shaped
`[6/13/15 10:32:04:123 EDT] 00000062 ServletWrappe E SRVE0068E: message…`
— timestamp, 8-hex thread id, component short-name, 1-char event type
(W/E/F/I/A/O), then a message usually led by a msgId
(websphereLogParser.sh:205-230). The severity filter keeps W/E/F plus
named msgIds (:132-133); the WTRN0006W→WTRN0124I transaction-timeout
correlation is an ordered as-of join keyed (server, thread)
(:236-247 — ST6/J2).

Vectorized Arrow RE2 parse + a group_safe_map ordered correlation; the
synthesizer composes real-format lines from the events table with an
events-derived SQL truth CTE, so the pack is oracle-checkable end to end.

Synthesis grammar per event (eid = event_id, uidn = user_id):
  srv     'was' || uidn%4          (the reference derives it from the file
                                    path — IO3; embedded as a line prefix
                                    like the error-log pack)
  thread  zero-padded hex of uidn%16
  eid%8: 0 → `SRVE0068E: Uncaught exception in servlet p<eid%20>`   (E)
         1 → `WSVR0605W: Thread "<eid%50>" may be hung`             (W)
         2 → `WTRN0006W: Transaction T<eid> timed out after <eid%120+1> seconds` (W)
         3 → `WTRN0124I: Transaction completed`                     (I)
         4 → `WSVR0001I: Server open for e-business`                (I)
         5 → `SECJ0064A: Authn audit`                               (A)
         6 → `HMGR0152W: CPU Starvation detected. Current thread
              scheduling delay is <eid%10+2> seconds.`              (W)
         7 → `SRVE0068E: Uncaught exception java.lang.OutOfMemoryError:
              Java heap space in servlet p<eid%20>`                 (E)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

WAS_RE = (
    r"^(?P<srv>\S+) \[(?P<dtm>[^\]]+)\] (?P<thread>[0-9a-f]{8}) "
    r"(?P<component>\w+) (?P<evt>[A-Z]) (?P<msg>.*)$"
)
MSGID_RE = r"^(?P<id>[A-Z]{4,5}\d{4}[A-Z]):"
TTO_DECLARE_RE = r"WTRN0006W: Transaction (?P<tran>\S+) timed out after (?P<to>\d+) seconds"


def parse_was_lines(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """M3: SystemOut lines → (line_id, srv, dtm, thread, component,
    evt_type, msg_id, msg, is_severe)."""

    def fn(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["text"], WAS_RE)
        sub = t.filter(pc.is_valid(m))
        ms = pc.extract_regex(sub["text"], WAS_RE)

        def f(n):
            return pc.struct_field(ms, n)

        msg = f("msg")
        msg_id = pc.fill_null(
            pc.struct_field(pc.extract_regex(msg, MSGID_RE), "id"), ""
        )
        evt = f("evt")
        # M2: severity filter semantics — W/E/F or the named msgIds
        named = pc.is_in(
            msg_id, value_set=pa.array(["WTRN0006W", "WTRN0124I", "WSVR0001I"])
        )
        severe = pc.or_(pc.is_in(evt, value_set=pa.array(["W", "E", "F"])), named)
        return pa.table(
            {
                "line_id": sub["line_id"],
                "srv": f("srv"),
                "dtm": f("dtm"),
                "thread": f("thread"),
                "component": f("component"),
                "evt_type": evt,
                "msg_id": msg_id,
                "msg": msg,
                "is_severe": severe,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def tto_correlate(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """J2/ST6: each WTRN0124I completion joined to the most recent PRIOR
    WTRN0006W declare of the same (srv, thread), carrying its tranId and
    timeout — the reference's pending-map (websphereLogParser.sh:236-247)."""
    from log_parser_ray.stages.aggregate import group_safe_map

    keep = parsed.select_columns(["line_id", "srv", "thread", "msg_id", "msg"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["srv", "thread", "line_id"], kind="stable")
        dec = g["msg"].str.extract(TTO_DECLARE_RE)
        is_dec = g["msg_id"] == "WTRN0006W"
        key = g["srv"] + "|" + g["thread"]
        tran = dec["tran"].where(is_dec).groupby(key, sort=False).ffill()
        to = pd.to_numeric(dec["to"].where(is_dec), errors="coerce").groupby(
            key, sort=False
        ).ffill()
        dec_line = g["line_id"].where(is_dec).groupby(key, sort=False).ffill()
        done = g["msg_id"] == "WTRN0124I"
        out = pd.DataFrame(
            {
                "line_id": g.loc[done, "line_id"],
                "srv": g.loc[done, "srv"],
                "thread": g.loc[done, "thread"],
                "tran_id": tran[done],
                "timeout_s": to[done].astype("float64"),
                "declare_line": dec_line[done].astype("float64"),
            }
        )
        return out

    return group_safe_map(keep, ["srv", "thread"], fn, batch_format="pandas")


CPU_STARV_RE = r"HMGR0152W: CPU Starvation detected.*delay is (?P<d>\d+) seconds"
OOM_RE = r"java\.lang\.OutOfMemoryError"


def cpu_starvation_summary(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """A7 for the real format: per server, COUNT of HMGR0152W CPU-starvation
    notifications + SUM of their scheduling delays (the reference's
    arrCPUStarvCnt/arrCPUStarvDly accumulators and .cpu.summary row,
    websphereLogParser.sh:315-323,427-439)."""
    from log_parser_ray.stages.aggregate import grouped_stats

    def extract(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["msg_id"], "HMGR0152W"))
        d = pc.struct_field(pc.extract_regex(sub["msg"], CPU_STARV_RE), "d")
        return pa.table(
            {"srv": sub["srv"], "delay_s": pc.cast(d, pa.int64())}
        )

    rows = parsed.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_stats(rows, ["srv"], "delay_s", count="n", sum_="total_delay_s")


def oom_last_event(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """AG3 for the real format: the LAST OutOfMemoryError per (srv, date) —
    the reference's arrOOM[pName|dt] map, which each new OOM line
    overwrites, so file order decides (websphereLogParser.sh:273-276,
    325-343). Last = max line_id within the (srv, date) group."""
    from log_parser_ray.stages.aggregate import argmax_by

    def extract(t: pa.Table) -> pa.Table:
        sub = t.filter(
            pc.is_valid(pc.extract_regex(t["msg"], OOM_RE))
        )
        dt = pc.list_element(pc.split_pattern(sub["dtm"], " "), 0)
        return pa.table(
            {
                "srv": sub["srv"],
                "dt": dt,
                "line_id": sub["line_id"],
                "dtm": sub["dtm"],
                "thread": sub["thread"],
                "component": sub["component"],
                "msg": sub["msg"],
            }
        )

    rows = parsed.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
    return argmax_by(rows, ["srv", "dt"], ["line_id"], [True])


def recycle_events(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """WSVR0001I server-start routing — the reference's JVM-recycle
    detection that feeds the alert file and RecycleHistoryRpt_all.csv
    (date|srv rows, websphereLogParser.sh:249-253)."""

    def extract(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["msg_id"], "WSVR0001I"))
        dt = pc.list_element(pc.split_pattern(sub["dtm"], " "), 0)
        return pa.table(
            {"line_id": sub["line_id"], "dt": dt, "dtm": sub["dtm"],
             "srv": sub["srv"]}
        )

    return parsed.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)


def _compose(batch: pa.Table) -> pa.Table:
    eid = batch["event_id"].to_numpy()
    uidn = batch["user_id"].to_numpy()
    ts_s = pc.cast(pc.floor_temporal(batch["ts"], unit="second"), pa.timestamp("s"))
    dtm = pc.strftime(ts_s, format="%m/%d/%y %H:%M:%S")

    def istr(a):
        return pc.cast(pa.array(a), pa.string())

    def j(*parts):
        return pc.binary_join_element_wise(*parts, "")

    srv = j("was", istr(uidn % 4))
    thread = pa.array([f"{i:08x}" for i in range(16)], pa.string()).take(
        pa.array(uidn % 16)
    )
    kinds = eid % 8
    conds = pa.StructArray.from_arrays(
        [pa.array(kinds == k) for k in range(7)],
        names=[str(k) for k in range(7)],
    )
    comp = pc.case_when(
        conds, "ServletWrappe", "ThreadMonitor", "TimeoutManage",
        "TimeoutManage", "WsServerImpl", "SecurityAudit", "CoordinatorCo",
        "ServletWrappe",
    )
    evt = pc.case_when(conds, "E", "W", "W", "I", "I", "A", "W", "E")
    msg = pc.case_when(
        conds,
        j("SRVE0068E: Uncaught exception in servlet p", istr(eid % 20)),
        j('WSVR0605W: Thread "', istr(eid % 50), '" may be hung'),
        j("WTRN0006W: Transaction T", istr(eid), " timed out after ",
          istr(eid % 120 + 1), " seconds"),
        "WTRN0124I: Transaction completed",
        "WSVR0001I: Server open for e-business",
        "SECJ0064A: Authn audit",
        j("HMGR0152W: CPU Starvation detected. Current thread scheduling "
          "delay is ", istr(eid % 10 + 2), " seconds."),
        j("SRVE0068E: Uncaught exception java.lang.OutOfMemoryError: "
          "Java heap space in servlet p", istr(eid % 20)),
    )
    line = j(srv, " [", dtm, ":000 UTC] ", thread, " ", comp, " ", evt, " ",
             msg)
    return pa.table({"line_id": pa.array(eid, pa.int64()), "text": line})


def synth_was_lines(sf_dir: str) -> "ray.data.Dataset":
    """events.parquet → (line_id, text) SystemOut-format lines."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return ds.map_batches(
        _compose, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768
    )


WAS_TRUTH_CTE = """
was_truth AS (
  SELECT
    event_id AS line_id,
    'was' || CAST(user_id % 4 AS VARCHAR) AS srv,
    strftime(ts, '%m/%d/%y %H:%M:%S') || ':000 UTC' AS dtm,
    printf('%08x', user_id % 16) AS thread,
    CASE event_id % 8 WHEN 0 THEN 'ServletWrappe' WHEN 1 THEN 'ThreadMonitor'
         WHEN 2 THEN 'TimeoutManage' WHEN 3 THEN 'TimeoutManage'
         WHEN 4 THEN 'WsServerImpl' WHEN 5 THEN 'SecurityAudit'
         WHEN 6 THEN 'CoordinatorCo' ELSE 'ServletWrappe' END AS component,
    CASE event_id % 8 WHEN 0 THEN 'E' WHEN 1 THEN 'W' WHEN 2 THEN 'W'
         WHEN 3 THEN 'I' WHEN 4 THEN 'I' WHEN 5 THEN 'A'
         WHEN 6 THEN 'W' ELSE 'E' END AS evt_type,
    CASE event_id % 8 WHEN 0 THEN 'SRVE0068E' WHEN 1 THEN 'WSVR0605W'
         WHEN 2 THEN 'WTRN0006W' WHEN 3 THEN 'WTRN0124I'
         WHEN 4 THEN 'WSVR0001I' WHEN 5 THEN 'SECJ0064A'
         WHEN 6 THEN 'HMGR0152W' ELSE 'SRVE0068E' END AS msg_id,
    CASE event_id % 8
      WHEN 0 THEN 'SRVE0068E: Uncaught exception in servlet p' || CAST(event_id % 20 AS VARCHAR)
      WHEN 1 THEN 'WSVR0605W: Thread "' || CAST(event_id % 50 AS VARCHAR) || '" may be hung'
      WHEN 2 THEN 'WTRN0006W: Transaction T' || CAST(event_id AS VARCHAR)
                  || ' timed out after ' || CAST(event_id % 120 + 1 AS VARCHAR) || ' seconds'
      WHEN 3 THEN 'WTRN0124I: Transaction completed'
      WHEN 4 THEN 'WSVR0001I: Server open for e-business'
      WHEN 5 THEN 'SECJ0064A: Authn audit'
      WHEN 6 THEN 'HMGR0152W: CPU Starvation detected. Current thread scheduling delay is '
                  || CAST(event_id % 10 + 2 AS VARCHAR) || ' seconds.'
      ELSE 'SRVE0068E: Uncaught exception java.lang.OutOfMemoryError: Java heap space in servlet p'
           || CAST(event_id % 20 AS VARCHAR) END AS msg,
    CASE WHEN event_id % 8 IN (0, 1, 2, 6, 7) THEN TRUE  -- W/E/F
         WHEN event_id % 8 IN (3, 4) THEN TRUE           -- named msgIds
         ELSE FALSE END AS is_severe
  FROM events
)
""".strip()
