"""Deterministic access-log line synthesis from the shared `events` table.

The driver's oracle runs on the pre-registered parquet views only, so the
access-log parse pack is made oracle-checkable the same way the transcript
shim is (sources/transcripts.py): ``synth_access_lines`` composes a REAL
reference-format access_log line per event (webAccessLogParser.sh:294-295
record shape), and ``ACCESS_TRUTH_CTE`` derives the GROUND-TRUTH parsed
fields for the same rows directly from the events columns in ANSI SQL. A
query that parses the synthesized lines with stages/accesslog.py and
matches the truth CTE therefore proves the parser inverts the format —
method repair, URL decompose, JSESSIONID split, ranges and all.

Line grammar per event (eid = event_id, uidn = user_id):
  websrvr   'web' || eid-independent uidn%4
  ts        events.ts rendered '[%d/%b/%Y:%H:%M:%S -0500]'
  method    eid%6==0 → POST, ==1 → HEAD, else GET
  glued     eid%17==0 → request token = 'p=1&q=2' || method (M6 repair case)
  uri       eid%5: 0 '/', 1 '/favicon.ico' (dotted-first-seg),
            2 '/app/pages/item<eid%20>.jsp', 3 '/app/search?q=term<eid%7>',
            4 '/svc/api/data'
  response  value>=100 → 503, >=50 → 404, else 200;   size eid%9000
  jsess     eid%11==0 → '-' else '0000S<uidn>X:cl<uidn%4>'
  uid       eid%13==0 → '-' (discard case) else 'u<uidn>@example.com'
  rt_us     round(value*1e6);  bytes eid%5000 / eid%7000
  ua        UA_LIST[eid%8] (covers the cascade cases + curl + unknown)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from log_parser_ray.stages.accesslog import CLONE_MAP

UA_LIST = [
    "Mozilla/5.0 (Windows NT 6.1; WOW64; rv:38.0) Gecko/20100101 Firefox/38.0",
    "Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/44.0.2403.107 Safari/537.36",
    "Mozilla/4.0 (compatible; MSIE 7.0; Windows NT 6.0)",
    "Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
    "Mozilla/5.0 (iPad; CPU OS 8_1_2 like Mac OS X) AppleWebKit/600.1.4 (KHTML, like Gecko) Version/8.0 Mobile/12B440 Safari/600.1.4",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/42.0.2311.135 Safari/537.36 Edge/12.10240",
    "curl/7.29.0",
    "SomeBot/1.0 (crawler)",
]

# per-URI perf baseline in µs (perfBaseLine.csv analogue, J6 —
# webAccessLogParser.sh:216-223,1009-1023)
PERF_BASELINE_US: dict[str, float] = {
    "/": 2_000_000.0,
    "/app/search": 5_000_000.0,
    "/favicon.ico": 100_000.0,
}


def _compose(batch: pa.Table) -> pa.Table:
    eid = batch["event_id"].to_numpy()
    uidn = batch["user_id"].to_numpy()
    value = batch["value"].to_numpy()

    def istr(a):
        return pc.cast(pa.array(a), pa.string())

    def j(*parts):
        return pc.binary_join_element_wise(*parts, "")

    def case(conds, *vals):
        struct = pa.StructArray.from_arrays(
            [pa.array(c) for c in conds],
            names=[str(i) for i in range(len(conds))],
        )
        return pc.case_when(struct, *vals)

    method = case([eid % 6 == 0, eid % 6 == 1], "POST", "HEAD", "GET")
    tok1 = pc.if_else(pa.array(eid % 17 == 0), j("p=1&q=2", method), method)

    v = eid % 5
    uri_full = case(
        [v == 0, v == 1, v == 2, v == 3],
        "/", "/favicon.ico",
        j("/app/pages/item", istr(eid % 20), ".jsp"),
        j("/app/search?q=term", istr(eid % 7)),
        "/svc/api/data",
    )

    resp = case([value >= 100.0, value >= 50.0], "503", "404", "200")
    jraw = pc.if_else(
        pa.array(eid % 11 == 0), "-",
        j("0000S", istr(uidn), "X:cl", istr(uidn % 4)),
    )
    uid = pc.if_else(
        pa.array(eid % 13 == 0), "-", j("u", istr(uidn), "@example.com")
    )
    ua = pa.array(UA_LIST, pa.string()).take(pa.array(eid % 8))
    websrvr = j("web", istr(uidn % 4))
    client = j("10.0.", istr(uidn % 256), ".", istr(eid % 256))
    rt_us = np.round(value * 1_000_000.0).astype(np.int64)

    # Arrow's %S renders fractional seconds for timestamp[us]; truncate to
    # whole seconds first (DuckDB's %S is integral — both sides agree).
    ts_s = pc.cast(
        pc.floor_temporal(batch["ts"], unit="second"), pa.timestamp("s")
    )
    dtm = pc.strftime(ts_s, format="%d/%b/%Y:%H:%M:%S")
    line = j(
        client, " - - [", dtm, " -0500] \"",
        tok1, " ", uri_full, " HTTP/1.1\" ",
        resp, " ", istr(eid % 9000),
        " JSESSIONID=\"", jraw, "\" UID=\"", uid, "\" ",
        istr(rt_us), " ", istr(eid % 5000), " ", istr(eid % 7000),
        " \"", ua, "\" ", websrvr,
    )
    return pa.table({"line_id": pa.array(eid, pa.int64()), "text": line})


def synth_access_lines(sf_dir: str) -> "ray.data.Dataset":
    """events.parquet → (line_id, text) access-log lines (row-local map)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return ds.map_batches(
        _compose, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768
    )


def _clone_case() -> str:
    whens = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in CLONE_MAP.items())
    return f"CASE clone_id {whens} ELSE '-' END"


# Ground-truth parsed fields derived straight from events — the oracle side
# of every access-log query. Column names match stages/accesslog.py output.
ACCESS_TRUTH_CTE = f"""
access_truth AS (
  SELECT * , {_clone_case()} AS was
  FROM (
    SELECT
      event_id AS line_id,
      'web' || CAST(user_id % 4 AS VARCHAR) AS websrvr,
      strftime(ts, '%Y-%m-%d') AS dt,
      strftime(ts, '%H:%M:%S') AS tm,
      '-0500' AS tz,
      CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
      CASE WHEN event_id % 11 = 0 THEN '-'
           ELSE 'S' || CAST(user_id AS VARCHAR) || 'X' END AS jsession,
      CASE WHEN event_id % 11 = 0 THEN '-'
           ELSE 'cl' || CAST(user_id % 4 AS VARCHAR) END AS clone_id,
      CASE WHEN event_id % 5 IN (0, 1) THEN '/'
           WHEN event_id % 5 = 4 THEN 'svc' ELSE 'app' END AS domain,
      CASE event_id % 5 WHEN 0 THEN 'NA'
           WHEN 1 THEN 'favicon.ico'
           WHEN 2 THEN 'item' || CAST(event_id % 20 AS VARCHAR) || '.jsp'
           WHEN 3 THEN 'search' ELSE 'data' END AS page,
      CASE event_id % 5 WHEN 0 THEN 'NA' WHEN 1 THEN 'ico'
           WHEN 2 THEN 'jsp' ELSE 'NA' END AS ext,
      CASE event_id % 5 WHEN 0 THEN '/'
           WHEN 1 THEN '/favicon.ico'
           WHEN 2 THEN '/app/pages/item' || CAST(event_id % 20 AS VARCHAR) || '.jsp'
           WHEN 3 THEN '/app/search' ELSE '/svc/api/data' END AS uri_path,
      CASE WHEN event_id % 5 = 3 AND event_id % 17 = 0
             THEN 'q=term' || CAST(event_id % 7 AS VARCHAR) || '&p=1&q=2'
           WHEN event_id % 5 = 3 THEN 'q=term' || CAST(event_id % 7 AS VARCHAR)
           WHEN event_id % 17 = 0 THEN 'p=1&q=2'
           ELSE '' END AS params,
      'HTTP/1.1' AS protocol,
      CASE WHEN event_id % 6 = 0 THEN 'POST'
           WHEN event_id % 6 = 1 THEN 'HEAD' ELSE 'GET' END AS request,
      CAST(CASE WHEN value >= 100 THEN 503 WHEN value >= 50 THEN 404
                ELSE 200 END AS INTEGER) AS response,
      CAST(event_id % 9000 AS VARCHAR) AS size,
      CAST(event_id % 5000 AS BIGINT) AS byte_rcvd,
      CAST(event_id % 7000 AS BIGINT) AS byte_snt,
      CASE WHEN event_id % 13 = 0 THEN '-'
           ELSE 'u' || CAST(user_id AS VARCHAR) || '@example.com' END AS uid,
      CAST(round(value * 1000000) AS BIGINT) AS rt_us,
      CASE WHEN round(value * 1000000) <= 1000000 THEN '<=1sec'
           WHEN round(value * 1000000) <= 5000000 THEN '<=5sec'
           WHEN round(value * 1000000) <= 10000000 THEN '<=10sec'
           WHEN round(value * 1000000) <= 20000000 THEN '<=20sec'
           ELSE '>20sec' END AS resp_range,
      {{ua_browser}} AS browser,
      {{ua_os_name}} AS os_name,
      {{ua_os_flav}} AS os_flav,
      {{ua_os_ver}} AS os_ver,
      CASE WHEN event_id % 8 IN (6, 7) THEN TRUE ELSE FALSE END AS ua_unknown,
      CASE WHEN event_id % 8 = 6 OR event_id % 13 = 0 THEN 'discarded'
           ELSE 'parsed' END AS sink
    FROM (SELECT *, {{ua_expr}} AS ua FROM events) e
  ) t
)
""".strip()


def access_truth_cte() -> str:
    """Fill the UA cascade holes with the shared cascade SQL over the
    synthesized ua column."""
    from log_parser_ray.stages.accesslog import ua_cascade_sql

    ua_whens = " ".join(
        f"WHEN {i} THEN '{u}'" for i, u in enumerate(UA_LIST)
    )
    ua_expr = f"CASE event_id % 8 {ua_whens} END"
    return ACCESS_TRUTH_CTE.format(
        ua_expr=ua_expr,
        ua_browser=ua_cascade_sql("ua", "browser"),
        ua_os_name=ua_cascade_sql("ua", "os_name"),
        ua_os_flav=ua_cascade_sql("ua", "os_flav"),
        ua_os_ver=ua_cascade_sql("ua", "os_ver"),
    )
