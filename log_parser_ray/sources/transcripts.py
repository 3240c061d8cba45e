"""Transcript sources.

The engine's real input is a Parquet transcript table (schema.TRANSCRIPT_SCHEMA).
``read_transcripts`` reads one. Because the sandbox's shared test tables
(/root/testdata/sf*) do not ship a transcript table, ``transcripts_from_events``
derives one *deterministically* from the ``events`` table — and
``TRANSCRIPTS_CTE`` is the exact same derivation in ANSI SQL, so every pipeline
over the shim is checkable against a DuckDB oracle.  The two MUST stay in
lockstep; tests/test_transcripts.py pins their equality row-by-row.

Derivation (row-local, no shuffle):
  conv_id  = 'c' || user_id
  turn_idx = event_id (events are written in ts order, so event_id is a stable
             within-conversation ordering key; int32-safe at every sf)
  role     = event_type → {error: system, signup: assistant, purchase: tool, *: user}
  tool     = event_type → {click: search, purchase: checkout, signup: auth, *: null}
  ts       = ts
  text     = reference-style payload embedding the parse targets (FIXTURES.md F1):
    error    → 'ERROR [WSVR0###L] thread hung for <ms> ms'  (L = E when
               event_id%3==0 else W; '+ CORBA.NO_RESPONSE' when event_id%7==0
               — a WASCustomFilter.txt:2-6 style keyword hit)
    click    → '<tool_call name="search" status="ok" rt_us=<us>>'
    purchase → '<tool_call name="checkout" status="ok|err" rt_us=<us>> logout'
    signup   → 'login uid=u<user_id>'
    view     → 'GET /app/page## status=<code>'   (code: 503 if value>=100,
               404 if value>=50 else 200); every 13th event_id is an
               unparseable 'note <id>' (unknown-UA analogue,
               webAccessLogParser.sh:646-653)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def _compose(batch):
    """Fully vectorized: numpy for the integer arithmetic, Arrow
    binary_join_element_wise for string building — no Python-per-row work
    (the object-dtype '+' version measured ~67 µs/row; this is <4)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    eid = batch["event_id"].to_numpy()
    value = batch["value"].to_numpy()
    uid = batch["user_id"].to_numpy()
    et = batch["event_type"].to_numpy(zero_copy_only=False)

    is_err = et == "error"
    is_click = et == "click"
    is_pur = et == "purchase"
    is_sign = et == "signup"

    def j(*parts):  # element-wise concat; trailing arg is the separator
        return pc.binary_join_element_wise(*parts, "")

    def istr(a):
        return pc.cast(pa.array(a), pa.string())

    ms_s = istr(np.round(value * 1000.0).astype(np.int64))
    us_s = istr(np.round(value * 1_000_000.0).astype(np.int64))
    uid_s = istr(uid)
    code3 = pc.utf8_lpad(istr(eid % 1000), 3, "0")
    sev = pc.if_else(pa.array(eid % 3 == 0), "E", "W")
    corba = pc.if_else(pa.array(eid % 7 == 0), " CORBA.NO_RESPONSE", "")
    err_txt = j("ERROR [WSVR0", code3, sev, "] thread hung for ", ms_s, " ms", corba)

    status = pc.if_else(pa.array(is_pur & (eid % 11 == 0)), "err", "ok")
    tool_nm = pc.if_else(pa.array(is_click), "search", "checkout")
    logout = pc.if_else(pa.array(is_pur), " logout", "")
    tool_txt = j(
        '<tool_call name="', tool_nm, '" status="', status, '" rt_us=', us_s, ">",
        logout,
    )

    login_txt = j("login uid=u", uid_s)
    http = pc.if_else(
        pa.array(value >= 100.0),
        "503",
        pc.if_else(pa.array(value >= 50.0), "404", "200"),
    )
    view_txt = pc.if_else(
        pa.array(eid % 13 == 0),
        j("note ", istr(eid)),
        j("GET /app/page", istr(eid % 20), " status=", http),
    )

    text = pc.if_else(
        pa.array(is_err),
        err_txt,
        pc.if_else(
            pa.array(is_click | is_pur),
            tool_txt,
            pc.if_else(pa.array(is_sign), login_txt, view_txt),
        ),
    )
    role = pc.if_else(
        pa.array(is_err),
        "system",
        pc.if_else(
            pa.array(is_sign),
            "assistant",
            pc.if_else(pa.array(is_pur), "tool", "user"),
        ),
    )
    tool = pa.array(
        np.where(is_click, "search", np.where(is_pur, "checkout", "auth")),
        mask=~(is_click | is_pur | is_sign),
    )

    return pa.table(
        {
            "conv_id": j("c", uid_s),
            "turn_idx": pa.array(eid.astype(np.int32)),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": batch["ts"],
        }
    )


def transcripts_from_events(sf_dir: str, filter=None) -> "ray.data.Dataset":
    """events.parquet → transcript Dataset (row-local map, streams, no shuffle).

    batch_size=32768 coalesces the reader's small blocks into full batches so
    per-task overhead stays negligible at every sf.

    ``filter``: optional pyarrow.dataset expression pushed down to the
    parquet scan (row-group pruning) — partitioned/resumable runs pass
    event_id ranges here so each partition reads only its own bytes."""
    kwargs = {}
    if filter is not None:
        kwargs["filter"] = filter
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
        **kwargs,
    )
    return ds.map_batches(
        _compose, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768
    )


def read_transcripts(path: str, **kwargs) -> "ray.data.Dataset":
    """Read a real transcript Parquet table (file, dir, or partitioned dir)."""
    return ray.data.read_parquet(path, **kwargs)


# The same derivation in SQL, for the DuckDB oracle. `events` is a
# pre-registered view over the same parquet file.
TRANSCRIPTS_CTE = """
transcripts AS (
  SELECT
    'c' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(event_id AS INTEGER) AS turn_idx,
    CASE event_type WHEN 'error' THEN 'system' WHEN 'signup' THEN 'assistant'
         WHEN 'purchase' THEN 'tool' ELSE 'user' END AS role,
    CASE
      WHEN event_type = 'error' THEN
        'ERROR [WSVR0' || lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0')
        || CASE WHEN event_id % 3 = 0 THEN 'E' ELSE 'W' END
        || '] thread hung for ' || CAST(CAST(round(value * 1000) AS BIGINT) AS VARCHAR)
        || ' ms' || CASE WHEN event_id % 7 = 0 THEN ' CORBA.NO_RESPONSE' ELSE '' END
      WHEN event_type IN ('click', 'purchase') THEN
        '<tool_call name="' || CASE event_type WHEN 'click' THEN 'search' ELSE 'checkout' END
        || '" status="'
        || CASE WHEN event_type = 'purchase' AND event_id % 11 = 0 THEN 'err' ELSE 'ok' END
        || '" rt_us=' || CAST(CAST(round(value * 1000000) AS BIGINT) AS VARCHAR) || '>'
        || CASE WHEN event_type = 'purchase' THEN ' logout' ELSE '' END
      WHEN event_type = 'signup' THEN 'login uid=u' || CAST(user_id AS VARCHAR)
      WHEN event_id % 13 = 0 THEN 'note ' || CAST(event_id AS VARCHAR)
      ELSE 'GET /app/page' || CAST(event_id % 20 AS VARCHAR) || ' status='
           || CASE WHEN value >= 100 THEN '503' WHEN value >= 50 THEN '404' ELSE '200' END
    END AS text,
    CASE event_type WHEN 'click' THEN 'search' WHEN 'purchase' THEN 'checkout'
         WHEN 'signup' THEN 'auth' ELSE NULL END AS tool,
    ts
  FROM events
)
""".strip()
