"""Ordered per-conversation operators.

The reference has four places where ORDER within a partition is load-bearing
(SURVEY.md §2.3-2.5): login→logout session pairing (J4,
webAccessLogParser.sh:715-720,1273-1295), the WTRN0006W→WTRN0124I
transaction-timeout as-of correlation (J2, websphereLogParser.sh:236-247),
last-event-per-group (AG3, javaGCStatsParser.sh:269-279), and the multi-line
GC record state machine (ST5, javaGCStatsParser.sh:158-283).

Ray-native shape: ``sort("conv_id")`` co-locates each conversation in one
block (range partitioner; same invariant as aggregate.sorted_combine — note
the sort key is conv_id ALONE: a composite (conv_id, turn_idx) sort could
split one conversation across partition boundaries). Each block is then
processed by ONE vectorized pandas pass — in-block stable sort on
``(conv_id, turn_idx)`` followed by groupby aggregations / group-wise
shift+ffill — so per-conversation logic never relies on block order and
there is no per-group Python task overhead (``groupby().map_groups``
measured ~1 ms/group — ruinous at 10⁵+ conversations per block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def _per_conv_blocks(ds: "ray.data.Dataset", fn):
    """sort by conv_id, then one vectorized pandas fn per whole block; a
    conversation split across blocks by dynamic block splitting is routed to
    the boundary pass (aggregate.group_safe_map), so fn always sees whole
    conversations."""
    from log_parser_ray.stages.aggregate import group_safe_map

    return group_safe_map(ds, ["conv_id"], fn, batch_format="pandas")


def session_pairs(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """login→logout pairing per conversation (J4 semantics).

    start = first login turn, end = last logout turn; a missing end yields a
    null duration — the reference's `na` left-outer semantics
    (webAccessLogParser.sh:1273-1295). duration_us is an exact integer.
    """
    keep = parsed.select_columns(["conv_id", "turn_idx", "ts", "login_uid", "is_logout"])

    def pair(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        base = pd.DataFrame({"conv_id": g["conv_id"].unique()})
        li = g[g["login_uid"].notna()]
        logins = li.groupby("conv_id", sort=False).agg(
            n_logins=("ts", "size"), login_ts=("ts", "first")
        )
        lo = g[g["is_logout"].astype(bool)]
        logouts = lo.groupby("conv_id", sort=False).agg(
            n_logouts=("ts", "size"), logout_ts=("ts", "last")
        )
        out = base.merge(logins, on="conv_id", how="left").merge(
            logouts, on="conv_id", how="left"
        )
        out["n_logins"] = out["n_logins"].fillna(0).astype("int64")
        out["n_logouts"] = out["n_logouts"].fillna(0).astype("int64")
        ok = (
            out["login_ts"].notna()
            & out["logout_ts"].notna()
            & (out["logout_ts"] >= out["login_ts"])
        )
        dur = (out["logout_ts"] - out["login_ts"]).values.astype("timedelta64[us]")
        out["duration_us"] = pd.array(
            np.where(ok, dur.astype("int64"), 0), dtype="Int64"
        )
        out.loc[~ok, "duration_us"] = pd.NA
        return out

    return _per_conv_blocks(keep, pair)


# Gap threshold for sessionization: a silence longer than this starts a new
# session window (the classic web-analytics 30-minute rule).
SESSION_GAP_US = 30 * 60 * 1_000_000


def session_windows(
    parsed: "ray.data.Dataset", gap_us: int = SESSION_GAP_US
) -> "ray.data.Dataset":
    """Gap-based sessionization (session windows): split each conversation's
    turn-ordered stream into sessions wherever the time since the previous
    turn exceeds ``gap_us``. The streaming-window analogue of the reference's
    hour bucketing (SURVEY §2.9 — its only windows are ts-derived buckets);
    gap windows are the one window kind a training/telemetry pipeline needs
    that fixed buckets can't express.

    Emits one row per (conv_id, session_idx): n_turns, start_ts/end_ts
    (min/max over the window — identical on both engines even if ts is not
    monotone in turn_idx) and an exact integer duration_us. Distributed shape:
    same per-conversation ordered pass as every operator here — state never
    crosses the conv_id group, so the shuffle key stays conv_id alone."""
    keep = parsed.select_columns(["conv_id", "turn_idx", "ts"])
    gap = pd.Timedelta(microseconds=gap_us)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        prev_ts = g.groupby("conv_id", sort=False)["ts"].shift(1)
        new_sess = prev_ts.isna() | ((g["ts"] - prev_ts) > gap)
        sess_idx = (
            new_sess.astype("int64").groupby(g["conv_id"], sort=False).cumsum() - 1
        )
        out = (
            g.assign(session_idx=sess_idx)
            .groupby(["conv_id", "session_idx"], sort=False)
            .agg(n_turns=("ts", "size"), start_ts=("ts", "min"), end_ts=("ts", "max"))
            .reset_index()
        )
        out["n_turns"] = out["n_turns"].astype("int64")
        out["duration_us"] = (
            (out["end_ts"] - out["start_ts"]).to_numpy().astype("timedelta64[us]").astype("int64")
        )
        return out

    return _per_conv_blocks(keep, fn)


def asof_correlate(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """For every error turn, the most recent PRIOR tool-call turn in the same
    conversation (J2 as-of semantics: a pending value keyed by the partition
    is read by a later matching event). Emits one row per error turn."""
    keep = parsed.select_columns(["conv_id", "turn_idx", "error_code", "tool_name"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        tool_turn = g["turn_idx"].where(g["tool_name"].notna()).astype("float64")
        # strictly-prior: shift within conversation, then forward-fill
        shifted_turn = tool_turn.groupby(g["conv_id"], sort=False).shift(1)
        shifted_name = (
            g["tool_name"].groupby(g["conv_id"], sort=False).shift(1)
        )
        prior_turn = shifted_turn.groupby(g["conv_id"], sort=False).ffill()
        prior_name = shifted_name.groupby(g["conv_id"], sort=False).ffill()
        prior_name = prior_name.where(prior_turn.notna())
        errs = g["error_code"].notna()
        return pd.DataFrame(
            {
                "conv_id": g.loc[errs, "conv_id"],
                "turn_idx": g.loc[errs, "turn_idx"].astype("int32"),
                "error_code": g.loc[errs, "error_code"],
                # plain float64/NaN, NOT nullable Int64: the external driver
                # hashes values without dtype canonicalization, and the DuckDB
                # oracle yields float64/NaN for a nullable lag column — pd.NA
                # renders differently and fails its hash (round-1 postmortem).
                "prior_tool_turn": prior_turn[errs].astype("float64"),
                "prior_tool_name": prior_name[errs],
            }
        )

    return _per_conv_blocks(keep, asof)


def last_per_conv(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """Last turn per conversation (AG3 last-value-per-group: assoc-array
    overwrite in the reference). Deterministic: max turn_idx wins."""
    keep = parsed.select_columns(["conv_id", "turn_idx", "role", "sink"])

    def last(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        return g.groupby("conv_id", sort=False, as_index=False).tail(1)

    return _per_conv_blocks(keep, last)


def hung_thread_stats(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """AG4 stateful ordered aggregate — the hung-thread new/max/remaining
    summary (websphereLogParser.sh:443-533): per JVM the reference walks the
    status-ordered hung-thread stream keeping running declared/cleared
    counters and their running maximum. Transcript analogue: error turns
    DECLARE a hang, logout turns CLEAR one; per conversation emit
    (n_declared, n_cleared, remaining, max_remaining) where max_remaining is
    the peak of the running declared-cleared series in turn order."""
    keep = parsed.select_columns(["conv_id", "turn_idx", "error_code", "is_logout"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        err = g["error_code"].notna().astype("int64")
        out = g["is_logout"].astype(bool).astype("int64")
        run = (err - out).groupby(g["conv_id"].to_numpy(), sort=False).cumsum()
        res = pd.DataFrame(
            {"conv_id": g["conv_id"].to_numpy(), "err": err.to_numpy(),
             "out": out.to_numpy(), "run": run.to_numpy()}
        )
        agg = res.groupby("conv_id", sort=False).agg(
            n_declared=("err", "sum"),
            n_cleared=("out", "sum"),
            max_remaining=("run", "max"),
        )
        agg["remaining"] = agg["n_declared"] - agg["n_cleared"]
        return agg.reset_index()[
            ["conv_id", "n_declared", "n_cleared", "remaining", "max_remaining"]
        ]

    return _per_conv_blocks(keep, fn)


BLOCK_BEGIN = "BEGIN_BLOCK id="
BLOCK_END = "END_BLOCK"


def reassemble_blocks(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Multi-turn record reassembly (ST5 — the GC `{Heap before GC …}` state
    machine, javaGCStatsParser.sh:158-283).

    A logical record spans turns from a `BEGIN_BLOCK id=X` line to the next
    `END_BLOCK` line within one conversation. Unterminated blocks are dropped
    (not crashed), mirroring the reference's per-file last-record handling.
    Emits (conv_id, block_id, start_turn, end_turn, n_lines, payload).

    The per-conversation scan is a genuine state machine (the one operator
    family where a Python loop over rows is the honest implementation); it
    touches only marker rows' neighborhoods and runs once per block."""
    keep = transcripts.select_columns(["conv_id", "turn_idx", "text"])

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        rows = []
        cur_conv = None
        cur_id, cur_start, cur_lines = None, None, []
        for conv, turn, text in zip(
            g["conv_id"].to_numpy(), g["turn_idx"].to_numpy(), g["text"].to_numpy()
        ):
            if conv != cur_conv:
                cur_conv, cur_id = conv, None
            t = text or ""
            if t.startswith(BLOCK_BEGIN):
                cur_id = t[len(BLOCK_BEGIN):].split()[0]
                cur_start, cur_lines = turn, [t]
            elif cur_id is not None:
                cur_lines.append(t)
                if t.startswith(BLOCK_END):
                    rows.append(
                        {
                            "conv_id": conv,
                            "block_id": cur_id,
                            "start_turn": int(cur_start),
                            "end_turn": int(turn),
                            "n_lines": len(cur_lines),
                            "payload": "\n".join(cur_lines),
                        }
                    )
                    cur_id, cur_start, cur_lines = None, None, []
        if not rows:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "block_id": pd.Series([], dtype=object),
                    "start_turn": pd.Series([], dtype="int64"),
                    "end_turn": pd.Series([], dtype="int64"),
                    "n_lines": pd.Series([], dtype="int64"),
                    "payload": pd.Series([], dtype=object),
                }
            )
        return pd.DataFrame(rows)

    return _per_conv_blocks(keep, assemble)
