"""Ordered per-conversation operators.

The reference has four places where ORDER within a partition is load-bearing
(SURVEY.md §2.3-2.5): login→logout session pairing (J4,
webAccessLogParser.sh:715-720,1273-1295), the WTRN0006W→WTRN0124I
transaction-timeout as-of correlation (J2, websphereLogParser.sh:236-247),
last-event-per-group (AG3, javaGCStatsParser.sh:269-279), and the multi-line
GC record state machine (ST5, javaGCStatsParser.sh:158-283).

Ray-native shape: all of them are ``groupby(conv_id).map_groups`` with an
explicit in-group stable sort on ``turn_idx`` — state never crosses the group
key, so the shuffle on conv_id is the only data movement and the per-group
logic is single-threaded by construction (never relies on block order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def _by_conv(ds: "ray.data.Dataset", fn):
    return ds.groupby("conv_id").map_groups(fn, batch_format="pandas")


def session_pairs(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """login→logout pairing per conversation (J4 semantics).

    start = first login turn, end = last logout turn; a missing end yields a
    null duration — the reference's `na` left-outer semantics
    (webAccessLogParser.sh:1273-1295). duration_us is an exact integer.
    """
    keep = parsed.select_columns(["conv_id", "turn_idx", "ts", "login_uid", "is_logout"])

    def pair(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="stable")
        logins = g[g["login_uid"].notna()]
        logouts = g[g["is_logout"].astype(bool)]
        login_ts = logins["ts"].iloc[0] if len(logins) else pd.NaT
        logout_ts = logouts["ts"].iloc[-1] if len(logouts) else pd.NaT
        dur = (
            (logout_ts - login_ts).value
            if (login_ts is not pd.NaT and logout_ts is not pd.NaT and logout_ts >= login_ts)
            else None
        )
        return pd.DataFrame(
            {
                "conv_id": [g["conv_id"].iloc[0]],
                "n_logins": [int(len(logins))],
                "n_logouts": [int(len(logouts))],
                "login_ts": [login_ts],
                "logout_ts": [logout_ts],
                "duration_us": pd.array(
                    [dur // 1000 if dur is not None else None], dtype="Int64"
                ),
            }
        )

    return _by_conv(keep, pair)


def asof_correlate(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """For every error turn, the most recent PRIOR tool-call turn in the same
    conversation (J2 as-of semantics: a pending value keyed by the partition
    is read by a later matching event). Emits one row per error turn."""
    keep = parsed.select_columns(["conv_id", "turn_idx", "error_code", "tool_name"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="stable")
        tool_turn = g["turn_idx"].where(g["tool_name"].notna())
        tool_name = g["tool_name"]
        prior_turn = tool_turn.shift(1).ffill()
        prior_name = tool_name.shift(1).ffill()
        # ffill of name must only carry values from tool rows
        prior_name = prior_name.where(prior_turn.notna())
        errs = g["error_code"].notna()
        out = pd.DataFrame(
            {
                "conv_id": g.loc[errs, "conv_id"],
                "turn_idx": g.loc[errs, "turn_idx"].astype("int32"),
                "error_code": g.loc[errs, "error_code"],
                "prior_tool_turn": prior_turn[errs].astype("Int64"),
                "prior_tool_name": prior_name[errs],
            }
        )
        return out

    # NOTE: shift/ffill carries the LAST tool turn at or before each row-1;
    # tool rows themselves are never error rows in this schema, but the
    # implementation is still "strictly prior" by the shift(1).
    return _by_conv(keep, asof)


def last_per_conv(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """Last turn per conversation (AG3 last-value-per-group: assoc-array
    overwrite in the reference). Deterministic: max turn_idx wins."""
    keep = parsed.select_columns(["conv_id", "turn_idx", "role", "sink"])

    def last(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("turn_idx", kind="stable").tail(1)

    return _by_conv(keep, last)


BLOCK_BEGIN = "BEGIN_BLOCK id="
BLOCK_END = "END_BLOCK"


def reassemble_blocks(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Multi-turn record reassembly (ST5 — the GC `{Heap before GC …}` state
    machine, javaGCStatsParser.sh:158-283).

    A logical record spans turns from a `BEGIN_BLOCK id=X` line to the next
    `END_BLOCK` line within one conversation. Unterminated blocks are dropped
    (not crashed), mirroring the reference's per-file last-record handling.
    Emits (conv_id, block_id, start_turn, end_turn, n_lines, payload).
    """
    keep = transcripts.select_columns(["conv_id", "turn_idx", "text"])

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="stable")
        rows = []
        cur_id, cur_start, cur_lines = None, None, []
        for turn, text in zip(g["turn_idx"].to_numpy(), g["text"].to_numpy()):
            t = text or ""
            if t.startswith(BLOCK_BEGIN):
                cur_id = t[len(BLOCK_BEGIN):].split()[0]
                cur_start, cur_lines = turn, [t]
            elif cur_id is not None:
                cur_lines.append(t)
                if t.startswith(BLOCK_END):
                    rows.append(
                        {
                            "conv_id": g["conv_id"].iloc[0],
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

    return _by_conv(keep, assemble)
