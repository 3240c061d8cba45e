"""Ordered per-conversation operators: pairing, as-of, reassembly."""

import datetime

import pandas as pd
import pyarrow as pa

import ray.data as rd

from log_parser_ray.stages.parse import parse_dataset
from log_parser_ray.stages.sessions import (
    asof_correlate,
    last_per_conv,
    reassemble_blocks,
    session_pairs,
)


def _tx(rows):
    """rows: list of (conv_id, turn_idx, text)."""
    base = datetime.datetime(2024, 1, 1)
    return rd.from_arrow(
        pa.table(
            {
                "conv_id": [r[0] for r in rows],
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": ["user"] * len(rows),
                "text": [r[2] for r in rows],
                "tool": [None] * len(rows),
                "ts": pa.array(
                    [base + datetime.timedelta(seconds=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )
    )


def test_session_pair_with_logout():
    ds = parse_dataset(
        _tx(
            [
                ("c1", 0, "login uid=u1"),
                ("c1", 5, "GET /a status=200"),
                ("c1", 9, '<tool_call name="checkout" status="ok" rt_us=10> logout'),
            ]
        )
    )
    out = session_pairs(ds).to_pandas()
    assert len(out) == 1
    assert out["n_logins"].iloc[0] == 1
    assert out["duration_us"].iloc[0] == 9_000_000


def test_session_missing_logout_is_null():
    ds = parse_dataset(_tx([("c1", 0, "login uid=u1"), ("c1", 1, "GET /a status=200")]))
    out = session_pairs(ds).to_pandas()
    assert pd.isna(out["duration_us"].iloc[0])
    assert pd.isna(out["logout_ts"].iloc[0])


def test_asof_prior_tool():
    ds = parse_dataset(
        _tx(
            [
                ("c1", 0, '<tool_call name="search" status="ok" rt_us=5>'),
                ("c1", 1, "ERROR [A1W] thread hung for 2 ms"),
                ("c1", 2, '<tool_call name="checkout" status="ok" rt_us=5>'),
                ("c1", 3, "ERROR [B2E] thread hung for 3 ms"),
                ("c2", 0, "ERROR [C3W] thread hung for 4 ms"),
            ]
        )
    )
    out = asof_correlate(ds).to_pandas().sort_values(["conv_id", "turn_idx"])
    assert list(out["prior_tool_name"].fillna("-")) == ["search", "checkout", "-"]


def test_last_per_conv():
    ds = parse_dataset(
        _tx([("c1", 0, "GET /a status=200"), ("c1", 7, "login uid=u2"), ("c2", 1, "note x")])
    )
    out = last_per_conv(ds).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert out["turn_idx"].tolist() == [7, 1]
    assert out["sink"].tolist() == ["sessions", "unparsed"]


def test_reassemble_blocks_and_drop_unterminated():
    ds = _tx(
        [
            ("c1", 0, "BEGIN_BLOCK id=b1 start"),
            ("c1", 1, "line two"),
            ("c1", 2, "END_BLOCK"),
            ("c1", 3, "BEGIN_BLOCK id=b2 start"),
            ("c1", 4, "never ends"),
            ("c2", 0, "no blocks here"),
        ]
    )
    out = reassemble_blocks(ds).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["block_id"] == "b1" and r["start_turn"] == 0 and r["end_turn"] == 2
    assert r["n_lines"] == 3 and "line two" in r["payload"]


def test_reassembly_order_independent_of_input_order():
    rows = [
        ("c1", 2, "END_BLOCK"),
        ("c1", 0, "BEGIN_BLOCK id=b1 x"),
        ("c1", 1, "mid"),
    ]
    out = reassemble_blocks(_tx(rows)).to_pandas()
    assert len(out) == 1 and out["n_lines"].iloc[0] == 3


def test_session_windows_gap_split():
    """Turns >30 min apart open a new session; boundaries are exact."""
    import numpy as np

    from log_parser_ray.stages.sessions import session_windows

    base = datetime.datetime(2024, 1, 1)
    rows, ts = [], []
    # c1: turns at 0s, 60s, then a 31-minute silence, then two more turns
    offs = [0, 60, 60 + 31 * 60, 60 + 31 * 60 + 10]
    for i, o in enumerate(offs):
        rows.append(("c1", i, f"turn {i}"))
        ts.append(base + datetime.timedelta(seconds=o))
    # c2: a single turn
    rows.append(("c2", 0, "only"))
    ts.append(base)
    tx = rd.from_arrow(
        pa.table(
            {
                "conv_id": [r[0] for r in rows],
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": ["user"] * len(rows),
                "text": [r[2] for r in rows],
                "tool": [None] * len(rows),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        )
    )
    out = (
        session_windows(parse_dataset(tx))
        .to_pandas()
        .sort_values(["conv_id", "session_idx"])
        .reset_index(drop=True)
    )
    assert list(out["conv_id"]) == ["c1", "c1", "c2"]
    assert list(out["session_idx"]) == [0, 1, 0]
    assert list(out["n_turns"]) == [2, 2, 1]
    assert list(out["duration_us"]) == [60_000_000, 10_000_000, 0]
    # partition property: every turn lands in exactly one session
    assert int(out["n_turns"].sum()) == len(rows)
    assert out["start_ts"].dtype == np.dtype("datetime64[us]")


def test_session_windows_boundary_is_exclusive():
    """A gap of exactly 30 min does NOT split (rule is strictly greater)."""
    from log_parser_ray.stages.sessions import session_windows

    base = datetime.datetime(2024, 1, 1)
    tx = rd.from_arrow(
        pa.table(
            {
                "conv_id": ["c", "c"],
                "turn_idx": pa.array([0, 1], pa.int32()),
                "role": ["user", "user"],
                "text": ["a", "b"],
                "tool": [None, None],
                "ts": pa.array(
                    [base, base + datetime.timedelta(minutes=30)], pa.timestamp("us")
                ),
            }
        )
    )
    out = session_windows(parse_dataset(tx)).to_pandas()
    assert len(out) == 1 and int(out["n_turns"].iloc[0]) == 2
