"""Unit tests for the vectorized parse stage (FIXTURES.md F3 edge cases)."""

import datetime

import pyarrow as pa
import pytest

import ray.data as rd

from log_parser_ray.stages.parse import make_parser, parse_dataset


def _tx(texts, tools=None, roles=None):
    n = len(texts)
    ts = [datetime.datetime(2024, 1, 1, 7, 30, i % 60) for i in range(n)]
    return pa.table(
        {
            "conv_id": [f"c{i % 3}" for i in range(n)],
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": roles or ["user"] * n,
            "text": texts,
            "tool": tools or [None] * n,
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def parse_table(texts):
    return make_parser()(_tx(texts))


def test_error_extraction():
    t = parse_table(["ERROR [WSVR0605W] thread hung for 644907 ms"])
    assert t["error_code"][0].as_py() == "WSVR0605W"
    assert t["duration_ms"][0].as_py() == 644907
    assert t["severity"][0].as_py() == "W"
    assert t["sink"][0].as_py() == "errors"


def test_severity_suffix_e():
    t = parse_table(["ERROR [X9E] thread hung for 5 ms"])
    assert t["severity"][0].as_py() == "E"


def test_tool_call_extraction():
    t = parse_table(['<tool_call name="search" status="ok" rt_us=162452>'])
    assert t["tool_name"][0].as_py() == "search"
    assert t["tool_status"][0].as_py() == "ok"
    assert t["rt_us"][0].as_py() == 162452
    assert t["sink"][0].as_py() == "tools"


def test_rt_bucket_boundaries_exact():
    """<= semantics at exactly 1/5/10/20 s (webAccessLogParser.sh:465-481)."""
    us = [1_000_000, 1_000_001, 5_000_000, 5_000_001, 10_000_000,
          10_000_001, 20_000_000, 20_000_001]
    texts = [f'<tool_call name="t" status="ok" rt_us={u}>' for u in us]
    t = parse_table(texts)
    got = [b.as_py() for b in t["rt_bucket"]]
    assert got == ["01_le1", "02_le5", "02_le5", "03_le10", "03_le10",
                   "04_le20", "04_le20", "05_gt20"]


def test_http_codes_and_severity():
    t = parse_table(["GET /x status=200", "GET /x status=404", "GET /x status=503"])
    assert [s.as_py() for s in t["severity"]] == ["I", "W", "E"]
    assert [s.as_py() for s in t["sink"]] == ["http_ok", "http_errors", "http_errors"]


def test_filter_patterns_route_first():
    """Keyword filter wins over the structured route (ST4 before M2)."""
    t = parse_table(["ERROR [A1W] thread hung for 9 ms CORBA.X.NO_RESPONSE"])
    assert t["filtered"][0].as_py() is True
    assert t["sink"][0].as_py() == "filtered"
    assert t["error_code"][0].as_py() == "A1W"  # extraction still happens


def test_custom_filter_patterns():
    p = make_parser(filter_patterns=[r"kaboom"])
    t = p(_tx(["this went kaboom", "fine"]))
    assert [x.as_py() for x in t["sink"]] == ["filtered", "unparsed"]


def test_null_and_empty_text_route_to_unparsed():
    t = parse_table([None, ""])
    assert [x.as_py() for x in t["sink"]] == ["unparsed", "unparsed"]
    assert [x.as_py() for x in t["filtered"]] == [False, False]


def test_routing_is_partition(sf_dir):
    """Property: every row lands in exactly one sink (sink is never null)."""
    from log_parser_ray.sources.transcripts import transcripts_from_events

    ds = parse_dataset(transcripts_from_events(sf_dir))
    t = ds.to_pandas()
    assert t["sink"].notna().all()
    assert set(t["sink"].unique()) <= {
        "filtered", "errors", "tools", "http_errors", "http_ok", "sessions", "unparsed"
    }


def test_login_session_extraction():
    t = parse_table(["login uid=u42"])
    assert t["login_uid"][0].as_py() == "u42"
    assert t["sink"][0].as_py() == "sessions"


def test_extract_json_field(ray_session):
    """Vectorized flat-JSON scalar extraction: ints (non-integral and
    absent keys → NULL), floats, and strings; no per-row json.loads."""
    import pyarrow as pa

    from log_parser_ray.stages.parse import extract_json_field

    props = ['{"k": 87}', '{"k": -3, "z": 1}', '{"z": 5}', None,
             '{"k": 2.5}', '{"name": "bob", "k": 7}']
    ds = rd.from_arrow(pa.table({"props": props})).repartition(3)
    ints = extract_json_field(ds, "props", "k").to_pandas()["k"]
    assert ints.tolist()[:2] == [87, -3] and ints.iloc[5] == 7
    assert ints.isna().tolist() == [False, False, True, True, True, False]
    flts = extract_json_field(ds, "props", "k", typ=pa.float64()).to_pandas()["k"]
    assert flts.iloc[4] == 2.5 and flts.iloc[0] == 87.0
    strs = extract_json_field(
        ds, "props", "name", out="who", typ=pa.string()
    ).to_pandas()["who"]
    assert strs.tolist() == [None] * 5 + ["bob"]
