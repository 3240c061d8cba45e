"""Raw text-log source: plain + gzip files → transcript schema → full
pipeline runs unchanged (the 'reference user switches today' path)."""

from __future__ import annotations

import gzip

from log_parser_ray.sources.rawlogs import read_raw_logs

LINES_A = [
    "ERROR [WSVR0001E] thread hung for 1200 ms",
    '<tool_call name="search" status="ok" rt_us=250000>',
    "GET /app/page3 status=200",
]
LINES_B = [
    "login uid=u42",
    "GET /app/page9 status=503",
    "note something unparseable",
    "OutOfMemory detected in heap dump",
]


def test_read_plain_and_gz(ray_session, tmp_path):
    (tmp_path / "serverA.log").write_text("\n".join(LINES_A) + "\n")
    (tmp_path / "serverB.log.gz").write_bytes(
        gzip.compress(("\n".join(LINES_B) + "\n").encode())
    )
    ds = read_raw_logs(str(tmp_path))
    df = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df[df["conv_id"] == "serverA"]["text"].tolist() == LINES_A
    assert df[df["conv_id"] == "serverB"]["text"].tolist() == LINES_B
    assert df[df["conv_id"] == "serverB"]["turn_idx"].tolist() == [0, 1, 2, 3]


def test_read_zip(ray_session, tmp_path):
    """.zip rotations (the reference's WAS format, unzip -p analogue):
    members concatenate in ARCHIVE order — the order `unzip -p` streams
    them — even when that differs from sorted-name order."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("part2.log", "\n".join(LINES_B) + "\n")
        zf.writestr("part1.log", "\n".join(LINES_A) + "\n")
    (tmp_path / "serverC.zip").write_bytes(buf.getvalue())
    df = read_raw_logs(str(tmp_path)).to_pandas()
    assert df["conv_id"].unique().tolist() == ["serverC"]
    # archive (write) order: part2 first, then part1 — NOT name order
    assert df["text"].tolist() == LINES_B + LINES_A
    assert df["turn_idx"].tolist() == list(range(len(LINES_A) + len(LINES_B)))


def test_file_pattern_filter(ray_session, tmp_path):
    (tmp_path / "access_log.0101").write_text("a\n")
    (tmp_path / "access_log.0102").write_text("b\n")
    ds = read_raw_logs(str(tmp_path), file_pattern="0102")
    assert ds.to_pandas()["text"].tolist() == ["b"]


def test_pipeline_over_raw_logs(ray_session, tmp_path):
    from log_parser_ray.pipelines import flagship

    (tmp_path / "serverA.log").write_text("\n".join(LINES_A) + "\n")
    (tmp_path / "serverB.log.gz").write_bytes(
        gzip.compress(("\n".join(LINES_B) + "\n").encode())
    )
    res = flagship.run(
        read_raw_logs(str(tmp_path)), str(tmp_path / "out"), enrich_concurrency=2
    )
    counts = dict(zip(res["sink_counts"]["sink"], res["sink_counts"]["n"]))
    assert res["rows"] == len(LINES_A) + len(LINES_B)
    assert counts["errors"] == 1      # WSVR line
    assert counts["filtered"] == 1    # OutOfMemory keyword hit
    assert counts["tools"] == 1
    assert counts["sessions"] == 1    # login line
    assert counts["http_errors"] == 1  # 503
    assert counts["http_ok"] == 1      # the single 200
    assert counts["unparsed"] == 1     # the 'note …' line


def test_localized_month_timestamps(ray_session, tmp_path):
    """M5 on non-English-locale logs (usage.sh:137-157: `date +%b` is
    LC_ALL-dependent): localized month tokens normalize to the English %b
    set in BOTH the raw-line ts extraction and the access parser's dt/tm."""
    import pyarrow as pa

    from log_parser_ray.sources.rawlogs import (
        extract_line_ts,
        normalize_month_tokens,
    )
    from log_parser_ray.stages.accesslog import parse_access_log

    UA = ("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:38.0) Gecko/20100101 "
          "Firefox/38.0")

    def line(stamp):
        return (f'10.0.0.1 - - [{stamp} -0500] "GET /app/x HTTP/1.1" 200 12 '
                f'JSESSIONID="0000S7X:cl1" UID="u7@e.com" 1000 1 2 "{UA}" web0')

    stamps = {
        "14/Okt/2015:10:32:04": "2015-10-14",   # German
        "01/août/2015:03:02:01": "2015-08-01",  # French
        "09/dic/2015:23:59:58": "2015-12-09",   # Spanish
        "13/Jun/2015:10:32:04": "2015-06-13",   # English stays
    }
    texts = pa.array([line(s) for s in stamps], pa.string())
    ts = extract_line_ts(texts).to_pylist()
    assert [str(t.date()) for t in ts] == list(stamps.values())

    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "line_id": pa.array(range(len(stamps)), pa.int64()),
        "text": texts,
    }))
    out = parse_access_log(ds).to_pandas().sort_values("line_id")
    assert out["dt"].tolist() == list(stamps.values())
    assert out["sink"].tolist() == ["parsed"] * len(stamps)

    # all-English input returns the INPUT array unchanged (zero-copy no-op)
    eng = pa.array(["13/Jun/2015:10:32:04", "01/Dec/2015:00:00:00"])
    assert normalize_month_tokens(eng) is eng


def test_binary_garbage_never_crashes(ray_session, tmp_path):
    """Real log files carry occasional binary garbage (crash dumps, torn
    writes): invalid UTF-8 and NUL bytes decode with errors='replace' and
    route to the unparsed sink — the run never raises."""
    import pyarrow.dataset as pads

    from log_parser_ray.pipelines import weblog

    logf = tmp_path / "access_log.bad"
    logf.write_bytes(
        b'10.0.0.1 - - [14/Jun/2015:10:00:00 -0500] "GET /x HTTP/1.1" 200 5 '
        b'JSESSIONID="-" UID="u@e.com" 100 1 2 "UA" web0\n'
        b"\x00\xff\xfe garbage \x80\x81 line\n"
        b"more \xc3(\x28 invalid utf8\n"
    )
    res = weblog.run(str(tmp_path), str(tmp_path / "out"),
                     file_pattern="access_log")
    assert res["total"] == 1  # the one valid record parses
    t = pads.dataset(str(tmp_path / "out" / "routed"), format="parquet",
                     partitioning="hive").to_table()
    sinks = sorted(t["sink"].to_pylist())
    assert t.num_rows == 3 and sinks.count("unparsed") == 2
