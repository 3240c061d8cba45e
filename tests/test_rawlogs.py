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
