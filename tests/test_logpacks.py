"""Real-log-format parse packs: access-log, error-log/mpmstats, GC.

Golden pins use the UA strings the reference documents in its own comments
(webAccessLogParser.sh:505-524) — the cascade must classify each into the
same case family; field values are pinned to THIS engine's regex extraction
(documented deviation from AWK token arithmetic: same fields, same ordering,
regex-extracted)."""

from __future__ import annotations

import gzip
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def lines_ds(lines, ids=None):
    ids = ids if ids is not None else list(range(len(lines)))
    return ray.data.from_arrow(
        pa.table({"line_id": pa.array(ids, pa.int64()), "text": lines})
    )


# (ua, browser, os_name, os_flav, os_ver) — reference-documented examples
UA_GOLDEN = [
    ("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:38.0) Gecko/20100101 Firefox/38.0",
     "Firefox/38.0", "Windows NT 6.1", "WOW64", "6.1"),
    ("Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/44.0.2403.107 Safari/537.36",
     "Chrome/44.0.2403.107", "Windows NT 6.1", "WOW64", "6.1"),
    ("Mozilla/5.0 (iPad; CPU OS 8_1_2 like Mac OS X) AppleWebKit/600.1.4 (KHTML, like Gecko) Version/8.0 Mobile/12B440 Safari/600.1.4",
     "Version/8.0", "iPad", "like Mac OS X", "8_1_2"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 7_0 like Mac OS X) AppleWebKit/537.51.1 (KHTML, like Gecko) Version/7.0 Mobile/11A465 Safari/9537.53",
     "Version/7.0", "iPhone", "like Mac OS X", "7_0"),
    ("Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
     "MSIE/11.0", "Windows NT", "WOW64", "6.1"),
    ("Mozilla/4.0 (compatible; MSIE 7.0; Windows NT 6.0)",
     "MSIE 7.0", "Windows NT", "", "6.0"),
    ("Mozilla/5.0 (Linux; Android 5.0; SM-G900W8 Build/LRX21T) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/52.0.2743.98 Mobile Safari/537.36",
     "Chrome/52.0.2743.98", "Android", "SM-G900W8 Build/LRX21T", "5.0"),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/42.0.2311.135 Safari/537.36 Edge/12.10240",
     "Edge/12.10240", "Windows NT 10.0", "Win64", "10.0"),
    ("curl/7.29.0", "Other", "Other", "na", "na"),
]


def test_ua_cascade_golden():
    from log_parser_ray.stages.accesslog import classify_ua

    ua = pa.array([u for u, *_ in UA_GOLDEN])
    browser, os_name, os_flav, os_ver, unknown = classify_ua(ua)
    for i, (u, b, on, of, ov) in enumerate(UA_GOLDEN):
        assert browser[i].as_py() == b, (u, browser[i].as_py())
        assert os_name[i].as_py() == on, (u, os_name[i].as_py())
        assert os_flav[i].as_py() == of, (u, os_flav[i].as_py())
        assert os_ver[i].as_py() == ov, (u, os_ver[i].as_py())
    assert unknown[len(UA_GOLDEN) - 1].as_py() is True  # curl → side-output
    assert unknown[0].as_py() is False


def test_ua_cascade_sql_matches_arrow():
    """The generated SQL cascade and the Arrow cascade agree on every golden
    UA — both engines run RE2, shared patterns."""
    from log_parser_ray.stages.accesslog import classify_ua, ua_cascade_sql

    ua_strings = [u for u, *_ in UA_GOLDEN]
    con = duckdb.connect()
    con.execute("CREATE TABLE uas (ua VARCHAR)")
    for u in ua_strings:
        con.execute("INSERT INTO uas VALUES (?)", [u])
    sql = (
        f"SELECT {ua_cascade_sql('ua', 'browser')} AS browser, "
        f"{ua_cascade_sql('ua', 'os_name')} AS os_name, "
        f"{ua_cascade_sql('ua', 'os_flav')} AS os_flav, "
        f"{ua_cascade_sql('ua', 'os_ver')} AS os_ver FROM uas"
    )
    got_sql = con.execute(sql).df()
    browser, os_name, os_flav, os_ver, _ = classify_ua(pa.array(ua_strings))
    assert got_sql["browser"].tolist() == browser.to_pylist()
    assert got_sql["os_name"].tolist() == os_name.to_pylist()
    assert got_sql["os_flav"].tolist() == os_flav.to_pylist()
    assert got_sql["os_ver"].tolist() == os_ver.to_pylist()


def test_method_repair(ray_session):
    """M6: glued params…METHOD tokens repair to the method, residue joins
    params (webAccessLogParser.sh:327-378,415-420)."""
    from log_parser_ray.stages.accesslog import parse_access_log

    def mk(reqline):
        return (
            f'10.0.0.1 - - [13/Jun/2015:10:32:04 -0400] "{reqline}" 200 10 '
            f'JSESSIONID="-" UID="u@x" 1000 1 2 "curl/7.29.0" web0'
        )

    rows = [
        mk("GET /a/b.html HTTP/1.1"),
        mk("eventId=409970&consentComments=GET /SysgSso/redirect.jsp HTTP/1.1"),
        mk("x=1POST /svc/y?q=2 HTTP/1.1"),
    ]
    out = parse_access_log(lines_ds(rows)).to_pandas().sort_values("line_id")
    assert out["request"].tolist() == ["GET", "GET", "POST"]
    assert out["params"].tolist() == ["", "eventId=409970&consentComments=", "q=2&x=1"]
    assert out["uri_path"].tolist() == ["/a/b.html", "/SysgSso/redirect.jsp", "/svc/y"]


def test_url_decompose_special_cases(ray_session):
    """M7: `/` root and dotted-first-segment rules (webAccessLogParser.sh:380-414)."""
    from log_parser_ray.stages.accesslog import parse_access_log

    def mk(uri):
        return (
            f'10.0.0.1 - - [13/Jun/2015:10:32:04 -0400] "GET {uri} HTTP/1.1" 200 10 '
            f'JSESSIONID="-" UID="u@x" 1000 1 2 "curl/7.29.0" web0'
        )

    rows = [mk("/"), mk("/favicon.ico"), mk("/app/pages/item.jsp"), mk("/svc/data")]
    out = parse_access_log(lines_ds(rows)).to_pandas().sort_values("line_id")
    assert out["domain"].tolist() == ["/", "/", "app", "svc"]
    assert out["page"].tolist() == ["NA", "favicon.ico", "item.jsp", "data"]
    assert out["ext"].tolist() == ["NA", "ico", "jsp", "NA"]


def test_gc_unit_normalization(ray_session):
    """M18: K/B/M/G → K, incl. the B path absent from the synth grammar."""
    from log_parser_ray.stages.gclog import parse_gc_lines

    rows = [
        "jvm0 [GC [PSYoungGen: 10K->5K(100K)] 0.0010000 secs]",
        "jvm0 [GC [PSYoungGen: 2M->1M(4M)] 0.0010000 secs]",
        "jvm0 [Full GC [ParOldGen: 1G->1G(2G)] 0.0010000 secs]",
        "jvm0 [GC [PSYoungGen: 2048B->1024B(4096B)] 0.0010000 secs]",
        # sub-KB B values: awk divides in FLOAT and truncates only at print,
        # so diff = trunc(1300/1024 - 300/1024) = 0 (not 1-0) and pct comes
        # from the untruncated quotient (javaGCStatsParser.sh:379-381)
        "jvm0 [GC [PSYoungGen: 1300B->300B(2048B)] 0.0010000 secs]",
    ]
    out = parse_gc_lines(lines_ds(rows)).to_pandas().sort_values("line_id")
    assert out["before_k"].tolist() == [10, 2048, 1048576, 2, 1]
    assert out["after_k"].tolist() == [5, 1024, 1048576, 1, 0]
    assert out["total_k"].tolist() == [100, 4096, 2097152, 4, 2]
    assert out["diff_k"].tolist() == [5, 1024, 0, 1, 0]
    assert out["pause_us"].tolist() == [1000] * 5
    assert round(out["pct_after"].tolist()[4], 4) == round(300 / 1024 / 2 * 100, 4)


def test_mpmstats_plugin_order_insensitive(ray_session):
    """M16: plugin counters match regardless of order; absent plugin → 0."""
    from log_parser_ray.stages.errorlog import parse_mpmstats

    rdy = "ihs0 [Sun Jun 14 00:00:48 2015] [notice] mpmstats: rdy 50 bsy 10 rd 1 wr 5 ka 3 log 0 dns 0 cls 1"
    rows = [
        rdy,
        "ihs0 [Sun Jun 14 00:00:48 2015] [notice] bsy: 3 in mod_webgate.c, 5 in mod_was_ap22_http.c",
        "ihs1 [Sun Jun 14 00:00:48 2015] [notice] mpmstats: rdy 9 bsy 2 rd 0 wr 1 ka 0 log 0 dns 0 cls 0",
    ]
    out = parse_mpmstats(lines_ds(rows)).to_pandas().sort_values("srv")
    r0 = out[out["srv"] == "ihs0"].iloc[0]
    assert (r0["was_bsy"], r0["wbg_bsy"]) == (5, 3)
    r1 = out[out["srv"] == "ihs1"].iloc[0]
    assert (r1["was_bsy"], r1["wbg_bsy"]) == (0, 0)  # absent side → 0


def test_error_families_fused_parse(ray_session):
    """master's ONE-read tagged-union error parse yields exactly the rows of
    the separate parse_error_lines / parse_mpmstats passes (the fused stage
    exists so raw text never pins the object store)."""
    from log_parser_ray.stages.errorlog import (
        parse_error_families,
        parse_error_lines,
        parse_mpmstats,
        split_error_families,
    )

    rows = [
        "ihs0 [Sun Jun 14 00:00:48 2015] [error] [client 10.0.0.9] "
        "File does not exist: /x, referer: http://a/b",
        "ihs0 [Sun Jun 14 00:00:48 2015] [notice] mpmstats: rdy 50 bsy 10 "
        "rd 1 wr 5 ka 3 log 0 dns 0 cls 1",
        "ihs0 [Sun Jun 14 00:00:48 2015] [notice] bsy: 3 in mod_webgate.c, "
        "5 in mod_was_ap22_http.c",
        "ihs1 [Sun Jun 14 00:00:49 2015] [notice] mpmstats: rdy 9 bsy 2 "
        "rd 0 wr 1 ka 0 log 0 dns 0 cls 0",
        "not a parseable line at all",
    ]
    errs, mpm = split_error_families(parse_error_families(lines_ds(rows)))
    got_errs = errs.to_pandas().sort_values("line_id").reset_index(drop=True)
    exp_errs = (
        parse_error_lines(lines_ds(rows)).to_pandas()
        .sort_values("line_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_errs, exp_errs)
    got_mpm = mpm.to_pandas().sort_values("srv").reset_index(drop=True)
    exp_mpm = (
        parse_mpmstats(lines_ds(rows)).to_pandas()
        .sort_values("srv").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got_mpm[sorted(got_mpm.columns)], exp_mpm[sorted(exp_mpm.columns)]
    )


def test_raw_access_log_file_hourly_vs_duckdb(ray_session, sf_dir, tmp_path):
    """VERDICT #6: a real access_log FILE (plain + gz) read through
    read_raw_logs gets real per-line timestamps, and hourly aggregates over
    it match a DuckDB oracle parsing the same lines."""
    from log_parser_ray.sources.accesssynth import synth_access_lines
    from log_parser_ray.sources.rawlogs import read_raw_logs
    from log_parser_ray.stages.aggregate import grouped_count

    lines = synth_access_lines(sf_dir).to_pandas().sort_values("line_id")
    half = len(lines) // 2
    plain = tmp_path / "access_log.0613"
    gz = tmp_path / "access_log.0614.gz"
    plain.write_text("\n".join(lines["text"][:half]) + "\n")
    with gzip.open(gz, "wt") as fh:
        fh.write("\n".join(lines["text"][half:]) + "\n")

    ds = read_raw_logs(str(tmp_path), file_pattern="access_log")
    import pyarrow.compute as pc

    with_hour = ds.map_batches(
        lambda t: t.append_column("hour", pc.cast(pc.hour(t["ts"]), pa.int32())),
        batch_format="pyarrow",
    )
    got = (
        grouped_count(with_hour, ["hour"], alias="n")
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT CAST(EXTRACT(hour FROM strptime(
                 regexp_extract(line, '\\[(\\d\\d/\\w+/\\d{{4}}:\\d\\d:\\d\\d:\\d\\d)', 1),
                 '%d/%b/%Y:%H:%M:%S')) AS INTEGER) AS hour,
               COUNT(*) AS n
        FROM (
          SELECT column0 AS line FROM read_csv(
            ['{plain}', '{gz}'], delim=chr(7), header=false, quote='')
        ) GROUP BY 1 ORDER BY 1
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


GOLDEN_RPT = "/root/reference/sample_reports/02_WebAccessLogSummaryRpt.txt"


def _golden_text():
    return open(GOLDEN_RPT).read()


def test_golden_report_response_code_percentages(ray_session):
    """Golden-report conformance (SURVEY §5): the reference's committed
    response-code table prints counts AND percentages
    (webAccessLogParser.sh:1164-1190). Feeding the golden counts through
    THIS engine's percentage derivation (the AG5 q_sink_pct machinery) must
    reproduce every printed percentage and the printed total."""
    import re

    from log_parser_ray.stages.aggregate import grouped_stats

    txt = _golden_text()
    sec = txt.split("===== Statistics by HTTP response code =====")[1]
    rows = [
        (int(m.group(1)), int(m.group(2)), float(m.group(3)))
        for m in re.finditer(r"^(\d{3})\t\s*(\d+)\t\s*([\d.]+)$", sec, re.M)
    ]
    assert len(rows) == 8
    total_printed = int(re.search(r"Total response count: (\d+)", sec).group(1))

    counts = pd.DataFrame(
        {"rsp": [r[0] for r in rows], "n": [r[1] for r in rows]}
    )
    total = int(counts["n"].sum())
    assert total == total_printed  # AG7 grand total vs the golden report
    # AG5 percentage derivation, reference rounding (%.3f)
    got_pc = (100.0 * counts["n"] / total).round(3)
    assert got_pc.tolist() == [r[2] for r in rows]


def test_golden_report_hourly_totals():
    """The golden hourly table's incl/excl counts must sum to the daily
    row's totals — the AG7/AG14 additivity our per-hour aggregation relies
    on, pinned against the reference's committed numbers."""
    import re

    txt = _golden_text()
    sec = txt.split("===== Hourly Statistics =====")[1].split(
        "===== Overall-Daily Statistics ====="
    )[0]
    rows = [l.split() for l in sec.splitlines() if re.match(r"^\d+\s", l)]
    assert len(rows) == 17
    daily = txt.split("===== Overall-Daily Statistics =====")[1]
    drow = [l.split() for l in daily.splitlines() if re.match(r"^\d{4}-", l)][0]
    assert sum(int(r[-2]) for r in rows) == int(drow[-2])  # xrc
    assert sum(int(r[-1]) for r in rows) == int(drow[-1])  # irc


def test_weblog_pipeline_end_to_end(ray_session, sf_dir, tmp_path):
    """The full webAccessLogParser-shape run over real files: routed sinks,
    report tables, and the rendered summary report — numbers cross-checked
    against the events-derived DuckDB truth."""
    from log_parser_ray.pipelines import weblog
    from log_parser_ray.sources.accesssynth import access_truth_cte, synth_access_lines

    lines = synth_access_lines(sf_dir).to_pandas().sort_values("line_id")
    logf = tmp_path / "access_log.1103"
    logf.write_text("\n".join(lines["text"]) + "\n")

    out = str(tmp_path / "rpt")
    res = weblog.run(str(tmp_path), out, file_pattern="access_log")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    truth = con.execute(
        "WITH " + access_truth_cte()
        + " SELECT response, COUNT(*) AS cnt FROM access_truth"
          " WHERE sink = 'parsed' GROUP BY response ORDER BY response"
    ).df()
    rc = res["response_codes"]
    assert rc["response"].tolist() == truth["response"].tolist()
    assert rc["cnt"].tolist() == truth["cnt"].tolist()
    assert res["total"] == int(truth["cnt"].sum())
    # percentage arithmetic identical to the golden-report rule
    assert rc["pc"].tolist() == (100.0 * rc["cnt"] / res["total"]).round(3).tolist()
    # hourly additivity: per-hour incl counts sum to the daily total
    assert int(res["hourly"]["irc"].sum()) == res["total"]
    assert (res["hourly"]["xrc"] <= res["hourly"]["irc"]).all()
    # rendered report exists with the golden section headers
    txt = open(res["report_path"]).read()
    assert "===== Hourly Statistics =====" in txt
    assert "===== Statistics by HTTP response code =====" in txt
    assert f"Total response count: {res['total']}" in txt
    # routed sinks written
    assert os.path.isdir(os.path.join(out, "routed", "sink=parsed"))
    # global http alert rules evaluated on the day totals: values must
    # reproduce from the report tables (rule arithmetic, not just presence)
    al = res["alerts"]
    assert set(al.columns) == {"rule", "key", "value", "threshold"}
    from log_parser_ray.schema import FAMILY_THRESHOLDS
    for _, r in al.iterrows():
        assert r["threshold"] == FAMILY_THRESHOLDS[r["rule"]]
    n400 = int(rc.loc[rc["response"] >= 400, "cnt"].sum())
    pct400 = 100.0 * n400 / res["total"]
    has_400_alert = ("http.http400PlusRespCountTh" in set(al["rule"]))
    assert has_400_alert == (pct400 > FAMILY_THRESHOLDS["http.http400PlusRespCountTh"])
    if has_400_alert:
        got = float(al.loc[al["rule"] == "http.http400PlusRespCountTh", "value"].iloc[0])
        # the shared rule helper rounds 6dp before the compare (oracle twin)
        assert got == round(pct400, 6)
    # discarded-count rule sees the sink histogram
    assert "sink_counts" in res and "sink" in res["sink_counts"].columns
    # domain-usage tables (webAccessLogParser.sh:1246-1267): all three CSVs
    # render; daily distinct-user counts pinned against truth
    for f in ("WebHourlyDomainUsageByUid.csv", "WebHourlyDomainUsageBySess.csv",
              "WebDlyDomainUsage.csv"):
        assert os.path.isfile(os.path.join(out, f)), f
    dd = res["domain_daily"]
    exp_dd = con.execute(
        "WITH " + access_truth_cte()
        + " SELECT domain, COUNT(DISTINCT uid) AS uuc FROM access_truth"
          " WHERE sink = 'parsed' GROUP BY domain ORDER BY domain"
    ).df()
    assert dd["domain"].tolist() == exp_dd["domain"].tolist()
    assert dd["uuc"].tolist() == exp_dd["uuc"].tolist()
    # hourly pivot row sums = daily non-distinct upper bound sanity: every
    # domain present with 24 hour columns
    assert list(res["domain_hourly_uid"].columns) == ["domain"] + [
        f"H{i}" for i in range(24)]
    # unknown-UA review file: one raw line per record whose agent missed the
    # cascade (webAccessLogParser.sh:652,1544-1546)
    unk = res["unknown_ua_path"]
    n_unk = int(con.execute(
        "WITH " + access_truth_cte()
        + " SELECT COUNT(*) FROM access_truth WHERE ua_unknown"
    ).fetchone()[0])
    assert unk and os.path.basename(unk) == "WebAccessLogSummaryUnknowUARpt.csv"
    assert len(open(unk).read().splitlines()) == n_unk
    # full 02 layout: every reference section renders, daily row arithmetic
    for section in [
        "===== Overall-Daily Statistics =====",
        "===== Statistics by Web Server(IHS)  and WebSphere App Server (WAS) =====",
        "===== Top 10 (slowest) responses by Response Time =====",
        "===== Top 10 (by count) URL ending with HTTP response code 400 and higher =====",
        "===== Summary by Domain - Top 5 (slowest) by average response time =====",
        "===== Top 5 (slowest) UIDs by Average Response Time =====",
        "===== Summary by Extension =====",
        "===== Browser Usage Statistics =====",
        "===== OS Usage Statistics =====",
    ]:
        assert section in txt, section
    d = res["daily"]
    assert d["irc"] == res["total"]
    assert d["xrc"] == int(res["hourly"]["xrc"].sum())
    # day-level distinct users vs the truth (NOT the hourly sum)
    t_uuc = con.execute(
        "WITH " + access_truth_cte()
        + " SELECT COUNT(DISTINCT uid) FROM access_truth WHERE sink = 'parsed'"
    ).fetchone()[0]
    assert d["uuc"] == t_uuc
    # per-WS share percentages cover the day
    assert abs(res["ws"]["irpc"].sum() - 100.0) < 0.1
    assert abs(res["ws"]["xrpc"].sum() - 100.0) < 0.1
    # raw top-10 is sorted by rt descending and ≤10 rows
    raw = res["topslow_raw"]
    assert len(raw) <= 10 and (raw["rt_us"].diff().dropna() <= 0).all()
    # 400+ table only has 400+ codes
    assert (res["top400"]["response"] >= 400).all()
    # FULL detail CSVs (webAccessLogParser.sh:1331-1436): per-UID, per-URI,
    # per-domain files render, sorted by avg desc, counts additive vs truth
    uidf = res["uid_detail_path"]
    urif = res["uri_detail_path"]
    assert uidf and os.path.basename(uidf) == "WebAccessLogSummaryByUIDRpt.csv"
    assert urif and os.path.basename(urif) == "WebAccessLogSummaryByTransactionRpt.csv"
    assert os.path.isfile(os.path.join(out, "WebAccessLogSummaryByDomainRpt.csv"))
    # full 400+ URL list: count column reconciles with the response-code table
    rc400 = [ln.split("\t") for ln in open(os.path.join(
        out, "WebAccessLogSummaryByRC400PlusURLRpt.csv")).read().splitlines()[1:]]
    assert sum(int(r[1]) for r in rc400) == int(
        rc.loc[rc["response"] >= 400, "cnt"].sum())
    uri_rows = [ln.split("\t") for ln in open(urif).read().splitlines()[1:]]
    assert sum(int(r[5]) for r in uri_rows) == res["total"]
    arts = [float(r[8]) for r in uri_rows]
    assert arts == sorted(arts, reverse=True)
    uid_rows = [ln.split("\t") for ln in open(uidf).read().splitlines()[1:]]
    from log_parser_ray.pipelines.weblog import STATIC_EXTS
    static_sql = ", ".join(f"'{e}'" for e in STATIC_EXTS)
    t_nuid = con.execute(
        "WITH " + access_truth_cte()
        + " SELECT COUNT(DISTINCT uid) FROM access_truth WHERE sink = 'parsed'"
          f" AND ext NOT IN ({static_sql})"
    ).fetchone()[0]
    assert len(uid_rows) == t_nuid


def test_master_orchestrator(ray_session, sf_dir, tmp_path):
    """S4: one run dispatches every log family by filename pattern, writes
    per-family parquet, and records S5 lineage per family."""
    import glob
    import json

    import ray.data as rd

    from log_parser_ray.pipelines import master
    from log_parser_ray.sources.accesssynth import synth_access_lines
    from log_parser_ray.stages.errorlog import synth_error_lines
    from log_parser_ray.stages.gclog import synth_gc_lines
    from log_parser_ray.stages.waslog import synth_was_lines

    logd = tmp_path / "logs"
    logd.mkdir()
    for name, synth in [
        ("access_log.1103", synth_access_lines),
        ("error_log.1103", synth_error_lines),
        ("SystemOut.log", synth_was_lines),
        ("native_stdout.log", synth_gc_lines),
    ]:
        df = synth(sf_dir).to_pandas().sort_values("line_id")
        (logd / name).write_text("\n".join(df["text"]) + "\n")
    # a second native_stdout with REAL multi-line {Heap before GC…} blocks
    from log_parser_ray.stages.gclog import synth_gc_stream

    mdf = synth_gc_stream(sf_dir).to_pandas().sort_values("turn_idx")
    (logd / "native_stdout2.log").write_text("\n".join(mdf["text"]) + "\n")

    out = str(tmp_path / "master_out")
    res = master.run(str(logd), out)
    assert set(res) == {"access", "error", "was", "gc"}
    assert res["gc"] == 2000  # 1000 single-line records + 1000 invocations
    assert res["was"] == 1000
    assert res["error"] == 500  # error lines are the eid%2==0 half
    # error-family report edges: referrer ranking + per-server max-bsy row
    assert os.path.isfile(os.path.join(out, "error", "errCntByRef.csv"))
    # IHS recycle notices surface as unconditional alert rows
    # (webErrorLogParser.sh:248-253); synth plants one per eid%40==0
    al = pd.read_csv(os.path.join(out, "alerts.csv"))
    n_rcy = int((al["rule"] == "http.recycle").sum())
    exp_rcy = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet' WHERE event_id % 40 = 0"
    ).fetchone()[0]
    assert n_rcy == exp_rcy
    assert al.loc[al["rule"] == "http.recycle", "key"].str.contains(
        " recycled at: ").all()
    # the _all CSV carries EVERY mpmstats record (webErrorLogParser.sh:40,
    # 353-360), not just the per-server max — header + one row per odd eid
    mpmcsv = os.path.join(out, "error", "WebErrorLogMpmStatsRpt_all.csv")
    n_mpm = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet' WHERE event_id % 2 = 1"
    ).fetchone()[0]
    mpm_lines = open(mpmcsv).read().splitlines()
    assert len(mpm_lines) == 1 + n_mpm
    # header byte-identical to the reference's committed golden
    golden_hdr = open("/root/reference/sample_reports/"
                      "WebErrorLogMpmStatsRpt_all.csv").readline().rstrip("\n")
    assert mpm_lines[0] == golden_hdr
    # date column in the golden's Mon-DD-YYYY form
    assert mpm_lines[1].split("\t")[1].count("-") == 2
    assert os.path.isfile(os.path.join(out, "00_Alert.txt"))
    assert rd.read_parquet(os.path.join(out, "gc", "invocations")).count() == 1000
    # 01/04 summary reports rendered from the same run (reports.py)
    assert os.path.isfile(os.path.join(out, "was", "01_WASLogSummaryRpt.txt"))
    # the nine standalone WAS CSVs (websphereLogParser.sh:56-64): eight full
    # rankings (superset of the 01 top-10s, sorted by count desc) + the
    # filtered-error detail stream
    for pre in ("Err", "Warn"):
        for dim in ("Cmp", "Class", "Exp", "Msg"):
            f = os.path.join(out, "was", f"WASLogSummaryBy{pre}{dim}Rpt.csv")
            assert os.path.isfile(f), f
    cmp_lines = open(os.path.join(
        out, "was", "WASLogSummaryByErrCmpRpt.csv")).read().splitlines()[1:]
    cnts = [int(ln.split("\t")[2]) for ln in cmp_lines]
    assert cnts == sorted(cnts, reverse=True) and len(cnts) >= 1
    filt_f = os.path.join(out, "was", "WASLogFilteredErrRpt.csv")
    assert os.path.isfile(filt_f)
    gc_txt = open(os.path.join(out, "gc", "04_GCSummaryRpt.txt")).read()
    # multi-line heap blocks present → the golden's last-GC-per-JVM section
    assert ("========= Last Verbose GC  record for each JVM parsed and "
            "extracted from native_stdout.log =========") in gc_txt
    assert os.path.isfile(os.path.join(out, "alerts.csv"))
    # per-family lineage lines
    lines = []
    for f in glob.glob(os.path.join(out, "_manifest-*.jsonl")):
        lines += [json.loads(l) for l in open(f) if l.strip()]
    assert sorted(l["partition"] for l in lines if l["status"] == "done") == [
        "family=access", "family=error", "family=gc", "family=was",
    ]
    # parsed parquet written per family
    assert rd.read_parquet(os.path.join(out, "was", "tto")).count() > 0


# --- property: the access parser inverts the line format for arbitrary
# field values (beyond the synth grammar), with URL decomposition checked
# against an independent re-implementation of the AWK rules
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_slow = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_seg = st.text(alphabet="abcz09", min_size=1, max_size=6)
_uri = st.one_of(
    st.just("/"),
    st.builds(lambda s: f"/{s}.ico", _seg),                    # dotted first seg
    st.builds(lambda a, b: f"/{a}/{b}", _seg, _seg),           # no ext
    st.builds(lambda a, b: f"/{a}/{b}.jsp", _seg, _seg),       # ext
    st.builds(lambda a, b, c: f"/{a}/{b}/{c}.html", _seg, _seg, _seg),
)


def _awk_url_rules(uri):
    """Independent transcription of webAccessLogParser.sh:380-414."""
    if uri == "":
        return "NA", "NA", "NA"
    if uri == "/":
        return "/", "NA", "NA"
    segs = uri.split("/")  # segs[0] == ''
    first = segs[1]
    if "." in first:
        page = first
        return "/", page, page.split(".")[1]
    domain = first
    page = segs[-1]
    if "." in page:
        return domain, page, page.split(".")[-1]
    return domain, page, "NA"


@_slow
@given(
    method=st.sampled_from(["GET", "POST", "DELETE", "PROPATCH"]),
    glue=st.one_of(st.just(""), st.just("a=1&b=2")),
    uri=_uri,
    q=st.one_of(st.just(""), st.just("x=9")),
    code=st.sampled_from([200, 302, 404, 503]),
    rt=st.integers(min_value=0, max_value=30_000_000),
    sess=st.one_of(st.just("-"), st.builds(lambda s: f"0000{s}:cl{s}", _seg)),
    uid=st.one_of(st.just("-"), st.builds(lambda s: f"{s}@x.com", _seg)),
)
def test_access_parser_roundtrip(ray_session, method, glue, uri, q, code, rt, sess, uid):
    from log_parser_ray.stages.accesslog import parse_access_log

    tok1 = glue + method
    target = uri + (f"?{q}" if q else "")
    line = (
        f'1.2.3.4 - - [13/Jun/2015:10:32:04 -0400] "{tok1} {target} HTTP/1.1" '
        f'{code} 10 JSESSIONID="{sess}" UID="{uid}" {rt} 1 2 "curl/7.29.0" web0'
    )
    out = parse_access_log(lines_ds([line])).to_pandas().iloc[0]
    assert out["request"] == method
    assert out["uri_path"] == uri
    exp_params = (q + "&" + glue) if (q and glue) else (glue or q)
    assert out["params"] == exp_params
    assert out["response"] == code
    assert out["rt_us"] == rt
    d, p, e = _awk_url_rules(uri)
    assert (out["domain"], out["page"], out["ext"]) == (d, p, e)
    if sess == "-":
        assert (out["jsession"], out["clone_id"]) == ("-", "-")
    else:
        assert out["jsession"] == sess[4:].split(":")[0]
        assert out["clone_id"] == sess.split(":")[1]
    assert out["uid"] == uid
    assert out["hour"] == 10
    exp_range = ("<=1sec" if rt <= 1e6 else "<=5sec" if rt <= 5e6 else
                 "<=10sec" if rt <= 10e6 else "<=20sec" if rt <= 20e6 else ">20sec")
    assert out["resp_range"] == exp_range


def test_whereuid_user_sessions_report(ray_session, tmp_path):
    """The whereuid login→logout session report
    (webAccessLogParser.sh:715-719,1273-1295): latest login / latest logout
    per (ws, was, clnid, js, uid), 'na' when never logged out, logout-only
    and no-jsession keys dropped, sorted by uid, space-separated layout."""
    from log_parser_ray.pipelines import weblog

    UA = ("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:38.0) Gecko/20100101 "
          "Firefox/38.0")

    def line(tm, uri, js, uid, ws="web0"):
        return (f'10.0.0.1 - - [14/Jun/2015:{tm} -0500] "GET {uri} HTTP/1.1" '
                f'200 123 JSESSIONID="{js}" UID="{uid}" 1000 10 20 "{UA}" {ws}')

    login = "/SecurityWeb/roleSelect/loginRoleSelect.xhtml"
    rows = [
        line("10:00:00", login, "0000S7X:cl1", "u7@example.com"),
        # a LATER login for the same key — last one wins
        line("11:00:00", login, "0000S7X:cl1", "u7@example.com"),
        line("11:30:00", "/SecurityWeb/Portal?logout=true&x=1",
             "0000S7X:cl1", "u7@example.com"),
        # login with no logout → endtm/diff 'na'
        line("09:00:00", login, "0000S8X:cl2", "u8@example.com"),
        # logout with no login → dropped
        line("09:30:00", "/SecurityWeb/Portal?logout=true",
             "0000S9X:cl3", "u9@example.com"),
        # no jsession → never marks
        line("09:45:00", login, "-", "u10@example.com"),
        # an ordinary row (no marker)
        line("12:00:00", "/app/x", "0000S7X:cl1", "u7@example.com"),
    ]
    (tmp_path / "access_log.1").write_text("\n".join(rows) + "\n")
    res = weblog.run(str(tmp_path), str(tmp_path / "rpt"),
                     file_pattern="access_log")
    path = res["user_sessions_path"]
    assert path and os.path.isfile(path)
    assert os.path.basename(path) == "WebAccessLogSummaryByUidSessionRpt.csv"
    got = open(path).read().splitlines()
    assert got[0] == "ws was clnid js uid strtm endtm diff"
    assert got[1:] == [
        "web0 WAS_B cl1 S7X u7@example.com "
        "2015-06-14:11:00:00 2015-06-14:11:30:00 1800",
        "web0 WAS_C cl2 S8X u8@example.com 2015-06-14:09:00:00 na na",
    ]

    # a run with no markers at all writes NO session file (the reference's
    # length(arrWhereUidStart)>0 guard)
    (tmp_path / "plain" ).mkdir()
    (tmp_path / "plain" / "access_log.2").write_text(
        line("12:00:00", "/app/x", "0000S7X:cl1", "u7@example.com") + "\n")
    res2 = weblog.run(str(tmp_path / "plain"), str(tmp_path / "rpt2"),
                      file_pattern="access_log")
    assert res2["user_sessions_path"] is None


def test_weblog_rerun_replaces_sinks(ray_session, tmp_path):
    """A rerun into the same out_dir over CHANGED input REPLACES the routed
    parquet sinks and the unknown-UA side sink — content-named parts are
    idempotent only for task retries within one run; across runs the old
    parts' names never collide, so without the run-start clear a corrected
    day's rerun would read stale rows next to fresh ones."""
    import pyarrow.dataset as pads

    from log_parser_ray.pipelines import weblog

    UA = ("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:38.0) Gecko/20100101 "
          "Firefox/38.0")

    def line(n, ua=UA):
        return (f'10.0.0.{n} - - [14/Jun/2015:10:00:{n:02d} -0500] '
                f'"GET /app/x{n} HTTP/1.1" 200 12 JSESSIONID="0000S7X:cl1" '
                f'UID="u{n}@e.com" 1000 1 2 "{ua}" web0')

    logf = tmp_path / "access_log.1"
    out = str(tmp_path / "rpt")
    # first run: 6 rows, 2 of them unknown-UA
    logf.write_text("\n".join(
        [line(n) for n in range(4)]
        + [line(n, ua="WeirdAgent/1.0") for n in (4, 5)]) + "\n")
    res1 = weblog.run(str(tmp_path), out, file_pattern="access_log")
    assert res1["total"] == 6
    # corrected rerun: only 3 rows, none unknown
    logf.write_text("\n".join(line(n) for n in range(10, 13)) + "\n")
    res2 = weblog.run(str(tmp_path), out, file_pattern="access_log")
    assert res2["total"] == 3
    routed = pads.dataset(os.path.join(out, "routed"), format="parquet",
                          partitioning="hive").to_table()
    assert routed.num_rows == 3  # stale first-run parts replaced
    # the unknown-UA sink cleared (first run had 2, rerun has none)
    unk = os.path.join(out, "unknownua")
    assert os.path.isdir(unk) and not any(
        f.endswith(".parquet") for f in os.listdir(unk))
    # the first run's UA review file dropped too (no unknowns in the rerun)
    assert not os.path.exists(
        os.path.join(out, "WebAccessLogSummaryUnknowUARpt.csv"))


def test_write_user_sessions_multiblock_order(ray_session, tmp_path):
    """write_user_sessions renders a MULTI-block session table in global
    uid order: the iteration pins preserve_order for its execution window
    (the _stream_csv hazard — without it the streaming executor yields
    sorted blocks in completion order and the file interleaves)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from log_parser_ray.pipelines.weblog import write_user_sessions

    rng = np.random.RandomState(11)
    uids = [f"u{i:05d}@example.com" for i in rng.permutation(4000)]
    df = pd.DataFrame({
        "ws": "web0", "was": "WAS_A", "clnid": "cl0", "js": "S1",
        "uid": uids, "strtm": "2015-06-14:10:00:00",
        "endtm": "2015-06-14:11:00:00", "diff": 3600,
    })
    ds = ray.data.from_pandas(df).repartition(16)
    path = write_user_sessions(ds, str(tmp_path))
    got = [ln.split()[4] for ln in open(path).read().splitlines()[1:]]
    assert got == sorted(got) and len(got) == 4000


def test_weblog_history_append_idempotent(ray_session, sf_dir, tmp_path):
    """IO5 on the real pack: daily history appends are idempotent per date
    (a rerun of the same day replaces, never double-appends)."""
    import pyarrow.parquet as pq

    from log_parser_ray.pipelines import weblog
    from log_parser_ray.sources.accesssynth import synth_access_lines

    lines = synth_access_lines(sf_dir).to_pandas().sort_values("line_id")
    (tmp_path / "access_log.1103").write_text("\n".join(lines["text"]) + "\n")
    hist = str(tmp_path / "history")
    for _ in range(2):  # rerun same day → same history
        weblog.run(str(tmp_path), str(tmp_path / "o"), file_pattern="access_log",
                   history_root=hist, run_date="2017-11-03")
    h = pq.read_table(hist + "/access_response_codes").to_pandas()
    assert len(h) == len(h.drop_duplicates(subset=["response"]))
    assert set(h["date"].astype(str)) == {"2017-11-03"}
    # a second day appends alongside
    weblog.run(str(tmp_path), str(tmp_path / "o2"), file_pattern="access_log",
               history_root=hist, run_date="2017-11-04")
    h2 = pq.read_table(hist + "/access_response_codes").to_pandas()
    assert set(h2["date"].astype(str)) == {"2017-11-03", "2017-11-04"}
    # all eight reference history families exist (webAccessLogParser.sh:
    # 57-109: perf/hourly/codes/top-slow/alerts + request-type, by-IHS,
    # by-WAS stats rows)
    for fam, keys in [("access_request_types", ["websrvr", "request"]),
                      ("access_stats_by_ihs", ["websrvr"]),
                      ("access_stats_by_was", ["was"])]:
        t = pq.read_table(os.path.join(hist, fam)).to_pandas()
        assert set(t["date"].astype(str)) == {"2017-11-03", "2017-11-04"}
        one = t[t["date"].astype(str) == "2017-11-03"]
        assert len(one) == len(one.drop_duplicates(subset=keys)), fam
    ihs = pq.read_table(hist + "/access_stats_by_ihs").to_pandas()
    assert {"uuc", "jsc", "art", "xrpc", "irpc"} <= set(ihs.columns)


@_slow
@given(
    jvm=st.integers(min_value=0, max_value=7),
    full=st.booleans(),
    b=st.integers(min_value=0, max_value=99999),
    a=st.integers(min_value=0, max_value=99999),
    t=st.integers(min_value=1, max_value=99999),
    unit=st.sampled_from(["K", "M", "G"]),
    frac=st.integers(min_value=0, max_value=9999999),
)
def test_gc_parser_roundtrip(ray_session, jvm, full, b, a, t, unit, frac):
    from log_parser_ray.stages.gclog import parse_gc_lines

    typ = "Full GC" if full else "GC"
    seg = "ParOldGen" if full else "PSYoungGen"
    line = f"jvm{jvm} [{typ} [{seg}: {b}{unit}->{a}{unit}({t}{unit})] 0.{frac:07d} secs]"
    out = parse_gc_lines(lines_ds([line])).to_pandas().iloc[0]
    mult = {"K": 1, "M": 1024, "G": 1024 * 1024}[unit]
    assert out["jvm"] == f"jvm{jvm}" and out["gc_type"] == typ
    assert out["before_k"] == b * mult and out["after_k"] == a * mult
    assert out["total_k"] == t * mult
    assert out["diff_k"] == (b - a) * mult
    # same float pipeline as the parser (string → float64 → ×1e6 → half-even)
    import numpy as np

    assert out["pause_us"] == int(np.round(np.float64(f"0.{frac:07d}") * 1e6))


def test_gc_multiline_raw_file(ray_session, tmp_path):
    """REAL multi-line verbose-GC stream (-XX:+PrintGCDetails
    -XX:+PrintHeapAtGC) from a raw native_stdout file: reassembles the
    `{Heap before GC …}` … `}` blocks and parses them to the reference's
    .vgc.all row set (javaGCStatsParser.sh:158-283). Pins: a minor GC takes
    old/perm values from the Heap-before/after sections, a Full GC from the
    GC line; the trailing unterminated block is dropped."""
    from log_parser_ray.sources.rawlogs import read_raw_logs
    from log_parser_ray.stages.gclog import (
        parse_gc_invocations,
        reassemble_gc_blocks,
    )

    minor = """{Heap before GC invocations=123 (full 4):
 PSYoungGen      total 2672384K, used 2546048K [0x0,0x0)
  eden space 2377728K, 100% used [0x0,0x0)
 ParOldGen       total 5595136K, used 5578700K [0x0,0x0)
  object space 5595136K, 99% used [0x0,0x0)
 PSPermGen       total 741376K, used 590847K [0x0,0x0)
2014-02-13T09:36:54.024-0500: [GC [PSYoungGen: 2546048K->32508K(2672384K)] 4626942K->2113402K(8267520K), 0.1491728 secs] [Times: user=0.34 sys=0.01, real=0.15 secs]
Heap after GC invocations=123 (full 4):
 PSYoungGen      total 2672384K, used 32508K [0x0,0x0)
 ParOldGen       total 5595136K, used 2080894K [0x0,0x0)
 PSPermGen       total 741376K, used 590105K [0x0,0x0)
}"""
    full = """{Heap before GC invocations=124 (full 5):
 PSYoungGen      total 2672384K, used 40000K [0x0,0x0)
 ParOldGen       total 5595136K, used 5578700K [0x0,0x0)
 PSPermGen       total 741376K, used 590847K [0x0,0x0)
2014-02-13T09:40:00.100-0500: [Full GC (System) [PSYoungGen: 40000K->0K(2672384K)] [ParOldGen: 5578700K->2080894K(5595136K)] 5618700K->2080894K(8267520K) [PSPermGen: 590847K->590105K(741376K)], 3.6775195 secs] [Times: user=27.09 sys=0.03, real=3.68 secs]
Heap after GC invocations=124 (full 5):
 PSYoungGen      total 2672384K, used 0K [0x0,0x0)
 ParOldGen       total 5595136K, used 2080894K [0x0,0x0)
 PSPermGen       total 741376K, used 590105K [0x0,0x0)
}
{Heap before GC invocations=125 (full 5):
 PSYoungGen      total 2672384K, used 99K [0x0,0x0)"""
    (tmp_path / "native_stdout.log").write_text(minor + "\n" + full + "\n")
    out = (
        parse_gc_invocations(reassemble_gc_blocks(read_raw_logs(str(tmp_path))))
        .to_pandas()
        .sort_values("all_gcs")
        .reset_index(drop=True)
    )
    assert len(out) == 2  # the unterminated 125th block is dropped
    m, f = out.iloc[0], out.iloc[1]
    assert m["jvm"] == "native_stdout" and m["gc_type"] == "GC"
    assert (m["dt"], m["tm"], m["tz"], m["hour"]) == (
        "2014-02-13", "09:36:54.024", "-0500", 9)
    assert (m["yng_before_k"], m["yng_after_k"], m["yng_total_k"]) == (
        2546048, 32508, 2672384)
    # minor GC: old/perm before from the Heap-before section, after+total
    # from the Heap-after section
    assert (m["old_before_k"], m["old_after_k"], m["old_total_k"]) == (
        5578700, 2080894, 5595136)
    assert m["old_diff_k"] == 5578700 - 2080894
    assert (m["perm_before_k"], m["perm_after_k"], m["perm_total_k"]) == (
        590847, 590105, 741376)
    assert (m["heap_before_k"], m["heap_after_k"], m["heap_total_k"]) == (
        4626942, 2113402, 8267520)
    assert (m["gcs"], m["fgcs"], m["all_gcs"]) == (119, 4, 123)
    assert (m["user_us"], m["sys_us"], m["real_us"]) == (340000, 10000, 150000)
    assert round(m["old_pct"], 4) == round(2080894 / 5595136 * 100, 4)
    # full GC: every segment from the GC line itself
    assert f["gc_type"] == "FULLGC_SYS"
    assert (f["yng_before_k"], f["yng_after_k"]) == (40000, 0)
    assert (f["old_before_k"], f["old_after_k"], f["old_total_k"]) == (
        5578700, 2080894, 5595136)
    assert (f["perm_before_k"], f["perm_after_k"]) == (590847, 590105)
    assert (f["heap_before_k"], f["heap_after_k"]) == (5618700, 2080894)
    assert (f["gcs"], f["fgcs"], f["all_gcs"]) == (119, 5, 124)
    assert f["real_us"] == 3680000 and f["runit"] == "secs"


@_slow
@given(
    srv=st.integers(min_value=0, max_value=3),
    thread=st.integers(min_value=0, max_value=0xFFFFFFFF),
    comp=st.sampled_from(["ServletWrappe", "WsServerImpl"]),
    evt=st.sampled_from(["E", "W", "I", "A", "F"]),
    msgid=st.sampled_from(["SRVE0068E", "WSVR0605W", "WTRN0006W", "SECJ0064A"]),
    tail=st.text(alphabet="ab c", min_size=0, max_size=12),
)
def test_was_parser_roundtrip(ray_session, srv, thread, comp, evt, msgid, tail):
    from log_parser_ray.stages.waslog import parse_was_lines

    msg = f"{msgid}: x{tail}"
    line = f"was{srv} [6/13/15 10:32:04:123 EDT] {thread:08x} {comp} {evt} {msg}"
    out = parse_was_lines(lines_ds([line])).to_pandas().iloc[0]
    assert out["srv"] == f"was{srv}"
    assert out["thread"] == f"{thread:08x}"
    assert out["component"] == comp
    assert out["evt_type"] == evt
    assert out["msg_id"] == msgid
    assert out["msg"] == msg
    named = msgid in ("WTRN0006W", "WTRN0124I", "WSVR0001I")
    assert bool(out["is_severe"]) == (evt in "WEF" or named)


def test_master_error_family_without_mpmstats(ray_session, tmp_path):
    """error_log files with zero mpmstats lines (plain Apache — mpmstats is
    IHS-specific) must not crash the orchestrator's report edge; the
    mpmstats CSV is simply absent."""
    from log_parser_ray.pipelines import master

    logd = tmp_path / "logs"
    logd.mkdir()
    (logd / "error_log.0101").write_text(
        "srvA [Sun Jun 14 00:00:48 2015] [error] [client 10.0.0.9] "
        "E1: lookup failed, referer: http://site/p1\n"
    )
    out = str(tmp_path / "out")
    res = master.run(str(logd), out)
    assert res["error"] == 1
    assert os.path.isfile(os.path.join(out, "error", "errCntByRef.csv"))
    assert not os.path.exists(
        os.path.join(out, "error", "WebErrorLogMpmStatsRpt_all.csv")
    )


def test_weblog_all_static_content(ray_session, sf_dir, tmp_path):
    """Edge: every parsed row is a static-extension request → app-only
    tables (per-UID detail, domain top-5, extension stats) are empty but
    the run, renders and detail CSVs must all still succeed."""
    import re as _re

    from log_parser_ray.pipelines import weblog
    from log_parser_ray.sources.accesssynth import synth_access_lines

    lines = synth_access_lines(sf_dir).to_pandas().sort_values("line_id")
    static = [ln for ln in lines["text"]
              if _re.search(r"\.(ico|css|gif|png|js|jpg) ", ln)]
    assert static, "synth corpus lost its static-content rows"
    (tmp_path / "access_log.1103").write_text("\n".join(static) + "\n")

    out = str(tmp_path / "rpt")
    res = weblog.run(str(tmp_path), out, file_pattern="access_log")
    assert res["total"] > 0
    assert int(res["hourly"]["xrc"].sum()) == 0
    # per-UID detail: header only (xrc == 0 rows are filtered)
    uid_lines = open(res["uid_detail_path"]).read().splitlines()
    assert len(uid_lines) == 1
    # per-URI detail covers ALL parsed rows regardless of exclusion
    uri_rows = open(res["uri_detail_path"]).read().splitlines()[1:]
    assert sum(int(r.split("\t")[5]) for r in uri_rows) == res["total"]
    assert len(res["domain_top5"]) == 0
    assert "===== Hourly Statistics =====" in open(res["report_path"]).read()


def test_weblog_no_parseable_lines(ray_session, tmp_path):
    """A file with zero parseable access lines yields an empty-but-typed
    report set (no KeyError on column-less frames); the report file still
    renders and the sink histogram shows where the lines went."""
    from log_parser_ray.pipelines import weblog

    (tmp_path / "access_log.bad").write_text("garbage line\nanother one\n")
    res = weblog.run(str(tmp_path), str(tmp_path / "out"),
                     file_pattern="access_log")
    assert res["total"] == 0
    assert len(res["hourly"]) == 0 and "hour" in res["hourly"].columns
    assert len(res["alerts"]) == 0
    assert os.path.isfile(res["report_path"])
    assert int(res["sink_counts"]["n"].sum()) == 2


def test_weblog_sessionless_domain_usage(ray_session, tmp_path):
    """A session-less app (every JSESSIONID '-'): domain_hour_usage's
    jsession side aggregates NOTHING — the pivot must come back as a typed
    empty table (not a column-less frame that KeyErrors the domain-usage
    CSV writer) and the run must complete."""
    from log_parser_ray.pipelines import weblog

    UA = ("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:38.0) Gecko/20100101 "
          "Firefox/38.0")
    rows = [
        (f'10.0.0.{i} - - [14/Jun/2015:10:0{i}:00 -0500] "GET /app/x HTTP/1.1" '
         f'200 123 JSESSIONID="-" UID="u{i}@example.com" 1000 10 20 "{UA}" web0')
        for i in range(3)
    ]
    (tmp_path / "access_log.1").write_text("\n".join(rows) + "\n")
    res = weblog.run(str(tmp_path), str(tmp_path / "rpt"),
                     file_pattern="access_log")
    assert res["total"] == 3
    # typed empty: columns present, zero rows
    assert len(res["domain_hourly_sess"]) == 0
    assert "domain" in res["domain_hourly_sess"].columns
    # the uid side still counted
    assert int(res["domain_hourly_uid"]["H10"].sum()) == 3
    # the BySess CSV rendered header-only instead of crashing
    sess_csv = os.path.join(str(tmp_path / "rpt"),
                            "WebHourlyDomainUsageBySess.csv")
    assert len(open(sess_csv).read().splitlines()) == 1


def test_weblog_record_date_filter(ray_session, tmp_path):
    """The reference's per-record date predicate (webAccessLogParser.sh:
    151-155 `grep -F "[$rec0DD/$recLM/$recYYYY"`): record_date keeps that
    date only; cumulative=True is the `-o full` dt <= recorddate variant.
    Filtered-out records never reach the routed sinks."""
    import glob

    from log_parser_ray.pipelines import weblog

    UA = ("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:38.0) Gecko/20100101 "
          "Firefox/38.0")

    def line(day, i):
        return (f'10.0.0.1 - - [{day}/Jun/2015:10:00:0{i} -0500] '
                f'"GET /app/x HTTP/1.1" 200 123 JSESSIONID="0000S7X:cl1" '
                f'UID="u@example.com" 1000 10 20 "{UA}" web0')

    rows = [line(14, i) for i in range(3)] + [line(15, i) for i in range(2)]
    (tmp_path / "access_log.1").write_text("\n".join(rows) + "\n")
    res_p = weblog.run(str(tmp_path), str(tmp_path / "p"),
                       file_pattern="access_log", record_date="2015-06-14")
    assert res_p["total"] == 3
    # sink accounting agrees: the day-15 rows were never routed
    routed = ray.data.read_parquet(
        glob.glob(str(tmp_path / "p" / "routed" / "sink=parsed"))
    ).count()
    assert routed == 3
    res_f = weblog.run(str(tmp_path), str(tmp_path / "f"),
                       file_pattern="access_log", record_date="2015-06-15",
                       cumulative=True)
    assert res_f["total"] == 5
    res_d15 = weblog.run(str(tmp_path), str(tmp_path / "d15"),
                         file_pattern="access_log", record_date="2015-06-15")
    assert res_d15["total"] == 2


def test_cli_access_record_date(ray_session, tmp_path, capsys):
    """--access-logs honors --record-date/--procoption (they must FILTER,
    not just key the history) and --perf-baseline feeds the per-URI bart
    column."""
    import json

    from log_parser_ray.__main__ import main

    UA = ("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:38.0) Gecko/20100101 "
          "Firefox/38.0")

    def line(day, i):
        return (f'10.0.0.1 - - [{day}/Jun/2015:10:00:0{i} -0500] '
                f'"GET /app/x HTTP/1.1" 200 123 JSESSIONID="0000S7X:cl1" '
                f'UID="u@example.com" 2000000 10 20 "{UA}" web0')

    logd = tmp_path / "logs"
    logd.mkdir()
    (logd / "access_log.1").write_text(
        "\n".join([line(14, i) for i in range(3)]
                  + [line(15, i) for i in range(2)]) + "\n")
    bl = tmp_path / "perfBaseLine.csv"
    bl.write_text("Transaction|AverageResponseTimeInSec\n/app/x|1.5\n")
    assert main(["--access-logs", str(logd), "--out", str(tmp_path / "o1"),
                 "--record-date", "2015-06-14",
                 "--perf-baseline", str(bl)]) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["total"] == 3
    # bart (baseline 1.5 s) and diff (2.0 - 1.5) present in the URI detail
    uri_csv = os.path.join(str(tmp_path / "o1"),
                           "WebAccessLogSummaryByTransactionRpt.csv")
    row = open(uri_csv).read().splitlines()[1]
    assert "1.5" in row and "0.5" in row
    assert main(["--access-logs", str(logd), "--out", str(tmp_path / "o2"),
                 "--record-date", "2015-06-15", "--procoption", "full"]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])["total"] == 5


def test_weblog_empty_rerun_clears_history(ray_session, tmp_path):
    """A daily rerun whose corrected logs parse NOTHING must replace every
    history family's date partition (append_history's contract) — not just
    two of the eight."""
    from log_parser_ray.pipelines import weblog
    from log_parser_ray.state.history import read_history

    UA = ("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:38.0) Gecko/20100101 "
          "Firefox/38.0")
    good = (f'10.0.0.1 - - [14/Jun/2015:10:00:00 -0500] "GET /a.xhtml '
            f'HTTP/1.1" 200 123 JSESSIONID="0000S7X:cl1" '
            f'UID="u@example.com" 1000 10 20 "{UA}" web0')
    d1 = tmp_path / "day1"
    d1.mkdir()
    (d1 / "access_log.1").write_text(good + "\n")
    hist = str(tmp_path / "hist")
    weblog.run(str(d1), str(tmp_path / "o1"), file_pattern="access_log",
               history_root=hist, run_date="2015-06-14")
    fams = ["access_hourly", "access_response_codes", "access_top_slow",
            "access_daily", "access_request_types", "access_stats_by_ihs",
            "access_stats_by_was"]
    for fam in fams:
        assert len(read_history(hist, fam)) > 0, fam
    # corrected logs: nothing parseable on the same date
    d2 = tmp_path / "day1b"
    d2.mkdir()
    (d2 / "access_log.1").write_text("garbage\n")
    weblog.run(str(d2), str(tmp_path / "o2"), file_pattern="access_log",
               history_root=hist, run_date="2015-06-14")
    for fam in fams:
        if fam == "access_daily":
            # the daily row survives as a zero-traffic row, like the
            # reference's daily summary line
            h = read_history(hist, fam)
            assert len(h) == 1 and int(h["irc"].iloc[0]) == 0
        else:
            assert len(read_history(hist, fam)) == 0, fam


def test_master_recycle_history_cleared_on_rerun(ray_session, sf_dir, tmp_path):
    """error_recycles history is appended UNCONDITIONALLY on daily runs: a
    rerun of a date whose corrected logs show no recycles clears the stale
    partition."""
    from log_parser_ray.pipelines import master
    from log_parser_ray.state.history import read_history
    from log_parser_ray.stages.errorlog import synth_error_lines

    lines = synth_error_lines(sf_dir).to_pandas().sort_values("line_id")
    d1 = tmp_path / "l1"
    d1.mkdir()
    (d1 / "error_log.1").write_text("\n".join(lines["text"]) + "\n")
    hist = str(tmp_path / "hist")
    master.run(str(d1), str(tmp_path / "o1"), record_date="2024-01-01",
               rpt_type="daily", history_root=hist)
    assert len(read_history(hist, "error_recycles")) > 0
    # corrected logs: same date, recycle notices gone
    d2 = tmp_path / "l2"
    d2.mkdir()
    kept = [t for t in lines["text"] if "resuming normal operations" not in t]
    (d2 / "error_log.1").write_text("\n".join(kept) + "\n")
    master.run(str(d2), str(tmp_path / "o2"), record_date="2024-01-01",
               rpt_type="daily", history_root=hist)
    assert len(read_history(hist, "error_recycles")) == 0


def test_batch_fingerprint_generic_schema(ray_session, tmp_path):
    """batch_fingerprint derives its boundary/sum/text columns from the
    batch's actual schema — a non-transcript side output gets a stable,
    content-sensitive name instead of KeyError('conv_id')."""
    import pyarrow.parquet as pq

    from log_parser_ray.stages.route import batch_fingerprint, write_batch_parquet

    t = pa.table({"srv": ["a", "b"], "dtm": ["x", "y"], "n": [1, 2]})
    fp1 = batch_fingerprint(t)
    assert fp1 == batch_fingerprint(t)  # deterministic
    t2 = pa.table({"srv": ["a", "c"], "dtm": ["x", "y"], "n": [1, 2]})
    assert fp1 != batch_fingerprint(t2)  # content-sensitive
    out = str(tmp_path / "side")
    write_batch_parquet(t, out)
    write_batch_parquet(t, out)  # retry → same file, no duplicate
    files = os.listdir(out)
    assert len(files) == 1
    assert pq.read_table(os.path.join(out, files[0])).num_rows == 2
    # the transcript schema keeps its historical fingerprint formula
    import hashlib

    tt = pa.table({"conv_id": ["c1", "c2"], "turn_idx": [0, 5],
                   "text": ["hello", "world"]})
    exp = hashlib.md5("2:c1:0:c2:5:5:hello:world".encode()).hexdigest()[:16]
    assert batch_fingerprint(tt) == exp


def test_load_perf_baseline(tmp_path):
    """load_perf_baseline parses the reference's perfBaseLine.csv format
    (header + uri|seconds rows, webAccessLogParser.sh:214-223) into the
    uri → microseconds map; malformed rows are skipped like AWK split()."""
    from log_parser_ray.pipelines.weblog import load_perf_baseline

    p = tmp_path / "perfBaseLine.csv"
    p.write_text("Transaction|AverageResponseTimeInSec\n"
                 "/a.xhtml|0.81\n"
                 "/b.xhtml|1.645\n"
                 "\n"
                 "/broken|notanumber\n")
    m = load_perf_baseline(str(p))
    assert m == {"/a.xhtml": 0.81e6, "/b.xhtml": 1.645e6}


def test_clone_map_file_and_cli(ray_session, tmp_path, capsys):
    """accesslog.load_clone_map parses WAS_CloneIDs.csv (`cloneID|WASname|
    host`, extras ignored) and --clone-map rewires the cloneID→WAS
    topology for an --access-logs run."""
    import json

    from log_parser_ray.__main__ import main
    from log_parser_ray.stages.accesslog import load_clone_map

    cm = tmp_path / "WAS_CloneIDs.csv"
    cm.write_text("#cloneID|WAS|host\n"
                  "cl1|MYWAS01|washost082\n"
                  "cl2|MYWAS02|washost083\n"
                  "malformed-line\n")
    assert load_clone_map(str(cm)) == {"cl1": "MYWAS01", "cl2": "MYWAS02"}

    UA = ("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:38.0) Gecko/20100101 "
          "Firefox/38.0")
    logd = tmp_path / "logs"
    logd.mkdir()
    (logd / "access_log.1").write_text(
        f'10.0.0.1 - - [14/Jun/2015:10:00:00 -0500] "GET /app/x HTTP/1.1" '
        f'200 123 JSESSIONID="0000S7X:cl1" UID="u@example.com" 1000 10 20 '
        f'"{UA}" web0\n')
    assert main(["--access-logs", str(logd), "--out", str(tmp_path / "o"),
                 "--clone-map", str(cm)]) == 0
    capsys.readouterr()
    parsed = ray.data.read_parquet(
        str(tmp_path / "o" / "routed" / "sink=parsed")).to_pandas()
    assert list(parsed["was"].unique()) == ["MYWAS01"]


def test_master_mpm_history_cleared_on_rerun(ray_session, sf_dir, tmp_path):
    """mpmstats_daily_max is appended unconditionally on daily runs: a
    rerun of a date whose corrected logs carry no mpmstats rows clears
    the stale per-server max partition."""
    from log_parser_ray.pipelines import master
    from log_parser_ray.state.history import read_history
    from log_parser_ray.stages.errorlog import synth_error_lines

    lines = synth_error_lines(sf_dir).to_pandas().sort_values("line_id")
    d1 = tmp_path / "l1"
    d1.mkdir()
    (d1 / "error_log.1").write_text("\n".join(lines["text"]) + "\n")
    hist = str(tmp_path / "hist")
    master.run(str(d1), str(tmp_path / "o1"), record_date="2024-01-01",
               rpt_type="daily", history_root=hist)
    assert len(read_history(hist, "mpmstats_daily_max")) > 0
    # corrected logs: mpmstats rows gone, error rows remain
    d2 = tmp_path / "l2"
    d2.mkdir()
    kept = [t for t in lines["text"] if "mpmstats" not in t]
    assert kept
    (d2 / "error_log.1").write_text("\n".join(kept) + "\n")
    master.run(str(d2), str(tmp_path / "o2"), record_date="2024-01-01",
               rpt_type="daily", history_root=hist)
    assert len(read_history(hist, "mpmstats_daily_max")) == 0
