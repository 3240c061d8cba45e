"""01_WAS / 04_GC summary-report conformance + per-family threshold alerts
+ master daily-history wiring (the reference's report/alert/history edges:
websphereLogParser.sh:440-900, javaGCStatsParser.sh:556-622,
webErrorLogParser.sh:361-379)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def lines_ds(lines):
    return ray.data.from_arrow(
        pa.table(
            {
                "line_id": pa.array(range(len(lines)), pa.int64()),
                "text": pa.array(list(lines), pa.string()),
            }
        )
    )


# real-grammar fixture lines (formats documented in websphereLogParser.sh
# comment examples :255-310; values are this test's own)
WAS_LINES = [
    # hung + release on AppSrv01 (WSVR0605W/0606W)
    'AppSrv01 [2/3/17 6:48:56:526 EST] 000013cb ThreadMonitor W '
    'WSVR0605W: Thread "WebContainer : 10" (000013cb) has been active for '
    '752276 milliseconds and may be hung.  There is/are 1 thread(s) in '
    'total in the server that may be hung.',
    'AppSrv01 [2/3/17 6:52:44:156 EST] 000013cb ThreadMonitor W '
    'WSVR0606W: Thread "WebContainer : 10" (000013cb) was previously '
    'reported to be hung but has completed.  It was active for '
    'approximately 979913 milliseconds.  There is/are 0 thread(s) in total '
    'in the server that still may be hung.',
    # a second hung thread that never releases (remains at end)
    'AppSrv01 [2/3/17 6:57:56:575 EST] 00011cd7 ThreadMonitor W '
    'WSVR0605W: Thread "WebContainer : 26" (00011cd7) has been active for '
    '610239 milliseconds and may be hung.  There is/are 1 thread(s) in '
    'total in the server that may be hung.',
    # transaction timeout declare + completion on the same (srv, thread)
    'AppSrv03 [2/3/17 9:07:50:870 EST] 00000056 TimeoutManage I '
    'WTRN0006W: Transaction TID123 timed out after 120 seconds',
    'AppSrv03 [2/3/17 9:07:58:870 EST] 00000056 TimeoutManage I '
    'WTRN0124I: Transaction completed',
    # CPU starvation warnings (3 on AppSrv02 → exceeds th=2)
    'AppSrv02 [2/3/17 10:09:08:674 EST] 00000049 CoordinatorCo W '
    'HMGR0152W: CPU Starvation detected. Current thread scheduling delay '
    'is 7 seconds.',
    'AppSrv02 [2/3/17 10:11:08:674 EST] 00000049 CoordinatorCo W '
    'HMGR0152W: CPU Starvation detected. Current thread scheduling delay '
    'is 5 seconds.',
    'AppSrv02 [2/3/17 10:15:08:674 EST] 00000049 CoordinatorCo W '
    'HMGR0152W: CPU Starvation detected. Current thread scheduling delay '
    'is 6 seconds.',
    # a WASCustomFilter pattern hit (CORBA.NO_RESPONSE)
    'AppSrv01 [2/3/17 7:05:00:000 EST] 0000000c OrbWorker E '
    'ORBX0390E: orb.Err Remote request failed CORBA.NO_RESPONSE detail',
    # errors with class/exception/message tokens + an OOM
    'AppSrv01 [2/3/17 7:00:00:000 EST] 0000000a ServletWrappe E '
    'SRVE0068E: servlet.Err Uncaught exception in servlet alpha',
    'AppSrv01 [2/3/17 7:01:00:000 EST] 0000000a ServletWrappe E '
    'SRVE0068E: servlet.Err Uncaught exception in servlet alpha',
    'AppSrv01 [2/3/17 7:02:00:000 EST] 0000000b ServletWrappe E '
    'SRVE0068E: servlet.Err Uncaught exception java.lang.OutOfMemoryError: '
    'Java heap space',
]


@pytest.fixture(scope="module")
def was_tables(ray_session):
    from log_parser_ray.pipelines.reports import was_summary_tables
    from log_parser_ray.stages.waslog import parse_was_lines

    return was_summary_tables(parse_was_lines(lines_ds(WAS_LINES)))


def test_hung_thread_grammar_and_summary(was_tables):
    hd = was_tables["hung_detail"]
    assert len(hd) == 3
    first = hd.iloc[0]
    assert first["woct"] == "10" and first["thid"] == "000013cb"
    assert first["htm_s"] == pytest.approx(752.276)
    assert first["sts"] == "Hung"
    assert hd["sts"].tolist().count("Released") == 1
    hs = was_tables["hung_summary"]
    assert len(hs) == 1
    r = hs.iloc[0]
    # nhtc = 2 Hung events; mhtc = max chtc among Hung; rhtc = last chtc
    # (the unreleased 26-thread leaves 1 remaining)
    assert (r["srv"], int(r["nhtc"]), int(r["mhtc"]), int(r["rhtc"])) == (
        "AppSrv01", 2, 1, 1)


def test_tto_and_starvation_sections(was_tables):
    tto = was_tables["tto_detail"]
    assert len(tto) == 1
    assert tto.iloc[0]["tran_id"] == "TID123"
    assert tto.iloc[0]["timeout_s"] == 120.0
    assert was_tables["tto_by_jvm"].iloc[0]["cnt"] == 1
    sv = was_tables["starv_summary"]
    assert len(sv) == 1
    assert int(sv.iloc[0]["n"]) == 3
    assert float(sv.iloc[0]["total_delay_s"]) == 18.0


def test_msg_dimensions_and_counts(was_tables):
    se = was_tables["srv_evt"]
    # I/A lines excluded from the count branch (reference gather semantics)
    assert int(se["cnt"].sum()) == len(WAS_LINES) - 2
    err_cls = was_tables["top_err_cls"]
    assert err_cls.iloc[0]["cls"] == "SRVE0068E:" and int(err_cls.iloc[0]["cnt"]) == 3
    err_exp = was_tables["top_err_exp"]
    assert err_exp.iloc[0]["exp"] == "servlet.Err"
    # OOM overwrite-map keeps the last per (srv, date)
    oom = was_tables["oom"]
    assert len(oom) == 1 and "OutOfMemoryError" in oom.iloc[0]["msg"]


def test_filtered_error_section(was_tables):
    """ST4 on the real pack: WASCustomFilter hits counted per (srv, msg)
    and alerted unconditionally (websphereLogParser.sh:619-650)."""
    f = was_tables["filtered"]
    # two pattern families hit: the CORBA line AND the OutOfMemory line
    # (FILTER_PATTERNS has both — the OOM text matches 'OutOfMemory')
    assert len(f) == 2
    assert set(f["srv"]) == {"AppSrv01"}
    assert any("CORBA.NO_RESPONSE" in m for m in f["msg"])
    assert any("OutOfMemoryError" in m for m in f["msg"])
    al = was_tables["alerts"]
    crit = al[al["rule"] == "was.filter.criticalError"]
    assert len(crit) == 2 and (crit["value"] == 1.0).all()


def test_family_threshold_alerts(was_tables):
    al = was_tables["alerts"]
    # AppSrv02 has 3 CPU starvations > was.App.wasCPUStarvCntTh=2
    starv = al[al["rule"] == "was.App.wasCPUStarvCntTh"]
    assert len(starv) == 1
    assert starv.iloc[0]["key"] == "AppSrv02"
    assert starv.iloc[0]["value"] == 3.0
    # counts below the E/W thresholds produce no alert rows
    assert not len(al[al["rule"].str.endswith("wasECntTh")])


def test_render_was_summary_layout(was_tables):
    from log_parser_ray.pipelines.reports import render_was_summary

    txt = render_was_summary(was_tables, record_date="2017-02-03")
    for section in [
        "===== WAS log analysis report =====",
        "===== Hung Thread Details =====",
        "===== Hung Thread Summary By Server =====",
        "===== Transaction Timeout =====",
        "===== CPU Starvation Warnings =====",
        "===== Out of Memory Error =====",
        "===== Critical or Filtere Error Summary =====",
        "===== Summary of Error and Warning count by Server =====",
        "ERROR and FATAL events by component",
        "WARN events by component",
        "Error and Fatal events by Error class",
        "ERROR and FATAL events by Message",
    ]:
        assert section in txt, section
    assert "Total New Hung Threads in the system: 2" in txt
    assert "total Transaction timeout on all JVMs:1" in txt
    # per-server count row arithmetic: 6 E + 4 W on AppSrv01/02
    assert "Total for all servers:10" in txt


def test_gc_summary_tables_and_render(ray_session, sf_dir):
    from log_parser_ray.pipelines.reports import (
        gc_summary_tables,
        render_gc_summary,
    )
    from log_parser_ray.stages.gclog import (
        parse_gc_invocations,
        parse_gc_lines,
        reassemble_gc_blocks,
        synth_gc_lines,
        synth_gc_stream,
    )

    gc = parse_gc_lines(synth_gc_lines(sf_dir)).materialize()
    inv = parse_gc_invocations(
        reassemble_gc_blocks(synth_gc_stream(sf_dir))
    ).materialize()
    t = gc_summary_tables(gc, inv)
    daily = t["daily"]
    # single-line rows roll up under date 'NA'; counts match the parse
    na = daily[daily["dt"] == "NA"]
    assert int(na["tgccnt"].sum()) == gc.count()
    gcp = gc.to_pandas()
    assert int(na["fgccnt"].sum()) == int((gcp["gc_type"] == "Full GC").sum())
    # trt = trtgc + trtfgc row-wise
    assert (daily["trt"] - (daily["trtgc"] + daily["trtfgc"])).abs().max() < 1e-6
    # invocation stream contributes dated rows + the last-record table
    dated = daily[daily["dt"] != "NA"]
    assert len(dated) >= 1
    assert int(dated["tgccnt"].sum()) == inv.count()
    assert len(t["last"]) >= 1
    txt = render_gc_summary(t, record_date="2017-04-21")
    assert "===== Verbose GC analysis report =====" in txt
    assert "Last Verbose GC  record for each JVM" in txt
    assert "jvm            \tdate      " in txt


def test_master_daily_history_idempotent(ray_session, sf_dir, tmp_path):
    from log_parser_ray.pipelines import master
    from log_parser_ray.state.history import read_history
    from log_parser_ray.stages.waslog import synth_was_lines

    logd = tmp_path / "logs"
    logd.mkdir()
    df = synth_was_lines(sf_dir).to_pandas().sort_values("line_id")
    (logd / "SystemOut.log").write_text("\n".join(df["text"]) + "\n")

    out1 = str(tmp_path / "o1")
    master.run(str(logd), out1, record_date="2024-01-01", rpt_type="daily",
               history_root=str(tmp_path / "hist"))
    master.run(str(logd), str(tmp_path / "o2"), record_date="2024-01-02",
               rpt_type="daily", history_root=str(tmp_path / "hist"))
    # rerun day 1 → replaced, not duplicated
    master.run(str(logd), str(tmp_path / "o3"), record_date="2024-01-01",
               rpt_type="daily", history_root=str(tmp_path / "hist"))
    hist = read_history(str(tmp_path / "hist"), "was_tto_by_jvm")
    assert set(hist["date"]) == {"2024-01-01", "2024-01-02"}
    per_date = hist.groupby("date").size()
    assert per_date["2024-01-01"] == per_date["2024-01-02"]
    # report emitted + ondemand runs append nothing
    assert os.path.isfile(os.path.join(out1, "was", "01_WASLogSummaryRpt.txt"))
    master.run(str(logd), str(tmp_path / "o4"))
    assert not os.path.isdir(os.path.join(str(tmp_path / "o4"), "history"))


def test_cli_record_date_validation(sf_dir, tmp_path):
    """The reference validates -d as YYYY-MM-DD and rejects future dates
    with a usage error (usage.sh:124-129,160-164); so does --record-date."""
    import pytest

    from log_parser_ray.__main__ import main

    base = ["--events-sf", sf_dir, "--out", str(tmp_path / "o")]
    for bad in ("2024/01/05", "05-01-2024", "2024-13-01", "2024-02-31",
                "9999-01-01"):
        with pytest.raises(SystemExit) as ei:
            main(base + ["--record-date", bad])
        assert ei.value.code == 2  # argparse usage error, not a traceback


def test_cli_record_date_daily(ray_session, sf_dir, tmp_path, capsys):
    """S1/M20: --record-date pushes a ts predicate to the parquet read;
    --rpttype daily appends idempotent per-date history (usage.sh:121-135)."""
    import json

    from log_parser_ray.__main__ import main
    from log_parser_ray.state.history import read_history

    out1 = str(tmp_path / "d1")
    hroot = str(tmp_path / "d1") + "/history"
    args = ["--events-sf", sf_dir, "--out", out1,
            "--record-date", "2024-01-05", "--rpttype", "daily"]
    assert main(args) == 0
    res1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the date slice is a strict subset of the full input
    assert main(["--events-sf", sf_dir, "--out", str(tmp_path / "full")]) == 0
    res_full = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < res1["rows"] < res_full["rows"]
    # rerun same date into the same history → replaced, not duplicated
    assert main(args[:3] + [str(tmp_path / "d1b")] + args[4:]
                + ["--history-root", hroot]) == 0
    capsys.readouterr()
    hist = read_history(hroot, "sink_counts")
    assert set(hist["date"]) == {"2024-01-05"}
    assert len(hist) == len(set(hist["sink"]))
    # daily without -d defaults to yesterday (usage.sh:31-33) — the synth
    # corpus has no 2026 rows, so the run succeeds with an empty slice
    import datetime as _dt

    assert main(["--events-sf", sf_dir, "--out", str(tmp_path / "dflt"),
                 "--rpttype", "daily"]) == 0
    res_d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res_d["rows"] == 0
    hist_d = read_history(str(tmp_path / "dflt") + "/history", "sink_counts")
    exp_date = (_dt.date.today() - _dt.timedelta(days=1)).isoformat()
    assert len(hist_d) == 0 or (
        set(hist_d["date"].astype(str)) <= {exp_date})


def test_cli_procoption_full(ray_session, sf_dir, tmp_path, capsys):
    """S1 `-o procoption` (usage.sh:24-38): `full` keeps everything up to
    and including the record date (cumulative ts <= recDate,
    javaGCStatsParser.sh:446-454); `partial` (default) keeps that date only.
    Both counts pinned against DuckDB over the same parquet."""
    import json

    import duckdb

    from log_parser_ray.__main__ import main

    base = ["--events-sf", sf_dir, "--record-date", "2024-01-05"]
    assert main(base + ["--out", str(tmp_path / "p")]) == 0
    rows_p = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    assert main(base + ["--out", str(tmp_path / "f"),
                        "--procoption", "full"]) == 0
    rows_f = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["rows"]
    con = duckdb.connect()
    exp_p, exp_f = con.execute(
        "SELECT SUM(CASE WHEN ts >= TIMESTAMP '2024-01-05'"
        "                 AND ts < TIMESTAMP '2024-01-06' THEN 1 ELSE 0 END),"
        "       SUM(CASE WHEN ts < TIMESTAMP '2024-01-06' THEN 1 ELSE 0 END)"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert (rows_p, rows_f) == (exp_p, exp_f)
    assert 0 < rows_p < rows_f
    # full without a record date is a CLI error, like daily without one
    with pytest.raises(SystemExit):
        main(["--events-sf", sf_dir, "--out", str(tmp_path / "x"),
              "--procoption", "full"])


def test_error_summary_report(ray_session, sf_dir, tmp_path):
    """03-report: by-server / by-detail / by-referrer sections and
    arithmetic (webErrorLogParser.sh:321-347)."""
    from log_parser_ray.pipelines.reports import (
        error_summary_tables,
        render_error_summary,
    )
    from log_parser_ray.stages.errorlog import (
        parse_error_lines,
        synth_error_lines,
    )

    parsed = parse_error_lines(synth_error_lines(sf_dir)).materialize()
    t = error_summary_tables(parsed)
    assert int(t["by_ws"]["cnt"].sum()) == parsed.count()
    assert int(t["by_err"]["cnt"].sum()) == parsed.count()
    # by_err is ranked descending
    assert (t["by_err"]["cnt"].diff().dropna() <= 0).all()
    txt = render_error_summary(t, record_date="2017-11-03")
    assert "===== Http Error log analysis report =====" in txt
    assert "===== Http Error Count by Web Server =====" in txt
    assert f"Total http error count: {parsed.count()}" in txt
    assert "===== Http Error Count by Http Referrer =====" in txt


def test_was_tables_no_parseable_lines(ray_session):
    """A SystemOut stream with zero parseable lines yields empty-but-typed
    tables and a renderable report (no KeyError on column-less frames)."""
    from log_parser_ray.pipelines.reports import (
        render_was_summary,
        was_summary_tables,
    )
    from log_parser_ray.stages.waslog import parse_was_lines

    t = was_summary_tables(parse_was_lines(lines_ds(["garbage", "junk"])))
    assert len(t["srv_evt"]) == 0 and "srv" in t["srv_evt"].columns
    assert len(t["alerts"]) == 0
    txt = render_was_summary(t, record_date="2024-01-01")
    assert "===== WAS log analysis report =====" in txt


def test_stream_csv_multiblock_order(ray_session, tmp_path):
    """_stream_csv renders a MULTI-block sorted Dataset in global order:
    formatting runs distributed (map_batches) and the iteration pins
    preserve_order for its execution window — without it the streaming
    executor yields blocks in completion order and a large sorted detail
    file would interleave."""
    import numpy as np
    import pandas as pd

    import ray.data

    from log_parser_ray.pipelines.reports import _stream_csv

    rng = np.random.RandomState(7)
    ds = ray.data.from_pandas(
        pd.DataFrame({"v": rng.permutation(5000)})).repartition(16)
    p = str(tmp_path / "out.csv")
    _stream_csv(ds, p, "v", lambda r: str(r.v), ["v"], [False])
    got = [int(x) for x in open(p).read().splitlines()[1:]]
    assert got == sorted(got) and len(got) == 5000
    # the global preserve_order default is restored afterwards
    from ray.data.context import DataContext

    assert DataContext.get_current().execution_options.preserve_order is False


def test_load_thresholds(tmp_path):
    """schema.load_thresholds parses the reference's thresholdValues.csv:
    dotted targets key `<target>.<property>` (WAS/GC style), the dotless
    http target keys the global rules, http.* rows spread onto existing
    per-prefix http rules, duplicates last-win, comments/malformed skipped."""
    from log_parser_ray import schema

    p = tmp_path / "thresholdValues.csv"
    p.write_text(
        "#property|value|target|comment\n"
        "httpAvgRespTimeTh|9.5|http|global avg\n"
        "httpErrorCountTh|7|http.err|per-server error count\n"
        "wasECntTh|123|was.App|dup first\n"
        "wasECntTh|456|was.App|dup last wins\n"
        "gcDlyCountTh|42|jvm.Bat|new prefix rule\n"
        "broken|notanumber|http|skipped\n"
    )
    out = schema.load_thresholds(str(p))
    assert out["http.httpAvgRespTimeTh"] == 9.5
    # http.err spreads onto the existing per-prefix http rule
    assert out["http.web.httpErrorCountTh"] == 7.0
    assert out["was.App.wasECntTh"] == 456.0
    assert out["jvm.Bat.gcDlyCountTh"] == 42.0
    # returns a copy — the module global is untouched
    assert schema.FAMILY_THRESHOLDS["was.App.wasECntTh"] == 4500.0


def test_cli_thresholds_flag(ray_session, sf_dir, tmp_path, capsys):
    """--thresholds overrides the built-in alert rules for the run: an
    absurdly low wasECntTh makes every synth WAS server alert."""
    import json

    from log_parser_ray import schema
    from log_parser_ray.__main__ import main
    from log_parser_ray.stages.waslog import synth_was_lines

    logd = tmp_path / "logs"
    logd.mkdir()
    df = synth_was_lines(sf_dir).to_pandas().sort_values("line_id")
    (logd / "SystemOut.log").write_text("\n".join(df["text"]) + "\n")
    th = tmp_path / "th.csv"
    th.write_text("wasECntTh|0|was.was|alert on any error\n")
    saved = dict(schema.FAMILY_THRESHOLDS)
    try:
        assert main(["--master-logs", str(logd), "--out",
                     str(tmp_path / "o1"), "--thresholds", str(th)]) == 0
        capsys.readouterr()
        al = pd.read_csv(tmp_path / "o1" / "alerts.csv")
        hit = al[al["rule"].str.contains("wasECntTh")]
        assert len(hit) > 0 and (hit["threshold"] == 0).all()
    finally:
        schema.FAMILY_THRESHOLDS.clear()
        schema.FAMILY_THRESHOLDS.update(saved)


def test_cli_custom_filter(ray_session, sf_dir, tmp_path, capsys):
    """--custom-filter replaces the WASCustomFilter.txt keyword set for the
    run (case-insensitive, like the reference's egrep -i): a pattern
    matching ordinary turn text swells the `filtered` sink."""
    import json

    from log_parser_ray import schema
    from log_parser_ray.__main__ import main

    saved = list(schema.FILTER_PATTERNS)
    try:
        assert main(["--events-sf", sf_dir, "--out",
                     str(tmp_path / "base")]) == 0
        base = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        f = tmp_path / "WASCustomFilter.txt"
        f.write_text("# custom keywords\nTIMEOUT\n")
        assert main(["--events-sf", sf_dir, "--out", str(tmp_path / "cust"),
                     "--custom-filter", str(f)]) == 0
        cust = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # the loader wrapped the pattern case-insensitively
        assert schema.FILTER_PATTERNS == ["(?i:TIMEOUT)"]
        assert cust["sink_counts"].get("filtered", 0) \
            != base["sink_counts"].get("filtered", 0)
    finally:
        schema.FILTER_PATTERNS[:] = saved


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference checkout not present")
def test_loaders_parse_reference_artifacts():
    """The four config-file loaders parse the reference repo's OWN committed
    artifacts (not synthesized copies): thresholdValues.csv, perfBaseLine.csv,
    WAS_CloneIDs.csv, WASCustomFilter.txt."""
    from log_parser_ray import schema
    from log_parser_ray.pipelines.weblog import load_perf_baseline
    from log_parser_ray.stages.accesslog import load_clone_map

    th = schema.load_thresholds("/root/reference/thresholdValues.csv")
    # values straight from the file, keyed like the parsers key them
    assert th["http.httpAvgRespTimeTh"] == 2.5
    assert th["was.App.wasFCntTh"] == 5.0
    assert th["jvm.Bat.gcDlyCountTh"] == 100.0
    # last-wins on the duplicated was.App wasTranTmOutCntTh rows (3 then 2)
    assert th["was.App.wasTranTmOutCntTh"] == 2.0
    # the http.err row spread onto the engine's per-prefix error rule
    assert th["http.web.httpErrorCountTh"] == 3500.0

    bl = load_perf_baseline("/root/reference/perfBaseLine.csv")
    assert bl["/custCaseMgmt/admin/caseNotification.xhtml"] == 0.81e6
    assert len(bl) > 10 and all(v > 0 for v in bl.values())

    cm = load_clone_map("/root/reference/WAS_CloneIDs.csv")
    assert cm["23532em3r"] == "AppSrv01"
    assert len(cm) >= 8

    pats = schema.load_filter_patterns("/root/reference/WASCustomFilter.txt")
    assert "(?i:CORBA.*NO_RESPONSE)" in pats
    assert all(p.startswith("(?i:") for p in pats) and len(pats) == 5
