"""History sink (IO5): idempotent per-date append semantics."""

from __future__ import annotations

import pandas as pd

from log_parser_ray.state.history import append_history, read_history


def test_append_and_read(tmp_path):
    root = str(tmp_path)
    append_history(root, "sink_counts", "2024-01-01",
                   pd.DataFrame({"sink": ["errors", "tools"], "n": [5, 7]}))
    append_history(root, "sink_counts", "2024-01-02",
                   pd.DataFrame({"sink": ["errors"], "n": [3]}))
    hist = read_history(root, "sink_counts")
    assert len(hist) == 3
    assert set(hist["date"]) == {"2024-01-01", "2024-01-02"}


def test_rerun_same_date_is_idempotent(tmp_path):
    root = str(tmp_path)
    df = pd.DataFrame({"sink": ["errors"], "n": [5]})
    append_history(root, "r", "2024-01-01", df)
    append_history(root, "r", "2024-01-01", df)  # retry/resume: no double row
    append_history(root, "r", "2024-01-01", pd.DataFrame({"sink": ["errors"], "n": [9]}))
    hist = read_history(root, "r")
    assert len(hist) == 1
    assert hist["n"].iloc[0] == 9  # last write wins, exactly one row


def test_flagship_appends_history(ray_session, sf_dir, tmp_path):
    from log_parser_ray.pipelines import flagship
    from log_parser_ray.sources.transcripts import transcripts_from_events

    tr = transcripts_from_events(sf_dir)
    hroot = str(tmp_path / "hist")
    r1 = flagship.run(tr, str(tmp_path / "d1"), enrich_concurrency=2,
                      history_root=hroot, run_date="2024-01-01")
    flagship.run(tr, str(tmp_path / "d2"), enrich_concurrency=2,
                 history_root=hroot, run_date="2024-01-02")
    # rerun day 1: history must not double-append
    flagship.run(tr, str(tmp_path / "d3"), enrich_concurrency=2,
                 history_root=hroot, run_date="2024-01-01")
    hist = read_history(hroot, "sink_counts")
    assert set(hist["date"]) == {"2024-01-01", "2024-01-02"}
    assert len(hist) == 2 * len(r1["sink_counts"])


def test_empty_frame_replaces_partition(tmp_path):
    """An EMPTY daily frame still replaces the date partition (stale rows
    removed) without writing a null-typed parquet file that would make the
    whole report unreadable next to dated partitions with real values."""
    import pandas as pd

    from log_parser_ray.state.history import append_history, read_history

    root = str(tmp_path / "h")
    cols = ["rule", "key", "value", "threshold"]
    append_history(root, "alerts", "2024-01-01",
                   pd.DataFrame({"rule": ["r"], "key": ["k"],
                                 "value": [1.0], "threshold": [0.5]}))
    # a later date with no rows must not poison the report schema
    append_history(root, "alerts", "2024-01-02", pd.DataFrame(columns=cols))
    h = read_history(root, "alerts")
    assert len(h) == 1 and set(h["date"]) == {"2024-01-01"}
    # rerunning a day whose corrected logs produce no rows removes the
    # stale rows (idempotent replace, not skip)
    append_history(root, "alerts", "2024-01-01", pd.DataFrame(columns=cols))
    assert len(read_history(root, "alerts")) == 0
