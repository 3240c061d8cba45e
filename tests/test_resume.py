"""Checkpoint/resume properties: kill-and-resume equals a single
uninterrupted run; completed partitions are skipped; routing is a strict
partition of rows; results are invariant to input parallelism."""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data

from log_parser_ray.pipelines.partitioned import run_partitioned
from log_parser_ray.sources.transcripts import transcripts_from_events


def routed_rows(root: str) -> pd.DataFrame:
    t = pq.read_table(root, columns=["conv_id", "turn_idx", "text", "sink"])
    return (
        t.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_kill_and_resume_equals_single_run(ray_session, sf_dir, tmp_path):
    clean_root = str(tmp_path / "clean")
    res_clean = run_partitioned(sf_dir, clean_root, n_partitions=4, enrich_concurrency=2)
    assert len(res_clean) == 4

    crash_root = str(tmp_path / "crashy")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_partitioned(
            sf_dir, crash_root, n_partitions=4, fail_after=2, enrich_concurrency=2
        )
    # 2 committed partitions + manifest lines; no partial final dirs
    done_dirs = [d for d in os.listdir(crash_root) if d.startswith("events-")]
    assert len(done_dirs) == 2

    res_resumed = run_partitioned(sf_dir, crash_root, n_partitions=4, enrich_concurrency=2)
    assert res_resumed == res_clean

    # routed-row equality under stable (conv_id, turn_idx) ordering
    pd.testing.assert_frame_equal(routed_rows(crash_root), routed_rows(clean_root))

    # lineage: manifest has exactly 4 done partitions with metrics
    lines = []
    for f in glob.glob(os.path.join(crash_root, "_manifest-*.jsonl")):
        lines += [json.loads(l) for l in open(f) if l.strip()]
    done = [l for l in lines if l["status"] == "done"]
    assert len(done) == 4 and all(l["partition"].startswith("events-") for l in done)
    assert all(l["rows_routed"] > 0 and l["wall_s"] > 0 for l in done)


def test_resume_skips_completed(ray_session, sf_dir, tmp_path):
    root = str(tmp_path / "skip")
    run_partitioned(sf_dir, root, n_partitions=2, enrich_concurrency=2)
    mtimes = {
        d: os.path.getmtime(os.path.join(root, d))
        for d in os.listdir(root)
        if d.startswith("events-")
    }
    run_partitioned(sf_dir, root, n_partitions=2, enrich_concurrency=2)
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(root, d)) == m  # untouched


def test_partition_ranges_disjoint_cover(sf_dir):
    """The read-level partitions are a strict partition of the input id space:
    disjoint, contiguous, and covering — the 1×-input-bytes property."""
    import pyarrow.parquet as pq

    from log_parser_ray.pipelines.partitioned import discover_event_partitions

    path = f"{sf_dir}/events.parquet"
    n_rows = pq.ParquetFile(path).metadata.num_rows
    parts = discover_event_partitions(path, 4)
    spans = sorted((lo, hi) for _, lo, hi in parts)
    assert spans[0][0] == 0
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert l2 == h1 + 1  # disjoint and contiguous
    assert spans[-1][1] >= n_rows - 1  # covers


def test_partitions_cover_input_exactly(ray_session, sf_dir, tmp_path):
    """Range partitioning is a partition: per-sink counts across partitions
    sum to the unpartitioned run's counts (routing itself is total: sink is
    never null)."""
    from log_parser_ray.pipelines import flagship

    tr = transcripts_from_events(sf_dir)
    root = str(tmp_path / "cover")
    res = run_partitioned(sf_dir, root, n_partitions=3, enrich_concurrency=2)
    summed: dict[str, int] = {}
    for counts in res.values():
        for s, n in counts.items():
            summed[s] = summed.get(s, 0) + n

    whole = flagship.run(tr, str(tmp_path / "whole"), enrich_concurrency=2)
    want = dict(zip(whole["sink_counts"]["sink"], whole["sink_counts"]["n"]))
    assert summed == {k: int(v) for k, v in want.items()}
    assert whole["rows"] == tr.count()


def test_parallelism_invariance(ray_session, sf_dir, tmp_path):
    """Same aggregates at 1 block and 16 blocks."""
    from log_parser_ray.pipelines import flagship

    tr = transcripts_from_events(sf_dir)
    r1 = flagship.run(tr.repartition(1), str(tmp_path / "p1"), enrich_concurrency=2)
    r16 = flagship.run(tr.repartition(16), str(tmp_path / "p16"), enrich_concurrency=2)

    def frame(v):
        # conv-keyed tables are (deliberately) distributed Datasets —
        # collect + canonical sort only at this test edge
        if not isinstance(v, pd.DataFrame):
            v = v.to_pandas()
        return v.sort_values(list(v.columns)).reset_index(drop=True)

    for key in ("sink_counts", "conv_category", "hourly", "topk_slow", "alerts"):
        pd.testing.assert_frame_equal(frame(r1[key]), frame(r16[key]))


def test_flagship_rerun_replaces_sinks(ray_session, sf_dir, tmp_path):
    """A flagship rerun into the same out_dir over a SMALLER input replaces
    the routed sinks and alerts (fresh_dir at run start) — consumers never
    read the first run's stale parts next to the new ones."""
    import pyarrow.dataset as pads

    from log_parser_ray.pipelines import flagship
    from log_parser_ray.sources.transcripts import transcripts_from_events

    tr = transcripts_from_events(sf_dir)
    out = str(tmp_path / "rr")
    r1 = flagship.run(tr, out, enrich_concurrency=2)
    half = tr.count() // 2
    r2 = flagship.run(tr.limit(half), out, enrich_concurrency=2)
    assert r1["rows"] > r2["rows"] == half
    routed = pads.dataset(
        out, format="parquet", partitioning="hive",
        ignore_prefixes=[".", "_", "alerts", "history"],
    ).to_table()
    assert routed.num_rows == half  # first run's parts replaced
