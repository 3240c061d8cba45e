"""Checkpoint / lineage manifest — resumable partitioned runs.

The reference's cross-run state is day-granularity: append-only history CSVs
plus an execution log (SURVEY.md IO5/S5 — usage.sh:56, history headers at
webAccessLogParser.sh:55-126). A rerun recomputes a whole day; the GC parser's
`partial` mode even seeks by line offset (javaGCStatsParser.sh:111-120).

Ray-native shape: the input is processed as named partitions (e.g. one per
input file / date / conv-id bucket). Each partition's outputs go to
partition-scoped directories written ATOMICALLY (write to `<dir>.tmp`, fsync,
rename), and a JSON-lines manifest records per-partition lineage + metrics::

    {"partition": "date=2024-01-01/bucket=7", "input": "...", "status": "done",
     "rows_in": N, "rows_routed": N, "sink_counts": {...}, "wall_s": 1.2}

On resume, partitions with `status=done` are skipped; a partition that died
mid-write left only a `.tmp` dir and no manifest line, so it reruns and the
rename overwrites — idempotent, so retries never double-write (§4 "Resumable
sinks"). The manifest append itself is a single O_APPEND write of one line,
safe for concurrent writers on one node; on a multi-node cluster each node
appends to its own shard file (_manifest-<node>.jsonl) and readers glob.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


@dataclass
class PartitionRecord:
    partition: str
    status: str = "running"
    input: str = ""
    rows_in: int = 0
    rows_routed: int = 0
    sink_counts: dict = field(default_factory=dict)
    wall_s: float = 0.0
    error: str = ""

    def to_json(self) -> str:
        return json.dumps(
            {
                "partition": self.partition,
                "status": self.status,
                "input": self.input,
                "rows_in": self.rows_in,
                "rows_routed": self.rows_routed,
                "sink_counts": self.sink_counts,
                "wall_s": round(self.wall_s, 3),
                "error": self.error,
                "ts": time.time(),
            },
            sort_keys=True,
        )


class RunManifest:
    """JSON-lines manifest of per-partition lineage + metrics."""

    def __init__(self, run_dir: str, shard: str = "0"):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        # leading underscore: Arrow/Spark dataset discovery ignores the file,
        # so the manifest can live inside the output root it describes
        self.path = os.path.join(run_dir, f"_manifest-{shard}.jsonl")

    def completed(self) -> dict[str, dict]:
        """partition → latest record with status=done (last line wins)."""
        done: dict[str, dict] = {}
        for name in sorted(os.listdir(self.run_dir)):
            if not name.startswith("_manifest-") or not name.endswith(".jsonl"):
                continue
            with open(os.path.join(self.run_dir, name)) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        done[rec["partition"]] = rec
        return done

    def append(self, rec: PartitionRecord) -> None:
        # single O_APPEND write: atomic on POSIX for one line << PIPE_BUF-free
        # regular-file appends from one process; multi-node uses per-node shards
        with open(self.path, "a") as f:
            f.write(rec.to_json() + "\n")
            f.flush()
            os.fsync(f.fileno())


def fresh_dir(path: str) -> str:
    """Clear-and-recreate a RUN-OWNED parquet sink directory.

    The per-batch sink writers use content-derived part names, which makes
    task RETRIES within one run idempotent — but across RUNS over changed
    input the old parts' names never collide with the new ones, so a rerun
    into the same out_dir would accumulate stale rows next to fresh ones
    (ray.data.write_parquet's uuid-named files have the same property).
    The reference regenerates every report file per run (`> file` awk
    redirects, mv-commit at webAccessLogParser.sh:1518-1557); this is the
    directory-shaped equivalent, applied at run start to each sink dir the
    run is about to own."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def atomic_output_dir(final_dir: str):
    """Context manager: yields a temp dir, renames to final_dir on success.

    A failed run leaves only `<final_dir>.tmp.<pid>`; the rename is the commit
    point (the reference's `mv temp → report` at webAccessLogParser.sh:1518-1557).
    """
    import contextlib
    import shutil

    @contextlib.contextmanager
    def cm():
        tmp = f"{final_dir}.tmp.{os.getpid()}"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        try:
            yield tmp
            if os.path.exists(final_dir):
                shutil.rmtree(final_dir)
            os.rename(tmp, final_dir)
        except BaseException:
            with contextlib.suppress(OSError):
                shutil.rmtree(tmp)
            raise

    return cm()
