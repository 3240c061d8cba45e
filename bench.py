"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": "...", "num_cpus": N, "turns_per_sec": ...}

``--scaling`` runs the flagship parse→enrich→route→aggregate pipeline at two
parallelism levels (default num_cpus=4 vs 16, N vs 4N) in FRESH processes on
the same input and reports both throughputs plus scaling efficiency — the
sandbox stand-in for the north rule's cluster-size criterion. ``--scaling
--stage`` does the same for the compute-dense MinHash stage (the regime not
bounded by the single-box shared object store — BASELINE.md §Measured).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
DEFAULT_SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # workers' benign schema-hash warnings otherwise flood the
            # bench output (Ray logs them per block on metadata-bearing
            # parquet schemas); the bench reads only its own JSON line
            log_to_driver=False,
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _corpus_path(sf_dir: str, repeat: int) -> str:
    """Materialize the ×repeat transcript corpus as a REAL transcript
    parquet dir once per (sf, repeat) and reuse it across protocol runs.

    Two reasons this is the honest benchmark input (round-2 postmortem):
    the contract's input IS a Parquet transcript table (BASELINE.json
    input_hint), and an in-pipeline replicate stage destroys parallelism —
    map_batches bundles by PRE-replicate input rows, so a ×48 in-batch
    fan-out collapsed the whole fused parse→enrich chain to ⌈100k/32768⌉ = 4
    tasks regardless of CPU count (measured via ds.stats; the round-1/round-2
    flagship scaling plateau was largely this artifact)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from log_parser_ray.sources.transcripts import transcripts_from_events

    tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/bench_corpus_{tag}_x{repeat}"
    marker = os.path.join(path, "_DONE")
    if os.path.exists(marker):
        return path
    tr = transcripts_from_events(sf_dir)
    if repeat > 1:
        def replicate(t, n=repeat):
            # each replica gets a distinct conv_id suffix so group
            # cardinality scales with the data
            parts = []
            idx = t.schema.get_field_index("conv_id")
            for i in range(n):
                cid = pc.binary_join_element_wise(t["conv_id"], f"_r{i}", "")
                parts.append(t.set_column(idx, "conv_id", cid))
            return pa.concat_tables(parts)

        tr = tr.map_batches(
            replicate, batch_format="pyarrow", zero_copy_batch=True, batch_size=2048
        )
    tmp = path + f".tmp.{os.getpid()}"
    tr.write_parquet(tmp, min_rows_per_file=200_000, max_rows_per_file=400_000)
    try:
        os.rename(tmp, path)
        with open(marker, "w") as fh:
            fh.write("ok")
    except OSError:
        # lost a concurrent race; the winner's corpus is identical
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path


def run_flagship(sf_dir: str, repeat: int = 1) -> dict:
    """End-to-end parse→enrich→route(write)→aggregate over a REAL transcript
    parquet corpus of ×repeat scale; returns rows + wall_s."""
    import tempfile

    import ray.data

    from log_parser_ray.pipelines import flagship

    path = _corpus_path(sf_dir, repeat)
    # Pin one block per parquet file: Ray's default parallelism heuristic
    # inserts SplitBlocks after the read, which blocks operator fusion of
    # read -> parse -> enrich+write+project and forces every full-width text
    # block through the object store once. The corpus writer sizes files to
    # 200-400k rows precisely so file-granularity blocks saturate the CPUs.
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    tr = ray.data.read_parquet(path, override_num_blocks=max(n_files, 1))
    out_dir = tempfile.mkdtemp(prefix="bench_flagship_", dir="/tmp")
    t0 = time.perf_counter()
    res = flagship.run(tr, out_dir=out_dir)
    wall = time.perf_counter() - t0
    return {"rows": res["rows"], "wall_s": wall}


BENCH_QUERIES = [
    # name → queries() key; the representative per-family workloads
    "conv_category_counts",
    "hourly_distinct_convs",
    "tool_rt_stats",
    "topk_slowest_tools",
    "session_durations",
    "asof_error_tool",
    "exact_dedup",
    "minhash_clusters",
    "text_quality",
    "knn_cosine",
    "curate_report",
    "lineitem_pricing",
    # round-2 real-log-format packs
    "access_parsed_rows",
    "access_hourly_xcl",
    "mpmstats_join",
    "gc_pause_summary",
    "hung_thread_stats",
    # round-3 additions: multi-line GC reassembly + WAS event families
    "gc_multiline_rows",
    "was_cpu_starvation",
]


def run_queries(sf_dir: str) -> dict[str, float]:
    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        out = fn(sf_dir)
        # force execution of lazy Datasets
        try:
            import ray.data

            if isinstance(out, ray.data.Dataset):
                out = out.to_pandas()
        except Exception:
            pass
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def _warmup(num_cpus: int):
    """Spin up the Python worker pool before timing: first-touch worker
    startup (~0.3-0.5 s/worker import cost) would otherwise be billed to the
    first pipeline stage and distort the N-vs-4N scaling comparison, which is
    about steady-state throughput."""
    import ray.data

    ray.data.range(num_cpus * 2000, override_num_blocks=num_cpus * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()


def single_run(sf_dir: str, num_cpus: int, flagship_only: bool, repeat: int = 1,
               stage: bool = False) -> dict:
    _init_ray(num_cpus)
    sys.path.insert(0, REPO)
    _warmup(num_cpus)
    t0 = time.perf_counter()
    fr = run_stage_bench(sf_dir, repeat) if stage else run_flagship(sf_dir, repeat=repeat)
    queries = {("minhash_stage" if stage else "flagship"): round(fr["wall_s"], 3)}
    if not flagship_only and not stage:
        queries.update(run_queries(sf_dir))
    total = time.perf_counter() - t0
    result = {
        "metric": "end-to-end parsed+routed turns/sec (flagship) + per-query sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "rows": fr["rows"],
        "turns_per_sec": round(fr["rows"] / fr["wall_s"], 1),
    }
    import ray

    ray.shutdown()
    return result


def run_stage_bench(sf_dir: str, repeat: int) -> dict:
    """Compute-dense stage workload: MinHash signatures over the documents
    table replicated ×repeat in-batch. Hash arithmetic per byte is high and
    the stage's object-store output is ~512 B/doc, so this isolates CPU
    scaling from the single-box shared-memory bandwidth that caps the full
    flagship (see BASELINE.md §scaling)."""
    import pyarrow as pa

    import ray.data
    from log_parser_ray.stages.dedup import minhash_signatures

    import ray

    n_blocks = int(ray.cluster_resources().get("CPU", 8)) * 4
    # override_num_blocks: the 500-row file would otherwise be ONE block and
    # the fused read->replicate->minhash chain ONE task (single core)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=n_blocks,
    )

    def replicate(t, n=repeat):
        return pa.concat_tables([t] * n)

    # materialize the fan-out: otherwise Ray fuses read->replicate->minhash
    # into the single read task and the whole stage runs on one core
    reps = docs.map_batches(
        replicate, batch_format="pyarrow", zero_copy_batch=True, batch_size=64
    ).materialize()
    t0 = time.perf_counter()
    n = minhash_signatures(reps).count()
    wall = time.perf_counter() - t0
    return {"rows": n, "wall_s": wall}


def scaling(sf_dir: str, lo: int, hi: int, repeat: int = 8, attempts: int = 3,
            stage: bool = False) -> dict:
    """Fresh-process runs at two parallelism levels → scaling efficiency.

    Each level runs ``attempts`` times and keeps the fastest: this sandbox is
    co-tenant-noisy (identical runs vary 2-3×), and noise only ever SLOWS a
    run, so min-wall is the honest steady-state estimate for both levels."""
    runs = {}
    for n in (lo, hi):
        best = None
        for _ in range(attempts):
            env = dict(os.environ)
            env.pop("RAY_ADDRESS", None)
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--single-run", "--cpus", str(n), "--sf", sf_dir,
                 "--repeat", str(repeat)] + (["--stage"] if stage else []),
                capture_output=True, text=True, env=env, cwd=REPO, check=True,
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            if best is None or r["turns_per_sec"] > best["turns_per_sec"]:
                best = r
        runs[n] = best
    tp_lo = runs[lo]["turns_per_sec"]
    tp_hi = runs[hi]["turns_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": ("minhash-stage" if stage else "flagship") + " scaling efficiency (fresh ray sessions, same input)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_dir,
        "runs": {
            str(n): {
                "num_cpus": n,
                "turns_per_sec": runs[n]["turns_per_sec"],
                "wall_s": runs[n]["value"],
                "rows": runs[n]["rows"],
            }
            for n in (lo, hi)
        },
        "speedup": round(tp_hi / tp_lo, 3),
        "cpu_ratio": hi / lo,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=DEFAULT_SF)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-lo", type=int, default=4)
    ap.add_argument("--scaling-hi", type=int, default=16)
    ap.add_argument("--single-run", action="store_true",
                    help="internal: flagship only, used by --scaling subprocesses")
    ap.add_argument("--repeat", type=int, default=int(os.environ.get("GRAFT_REPEAT", "48")),
                    help="replicate the input N times in-batch (runs need length)")
    ap.add_argument("--attempts", type=int, default=3,
                    help="scaling: best-of-N runs per CPU level")
    ap.add_argument("--stage", action="store_true",
                    help="bench the compute-dense minhash stage instead of flagship")
    args = ap.parse_args()

    if args.scaling:
        rep = args.repeat if args.repeat > 8 else (256 if args.stage else 96)
        print(json.dumps(scaling(args.sf, args.scaling_lo, args.scaling_hi,
                                 repeat=rep, attempts=args.attempts,
                                 stage=args.stage)))
        return 0
    result = single_run(args.sf, args.cpus, flagship_only=args.single_run,
                        repeat=args.repeat, stage=args.stage)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
