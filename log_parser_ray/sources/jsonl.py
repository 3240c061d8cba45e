"""NDJSON (JSON-Lines) document source and sink.

Web-scale text corpora interchange as newline-delimited JSON — one
document object per line, sharded, usually gzip-compressed (the Dolma /
C4 / RedPajama layout). The reference engine has no JSON surface (its
inputs are raw text logs, ``websphereLogParser.sh:104-140``); this module
adds the ingestion/emission format a training-data pipeline meets at its
edge, Ray-native:

- :func:`read_documents_jsonl` — ``ray.data.read_json`` over a file or
  directory of ``*.jsonl`` / ``*.jsonl.gz`` shards (compression is
  inferred from the extension, one read task per shard). Arrow's NDJSON
  reader parses every field of every line: there is no column pruning or
  row-group skipping at a JSON read, which is exactly WHY a 100-TB
  pipeline converts JSONL to parquet once at the edge and runs everything
  downstream columnar — this reader is that edge. Pass ``schema=`` to pin
  dtypes across shards (per-shard inference can disagree when one shard's
  column is all-null) and to drop unlisted fields at parse time
  (``explicit_schema`` + ``unexpected_field_behavior="ignore"`` — the
  cheap projection JSON allows).
- :func:`write_jsonl` — ``Dataset.write_json`` NDJSON shards, one file
  per block, for handing results back to JSONL-consuming tools.
- :func:`export_documents_jsonl` — deterministic parquet→NDJSON exporter
  used by tests/benches to synthesize a JSONL corpus from the testdata
  ``documents`` table (half the shards plain, half ``.gz``, so both
  decode paths stay covered). Test fixture, not a production path:
  production JSONL already exists at the edge.
"""

from __future__ import annotations

import gzip
import os
from typing import Sequence

import pyarrow as pa

import ray


def read_documents_jsonl(
    path: str | Sequence[str],
    *,
    schema: pa.Schema | None = None,
    columns: Sequence[str] | None = None,
    **kwargs,
) -> "ray.data.Dataset":
    """Read an NDJSON corpus (``*.jsonl`` / ``*.jsonl.gz`` shards).

    ``schema`` pins the parse dtypes and ignores unlisted fields;
    ``columns`` post-projects (JSON cannot prune at the read — see the
    module docstring).
    """
    from pyarrow import json as pj

    if schema is not None:
        kwargs.setdefault(
            "parse_options",
            pj.ParseOptions(
                explicit_schema=schema, unexpected_field_behavior="ignore"
            ),
        )
    # ".json" included so write_jsonl output (Ray's default NDJSON sink
    # extension) roundtrips through this reader
    ds = ray.data.read_json(
        path, file_extensions=["jsonl", "json", "gz"], **kwargs
    )
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def write_jsonl(ds: "ray.data.Dataset", path: str, **kwargs) -> str:
    """Write ``ds`` as NDJSON shards under ``path`` (one file per block)."""
    ds.write_json(path, **kwargs)
    return path


def export_documents_jsonl(
    sf_dir: str, out_dir: str, *, shards: int = 4
) -> str:
    """Deterministically export ``<sf_dir>/documents.parquet`` to NDJSON.

    Contiguous row slices → ``part-K.jsonl`` (even K) / ``part-K.jsonl.gz``
    (odd K) under ``out_dir``; same input ⇒ byte-identical shards. Driver-
    side by design — it is a small-scale test fixture generator.
    """
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    shards = max(1, min(shards, n or 1))
    step = -(-n // shards) if n else 1
    for k in range(shards):
        part = tbl.slice(k * step, step).to_pandas()
        if part.empty:
            # arrow's NDJSON reader rejects empty files ("Empty JSON file") —
            # never write a rowless shard
            continue
        if k % 2:
            with gzip.open(
                os.path.join(out_dir, f"part-{k}.jsonl.gz"), "wt",
                encoding="utf-8",
            ) as f:
                part.to_json(f, orient="records", lines=True, force_ascii=False)
        else:
            part.to_json(
                os.path.join(out_dir, f"part-{k}.jsonl"),
                orient="records",
                lines=True,
                force_ascii=False,
            )
    return out_dir
