"""CSV/TSV document source and sink.

The third interchange edge next to parquet and NDJSON (sources/jsonl.py):
tabular corpora and metadata tables ship as delimited text — the reference
engine's own config surface is CSV (``thresholdValues.csv``,
``WAS_CloneIDs.csv``, ``perfBaseLine.csv``; loaded at
``webAccessLogParser.sh:216-223``), and crawl-index sidecars commonly
arrive as TSV. Ray-native:

- :func:`read_documents_csv` — ``ray.data.read_csv`` over a file or
  directory of ``*.csv`` / ``*.tsv`` / ``*.gz`` shards (compression
  inferred from the extension, one read task per shard). Unlike JSON, CSV
  CAN prune at the parse: ``columns=`` becomes Arrow's
  ``ConvertOptions(include_columns=...)`` so dropped fields are never
  materialized. ``schema=`` pins ``column_types`` so per-shard inference
  cannot disagree (an all-digits shard of a string column would otherwise
  come back int64). Quoted embedded newlines are enabled
  (``newlines_in_values=True``) — correctness over the block-splitting
  fast path, since a 100-TB text corpus WILL contain one.
- :func:`write_csv` — ``Dataset.write_csv`` shards for handing results to
  spreadsheet/SQL-loader consumers (the reference's report CSVs are this
  shape).
- :func:`export_documents_csv` — deterministic parquet→CSV exporter used
  by tests/benches (half the shards plain, half ``.gz``). Test fixture,
  not a production path.
"""

from __future__ import annotations

import gzip
import os
from typing import Sequence

import pyarrow as pa

import ray


def read_documents_csv(
    path: str | Sequence[str],
    *,
    schema: pa.Schema | None = None,
    columns: Sequence[str] | None = None,
    delimiter: str = ",",
    **kwargs,
) -> "ray.data.Dataset":
    """Read a delimited corpus (``*.csv`` / ``*.tsv`` / ``*.gz`` shards).

    ``schema`` pins the parse dtypes; ``columns`` prunes AT THE PARSE
    (Arrow ``include_columns``); ``delimiter`` covers the TSV case."""
    from pyarrow import csv as pcsv

    kwargs.setdefault(
        "parse_options",
        pcsv.ParseOptions(delimiter=delimiter, newlines_in_values=True),
    )
    conv: dict = {}
    if schema is not None:
        conv["column_types"] = {f.name: f.type for f in schema}
    if columns:
        conv["include_columns"] = list(columns)
    if conv:
        kwargs.setdefault("convert_options", pcsv.ConvertOptions(**conv))
    return ray.data.read_csv(
        path, file_extensions=["csv", "tsv", "gz"], **kwargs
    )


def write_csv(ds: "ray.data.Dataset", path: str, **kwargs) -> str:
    """Write ``ds`` as CSV shards under ``path`` (one file per block)."""
    ds.write_csv(path, **kwargs)
    return path


def export_documents_csv(
    sf_dir: str, out_dir: str, *, shards: int = 4, delimiter: str = ","
) -> str:
    """Deterministically export ``<sf_dir>/documents.parquet`` to CSV.

    Contiguous row slices → ``part-K.csv`` (even K) / ``part-K.csv.gz``
    (odd K) under ``out_dir``; same input ⇒ byte-identical shards."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    shards = max(1, min(shards, n or 1))
    step = -(-n // shards) if n else 1
    for k in range(shards):
        part = tbl.slice(k * step, step).to_pandas()
        if part.empty:
            continue
        if k % 2:
            with gzip.open(
                os.path.join(out_dir, f"part-{k}.csv.gz"), "wt",
                encoding="utf-8",
            ) as f:
                part.to_csv(f, index=False, sep=delimiter)
        else:
            part.to_csv(
                os.path.join(out_dir, f"part-{k}.csv"),
                index=False,
                sep=delimiter,
            )
    return out_dir
