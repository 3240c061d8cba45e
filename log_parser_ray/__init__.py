"""log_parser_ray — a Ray-Data-native parse → enrich → route → aggregate engine.

A from-scratch re-expression of the query/data-processing capabilities of
``pppoudel/log-parser`` (shell+AWK log parsing/analysis/correlation/reporting;
see /root/reference) as an idiomatic Ray Data pipeline over Parquet tables of
multi-turn conversation/agent transcripts::

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp[us])

Design (SURVEY.md §3.4):

    read_parquet(transcripts)                       # column-pruned scan
      → map_batches(parse_batch, pyarrow)           # vectorized grok/regex extract
      → map_batches(Enricher, concurrency=N)        # broadcast lookups, actor pool
      → derive sink/category column                 # router predicate
      → fan-out per-sink write_parquet              # routed sinks
      → groupby(...).aggregate(...)                 # two-phase / salted aggregation
      → sort(...).limit(k)                          # rankings
      → threshold broadcast-join                    # alerts
      → partitioned history sinks + manifest        # checkpoint / lineage

Nothing here calls ``ray.init`` / ``ray.shutdown``; sessions are owned by the
CLI entry points, ``bench.py`` and the pytest fixture only.
"""

__version__ = "0.1.0"

import logging as _logging

# The driver-generated parquet files carry pandas metadata in their Arrow
# schema, and a pyarrow Schema with metadata is unhashable (hash() raises
# "unhashable type: 'dict'"). Ray Data's block-schema dedup cache tries
# hash(schema) and logs a warning per worker on the miss before taking the
# (correct) slow unify path. Pure noise for us; pin that logger to ERROR.
# This module is imported inside every worker that deserializes our stage
# callables, so the pin applies where the warning is emitted.
_logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").setLevel(
    _logging.ERROR
)
