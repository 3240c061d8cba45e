"""Vectorized grok/regex parse stage.

The analogue of the reference's AWK field-extraction passes (SURVEY.md §2.2):
WAS msgId/severity extraction (websphereLogParser.sh:205-230), access-log
request/response/%D parsing (webAccessLogParser.sh:297-481), the keyword
filter applied to every line (websphereLogParser.sh:99-101,123 via
WASCustomFilter.txt), response-time bucketing (webAccessLogParser.sh:465-481),
and the severity classing of websphereLogParser.sh:132-133.

Implementation: a single stateless ``map_batches`` function over zero-copy
Arrow batches; every extraction is a ``pyarrow.compute`` RE2 kernel (compiled
inside Arrow, no Python-per-row work). Appends schema.PARSED_COLUMNS.

SQL mirror: ``parsed_sql_cte`` emits the identical derivation for the DuckDB
oracle (NULLIF guards because DuckDB's regexp_extract returns '' on no-match).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from log_parser_ray.schema import (
    FILTER_PATTERNS,
    RT_BUCKET_OVER,
    RT_BUCKETS,
)

_ERROR_RE = r"ERROR \[(?P<error_code>\w+)\] thread hung for (?P<duration_ms>\d+) ms"
_TOOL_RE = r'<tool_call name="(?P<tool_name>\w+)" status="(?P<tool_status>\w+)" rt_us=(?P<rt_us>\d+)>'
_HTTP_RE = r" status=(?P<http_code>\d+)"
_LOGIN_RE = r"login uid=(?P<login_uid>\w+)"
_LOGOUT_SUBSTR = " logout"


def _field(struct: pa.ChunkedArray | pa.Array, name: str, typ: pa.DataType):
    return pc.cast(pc.struct_field(struct, name), typ)


def make_parser(filter_patterns: list[str] | None = None):
    """Build the parse fn; the keyword-filter union regex is config data
    (WASCustomFilter.txt analogue) captured in the closure — applied to EVERY
    turn, including ones that match no structured pattern, exactly like the
    spawned egrep at websphereLogParser.sh:123,136."""
    union = "|".join(f"(?:{p})" for p in (filter_patterns or FILTER_PATTERNS))

    def parse_batch(batch: pa.Table) -> pa.Table:
        text = batch["text"]

        err = pc.extract_regex(text, _ERROR_RE)
        tool = pc.extract_regex(text, _TOOL_RE)
        http = pc.extract_regex(text, _HTTP_RE)
        login = pc.extract_regex(text, _LOGIN_RE)

        error_code = _field(err, "error_code", pa.string())
        duration_ms = _field(err, "duration_ms", pa.int64())
        tool_name = _field(tool, "tool_name", pa.string())
        tool_status = _field(tool, "tool_status", pa.string())
        rt_us = _field(tool, "rt_us", pa.int64())
        http_code = _field(http, "http_code", pa.int32())
        login_uid = _field(login, "login_uid", pa.string())
        # fill_null → False: a null text matches nothing but must still route
        # (to 'unparsed'), keeping the router a strict partition of rows.
        is_logout = pc.fill_null(pc.match_substring(text, _LOGOUT_SUBSTR), False)
        filtered = pc.fill_null(pc.match_substring_regex(text, union), False)

        has_err = pc.is_valid(error_code)
        has_tool = pc.is_valid(tool_name)
        has_http = pc.is_valid(http_code)

        # severity: E/W from the error-code suffix letter (msgId class switch,
        # websphereLogParser.sh:277-318); http >=500 → E, >=400 → W
        # (webAccessLogParser.sh:669-671); failed tool call → W; else I.
        severity = pc.if_else(
            has_err,
            pc.if_else(pc.match_substring_regex(error_code, r"E$"), "E", "W"),
            pc.if_else(
                pc.and_kleene(has_http, pc.greater_equal(http_code, 500)),
                pa.scalar("E"),
                pc.if_else(
                    pc.and_kleene(has_http, pc.greater_equal(http_code, 400)),
                    pa.scalar("W"),
                    pc.if_else(
                        pc.fill_null(pc.equal(tool_status, "err"), False),
                        pa.scalar("W"),
                        pa.scalar("I"),
                    ),
                ),
            ),
        )

        # rt bucket on integer µs so boundaries are exact (<= semantics of
        # webAccessLogParser.sh:465-481).
        rt_bucket = pa.nulls(len(batch), pa.string())
        for label, bound in reversed(RT_BUCKETS):
            rt_bucket = pc.if_else(
                pc.fill_null(pc.less_equal(rt_us, bound), False), pa.scalar(label), rt_bucket
            )
        rt_bucket = pc.if_else(
            pc.fill_null(pc.greater(rt_us, RT_BUCKETS[-1][1]), False),
            pa.scalar(RT_BUCKET_OVER),
            rt_bucket,
        )

        # router predicate — a PARTITION: each row lands in exactly one sink
        # (filtered checked first, like the keyword grep preceding the
        # structured path; then the IO7 side-output family).
        ge400 = pc.fill_null(pc.greater_equal(http_code, 400), False)
        sink = pc.if_else(
            filtered,
            pa.scalar("filtered"),
            pc.if_else(
                has_err,
                pa.scalar("errors"),
                pc.if_else(
                    has_tool,
                    pa.scalar("tools"),
                    pc.if_else(
                        pc.and_kleene(has_http, ge400),
                        pa.scalar("http_errors"),
                        pc.if_else(
                            has_http,
                            pa.scalar("http_ok"),
                            pc.if_else(
                                pc.is_valid(login_uid),
                                pa.scalar("sessions"),
                                pa.scalar("unparsed"),
                            ),
                        ),
                    ),
                ),
            ),
        )

        hour = pc.cast(pc.hour(batch["ts"]), pa.int32())

        for name, col in [
            ("error_code", error_code),
            ("duration_ms", duration_ms),
            ("tool_name", tool_name),
            ("tool_status", tool_status),
            ("rt_us", rt_us),
            ("http_code", http_code),
            ("login_uid", login_uid),
            ("is_logout", is_logout),
            ("filtered", filtered),
            ("severity", severity),
            ("hour", hour),
            ("rt_bucket", rt_bucket),
            ("sink", sink),
        ]:
            batch = batch.append_column(name, col)
        return batch

    return parse_batch


def parse_dataset(ds, filter_patterns: list[str] | None = None, batch_size: int = 32768):
    """transcripts Dataset → parsed Dataset (stateless tasks, zero-copy Arrow)."""
    return ds.map_batches(
        make_parser(filter_patterns),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def parsed_sql_cte(filter_patterns: list[str] | None = None) -> str:
    """The identical derivation in ANSI SQL over the `transcripts` CTE."""
    union = "|".join(f"(?:{p})" for p in (filter_patterns or FILTER_PATTERNS))
    bucket_sql = "CASE WHEN rt_us IS NULL THEN NULL " + " ".join(
        f"WHEN rt_us <= {bound} THEN '{label}'" for label, bound in RT_BUCKETS
    ) + f" ELSE '{RT_BUCKET_OVER}' END"
    return f"""
parsed AS (
  SELECT *,
    {bucket_sql} AS rt_bucket,
    CASE WHEN filtered THEN 'filtered'
         WHEN error_code IS NOT NULL THEN 'errors'
         WHEN tool_name IS NOT NULL THEN 'tools'
         WHEN http_code >= 400 THEN 'http_errors'
         WHEN http_code IS NOT NULL THEN 'http_ok'
         WHEN login_uid IS NOT NULL THEN 'sessions'
         ELSE 'unparsed' END AS sink
  FROM (
    SELECT *,
      CASE WHEN error_code IS NOT NULL THEN
             (CASE WHEN error_code LIKE '%E' THEN 'E' ELSE 'W' END)
           WHEN http_code >= 500 THEN 'E'
           WHEN http_code >= 400 THEN 'W'
           WHEN tool_status = 'err' THEN 'W'
           ELSE 'I' END AS severity
    FROM (
      SELECT t.*,
        NULLIF(regexp_extract(text, 'ERROR \\[(\\w+)\\] thread hung for \\d+ ms', 1), '') AS error_code,
        CAST(NULLIF(regexp_extract(text, 'ERROR \\[\\w+\\] thread hung for (\\d+) ms', 1), '') AS BIGINT) AS duration_ms,
        NULLIF(regexp_extract(text, '<tool_call name="(\\w+)" status="\\w+" rt_us=\\d+>', 1), '') AS tool_name,
        NULLIF(regexp_extract(text, '<tool_call name="\\w+" status="(\\w+)" rt_us=\\d+>', 1), '') AS tool_status,
        CAST(NULLIF(regexp_extract(text, '<tool_call name="\\w+" status="\\w+" rt_us=(\\d+)>', 1), '') AS BIGINT) AS rt_us,
        CAST(NULLIF(regexp_extract(text, ' status=(\\d+)', 1), '') AS INTEGER) AS http_code,
        NULLIF(regexp_extract(text, 'login uid=(\\w+)', 1), '') AS login_uid,
        COALESCE(contains(text, ' logout'), FALSE) AS is_logout,
        COALESCE(regexp_matches(text, '{union}'), FALSE) AS filtered,
        CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour
      FROM transcripts t
    ) x
  ) y
)
""".strip()


def extract_json_field(
    ds,
    column: str,
    key: str,
    out: str | None = None,
    typ: pa.DataType = pa.int64(),
):
    """Semi-structured payload extraction: pull one scalar field out of a
    flat-JSON string column (the ``props``-style payload attached to event
    streams; the reference's analogue is the AWK k=v field grabs, e.g.
    webAccessLogParser.sh:297-481's request-line token extraction).

    One RE2 ``extract_regex`` kernel per batch over the zero-copy Arrow
    column — no per-row ``json.loads``. Absent / non-matching keys yield
    NULL (the DuckDB twin is ``NULLIF(regexp_extract(...), '')`` + CAST).
    Scalar strings and numbers only; nested JSON is out of scope.

    100-TB shape: stateless task map, output adds ONE narrow column;
    callers should ``select_columns`` afterwards if the JSON blob itself
    is no longer needed so the wide string column never shuffles.
    """
    out = out or key
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        pat = rf'"{key}"\s*:\s*"(?P<v>[^"]*)"'
    else:
        pat = rf'"{key}"\s*:\s*(?P<v>-?\d+(?:\.\d+)?)'

    def fn(t: pa.Table) -> pa.Table:
        v = pc.struct_field(pc.extract_regex(t[column], pat), "v")
        if pa.types.is_integer(typ):
            # RE2 has no lookahead, so "2.5" would match "2" under an
            # integer-only pattern; extract the full numeric token instead
            # and NULL out non-integral values before the narrowing cast
            f = pc.cast(v, pa.float64())
            f = pc.if_else(pc.equal(pc.floor(f), f), f, pa.scalar(None, pa.float64()))
            return t.append_column(out, pc.cast(f, typ))
        return t.append_column(out, pc.cast(v, typ))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
