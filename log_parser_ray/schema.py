"""Schemas and default lookup/config tables.

The transcript table is the engine's primary input (BASELINE.json input_hint)::

    conv_id: string        conversation id; partition/group key
    turn_idx: int32        stable-sort tiebreak within a conversation
    role: string           user / assistant / system / tool
    text: string           raw turn text (the parse target)
    tool: string?          tool invoked this turn, nullable
    ts: timestamp[us]      event time

Reference analogues (SURVEY.md §1.3): conv_id ≈ server name from dir path
(websphereLogParser.sh:120-121), turn_idx ≈ file line order, text ≈ raw log line.

Lookup tables mirror the reference's four config CSVs (README.md:20-24):
``tool_categories`` ≈ WAS_CloneIDs.csv (cloneID→WAS broadcast lookup,
webAccessLogParser.sh:196-201); ``role_severities`` ≈ WAS eventType classes
(websphereLogParser.sh:132); ``thresholds`` ≈ thresholdValues.csv;
``filter_patterns`` ≈ WASCustomFilter.txt (websphereLogParser.sh:99-101).
They are small broadcast state — never shuffled.
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Columns the parse stage appends to a transcript batch.
PARSED_COLUMNS = [
    ("error_code", pa.string()),
    ("duration_ms", pa.int64()),
    ("tool_name", pa.string()),
    ("tool_status", pa.string()),
    ("rt_us", pa.int64()),
    ("http_code", pa.int32()),
    ("login_uid", pa.string()),
    ("is_logout", pa.bool_()),
    ("filtered", pa.bool_()),
    ("severity", pa.string()),
    ("hour", pa.int32()),
    ("rt_bucket", pa.string()),
    ("sink", pa.string()),
]

# --- default lookup/config data (user-editable "config files" of the engine) ---

# tool → category ("auth" is intentionally absent: unmatched tools map to
# "uncat", mirroring the '-'-session null triple at webAccessLogParser.sh:441-445).
TOOL_CATEGORIES: dict[str, str] = {
    "search": "retrieval",
    "checkout": "commerce",
    "browse": "web",
}
CATEGORY_UNMATCHED = "uncat"  # tool present but not in the lookup
CATEGORY_NONE = "none"  # no tool on the turn

# role → severity class (analogue of WAS eventType W/E/F/I/A classes).
ROLE_SEVERITIES: dict[str, str] = {
    "system": "high",
    "assistant": "medium",
    "tool": "medium",
    "user": "low",
}
ROLE_SEVERITY_DEFAULT = "low"

# property|value|target thresholds (thresholdValues.csv:1 shape). Keyed by
# (target-prefix, property) like the reference's `was.App.wasFCntTh`.
THRESHOLDS: dict[str, float] = {
    "conv.errCntTh": 8.0,  # per-conversation error-sink count alert
    "conv.filteredCntTh": 3.0,  # per-conversation keyword-filter hits
    "global.http5xxPctTh": 5.0,  # % of http rows that are 5xx
}

# Per-family thresholds keyed `<family>.<srvPrefix3>.<property>` — the
# reference resolves rules by the server name's 3-char prefix
# (websphereLogParser.sh:345-379,416-439; webErrorLogParser.sh:175-190;
# javaGCStatsParser.sh:474-489). Prefixes cover the synth fixtures
# (was0-3 / web0-3 / jvm0-3) and the reference's App/Bat naming.
FAMILY_THRESHOLDS: dict[str, float] = {
    # WAS SystemOut family
    "was.was.wasECntTh": 50.0,
    "was.was.wasWCntTh": 100.0,
    "was.was.wasFCntTh": 5.0,
    "was.was.wasTranTmOutCntTh": 3.0,
    "was.was.wasCPUStarvCntTh": 2.0,
    "was.was.wasHungThrdCntTh": 2.0,
    "was.App.wasECntTh": 4500.0,
    "was.App.wasWCntTh": 9000.0,
    "was.App.wasFCntTh": 5.0,
    "was.App.wasTranTmOutCntTh": 3.0,
    "was.App.wasCPUStarvCntTh": 2.0,
    "was.App.wasHungThrdCntTh": 2.0,
    # web error_log family
    "http.web.httpErrorCountTh": 3500.0,
    "http.web.httpMpmStBsyCountTh": 100.0,
    # web access_log family — GLOBAL (daily) rules, no server prefix
    # (thresholdValues.csv target 'http': webAccessLogParser.sh alert rows)
    "http.httpAvgRespTimeTh": 2.5,       # daily avg resp sec, app pages only
    "http.httpDly1SecRangeTh": 82.0,     # alert if ≤1s range % falls BELOW
    "http.httpDly20SecRangeTh": 0.9,     # alert if >20s range % exceeds
    "http.http400PlusRespCountTh": 10.0, # alert if 400+ responses % exceeds
    "http.httpDiscRcdCountTh": 2500.0,   # discarded-record count
    # verbose-GC family (daily counts + old-gen-after full GC)
    "jvm.jvm.gcDlyCountTh": 800.0,
    "jvm.jvm.fgcDlyCountTh": 10.0,
    "jvm.jvm.fgcOldGenAfTh": 4_700_000.0,
    "jvm.App.gcDlyCountTh": 800.0,
    "jvm.App.fgcDlyCountTh": 10.0,
    "jvm.App.fgcOldGenAfTh": 4_700_000.0,
}

def load_thresholds(path: str,
                    base: dict[str, float] | None = None) -> dict[str, float]:
    """Parse the reference's thresholdValues.csv into the FAMILY_THRESHOLDS
    key scheme and return an UPDATED COPY (callers decide whether to adopt
    it; the CLI updates the global in place for the run).

    File shape: ``property|value|target|comment``, ``#`` comment lines,
    duplicate rows last-wins (plain AWK array overwrite). Dotted targets
    (``was.App``, ``jvm.Bat``) key exactly like the WAS/GC parsers —
    ``<target>.<property>`` (websphereLogParser.sh:150-158,
    javaGCStatsParser.sh:136-148). The dotless ``http`` target is the
    access parser's GLOBAL rule set — ``http.<property>``
    (webAccessLogParser.sh:180-192) — and ``http.*`` rows additionally
    spread onto every existing per-prefix http rule with that property,
    because the error parser loads them BARE and applies them to every
    server (webErrorLogParser.sh:100-112)."""
    out = dict(FAMILY_THRESHOLDS if base is None else base)
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("|")
            if len(parts) < 3:
                continue
            prop, val, target = (parts[0].strip(), parts[1].strip(),
                                 parts[2].strip())
            try:
                v = float(val)
            except ValueError:
                continue  # heading / malformed row — AWK split() skips too
            key = f"{target}.{prop}"
            out[key] = v
            if target == "http" or target.startswith("http."):
                for k in list(out):
                    if (k.startswith("http.") and k.endswith("." + prop)
                            and k != key):
                        out[k] = v
    return out


# WASCustomFilter.txt analogue: user-pluggable critical-error regexes, applied
# to EVERY turn's text (websphereLogParser.sh:99-101,123,136).
FILTER_PATTERNS: list[str] = [
    r"CORBA.*NO_RESPONSE",
    r"OutOfMemory",
]


def load_filter_patterns(path: str) -> list[str]:
    """Parse the reference's WASCustomFilter.txt — one keyword/regex per
    line, ``#`` comments (websphereLogParser.sh:99-101 builds an
    ``egrep -i`` union from it). Each pattern is wrapped ``(?i:…)`` to
    reproduce the reference's case-INSENSITIVE match (RE2-compatible, so
    it runs inside Arrow's match_substring_regex kernels unchanged)."""
    pats: list[str] = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line and not line.startswith("#"):
                pats.append(f"(?i:{line})")
    return pats

# Response-time buckets (webAccessLogParser.sh:465-481 uses `<=` boundaries
# 1/5/10/20 s). Labels are lexically ordered for stable sorts. Compared on
# integer rt_us so the bucketing is exact under parallelism.
RT_BUCKETS: list[tuple[str, int]] = [
    ("01_le1", 1_000_000),
    ("02_le5", 5_000_000),
    ("03_le10", 10_000_000),
    ("04_le20", 20_000_000),
]
RT_BUCKET_OVER = "05_gt20"

SINKS = ["filtered", "errors", "tools", "http_errors", "http_ok", "sessions", "unparsed"]
