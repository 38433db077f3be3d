"""Cassandra log-line parsing and issue classification — Column exprs.

Parity targets in the reference (``/root/reference/cassandra_log_analyzer.py``):
- ``parse_log_line`` regex           → ``LOG_LINE_REGEX`` (ref :186-203)
- ``ERROR_PATTERNS``/``WARNING_PATTERNS`` → same dicts (ref :38-56)
- ``detect_issues`` multi-label scan → ``issues_col`` (ref :205-217)
- error/warning accounting rules     → ``is_error_col``/``is_warning_col``
  (level=='ERROR' OR any error-issue; level=='WARN' OR any warning-issue,
  ref :245-251)

Everything here is a JVM-side Column expression (regexp_extract / rlike)
so classification stays inside whole-stage codegen — a single pass over
the scan, no Python in the loop. At 100 TB this is a map-only stage.

The synthetic-log builder turns the driver's ``events`` table into
deterministic Cassandra-format lines (node = user_id % 4, message
template keyed by event_id) so the parser is exercised on realistic
input while remaining oracle-checkable: the DuckDB oracle re-derives the
same fields directly (see ``oracles.py``), so any parser defect shows up
as a t2 hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference parse_log_line regex, ref :189 (format:
# ``LEVEL [timestamp] [thread] class:line - message``).
LOG_LINE_REGEX = r"(\w+)\s+\[([^\]]+)\]\s+\[([^\]]+)\]\s+([^:]+):(\d+)\s+-\s+(.*)"

# Issue patterns, ref :38-49 and :51-56. RE2/Java-compatible (inline
# (?i) flag works in both Spark's Java regex and DuckDB's RE2).
ERROR_PATTERNS: dict[str, str] = {
    "timeout": r"(?i)(timeout|timed out|TimedOut)",
    "oom": r"(?i)(OutOfMemory|java\.lang\.OutOfMemoryError)",
    "connection": r"(?i)(connection.*(?:refused|failed|lost|closed))",
    "compaction": r"(?i)(compaction.*(?:error|failed))",
    "repair": r"(?i)(repair.*(?:error|failed))",
    "gc": r"(?i)(GC.*(?:pause|exceeded))",
    "tombstone": r"(?i)(tombstone.*(?:warning|exceeded))",
    "dropped": r"(?i)(dropped.*messages?)",
    "unavailable": r"(?i)(UnavailableException)",
    "coordinator": r"(?i)(coordinator.*(?:timeout|failed))",
}
WARNING_PATTERNS: dict[str, str] = {
    "heap": r"(?i)(heap.*(?:pressure|warning))",
    "slow_query": r"(?i)(slow.*query)",
    "batch": r"(?i)(batch.*(?:too large|warning))",
    "streaming": r"(?i)(streaming.*(?:failed|error))",
}
ALL_PATTERNS: dict[str, str] = {**ERROR_PATTERNS, **WARNING_PATTERNS}
ISSUE_SEVERITY: dict[str, str] = {
    **{k: "ERROR" for k in ERROR_PATTERNS},
    **{k: "WARNING" for k in WARNING_PATTERNS},
}

# Recommendation threshold rules, ref _generate_recommendations :270-309.
# (issue, threshold, severity, recommendation)
RECOMMENDATION_RULES: list[tuple[str, int, str, str]] = [
    (
        "timeout",
        10,
        "HIGH",
        "Check network latency, increase timeouts, or optimize queries",
    ),
    (
        "oom",
        0,
        "CRITICAL",
        "Increase JVM heap or reduce load; check for memory leaks",
    ),
    (
        "tombstone",
        5,
        "MEDIUM",
        "Review the data model, adjust gc_grace_seconds, or raise "
        "tombstone_warn_threshold",
    ),
    (
        "gc",
        5,
        "HIGH",
        "Tune the JVM heap, consider G1GC, or reduce load",
    ),
    (
        "dropped",
        10,
        "HIGH",
        "Cluster overloaded: add nodes or optimize queries",
    ),
]

# ---------------------------------------------------------------------------
# Deterministic synthetic-log templates (shared with the DuckDB oracle).
# Each template intentionally trips specific issue patterns; ERROR#7
# trips two (coordinator + timeout) and INFO#3 trips an ERROR-severity
# issue on an INFO line — both parity edge cases of ref :243-251.
# ---------------------------------------------------------------------------
ERROR_TEMPLATES = [
    "Operation timed out waiting for 2 replica responses",      # timeout
    "java.lang.OutOfMemoryError: Java heap space",              # oom
    "Connection to peer closed during handshake",               # connection
    "Compaction failed on sstable segment",                     # compaction
    "UnavailableException: not enough replicas alive for QUORUM",  # unavailable
    "Repair session failed on range owner",                     # repair
    "Dropped 17 READ messages in the last interval",            # dropped
    "Coordinator timeout during read at consistency QUORUM",    # coordinator+timeout
]
WARN_TEMPLATES = [
    "GC pause of 1213ms exceeded threshold",                    # gc
    "Read 8012 live rows and 50001 tombstone cells, tombstone warning threshold hit",  # tombstone
    "Slow query on table ks.events took 4021ms",                # slow_query
    "Batch of prepared statements is too large for keyspace",   # batch
    "Heap pressure warning, memtable flush triggered",          # heap
    "Streaming session failed with peer during bootstrap",      # streaming
]
INFO_TEMPLATES = [
    "Completed flushing memtable to disk",
    "Handshaking version with peer endpoint",
    "Enqueuing flush of sstable segment",
    "Dropped 2 HINT messages during drain",                     # dropped (on INFO)
]
ERROR_CLASSES = [
    "StorageProxy", "HeapUtils", "OutboundTcpConnection", "CompactionManager",
    "StorageProxy", "RepairRunnable", "MessagingService", "StorageProxy",
]
WARN_CLASSES = [
    "GCInspector", "ReadCommand", "MonitoringTask", "BatchStatement",
    "GCInspector", "StreamSession",
]
INFO_CLASSES = [
    "Memtable", "OutboundTcpConnection", "ColumnFamilyStore", "HintsService",
]
THREADS = ["ReadStage-1", "MutationStage-2", "CompactionExecutor-3", "GossipStage-1"]

N_NODES = 4
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss,SSS"


def _pick(col: Column, values: list[str]) -> Column:
    """values[col % len(values)] as a Column expression."""
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (col % len(values) + 1).cast("int"))


def _synth_fields(events: DataFrame) -> DataFrame:
    """events → the deterministic per-line log fields shared by every
    synthesized format (plain Cassandra lines, JSON lines).

    level from event_type (error→ERROR, view→WARN, else INFO),
    message/class template keyed by event_id, thread by event_id % 4,
    node by user_id % 4, line_no = 100 + event_id % 400.
    """
    eid = F.col("event_id")
    level = (
        F.when(F.col("event_type") == "error", "ERROR")
        .when(F.col("event_type") == "view", "WARN")
        .otherwise("INFO")
    )
    message = (
        F.when(level == "ERROR", _pick(eid, ERROR_TEMPLATES))
        .when(level == "WARN", _pick(eid, WARN_TEMPLATES))
        .otherwise(_pick(eid, INFO_TEMPLATES))
    )
    clazz = (
        F.when(level == "ERROR", _pick(eid, ERROR_CLASSES))
        .when(level == "WARN", _pick(eid, WARN_CLASSES))
        .otherwise(_pick(eid, INFO_CLASSES))
    )
    return events.select(
        eid.alias("line_id"),
        F.concat(
            F.lit("node"), (F.col("user_id") % N_NODES).cast("string")
        ).alias("node"),
        level.alias("level"),
        F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
        _pick(eid, THREADS).alias("thread"),
        clazz.alias("clazz"),
        (F.lit(100) + eid % 400).cast("int").alias("line_no"),
        message.alias("message"),
    )


def synth_raw_lines(events: DataFrame) -> DataFrame:
    """events table → (line_id, node, raw) Cassandra-format log lines."""
    f = _synth_fields(events)
    raw = F.concat(
        F.col("level"), F.lit(" ["), F.col("ts_str"), F.lit("] ["),
        F.col("thread"), F.lit("] "), F.col("clazz"), F.lit(":"),
        F.col("line_no").cast("string"), F.lit(" - "), F.col("message"),
    )
    return f.select("line_id", "node", raw.alias("raw"))


#: JSON log-line schema (logback/log4j2 JSON-appender style keys)
JSON_LOG_SCHEMA = (
    "level STRING, ts STRING, thread STRING, logger STRING, "
    "line INT, msg STRING"
)


def synth_json_lines(events: DataFrame) -> DataFrame:
    """events table → (line_id, node, raw) JSON-format log lines — the
    "other log formats" capability (ref README roadmap :256): same
    deterministic fields, logback-JSON-appender-style keys.
    """
    f = _synth_fields(events)
    raw = F.to_json(
        F.struct(
            F.col("level"),
            F.col("ts_str").alias("ts"),
            F.col("thread"),
            F.col("clazz").alias("logger"),
            F.col("line_no").alias("line"),
            F.col("message").alias("msg"),
        )
    )
    return f.select("line_id", "node", raw.alias("raw"))


def parse_json_lines(df: DataFrame) -> DataFrame:
    """(line_id, node, raw) JSON lines → the SAME parsed schema as
    ``parse_lines``, so every downstream operator (classification,
    windows, streaming) is format-agnostic. from_json is a JVM-side
    Jackson scan — one map-only stage, no Python.
    """
    j = F.from_json("raw", JSON_LOG_SCHEMA)
    out = df.select(
        "line_id",
        "node",
        "raw",
        j.getField("level").alias("level"),
        j.getField("ts").alias("ts_str"),
        j.getField("thread").alias("thread"),
        j.getField("logger").alias("clazz"),
        j.getField("line").alias("line_no"),
        j.getField("msg").alias("message"),
    )
    return out.filter(
        F.col("level").isNotNull() & (F.col("level") != "")
    ).withColumn(
        "ts", F.replace("ts_str", F.lit(","), F.lit(".")).cast("timestamp")
    )


#: TSV log-line schema (tab-separated shipper output; tab, not comma,
#: because real log messages contain commas but never tabs)
CSV_LOG_SCHEMA = (
    "level STRING, ts STRING, thread STRING, logger STRING, "
    "line INT, msg STRING"
)


def synth_csv_lines(events: DataFrame) -> DataFrame:
    """events table → (line_id, node, raw) tab-separated log lines —
    the third wire format (plain Cassandra, JSON, TSV) proving every
    downstream operator is format-agnostic."""
    f = _synth_fields(events)
    raw = F.concat_ws(
        "\t",
        F.col("level"), F.col("ts_str"), F.col("thread"),
        F.col("clazz"), F.col("line_no").cast("string"), F.col("message"),
    )
    return f.select("line_id", "node", raw.alias("raw"))


def parse_csv_lines(df: DataFrame) -> DataFrame:
    """(line_id, node, raw) TSV lines → the SAME parsed schema as
    ``parse_lines``. from_csv is a JVM-side univocity scan — one
    map-only stage, no Python.
    """
    # quote must be DISABLED: the writer (concat_ws) never quotes, and
    # univocity's default '"' would silently strip a leading quote off
    # a message field ('"abc"' → 'abc'); empty string turns quoting off
    # so arbitrary message text roundtrips byte-identical.
    c = F.from_csv("raw", F.lit(CSV_LOG_SCHEMA), {"sep": "\t", "quote": ""})
    out = df.select(
        "line_id",
        "node",
        "raw",
        c.getField("level").alias("level"),
        c.getField("ts").alias("ts_str"),
        c.getField("thread").alias("thread"),
        c.getField("logger").alias("clazz"),
        c.getField("line").alias("line_no"),
        c.getField("msg").alias("message"),
    )
    return out.filter(
        F.col("level").isNotNull() & (F.col("level") != "")
    ).withColumn(
        "ts", F.replace("ts_str", F.lit(","), F.lit(".")).cast("timestamp")
    )


def parse_lines(df: DataFrame) -> DataFrame:
    """(line_id, node, raw, *extras) → parsed log entries (parser of
    ref :186-203), extra input columns passed through untouched.

    Non-matching lines get empty groups and are dropped, mirroring the
    reference's ``return None`` branch. Single map-only stage.
    """
    g = lambda i: F.regexp_extract("raw", LOG_LINE_REGEX, i)  # noqa: E731
    out = df.select(
        "*",
        g(1).alias("level"),
        g(2).alias("ts_str"),
        g(3).alias("thread"),
        g(4).alias("clazz"),
        g(5).cast("int").alias("line_no"),
        g(6).alias("message"),
    )
    return out.filter(F.col("level") != "").withColumn(
        "ts", F.replace("ts_str", F.lit(","), F.lit(".")).cast("timestamp")
    )


# ---------------------------------------------------------------------------
# Multi-line entries (Java stack traces). The reference's line parser
# silently DROPS continuation lines (ref :186-203 returns None); here
# they are segmented back onto their header entry — the capability gap
# every real Cassandra log exposes (OOM / assertion stack traces).
# ---------------------------------------------------------------------------
#: ERROR template index that carries a stack trace (the OOM) and how
#: many continuation frames it emits; shared with the DuckDB oracle.
STACK_IDX = 1
STACK_FRAMES = 2
LINES_PER_ENTRY = STACK_FRAMES + 1  # line-id stride in the synth
HEADER_REGEX = r"^(ERROR|WARN|INFO) \["


def _frame(k: int) -> Column:
    return F.concat(
        F.lit("\tat org.apache.cassandra."), F.col("clazz"),
        F.lit(".run("), F.col("clazz"), F.lit(".java:"),
        (F.col("line_no") + k).cast("string"), F.lit(")"),
    )


def synth_multiline_lines(events: DataFrame) -> DataFrame:
    """events → (line_id, node, raw) where OOM errors carry
    STACK_FRAMES continuation lines after the header, interleaved in
    per-node line order (header at line_id·3, frames at +1, +2)."""
    f = _synth_fields(events)
    raw = F.concat(
        F.col("level"), F.lit(" ["), F.col("ts_str"), F.lit("] ["),
        F.col("thread"), F.lit("] "), F.col("clazz"), F.lit(":"),
        F.col("line_no").cast("string"), F.lit(" - "), F.col("message"),
    )
    has_stack = (F.col("level") == "ERROR") & (
        F.col("line_id") % len(ERROR_TEMPLATES) == STACK_IDX
    )
    parts = F.array(
        F.struct(F.lit(0).alias("k"), raw.alias("raw")),
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.when(has_stack, _frame(k)).alias("raw"),
            )
            for k in range(1, STACK_FRAMES + 1)
        ],
    )
    ex = f.select("line_id", "node", F.explode(parts).alias("p")).filter(
        F.col("p.raw").isNotNull()
    )
    return ex.select(
        (F.col("line_id") * LINES_PER_ENTRY + F.col("p.k")).alias("line_id"),
        "node",
        F.col("p.raw").alias("raw"),
    )


#: line-id block width for two-stage multiline segmentation (the 100 TB
#: analogue is the source file; fixed-width id blocks stand in here).
MULTILINE_BLOCK_LINES = 8192


def parse_multiline(df: DataFrame) -> DataFrame:
    """(line_id, node, raw) with continuation lines → parsed entries
    carrying ``n_extra_lines`` and the joined ``stack`` tail.

    Segmentation is a running count of header lines per node in line
    order (at 100 TB the order key is (file, byte offset) — exactly
    what a text scan provides), computed scale-safely in two stages:
    a running header count WITHIN each (node, line-id block) —
    fine-grained, massively parallel — plus each block's cumulative
    header offset from the tiny (node × block) rollup, broadcast back.
    ``offset + within-block count`` equals the global running count
    exactly, including stack traces that span a block seam (their
    continuation lines land in the next block with local count 0, so
    they inherit the previous block's last segment id). Each segment
    then collapses in ONE hash aggregate: min_by picks the header,
    array_sort fixes the collect_list order so the stack string is
    deterministic.
    """
    from pyspark.sql.window import Window

    is_header = F.col("raw").rlike(HEADER_REGEX)
    blocked = df.select(
        "line_id", "node", "raw",
        F.floor(F.col("line_id") / MULTILINE_BLOCK_LINES).alias("block"),
        is_header.cast("long").alias("is_hdr"),
    )
    w_local = (
        Window.partitionBy("node", "block")
        .orderBy("line_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_block = blocked.groupBy("node", "block").agg(
        F.sum("is_hdr").alias("n_headers")
    )
    wb = Window.partitionBy("node").orderBy("block")
    offsets = per_block.select(
        "node", "block",
        F.coalesce(
            F.sum("n_headers").over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("hdr_offset"),
    )
    tagged = (
        blocked.join(F.broadcast(offsets), ["node", "block"])
        .select(
            "line_id", "node", "raw",
            (F.col("hdr_offset") + F.sum("is_hdr").over(w_local)).alias("seg"),
        )
    )
    grouped = (
        tagged.groupBy("node", "seg")
        .agg(
            F.min("line_id").alias("line_id"),
            F.min_by("raw", "line_id").alias("raw"),
            (F.count("*") - 1).cast("int").alias("n_extra_lines"),
            F.array_join(
                F.transform(
                    F.slice(
                        F.array_sort(F.collect_list(F.struct("line_id", "raw"))),
                        2,
                        1_000_000,
                    ),
                    lambda x: x.raw,
                ),
                "\n",
            ).alias("stack"),
        )
        .drop("seg")
    )
    return parse_lines(grouped)


def issues_col(message: Column = None) -> Column:
    """Array of issue names whose pattern matches ``message`` (ref :205-217)."""
    msg = F.col("message") if message is None else message
    return F.array_compact(
        F.array(
            *[
                F.when(msg.rlike(pat), F.lit(name))
                for name, pat in ALL_PATTERNS.items()
            ]
        )
    )


def _any_match(msg: Column, patterns: dict[str, str]) -> Column:
    cond = F.lit(False)
    for pat in patterns.values():
        cond = cond | msg.rlike(pat)
    return cond


def is_error_col(level: Column = None, message: Column = None) -> Column:
    """Reference error accounting: level=='ERROR' OR any error issue (ref :245)."""
    lvl = F.col("level") if level is None else level
    msg = F.col("message") if message is None else message
    return (lvl == "ERROR") | _any_match(msg, ERROR_PATTERNS)


def is_warning_col(level: Column = None, message: Column = None) -> Column:
    """Reference warning accounting: level=='WARN' OR any warning issue (ref :249)."""
    lvl = F.col("level") if level is None else level
    msg = F.col("message") if message is None else message
    return (lvl == "WARN") | _any_match(msg, WARNING_PATTERNS)


def with_issue_flags(df: DataFrame) -> DataFrame:
    """Add issues / is_error / is_warning columns in one codegen stage."""
    return df.withColumns(
        {
            "issues": issues_col(),
            "is_error": is_error_col(),
            "is_warning": is_warning_col(),
        }
    )


#: corrupt-tolerance demo: every CORRUPT_MOD-th JSON line is mangled
#: (prefixed so it can never parse) — deterministic stand-in for the
#: torn writes / partial flushes a 100 TB log landing always contains.
CORRUPT_MOD = 9


def corrupt_some_lines(lines: DataFrame) -> DataFrame:
    """Mangle every CORRUPT_MOD-th line's payload (unparseable by
    construction: prefixed AND brace-stripped)."""
    bad = F.concat(F.lit("###torn###"), F.substring("raw", 1, 40))
    return lines.select(
        "line_id",
        "node",
        F.when(F.col("line_id") % CORRUPT_MOD == 0, bad)
        .otherwise(F.col("raw"))
        .alias("raw"),
    )


def parse_json_tolerant(df: DataFrame) -> DataFrame:
    """PERMISSIVE parse: rows that fail the Jackson scan surface as
    is_corrupt=true WITH their raw payload retained (the
    _corrupt_record contract) instead of killing the job — at 100 TB
    a landing always contains torn writes, and a parser that throws
    on the first one never finishes. Map-only, JVM-side."""
    j = F.from_json("raw", JSON_LOG_SCHEMA)
    return df.select(
        "line_id",
        "node",
        "raw",
        j.getField("level").alias("level"),
        j.getField("msg").alias("message"),
        (
            j.isNull() | j.getField("level").isNull()
        ).alias("is_corrupt"),
    )
