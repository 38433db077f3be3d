"""Parser + issue-classification semantics (ref parse_log_line/detect_issues)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cassandra_log_analyzer_mcp_spark.functions.parsing import (
    ALL_PATTERNS,
    ERROR_TEMPLATES,
    INFO_TEMPLATES,
    WARN_TEMPLATES,
    is_error_col,
    is_warning_col,
    issues_col,
    parse_lines,
    synth_raw_lines,
    with_issue_flags,
)
from cassandra_log_analyzer_mcp_spark.sources.tables import table


def _raw_df(spark, lines):
    return spark.createDataFrame(
        [Row(line_id=i, node="n0", raw=line) for i, line in enumerate(lines)]
    )


def test_parse_roundtrip_fields(spark):
    line = (
        "ERROR [2025-03-01 10:11:12,345] [ReadStage-7] StorageProxy:321"
        " - Operation timed out: extra : colons - and dashes"
    )
    got = parse_lines(_raw_df(spark, [line])).collect()[0]
    assert got.level == "ERROR"
    assert got.ts_str == "2025-03-01 10:11:12,345"
    assert got.thread == "ReadStage-7"
    assert got.clazz == "StorageProxy"
    assert got.line_no == 321
    assert got.message == "Operation timed out: extra : colons - and dashes"
    assert str(got.ts) == "2025-03-01 10:11:12.345000"


def test_parse_drops_nonmatching(spark):
    lines = [
        "utter garbage",
        "",
        "WARN [2025-01-01 00:00:00,000] [T-1] C:1 - ok",
    ]
    assert parse_lines(_raw_df(spark, lines)).count() == 1


def test_every_template_trips_expected_patterns(spark):
    msgs = ERROR_TEMPLATES + WARN_TEMPLATES + INFO_TEMPLATES
    df = spark.createDataFrame([Row(message=m) for m in msgs]).select(
        "message", issues_col().alias("issues")
    )
    by_msg = {r.message: set(r.issues) for r in df.collect()}
    assert by_msg[ERROR_TEMPLATES[0]] == {"timeout"}
    assert by_msg[ERROR_TEMPLATES[1]] == {"oom"}
    assert by_msg[ERROR_TEMPLATES[7]] == {"timeout", "coordinator"}  # multi-label
    assert by_msg[WARN_TEMPLATES[0]] == {"gc"}
    assert by_msg[INFO_TEMPLATES[3]] == {"dropped"}  # ERROR-severity on INFO line
    assert by_msg[INFO_TEMPLATES[0]] == set()


def test_error_accounting_matches_reference_rule(spark):
    # INFO line with a 'dropped' issue counts as error (ref :245-247);
    # plain INFO does not; ERROR level always counts.
    rows = [
        Row(level="INFO", message=INFO_TEMPLATES[3]),
        Row(level="INFO", message=INFO_TEMPLATES[0]),
        Row(level="ERROR", message="no pattern here"),
        Row(level="WARN", message="no pattern here"),
    ]
    df = spark.createDataFrame(rows).select(
        is_error_col().alias("e"), is_warning_col().alias("w")
    )
    got = [(r.e, r.w) for r in df.collect()]
    assert got == [(True, False), (False, False), (True, False), (False, True)]


def test_synth_roundtrip_is_lossless(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    raw = synth_raw_lines(ev)
    parsed = parse_lines(raw)
    assert parsed.count() == ev.count()  # every synthesized line parses
    # node digits match user_id % 4
    joined = parsed.join(ev, parsed.line_id == ev.event_id)
    bad = joined.filter(
        F.col("node") != F.concat(F.lit("node"), (F.col("user_id") % 4).cast("string"))
    )
    assert bad.count() == 0


@pytest.mark.parametrize("name,pattern", list(ALL_PATTERNS.items()))
def test_patterns_compile_in_java_regex(spark, name, pattern):
    df = spark.range(1).select(F.lit("probe text").rlike(pattern).alias("x"))
    assert df.collect()[0].x in (True, False)


def test_with_issue_flags_consistency(spark, sf_dir):
    lf = with_issue_flags(
        parse_lines(synth_raw_lines(table(spark, sf_dir, "events")))
    )
    # any line whose issues include an error-issue must have is_error
    from cassandra_log_analyzer_mcp_spark.functions.parsing import ERROR_PATTERNS

    err_names = list(ERROR_PATTERNS)
    bad = lf.filter(
        (F.size(F.array_intersect("issues", F.array(*map(F.lit, err_names)))) > 0)
        & ~F.col("is_error")
    )
    assert bad.count() == 0


def test_parse_multiline_attaches_stack_to_header(spark):
    from cassandra_log_analyzer_mcp_spark.functions.parsing import (
        parse_multiline,
    )

    lines = spark.createDataFrame([
        Row(line_id=0, node="n0",
            raw="ERROR [2025-01-01 12:00:00,000] [t] C:1 - boom"),
        Row(line_id=1, node="n0", raw="\tat a.b(C.java:2)"),
        Row(line_id=2, node="n0", raw="\tat a.c(C.java:3)"),
        Row(line_id=3, node="n0",
            raw="INFO [2025-01-01 12:00:01,000] [t] D:9 - fine"),
        # other node interleaves without stealing continuations
        Row(line_id=1, node="n1",
            raw="WARN [2025-01-01 12:00:00,500] [t] E:5 - careful"),
    ])
    got = {
        (r.node, r.line_id): (r.message, r.n_extra_lines, r.stack)
        for r in parse_multiline(lines).collect()
    }
    assert got[("n0", 0)] == (
        "boom", 2, "\tat a.b(C.java:2)\n\tat a.c(C.java:3)"
    )
    assert got[("n0", 3)] == ("fine", 0, "")
    assert got[("n1", 1)] == ("careful", 0, "")


def test_json_roundtrip_matches_plain_format(spark, sf_dir):
    """The JSON-format path must parse back to exactly the rows the
    plain Cassandra-format path produces (same fields, same lines)."""
    from cassandra_log_analyzer_mcp_spark.functions.parsing import (
        parse_json_lines,
        synth_json_lines,
    )

    ev = table(spark, sf_dir, "events")
    cols = ["line_id", "node", "level", "ts_str", "thread", "clazz",
            "line_no", "message"]
    plain = parse_lines(synth_raw_lines(ev)).select(cols)
    js = parse_json_lines(synth_json_lines(ev)).select(cols)
    assert plain.exceptAll(js).count() == 0
    assert js.exceptAll(plain).count() == 0
