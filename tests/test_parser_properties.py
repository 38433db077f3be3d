"""Property-based parser tests (hypothesis): format→parse roundtrip for
arbitrary well-formed components, and rejection of malformed lines."""

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from cassandra_log_analyzer_mcp_spark.functions.parsing import (
    LOG_LINE_REGEX,
    parse_lines,
)

LEVELS = st.sampled_from(["ERROR", "WARN", "INFO", "DEBUG", "TRACE"])
THREAD = st.from_regex(r"[A-Za-z][A-Za-z0-9\-]{0,20}", fullmatch=True)
CLAZZ = st.from_regex(r"[A-Za-z][A-Za-z0-9\.]{0,30}", fullmatch=True)
LINE_NO = st.integers(min_value=0, max_value=99999)
# message: printable, no newline; must not be empty
MESSAGE = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "S", "Zs"), max_codepoint=0x2FF
    ),
    min_size=1,
    max_size=120,
)
TS = st.datetimes(
    min_value=__import__("datetime").datetime(2000, 1, 1),
    max_value=__import__("datetime").datetime(2035, 12, 31),
)


@settings(max_examples=30, deadline=None)
@given(level=LEVELS, thread=THREAD, clazz=CLAZZ, line_no=LINE_NO,
       message=MESSAGE, ts=TS)
def test_roundtrip_python_regex(level, thread, clazz, line_no, message, ts):
    """The regex itself (shared with Spark) roundtrips every component
    the format can encode. Checked in-process; the Spark-side behavior
    of the same pattern is covered by test_roundtrip_spark_sample."""
    ts_str = ts.strftime("%Y-%m-%d %H:%M:%S,") + f"{ts.microsecond // 1000:03d}"
    line = f"{level} [{ts_str}] [{thread}] {clazz}:{line_no} - {message}"
    m = re.match(LOG_LINE_REGEX, line)
    assert m is not None
    got_level, got_ts, got_thread, got_clazz, got_no, got_msg = m.groups()
    assert got_level == level
    assert got_ts == ts_str
    assert got_thread == thread
    assert got_clazz == clazz
    assert int(got_no) == line_no
    # trailing whitespace of the message is consumed by \s+ matching:
    assert got_msg == message or got_msg == message.strip()


def test_roundtrip_spark_sample(spark):
    """Spark executes the same pattern with the same semantics on a
    deterministic sample of awkward messages."""
    messages = [
        "plain",
        "with : colon",
        "with :123 - number-dash",
        "[brackets] inside",
        "trailing spaces   ",
        "unicode é ü 中",
    ]
    lines = [
        Row(
            line_id=i,
            node="n0",
            raw=f"ERROR [2025-01-01 00:00:00,000] [T-1] C:{i} - {m}",
        )
        for i, m in enumerate(messages)
    ]
    got = {
        r.line_no: r.message
        for r in parse_lines(spark.createDataFrame(lines)).collect()
    }
    for i, m in enumerate(messages):
        want = re.match(LOG_LINE_REGEX, lines[i].raw).group(6)
        assert got[i] == want


@pytest.mark.parametrize(
    "bad",
    [
        "no brackets at all",
        "ERROR [ts only] missing thread",
        "ERROR [a] [b] NoLineNumber - msg",
        "ERROR [a] [b] C:NaN - msg",
        "",
    ],
)
def test_malformed_lines_rejected(spark, bad):
    df = spark.createDataFrame([Row(line_id=0, node="n", raw=bad)])
    assert parse_lines(df).count() == 0


@settings(max_examples=10, deadline=None)
@given(
    entries=st.lists(
        st.tuples(
            st.sampled_from(["n0", "n1"]),       # node
            st.integers(min_value=0, max_value=4),  # extra lines
        ),
        min_size=1,
        max_size=8,
    )
)
def test_multiline_segmentation_property(spark, entries):
    """For ANY per-node interleaving of entries with 0-4 continuation
    lines, segmentation reattaches exactly the continuations emitted
    after each header, in order."""
    from cassandra_log_analyzer_mcp_spark.functions.parsing import (
        parse_multiline,
    )

    rows, want = [], {}
    lid = 0
    for i, (node, n_extra) in enumerate(entries):
        rows.append(Row(
            line_id=lid, node=node,
            raw=f"ERROR [2025-01-01 00:00:00,000] [t] C:{i} - m{i}",
        ))
        header_id = lid
        lid += 1
        frames = []
        for k in range(n_extra):
            frames.append(f"\tat f{i}.{k}(X.java:{k})")
            rows.append(Row(line_id=lid, node=node, raw=frames[-1]))
            lid += 1
        want[(node, header_id)] = (n_extra, "\n".join(frames))
    got = {
        (r.node, r.line_id): (r.n_extra_lines, r.stack)
        for r in parse_multiline(spark.createDataFrame(rows)).collect()
    }
    assert got == want


TOKENS = st.lists(
    st.sampled_from(["a", "bb", "ccc", "dd", "e", "spark", "dup"]),
    min_size=0,
    max_size=40,
)


@settings(max_examples=30, deadline=None)
@given(tokens=TOKENS)
def test_repetition_features_match_python_reference(spark, tokens):
    """doc_repetition's array expressions == a direct Python
    computation for arbitrary token sequences (including empty and
    sub-shingle-length docs)."""
    from collections import Counter

    from cassandra_log_analyzer_mcp_spark.operators import textops

    text = " ".join(tokens)
    import cassandra_log_analyzer_mcp_spark.operators.textops as t

    docs = spark.createDataFrame([Row(doc_id=0, text=text)])
    orig = t.documents
    try:
        t.documents = lambda s, d: docs
        r = t.doc_repetition(spark, "unused").collect()[0]
    finally:
        t.documents = orig

    def dup_frac(k):
        grams = [
            " ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)
        ]
        return 1 - len(set(grams)) / len(grams) if grams else 0.0

    top = max(Counter(tokens).values()) / len(tokens) if tokens else 0.0
    assert r.n_tokens == len(tokens)
    assert abs(r.dup_2gram_frac - dup_frac(2)) < 1e-12
    assert abs(r.dup_3gram_frac - dup_frac(3)) < 1e-12
    assert abs(r.top_token_frac - top) < 1e-12


@settings(max_examples=15, deadline=None)
@given(level=LEVELS, thread=THREAD, clazz=CLAZZ, line_no=LINE_NO,
       message=MESSAGE, ts=TS)
def test_json_tsv_roundtrip_property(
    spark, level, thread, clazz, line_no, message, ts
):
    """The JSON and TSV wire formats roundtrip ARBITRARY field values
    (quotes, brackets, colons, unicode) to the same parsed schema —
    the structured formats must be strictly more robust than the
    regex-parsed plain format."""
    from pyspark.sql import functions as F

    from cassandra_log_analyzer_mcp_spark.functions.parsing import (
        parse_csv_lines,
        parse_json_lines,
    )

    ts_str = (
        ts.strftime("%Y-%m-%d %H:%M:%S,") + f"{ts.microsecond // 1000:03d}"
    )
    fields = spark.createDataFrame(
        [Row(line_id=0, node="n0", level=level, ts_str=ts_str,
             thread=thread, clazz=clazz, line_no=line_no, message=message)]
    )
    json_raw = fields.select(
        "line_id", "node",
        F.to_json(F.struct(
            F.col("level"), F.col("ts_str").alias("ts"), F.col("thread"),
            F.col("clazz").alias("logger"), F.col("line_no").alias("line"),
            F.col("message").alias("msg"),
        )).alias("raw"),
    )
    got_j = parse_json_lines(json_raw).collect()[0]
    assert (got_j.level, got_j.thread, got_j.clazz, got_j.line_no,
            got_j.message) == (level, thread, clazz, line_no, message)
    assert got_j.ts_str == ts_str

    if "\t" not in message:  # TSV's one documented exclusion
        csv_raw = fields.select(
            "line_id", "node",
            F.concat_ws(
                "\t", "level", "ts_str", "thread", "clazz",
                F.col("line_no").cast("string"), "message",
            ).alias("raw"),
        )
        got_c = parse_csv_lines(csv_raw).collect()[0]
        assert (got_c.level, got_c.thread, got_c.clazz, got_c.line_no,
                got_c.message) == (level, thread, clazz, line_no, message)


def test_tsv_roundtrips_quote_edge_cases(spark):
    """univocity's default quote char ('"') would strip a leading
    double quote off the message field ('"abc"' → 'abc'); parse_csv_lines
    disables quoting so these roundtrip byte-identical (the failure
    mode the r1 advisor verified on Spark)."""
    from pyspark.sql import functions as F

    from cassandra_log_analyzer_mcp_spark.functions.parsing import (
        parse_csv_lines,
    )

    messages = ['"abc"', '"abc', 'a"b', '""', '"', '" leading quote space']
    fields = spark.createDataFrame(
        [
            Row(line_id=i, node="n0", level="INFO",
                ts_str="2024-01-01 00:00:00,000", thread="t", clazz="C",
                line_no=1, message=m)
            for i, m in enumerate(messages)
        ]
    )
    csv_raw = fields.select(
        "line_id", "node",
        F.concat_ws(
            "\t", "level", "ts_str", "thread", "clazz",
            F.col("line_no").cast("string"), "message",
        ).alias("raw"),
    )
    got = {r.line_id: r.message for r in parse_csv_lines(csv_raw).collect()}
    for i, m in enumerate(messages):
        assert got[i] == m, f"TSV mangled {m!r} -> {got[i]!r}"


EMAIL_LOCAL = st.from_regex(r"[A-Za-z0-9][A-Za-z0-9._%+-]{0,15}", fullmatch=True)
EMAIL_DOMAIN = st.from_regex(
    r"[A-Za-z0-9][A-Za-z0-9-]{0,10}\.[A-Za-z]{2,6}", fullmatch=True
)


@settings(max_examples=20, deadline=None)
@given(local=EMAIL_LOCAL, domain=EMAIL_DOMAIN)
def test_pii_email_regex_property(local, domain):
    """Any well-formed address embedded in prose is fully consumed by
    the email pattern (no partial redaction leaking the local part or
    the domain)."""
    import re

    from cassandra_log_analyzer_mcp_spark.operators.textops import (
        PII_EMAIL_REGEX,
    )

    addr = f"{local}@{domain}"
    text = f"reach me at {addr} thanks"
    scrubbed = re.sub(PII_EMAIL_REGEX, "<EMAIL>", text)
    assert addr not in scrubbed
    assert "@" not in scrubbed
    assert "<EMAIL>" in scrubbed
