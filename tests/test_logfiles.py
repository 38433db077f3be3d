"""Raw log-file source: multi-file-per-node line numbering must be
pinned to (file name, in-file position) — the day a node ships rotated
logs (``system.log.1``) the numbers must not depend on Spark's
size-ordered split packing."""

import pytest


@pytest.fixture(scope="module")
def two_file_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("logs")
    for node in ("node0", "node1"):
        d = root / node
        d.mkdir()
        # a.log sorts before b.log; sizes chosen so size-ordered split
        # packing would REVERSE them (b.log is larger)
        (d / "a.log").write_text(
            f"INFO [ts] [t] C:1 - {node} a line 1\n"
            f"INFO [ts] [t] C:1 - {node} a line 2\n"
        )
        (d / "b.log").write_text(
            "".join(
                f"INFO [ts] [t] C:1 - {node} b line {i}\n"
                for i in range(1, 6)
            )
        )
    return str(root)


def test_line_numbers_continue_across_files_in_name_order(
    spark, two_file_dir
):
    from cassandra_log_analyzer_mcp_spark.sources.logfiles import (
        read_log_dir,
    )

    rows = read_log_dir(spark, f"{two_file_dir}/*/*.log").collect()
    by_node = {}
    for r in rows:
        by_node.setdefault(r.node, {})[r.line_id] = r.raw
    for node in ("node0", "node1"):
        lines = by_node[node]
        # per-node numbering is 1..7, dense
        assert sorted(lines) == list(range(1, 8))
        # a.log's two lines first, then b.log's five, each in file order
        expected = [f"{node} a line 1", f"{node} a line 2"] + [
            f"{node} b line {i}" for i in range(1, 6)
        ]
        got = [lines[i].split(" - ")[1] for i in range(1, 8)]
        assert got == expected


def test_numbering_has_no_per_node_global_window(spark, two_file_dir):
    import re

    from cassandra_log_analyzer_mcp_spark.sources.logfiles import (
        read_log_dir,
    )

    df = read_log_dir(spark, f"{two_file_dir}/*/*.log")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_fname" in spec, f"per-node global window: {spec}"


def test_python_datasource_matches_builtin_text_reader(spark, tmp_path):
    """The logdir DataSource plans one partition per file and returns
    exactly the same (node, raw) multiset as spark.read.text over the
    same tree."""
    from cassandra_log_analyzer_mcp_spark.sources.pyds import (
        LogDirDataSource,
        LogDirReader,
    )

    root = tmp_path / "logs"
    for node, fname, lines in [
        ("n0", "a.log", ["l1", "l2"]),
        ("n0", "b.log", ["l3"]),
        ("n1", "a.log", ["x1", "x2", "x3"]),
    ]:
        d = root / f"node={node}"
        d.mkdir(parents=True, exist_ok=True)
        (d / fname).write_text("\n".join(lines) + "\n")
    (root / "_SUCCESS").parent.mkdir(exist_ok=True)
    (root / "node=n0" / "_hidden").write_text("skip me")

    reader = LogDirReader({"path": str(root)})
    parts = reader.partitions()
    assert len(parts) == 3  # one per visible file, _hidden skipped
    assert {p.node for p in parts} == {"n0", "n1"}

    spark.dataSource.register(LogDirDataSource)
    got = sorted(
        (r.node, r.raw)
        for r in spark.read.format("logdir")
        .option("path", str(root))
        .load()
        .collect()
    )
    assert got == [
        ("n0", "l1"), ("n0", "l2"), ("n0", "l3"),
        ("n1", "x1"), ("n1", "x2"), ("n1", "x3"),
    ]
