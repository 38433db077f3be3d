"""Report/tool surface — parity with the reference MCP server's tools.

The reference renders analysis as markdown text for an LLM client
(ref handle_call_tool :582-857). This module is that surface on top of
the Spark engine: each function mirrors one tool's report shape. Only
final small aggregates are collected to the driver — every scan stays
distributed.

``LogStore`` replaces the reference's in-memory ``logs_storage`` dict:
nodes register log *paths* (local/HDFS/S3 globs or pasted content
landed to disk), and analysis reads them through the distributed
sources. That is the design change that takes the tool surface from
one-machine-RAM to 100 TB.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.parsing import parse_lines, with_issue_flags
from .operators import analysis
from .sources.logfiles import read_log_dir


class LogStore:
    """Registered log locations, one or more per node."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._globs: list[str] = []
        self._paste_dir: str | None = None

    def add_glob(self, path_glob: str) -> None:
        """Register a directory glob whose paths encode the node name
        (…/<node>/<file>.log)."""
        self._globs.append(path_glob)

    def add_pasted(self, node_name: str, content: str) -> None:
        """Parity with the reference's manual load_logs tool (ref
        :724-736): land pasted content to a local staging dir."""
        if self._paste_dir is None:
            self._paste_dir = tempfile.mkdtemp(prefix="logstore_")
            self._globs.append(f"{self._paste_dir}/*/*.log")
        d = os.path.join(self._paste_dir, node_name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "pasted.log"), "a") as fh:
            fh.write(content if content.endswith("\n") else content + "\n")

    def lines(self) -> DataFrame:
        if not self._globs:
            raise ValueError("no logs loaded — register a glob or paste content")
        dfs = [read_log_dir(self.spark, g) for g in self._globs]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def flagged(self) -> DataFrame:
        return with_issue_flags(parse_lines(self.lines())).cache()

    def nodes(self) -> list[str]:
        return [
            r.node for r in self.lines().select("node").distinct().collect()
        ]


def analyze_cluster_report(flagged: DataFrame) -> str:
    """Markdown parity with the reference's analyze_cluster (ref :738-771)."""
    summary = analysis.node_summary(flagged).orderBy("node").collect()
    issues = analysis.issue_counts(flagged).orderBy(F.desc("n"), "issue").collect()
    recs = analysis.recommendations(flagged).collect()

    out = ["# Cassandra Cluster Analysis", "", "## Summary by Node"]
    for r in summary:
        out += [
            f"\n### {r.node}",
            f"- Errors: {r.errors}",
            f"- Warnings: {r.warnings}",
            f"- Total lines: {r.total_lines}",
        ]
    out += ["", "## Detected Issues"]
    for r in issues:
        out.append(f"- {r.issue}: {r.n} occurrences")
    if recs:
        out += ["", "## Recommendations"]
        for r in recs:
            out += [f"\n**{r.issue}** ({r.severity})", f"→ {r.recommendation}"]
    return "\n".join(out)


def search_report(flagged: DataFrame, pattern: str, case_sensitive: bool = False,
                  node_filter: str | None = None, limit: int = 100) -> str:
    """Markdown parity with search_logs (ref :773-799)."""
    df = flagged
    if node_filter:
        df = df.filter(F.col("node") == node_filter)
    hits = analysis.search_logs(df, pattern, case_sensitive)
    total = hits.count()
    shown = hits.orderBy("node", "line_number").limit(limit).collect()
    out = [f"# Search results: '{pattern}'", "", f"Total: {total}", ""]
    for r in shown:
        out += [f"**{r.node}** (line {r.line_number})", "```", r.content, "```", ""]
    if total > limit:
        out.append(f"... and {total - limit} more results")
    return "\n".join(out)


def errors_report(flagged: DataFrame, node_name: str | None = None,
                  limit: int = 50) -> str:
    """Markdown parity with get_errors (ref :801-826): ONE list
    truncated to ``limit`` across nodes (the reference slices the
    concatenated per-node lists, ref :816-819) — served by
    get_errors_global, whose oracle pins exactly these semantics."""
    df = flagged
    if node_name:
        df = df.filter(F.col("node") == node_name)
    errs = analysis.get_errors_global(df, limit=limit).orderBy("rn").collect()
    out = [f"# Errors ({len(errs)})", ""]
    for r in errs:
        out += [f"**{r.node}** [{r.ts_str}]", "```", r.message, "```", ""]
    return "\n".join(out)


def compare_report(flagged: DataFrame, nodes: list[str] | None = None) -> str:
    """Markdown parity with compare_nodes (ref :828-842)."""
    rows = analysis.compare_nodes(flagged).orderBy("rank").collect()
    if nodes:
        rows = [r for r in rows if r.node in nodes]
    out = [
        "# Node Comparison",
        "",
        "| Node | Errors | Warnings | Lines | Error rate |",
        "|------|--------|----------|-------|------------|",
    ]
    for r in rows:
        out.append(
            f"| {r.node} | {r.errors} | {r.warnings} | {r.lines} | {r.error_rate} |"
        )
    return "\n".join(out)


def issues_report(flagged: DataFrame, severity: str = "all") -> str:
    """Markdown parity with detect_issues (ref :844-857)."""
    recs = analysis.recommendations(flagged).collect()
    out = ["# Detected Issues", ""]
    for r in recs:
        if severity == "all" or r.severity.lower() == severity.lower():
            out += [f"**{r.issue}** ({r.severity})", f"→ {r.recommendation}", ""]
    return "\n".join(out)


def health_report(flagged: DataFrame) -> str:
    """Markdown report over node_health_score — the composed
    report-card narrative the reference's analyze_cluster implies
    (who needs attention, ranked, with the penalty breakdown)."""
    rows = analysis.node_health_score(flagged).orderBy("rank").collect()
    out = [
        "# Cluster Health",
        "",
        "| Rank | Node | Grade | Penalty | Errors | Warnings | Bursts | Dropped |",
        "|------|------|-------|---------|--------|----------|--------|---------|",
    ]
    for r in rows:
        out.append(
            f"| {r.rank} | {r.node} | {r.grade} | {r.penalty} |"
            f" {r.errors} | {r.warnings} | {r.n_bursts} | {r.n_dropped} |"
        )
    flagged_rows = [r for r in rows if r.grade != "ok"]
    if flagged_rows:
        out += ["", "Needs attention: " + ", ".join(
            f"{r.node} ({r.grade})" for r in flagged_rows
        )]
    return "\n".join(out)
