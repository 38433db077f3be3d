"""DuckDB oracle SQL — independently-derived answers for every query.

The Spark side synthesizes Cassandra log lines from ``events`` and then
*parses them back* with the real regex parser; the oracle derives the
same fields directly from the shared templates (single source of truth:
``functions.parsing``). Any defect in the format→parse roundtrip
therefore shows up as a t2 value-hash mismatch.

Dialect parity rules used throughout (verified against DuckDB 1.0 +
Spark 4.1):
- strftime(ts, '%Y-%m-%d %H:%M:%S,%g')  ==  date_format(ts, 'yyyy-MM-dd HH:mm:ss,SSS') under UTC
- epoch seconds: CAST(floor(epoch(ts)) AS BIGINT)  ==  CAST(ts AS LONG)
- md5() identical; hex strings compare lexicographically the same
- every COUNT/SUM-of-int is cast to BIGINT (DuckDB sums to HUGEINT)
- every double aggregate is rounded identically on both sides
"""

from __future__ import annotations

from ..functions.parsing import (
    ALL_PATTERNS,
    ERROR_CLASSES,
    ERROR_PATTERNS,
    ERROR_TEMPLATES,
    INFO_CLASSES,
    INFO_TEMPLATES,
    ISSUE_SEVERITY,
    N_NODES,
    RECOMMENDATION_RULES,
    THREADS,
    WARN_CLASSES,
    WARN_TEMPLATES,
    WARNING_PATTERNS,
)


def _case_mod(col: str, values: list[str]) -> str:
    whens = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return f"CASE CAST({col} % {len(values)} AS INT) {whens} END"


def _rx(col: str, pattern: str) -> str:
    return f"regexp_matches({col}, '{pattern}')"


def _any(col: str, patterns: dict[str, str]) -> str:
    return "(" + " OR ".join(_rx(col, p) for p in patterns.values()) + ")"


#: Shared CTE body: logs = parsed entries, lines adds the raw line.
LOG_CTE = f"""
_ev AS (
  SELECT event_id, user_id, date_trunc('milliseconds', ts) AS ts,
         strftime(ts, '%Y-%m-%d %H:%M:%S,%g') AS ts_str,
         CASE WHEN event_type = 'error' THEN 'ERROR'
              WHEN event_type = 'view' THEN 'WARN'
              ELSE 'INFO' END AS level
  FROM events
),
logs AS (
  SELECT event_id AS line_id,
         'node' || (user_id % {N_NODES}) AS node,
         level, ts, ts_str,
         {_case_mod('event_id', THREADS)} AS thread,
         CASE WHEN level = 'ERROR' THEN {_case_mod('event_id', ERROR_CLASSES)}
              WHEN level = 'WARN' THEN {_case_mod('event_id', WARN_CLASSES)}
              ELSE {_case_mod('event_id', INFO_CLASSES)} END AS clazz,
         CAST(100 + event_id % 400 AS INT) AS line_no,
         CASE WHEN level = 'ERROR' THEN {_case_mod('event_id', ERROR_TEMPLATES)}
              WHEN level = 'WARN' THEN {_case_mod('event_id', WARN_TEMPLATES)}
              ELSE {_case_mod('event_id', INFO_TEMPLATES)} END AS message
  FROM _ev
),
lines AS (
  SELECT *,
         level || ' [' || ts_str || '] [' || thread || '] ' || clazz || ':'
               || line_no || ' - ' || message AS raw
  FROM logs
),
flagged AS (
  SELECT *,
         (level = 'ERROR' OR {_any('message', ERROR_PATTERNS)}) AS is_error,
         (level = 'WARN' OR {_any('message', WARNING_PATTERNS)}) AS is_warning
  FROM logs
)
"""


def with_logs(body: str) -> str:
    return f"WITH {LOG_CTE} {body}"


#: error-burst rollup body (shared by error_bursts, the streaming
#: bridge, and error_recovery's gap analysis).
BURSTS_BODY = """
        SELECT node, CAST(burst_id AS BIGINT) AS burst_id,
               CAST(count(*) AS BIGINT) AS n_events,
               min(epoch_s) AS start_s, max(epoch_s) AS end_s,
               max(epoch_s) - min(epoch_s) AS duration_s
        FROM (
          SELECT node, epoch_s,
                 sum(new_burst) OVER (PARTITION BY node ORDER BY ts, line_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst_id
          FROM (
            SELECT node, ts, line_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
                   CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT))
                             OVER (PARTITION BY node ORDER BY ts, line_id) IS NULL
                        THEN 1
                        WHEN CAST(floor(epoch(ts)) AS BIGINT)
                             - lag(CAST(floor(epoch(ts)) AS BIGINT))
                               OVER (PARTITION BY node ORDER BY ts, line_id) > 300
                        THEN 1 ELSE 0 END AS new_burst
            FROM flagged WHERE is_error
          ) a
        ) b
        GROUP BY node, burst_id
        """


def _per_window_issues(window_s: int = 900) -> str:
    """Distinct (node, win, issue) via UNION of per-pattern selects."""
    selects = " UNION ".join(
        f"SELECT DISTINCT node, CAST(floor(epoch(ts) / {window_s}) AS BIGINT) "
        f"* {window_s} AS win, '{name}' AS issue FROM logs "
        f"WHERE {_rx('message', pat)}"
        for name, pat in ALL_PATTERNS.items()
    )
    return selects


def analysis_oracles() -> dict[str, str]:
    """Oracle SQL for SURVEY §2 sections A + B."""
    o: dict[str, str] = {}

    o["log_parse"] = with_logs(
        "SELECT line_id, node, level, ts_str, thread, clazz, line_no, message FROM logs"
    )
    # the JSON- and TSV-format roundtrips must reproduce the exact
    # same parsed fields, so they share the oracle verbatim
    o["log_parse_json"] = o["log_parse"]
    o["log_parse_csv"] = o["log_parse"]

    # PERMISSIVE parse over the torn landing: the corruption rule is
    # pure modular arithmetic, so the oracle states the expected
    # parsed/corrupt split directly — a swallowed good line or a
    # leaked bad one hash-mismatches
    from ..functions.parsing import CORRUPT_MOD

    o["log_parse_corrupt_tolerant"] = with_logs(
        f"""
        SELECT node, CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN line_id % {CORRUPT_MOD} = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
               CAST(sum(CASE WHEN line_id % {CORRUPT_MOD} != 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
               CAST(sum(CASE WHEN line_id % {CORRUPT_MOD} != 0
                             AND level = 'ERROR'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
        FROM logs GROUP BY node
        """
    )

    # DLQ routing must reproduce the same census as the batch
    # tolerant parse — shared oracle IS the proof
    o["streaming_dlq_counts"] = o["log_parse_corrupt_tolerant"]

    # multiline: the oracle derives each entry's stack DIRECTLY from
    # the templates (which events carry frames, and their exact text),
    # never re-simulating the segmentation — so any window/grouping
    # bug on the Spark side hash-mismatches.
    from ..functions.parsing import LINES_PER_ENTRY, STACK_FRAMES, STACK_IDX

    frame_sql = " || chr(10) || ".join(
        f"chr(9) || 'at org.apache.cassandra.' || clazz || '.run(' || clazz"
        f" || '.java:' || CAST(line_no + {k} AS VARCHAR) || ')'"
        for k in range(1, STACK_FRAMES + 1)
    )
    stacky = f"(level = 'ERROR' AND line_id % {len(ERROR_TEMPLATES)} = {STACK_IDX})"
    o["log_parse_multiline"] = with_logs(
        f"""
        SELECT line_id * {LINES_PER_ENTRY} AS line_id, node, level, ts_str,
               thread, clazz, line_no, message,
               CASE WHEN {stacky} THEN {STACK_FRAMES} ELSE 0 END
                 AS n_extra_lines,
               CASE WHEN {stacky} THEN {frame_sql} ELSE '' END AS stack
        FROM logs
        """
    )

    classify_selects = " UNION ALL ".join(
        f"SELECT line_id, node, level, clazz, message, '{name}' AS issue, "
        f"'{ISSUE_SEVERITY[name]}' AS severity FROM logs WHERE {_rx('message', pat)}"
        for name, pat in ALL_PATTERNS.items()
    )
    o["issue_classify"] = with_logs(classify_selects)

    count_selects = " UNION ALL ".join(
        f"SELECT '{name}' AS issue, '{ISSUE_SEVERITY[name]}' AS severity, "
        f"CAST(count(*) AS BIGINT) AS n FROM logs WHERE {_rx('message', pat)}"
        for name, pat in ALL_PATTERNS.items()
    )
    o["issue_counts"] = with_logs(
        f"SELECT * FROM ({count_selects}) t WHERE n > 0"
    )

    node_summary_body = """
        SELECT node,
               CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS errors,
               CAST(sum(CASE WHEN is_warning THEN 1 ELSE 0 END) AS BIGINT) AS warnings,
               CAST(count(*) AS BIGINT) AS total_lines
        FROM flagged {where}GROUP BY node
        """
    o["node_summary"] = with_logs(node_summary_body.format(where=""))
    # the salted two-stage aggregation must be EXACTLY node_summary
    o["node_summary_salted"] = o["node_summary"]
    # the silver-layer read must reproduce node_summary exactly on its
    # node subset — same aggregation body, only the WHERE differs
    o["node_summary_silver"] = with_logs(
        node_summary_body.format(where="WHERE node IN ('node1', 'node3') ")
    )

    # SCD2: the dimension reproduced arithmetically (node ordinal,
    # era split at the exact integer midpoint of the span)
    from ..operators.analysis import SCD_TEAMS

    o["scd_owner_join"] = with_logs(
        f"""
        SELECT node,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) <
                     (SELECT (min(CAST(floor(epoch(ts)) AS BIGINT))
                              + max(CAST(floor(epoch(ts)) AS BIGINT)))
                             // 2 FROM flagged)
                    THEN 'team' || CAST(CAST(substr(node, 5) AS INT)
                                        % {SCD_TEAMS} AS VARCHAR)
                    ELSE 'team' || CAST((CAST(substr(node, 5) AS INT)
                                         + 1) % {SCD_TEAMS} AS VARCHAR)
               END AS owner,
               CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END)
                    AS BIGINT) AS errors,
               CAST(count(*) AS BIGINT) AS total_lines
        FROM flagged
        GROUP BY 1, 2
        """
    )

    # UNPIVOT: stated as the UNION-ALL tidy form
    o["node_summary_unpivot"] = with_logs(
        """
        SELECT node, metric, value FROM (
          SELECT node,
                 CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END)
                      AS BIGINT) AS errors,
                 CAST(sum(CASE WHEN is_warning THEN 1 ELSE 0 END)
                      AS BIGINT) AS warnings,
                 CAST(count(*) AS BIGINT) AS total_lines
          FROM flagged GROUP BY node
        ) w
        UNPIVOT (value FOR metric IN (errors, warnings, total_lines))
        """
    )

    o["error_timeline"] = with_logs(
        """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
               node, level, CAST(count(*) AS BIGINT) AS n
        FROM logs WHERE level IN ('ERROR', 'WARN')
        GROUP BY 1, 2, 3
        """
    )

    o["compare_nodes"] = with_logs(
        """
        SELECT node, errors, warnings, lines,
               round(errors / lines, 4) AS error_rate,
               CAST(row_number() OVER (ORDER BY errors DESC, node) AS INT) AS rank
        FROM (
          SELECT node,
                 CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS errors,
                 CAST(sum(CASE WHEN is_warning THEN 1 ELSE 0 END) AS BIGINT) AS warnings,
                 CAST(count(*) AS BIGINT) AS lines
          FROM flagged GROUP BY node
        ) t
        """
    )

    o["get_errors"] = with_logs(
        """
        SELECT node, CAST(rn AS INT) AS rn, ts_str, level, clazz, message FROM (
          SELECT node, ts_str, level, clazz, message,
                 row_number() OVER (PARTITION BY node ORDER BY ts, line_id) AS rn
          FROM flagged WHERE is_error
        ) t WHERE rn <= 50
        """
    )

    # reference tool-surface limit semantics: ONE cross-node list
    # truncated to 50 (ref :816-819), order pinned (node, ts, line_id)
    o["get_errors_global"] = with_logs(
        """
        SELECT CAST(rn AS INT) AS rn, node, ts_str, level, clazz, message
        FROM (
          SELECT node, ts_str, level, clazz, message,
                 row_number() OVER (ORDER BY node, ts, line_id) AS rn
          FROM flagged WHERE is_error
        ) t WHERE rn <= 50
        """
    )

    # silver round trip: the oracle recomputes the rollup straight
    # from the shared CTE — any defect in write→partition→read (type
    # drift on the partition columns, row loss, pruning bugs)
    # hash-mismatches
    o["silver_node_errors"] = with_logs(
        """
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS log_date, node,
               CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT)
                 AS errors,
               CAST(sum(CASE WHEN is_warning THEN 1 ELSE 0 END) AS BIGINT)
                 AS warnings,
               CAST(count(*) AS BIGINT) AS total_lines
        FROM flagged WHERE node IN ('node1', 'node3')
        GROUP BY 1, 2
        """
    )

    # DPP join: rack r1 is exactly the odd-ordinal nodes, so the
    # oracle recomputes the joined rollup from raw flagged lines with
    # the same parity arithmetic (no dim table needed on this side)
    o["silver_dpp_join"] = with_logs(
        """
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS log_date, node,
               'r' || CAST(CAST(substr(node, 5) AS INT) % 2 AS VARCHAR)
                 AS rack,
               CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT)
                 AS errors,
               CAST(sum(CASE WHEN is_warning THEN 1 ELSE 0 END) AS BIGINT)
                 AS warnings,
               CAST(count(*) AS BIGINT) AS total_lines
        FROM flagged WHERE CAST(substr(node, 5) AS INT) % 2 = 1
        GROUP BY 1, 2, 3
        """
    )

    # the v0→v1 change feed, stated from first principles: the
    # errors-only restatement DELETES exactly the non-error rows of
    # the earliest day on nodes that had ≥1 error that day (nodes
    # without errors get no new files, so their partitions are not in
    # the manifest delta at all); no inserts or updates exist
    o["silver_changes_between"] = with_logs(
        """
        SELECT 'delete' AS op,
               strftime(CAST(ts AS DATE), '%Y-%m-%d') AS log_date,
               node,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM flagged
        WHERE CAST(ts AS DATE) =
                (SELECT min(CAST(ts AS DATE)) FROM flagged)
          AND NOT is_error
          AND node IN (
            SELECT DISTINCT node FROM flagged
            WHERE CAST(ts AS DATE) =
                    (SELECT min(CAST(ts AS DATE)) FROM flagged)
              AND is_error)
        GROUP BY 1, 2, 3
        """
    )

    # post-erasure content, stated directly: everything but the
    # subject (silver.ERASE_USER = 7) — a leaked subject row,
    # over-deletion, or a double-read rewrite all hash-mismatch
    o["silver_delete_rewrite"] = """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               round(sum(value), 2) AS sum_value
        FROM events
        WHERE user_id <> 7
        GROUP BY event_type
        """

    # compaction is a pure layout change — identical rollup
    o["silver_compaction"] = o["silver_node_errors"]
    # incremental maintenance must equal the full recompute
    o["silver_incremental_rollup"] = o["silver_node_errors"]
    # ORC roundtrip is a pure format change — identical rollup
    o["orc_export_roundtrip"] = o["silver_node_errors"]
    # the v0 snapshot read AFTER v1 exists must equal the original
    o["silver_time_travel"] = o["silver_node_errors"]

    # restated final state, stated directly: the earliest day's
    # overwritten (node, day) partitions hold only their error lines —
    # UNLESS that day/node produced no errors, in which case dynamic
    # overwrite leaves the old partition in place (the ELSE branch)
    o["silver_restatement"] = with_logs(
        """
        SELECT log_date, node, errors,
               CASE WHEN is_day0 AND errors > 0
                    THEN err_warnings ELSE warnings END AS warnings,
               CASE WHEN is_day0 AND errors > 0
                    THEN errors ELSE total_lines END AS total_lines
        FROM (
          SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS log_date, node,
                 CAST(ts AS DATE) =
                   (SELECT min(CAST(ts AS DATE)) FROM flagged) AS is_day0,
                 CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT)
                   AS errors,
                 CAST(sum(CASE WHEN is_warning THEN 1 ELSE 0 END) AS BIGINT)
                   AS warnings,
                 -- WARN-level lines whose message matches an error
                 -- pattern are is_error AND is_warning: the
                 -- correction keeps them, so they still count
                 CAST(sum(CASE WHEN is_error AND is_warning
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS err_warnings,
                 CAST(count(*) AS BIGINT) AS total_lines
          FROM flagged WHERE node IN ('node1', 'node3')
          GROUP BY 1, 2, 3
        ) t
        """
    )

    # branch isolation: both refs' contents stated from first
    # principles — main@v1 is the restatement rule, branch is v0 plus
    # the latest-day error backfill; leakage in either direction
    # breaks one of the two halves
    o["silver_branch_diverge"] = with_logs(
        """
        , g AS (
          SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS log_date,
                 node,
                 CAST(ts AS DATE) =
                   (SELECT min(CAST(ts AS DATE)) FROM flagged)
                   AS is_day0,
                 CAST(ts AS DATE) =
                   (SELECT max(CAST(ts AS DATE)) FROM flagged)
                   AS is_daymax,
                 CAST(count(*) AS BIGINT) AS total,
                 CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END)
                      AS BIGINT) AS errors
          FROM flagged GROUP BY 1, 2, 3, 4
        )
        SELECT 'main@v1' AS ref, log_date, node,
               CASE WHEN is_day0 AND errors > 0
                    THEN errors ELSE total END AS n_rows,
               errors AS n_errors
        FROM g
        UNION ALL
        SELECT 'branch', log_date, node,
               CASE WHEN is_daymax THEN total + errors ELSE total END,
               CASE WHEN is_daymax THEN 2 * errors ELSE errors END
        FROM g
        """
    )

    # CDC closure: feed applied to v0 must reconstruct v1 — graded
    # against the first-principles restated-content oracle, which
    # never sees the feed (a self-consistent-but-wrong feed fails)
    o["silver_cdc_apply"] = o["silver_restatement"]

    # vacuum grades the v1 read AFTER v0's files are deleted — the
    # logical content must be indifferent to the physical expiry
    o["silver_vacuum"] = o["silver_restatement"]

    # key-level merge: final content stated directly — the corrected
    # rows (earliest day, MERGE_NODE, was-is_error) are WARN level
    # after the merge, so they count as warnings always and as errors
    # only when their MESSAGE matches an error pattern; every other
    # row keeps its original flags. Any dropped bystander, duplicated
    # key, or leak into another partition breaks the hash.
    o["silver_merge_upsert"] = with_logs(
        f"""
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS log_date, node,
               CAST(sum(CASE WHEN (CASE WHEN corrected
                                   THEN {_any('message', ERROR_PATTERNS)}
                                   ELSE is_error END)
                             THEN 1 ELSE 0 END) AS BIGINT) AS errors,
               CAST(sum(CASE WHEN (corrected OR is_warning)
                             THEN 1 ELSE 0 END) AS BIGINT) AS warnings,
               CAST(count(*) AS BIGINT) AS total_lines
        FROM (
          SELECT *,
                 (CAST(ts AS DATE) =
                    (SELECT min(CAST(ts AS DATE)) FROM flagged)
                  AND node = 'node2' AND is_error) AS corrected
          FROM flagged
        ) t
        GROUP BY 1, 2
        """
    )

    # the reference timeline's RAW entry list (ref :256-257), bounded
    # to the first 100 ERROR|WARN entries per node
    o["error_timeline_raw"] = with_logs(
        """
        SELECT node, CAST(rn AS INT) AS rn, ts_str, level, thread, clazz,
               message
        FROM (
          SELECT node, ts_str, level, thread, clazz, message,
                 row_number() OVER (PARTITION BY node
                                    ORDER BY ts, line_id) AS rn
          FROM logs WHERE level IN ('ERROR', 'WARN')
        ) t WHERE rn <= 100
        """
    )

    o["search_logs"] = with_logs(
        f"""
        SELECT node, CAST(line_number AS INT) AS line_number, content FROM (
          SELECT node, raw AS content,
                 row_number() OVER (PARTITION BY node ORDER BY line_id) AS line_number,
                 {_rx('raw', '(?i)tombstone')} AS hit
          FROM lines
        ) t WHERE hit
        """
    )

    rule_selects = " UNION ALL ".join(
        f"""SELECT '{sev}' AS severity, '{issue}' AS issue,
            '{rec}' AS recommendation, CAST(n AS BIGINT) AS n
            FROM (SELECT count(*) AS n FROM logs
                  WHERE {_rx('message', ALL_PATTERNS[issue])}) t
            WHERE n > {thr}"""
        for issue, thr, sev, rec in RECOMMENDATION_RULES
    )
    o["recommendations"] = with_logs(rule_selects)

    o["top_error_classes"] = with_logs(
        """
        SELECT clazz, CAST(n AS BIGINT) AS n,
               CAST(row_number() OVER (ORDER BY n DESC, clazz) AS INT) AS rank
        FROM (SELECT clazz, count(*) AS n FROM flagged WHERE is_error GROUP BY clazz) t
        """
    )

    o["error_rate_windowed"] = with_logs(
        """
        SELECT node,
               CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS win_start,
               CAST(count(*) AS BIGINT) AS total,
               CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS errors,
               round(sum(CASE WHEN is_error THEN 1 ELSE 0 END) / count(*), 4) AS error_rate
        FROM flagged GROUP BY 1, 2
        """
    )

    alert_branches = " UNION ALL ".join(
        f"""
        SELECT node,
               CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS win_start,
               '{issue}' AS issue, '{sev}' AS severity,
               CAST(count(*) AS BIGINT) AS n_hits,
               CAST({thr} AS INT) AS threshold
        FROM logs WHERE {_rx('message', ALL_PATTERNS[issue])}
        GROUP BY 1, 2 HAVING count(*) > {thr}
        """
        for issue, thr, sev, _ in RECOMMENDATION_RULES
    )
    o["windowed_alerts"] = with_logs(alert_branches)
    # the streaming twin must fire the exact same alert rows
    o["streaming_windowed_alerts"] = o["windowed_alerts"]

    from ..operators.analysis import ALERT_COOLDOWN_S

    # cooldown suppression composed over the SAME alert branches, so
    # it cannot drift from the rules it suppresses
    o["alert_dedup"] = with_logs(
        f"""
        SELECT node, win_start, issue, severity, n_hits, threshold,
               COALESCE(prev_gap_s, -1) AS prev_gap_s
        FROM (
          SELECT a.*,
                 win_start - lag(win_start) OVER (
                   PARTITION BY node, issue ORDER BY win_start
                 ) AS prev_gap_s
          FROM ({alert_branches}) a
        ) t
        WHERE prev_gap_s IS NULL OR prev_gap_s > {ALERT_COOLDOWN_S}
        """
    )

    # Pearson r over exact-integer sums: num/den use only IEEE
    # correctly-rounded ops (incl. sqrt) in the same graph as the
    # Spark side — bit-identical doubles, no rounding.
    o["node_failure_correlation"] = with_logs(
        """
        SELECT na, nb, n,
               CASE WHEN sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) > 0
                    THEN (n * sxy - sx * sy)
                         / (sqrt(n * sxx - sx * sx)
                            * sqrt(n * syy - sy * sy))
                    ELSE 0.0 END AS r
        FROM (
          SELECT a.node AS na, b.node AS nb,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(a.e) AS BIGINT) AS sx,
                 CAST(sum(b.e) AS BIGINT) AS sy,
                 CAST(sum(a.e * a.e) AS BIGINT) AS sxx,
                 CAST(sum(b.e * b.e) AS BIGINT) AS syy,
                 CAST(sum(a.e * b.e) AS BIGINT) AS sxy
          FROM (
            SELECT nn.node, ww.win, coalesce(c.e, 0) AS e
            FROM (SELECT node FROM flagged WHERE is_error GROUP BY node) nn
            CROSS JOIN (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                        AS win FROM flagged WHERE is_error GROUP BY 1) ww
            LEFT JOIN (
              SELECT node,
                     CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS win,
                     CAST(count(*) AS BIGINT) AS e
              FROM flagged WHERE is_error GROUP BY 1, 2
            ) c ON c.node = nn.node AND c.win = ww.win
          ) a
          JOIN (
            SELECT nn.node, ww.win, coalesce(c.e, 0) AS e
            FROM (SELECT node FROM flagged WHERE is_error GROUP BY node) nn
            CROSS JOIN (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                        AS win FROM flagged WHERE is_error GROUP BY 1) ww
            LEFT JOIN (
              SELECT node,
                     CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS win,
                     CAST(count(*) AS BIGINT) AS e
              FROM flagged WHERE is_error GROUP BY 1, 2
            ) c ON c.node = nn.node AND c.win = ww.win
          ) b ON a.win = b.win AND a.node < b.node
          GROUP BY a.node, b.node
        ) s
        """
    )

    o["issue_cooccurrence"] = with_logs(
        f"""
        SELECT issue_a, issue_b, CAST(count(*) AS BIGINT) AS n_windows
        FROM (
          SELECT a.node, a.win, a.issue AS issue_a, b.issue AS issue_b
          FROM (
            {_per_window_issues()}
          ) a
          JOIN (
            {_per_window_issues()}
          ) b ON a.node = b.node AND a.win = b.win AND a.issue < b.issue
        ) t
        GROUP BY issue_a, issue_b
        """
    )

    o["streaming_issue_counts"] = with_logs(
        f"""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
               node, level,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN (level = 'ERROR'
                     OR {_any('message', ERROR_PATTERNS)}) THEN 1 ELSE 0 END)
                    AS BIGINT) AS errors
        FROM logs
        GROUP BY 1, 2, 3
        """
    )

    # the Kafka wire-format path (binary key/value → decode → the same
    # parse/classify/window plan) must reproduce the file-source result
    # exactly — one contract, two ingestion formats
    o["streaming_kafka_issue_counts"] = o["streaming_issue_counts"]

    o["error_rate_rolling"] = with_logs(
        """
        SELECT node, win_start, errors, total,
               round(avg(errors) OVER (PARTITION BY node ORDER BY win_start
                     ROWS BETWEEN 5 PRECEDING AND CURRENT ROW), 4) AS errors_ma6
        FROM (
          SELECT node,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS win_start,
                 CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT) AS errors,
                 CAST(count(*) AS BIGINT) AS total
          FROM flagged GROUP BY 1, 2
        ) h
        """
    )

    # multi-window burn: same integer cross-multiplied rule
    o["slo_burn_alerts"] = with_logs(
        """
        SELECT s.node, s.win_s, s.e_s, s.t_s,
               round(4 * s.e_s / s.t_s, 4) AS burn_short,
               round(4 * l.e_l / l.t_l, 4) AS burn_long
        FROM (
          SELECT node,
                 CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS win_s,
                 CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END)
                      AS BIGINT) AS e_s,
                 CAST(count(*) AS BIGINT) AS t_s
          FROM flagged GROUP BY 1, 2
        ) s
        JOIN (
          SELECT node,
                 CAST(floor(epoch(ts) / 7200) AS BIGINT) * 7200 AS win_l,
                 CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END)
                      AS BIGINT) AS e_l,
                 CAST(count(*) AS BIGINT) AS t_l
          FROM flagged GROUP BY 1, 2
        ) l ON l.node = s.node
           AND l.win_l = (s.win_s // 7200) * 7200
        WHERE 2 * s.e_s >= s.t_s AND 10 * l.e_l >= 3 * l.t_l
        """
    )

    # LOCF imputation: same grid, last_value IGNORE NULLS carry
    o["impute_hourly_locf"] = with_logs(
        """
        , hourly AS (
          SELECT node,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
                 CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END)
                      AS BIGINT) AS x
          FROM flagged GROUP BY 1, 2
        ),
        grid AS (
          SELECT node, unnest(generate_series(h0, h1, 3600)) AS h
          FROM (SELECT node, min(h) AS h0, max(h) AS h1
                FROM hourly GROUP BY node) b
        )
        SELECT g.node, g.h AS hour_s,
               CAST(coalesce(last_value(hr.x IGNORE NULLS) OVER (
                      PARTITION BY g.node ORDER BY g.h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    0) AS BIGINT) AS errors_imputed,
               hr.x IS NULL AS is_imputed
        FROM grid g LEFT JOIN hourly hr
          ON hr.node = g.node AND hr.h = g.h
        """
    )

    # coverage gaps: zero-filled grid + gaps-and-islands streaks
    o["node_coverage_gaps"] = with_logs(
        """
        , hourly AS (
          SELECT node,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
                 count(*) AS x
          FROM logs GROUP BY 1, 2
        ),
        grid AS (
          SELECT node, unnest(generate_series(h0, h1, 3600)) AS h
          FROM (SELECT node, min(h) AS h0, max(h) AS h1
                FROM hourly GROUP BY node) b
        ),
        filled AS (
          SELECT g.node, g.h, hr.x IS NULL AS silent
          FROM grid g LEFT JOIN hourly hr
            ON hr.node = g.node AND hr.h = g.h
        ),
        streaks AS (
          SELECT node, max(len) AS longest FROM (
            SELECT node, grp, count(*) AS len FROM (
              SELECT node, h,
                     row_number() OVER (PARTITION BY node ORDER BY h)
                     - row_number() OVER (PARTITION BY node, silent
                                          ORDER BY h) AS grp
              FROM filled
              QUALIFY silent
            ) s GROUP BY node, grp
          ) m GROUP BY node
        )
        SELECT t.node,
               CAST(t.expected_hours AS BIGINT) AS expected_hours,
               CAST(t.observed_hours AS BIGINT) AS observed_hours,
               CAST(t.silent_hours AS BIGINT) AS silent_hours,
               CAST(coalesce(s.longest, 0) AS BIGINT)
                 AS longest_gap_hours
        FROM (
          SELECT node, count(*) AS expected_hours,
                 sum(CASE WHEN silent THEN 0 ELSE 1 END)
                   AS observed_hours,
                 sum(CASE WHEN silent THEN 1 ELSE 0 END) AS silent_hours
          FROM filled GROUP BY node
        ) t LEFT JOIN streaks s ON s.node = t.node
        """
    )

    # 2x2 chi-square: integer numerator/denominator, one division
    o["error_independence_chi2"] = with_logs(
        """
        SELECT node, a AS errors, a + b AS lines,
               round(CAST(CAST(n AS HUGEINT)
                          * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                          * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                          AS DOUBLE)
                     / CAST(CAST(a + b AS HUGEINT) * (c + d)
                            * (a + c) * (b + d) AS DOUBLE), 4)
                 AS chi2,
               round(CAST(CAST(n AS HUGEINT)
                          * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                          * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                          AS DOUBLE)
                     / CAST(CAST(a + b AS HUGEINT) * (c + d)
                            * (a + c) * (b + d) AS DOUBLE), 4)
                 > 3.841 AS significant_95
        FROM (
          SELECT node, a, b,
                 (sum(a) OVER ()) - a AS c,
                 (sum(b) OVER ()) - b AS d,
                 (sum(a) OVER ()) + (sum(b) OVER ()) AS n
          FROM (
            SELECT node,
                   CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END)
                        AS BIGINT) AS a,
                   CAST(sum(CASE WHEN is_error THEN 0 ELSE 1 END)
                        AS BIGINT) AS b
            FROM flagged GROUP BY node
          ) p
        ) t
        """
    )

    # sliding windows: the k-th covering window of t starts at
    # floor(t/900)*900 - k*900 (k in 0..3) — integer epoch math
    o["error_rate_sliding"] = with_logs(
        """
        SELECT node, win_start,
               CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END)
                    AS BIGINT) AS errors,
               CAST(count(*) AS BIGINT) AS total
        FROM (
          SELECT f.node, f.is_error,
                 (CAST(floor(epoch(f.ts) / 900) AS BIGINT) - k.k) * 900
                   AS win_start
          FROM flagged f
          CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
        ) s
        GROUP BY 1, 2
        """
    )

    # CUSUM via its closed form (prefix sum − clamped running min);
    # all-integer arithmetic end to end, zero-filled hours from
    # generate_series mirroring the Spark side's sequence explode
    o["error_cusum_changepoints"] = with_logs(
        """
        SELECT node, h AS hour_s, x AS n_errors, s AS cusum, k AS k_ref
        FROM (
          SELECT node, h, x, k,
                 CAST(p - least(0, min(p) OVER (PARTITION BY node
                        ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)) AS BIGINT) AS s
          FROM (
            SELECT node, h, x, k,
                   sum(x - k) OVER (PARTITION BY node ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS p
            FROM (
              SELECT s.node, s.h, CAST(coalesce(hr.x, 0) AS BIGINT) AS x,
                     CAST((s.tot + s.n_slots - 1) // s.n_slots AS BIGINT)
                       AS k
              FROM (
                SELECT node, tot, (h1 - h0) // 3600 + 1 AS n_slots,
                       unnest(generate_series(h0, h1, 3600)) AS h
                FROM (
                  SELECT node, min(h) AS h0, max(h) AS h1,
                         sum(x) AS tot
                  FROM (
                    SELECT node,
                           CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                             AS h,
                           CAST(count(*) AS BIGINT) AS x
                    FROM flagged WHERE is_error GROUP BY 1, 2
                  ) hh GROUP BY node
                ) b
              ) s
              LEFT JOIN (
                SELECT node,
                       CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                         AS h,
                       CAST(count(*) AS BIGINT) AS x
                FROM flagged WHERE is_error GROUP BY 1, 2
              ) hr ON hr.node = s.node AND hr.h = s.h
            ) series
          ) pre
        ) cz
        WHERE s > 3 * k
        """
    )

    # integer EWMA restated as a genuine recursive CTE stepping the
    # per-node hour rank — bit-identical to the Spark fold because
    # every step is exact integer arithmetic (scaled by 1000,
    # truncating floor-div 4, positive operands throughout)
    from ..operators.analysis import EWMA_MIN_X, EWMA_SCALE

    o["error_ewma_smoothed"] = f"""
        WITH RECURSIVE {LOG_CTE},
        hourly AS (
          SELECT node, CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
                 CAST(count(*) AS BIGINT) AS x
          FROM flagged WHERE is_error GROUP BY 1, 2
        ),
        series AS (
          SELECT s.node, s.h, CAST(coalesce(hr.x, 0) AS BIGINT) AS x
          FROM (
            SELECT node, unnest(generate_series(h0, h1, 3600)) AS h
            FROM (SELECT node, min(h) AS h0, max(h) AS h1
                  FROM hourly GROUP BY node) b
          ) s
          LEFT JOIN hourly hr ON hr.node = s.node AND hr.h = s.h
        ),
        seq AS (
          SELECT node, h, x,
                 row_number() OVER (PARTITION BY node ORDER BY h) AS rn
          FROM series
        ),
        rec AS (
          SELECT node, rn, CAST(x * {EWMA_SCALE} AS BIGINT) AS ewma,
                 CAST(0 AS BIGINT) AS n_spikes
          FROM seq WHERE rn = 1
          UNION ALL
          SELECT s.node, s.rn,
                 CAST((s.x * {EWMA_SCALE} + 3 * r.ewma) // 4 AS BIGINT),
                 CAST(r.n_spikes
                      + CASE WHEN 2 * s.x * {EWMA_SCALE} > 3 * r.ewma
                                  AND s.x >= {EWMA_MIN_X}
                             THEN 1 ELSE 0 END AS BIGINT)
          FROM rec r JOIN seq s ON s.node = r.node AND s.rn = r.rn + 1
        ),
        fin AS (
          SELECT node, ewma, n_spikes,
                 row_number() OVER (PARTITION BY node ORDER BY rn DESC)
                   AS rk
          FROM rec
        )
        SELECT t.node,
               CAST(t.n_hours AS BIGINT) AS n_hours,
               CAST(t.max_errors AS BIGINT) AS max_errors,
               f.ewma AS ewma_final,
               f.n_spikes
        FROM (SELECT node, count(*) AS n_hours, max(x) AS max_errors
              FROM series GROUP BY node) t
        JOIN fin f ON f.node = t.node AND f.rk = 1
    """

    # stream-static enrichment: rack recomputed from node parity,
    # windowed counts stated directly
    o["streaming_rack_counts"] = with_logs(
        """
        SELECT strftime(date_trunc('hour', ts),
                        '%Y-%m-%d %H:00:00') AS hour,
               'r' || CAST(CAST(substr(node, 5) AS INT) % 2 AS VARCHAR)
                 AS rack,
               level,
               CAST(count(*) AS BIGINT) AS n
        FROM logs
        GROUP BY 1, 2, 3
        """
    )

    # the cross-batch streaming fold must emit the batch closed
    # form's exact alarm set — shared oracle IS the proof
    o["streaming_cusum_alerts"] = o["error_cusum_changepoints"]

    # exact-rational OLS trend: the oracle recomputes the zero-filled
    # grid's Σt/Σt² from the SAME Faulhaber closed forms (each cubic
    # product divisible by 6, the pairwise product by 2 — `//` is
    # floor-exact on positives); HUGEINT mirrors Spark's DECIMAL(38)
    # for the n·Σt² and (Σt)² products that cross int64 on long
    # node histories; slope_num/den are shift-invariant and small.
    o["error_trend_ols"] = with_logs(
        """
        SELECT node,
               CAST(n AS BIGINT) AS n_hours,
               CAST(sy AS BIGINT) AS total_errors,
               CAST(n*sty - st*sy AS BIGINT) AS slope_num,
               CAST(n*stt - st*st AS BIGINT) AS slope_den,
               CASE WHEN n*sty - st*sy > 0 THEN 'degrading'
                    WHEN n*sty - st*sy < 0 THEN 'improving'
                    ELSE 'flat' END AS trend
        FROM (
          SELECT node, n, sy, sty,
                 ((t0 + t1) * n) // 2 AS st,
                 (t1*(t1+1)*(2*t1+1)
                  - (t0-1)*t0*(2*t0-1)) // 6 AS stt
          FROM (
            SELECT node,
                   CAST(min(t) AS HUGEINT) AS t0,
                   CAST(max(t) AS HUGEINT) AS t1,
                   CAST(max(t) - min(t) + 1 AS HUGEINT) AS n,
                   CAST(count(*) AS HUGEINT) AS sy,
                   CAST(sum(t) AS HUGEINT) AS sty
            FROM (
              SELECT node, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t
              FROM flagged WHERE is_error
            ) e GROUP BY node
          ) raw
        ) m
        """
    )

    # Wilson CI: identical IEEE expression graph (+,x,/,sqrt all
    # correctly rounded) -> round(.,6) hashes bit-equal, the Pearson
    # discipline; z is the same literal constant on both sides
    o["error_rate_wilson_ci"] = with_logs(
        """
        SELECT node,
               CAST(n AS BIGINT) AS n,
               CAST(e AS BIGINT) AS n_errors,
               round(p, 6) AS rate,
               round((p + (1.96*1.96) / (2*nd) - 1.96 * sqrt(
                        p * (1 - p) / nd + (1.96*1.96) / (4*nd*nd)))
                     / (1 + (1.96*1.96) / nd), 6) AS wilson_lo,
               round((p + (1.96*1.96) / (2*nd) + 1.96 * sqrt(
                        p * (1 - p) / nd + (1.96*1.96) / (4*nd*nd)))
                     / (1 + (1.96*1.96) / nd), 6) AS wilson_hi
        FROM (
          SELECT node, count(*) AS n,
                 CAST(count(*) AS DOUBLE) AS nd,
                 sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS e,
                 sum(CASE WHEN is_error THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE) AS p
          FROM flagged GROUP BY node
        ) t
        """
    )

    # forecast: same Faulhaber moments, intercept numerator added,
    # HUGEINT mirrors DECIMAL(38); 'rising' compares cross-products
    # so no division ever happens
    o["error_forecast_next_day"] = with_logs(
        """
        SELECT node,
               CAST(t1 + 24 AS BIGINT) AS t_star,
               CAST(sy*stt - st*sty
                    + (n*sty - st*sy) * (t1 + 24) AS BIGINT) AS yhat_num,
               CAST(n*stt - st*st AS BIGINT) AS yhat_den,
               CASE WHEN (sy*stt - st*sty
                          + (n*sty - st*sy) * (t1 + 24)) * n
                         > sy * (n*stt - st*st)
                    THEN 'rising' ELSE 'easing' END AS outlook
        FROM (
          SELECT node, n, sy, sty, t1,
                 ((t0 + t1) * n) // 2 AS st,
                 (t1*(t1+1)*(2*t1+1)
                  - (t0-1)*t0*(2*t0-1)) // 6 AS stt
          FROM (
            SELECT node,
                   CAST(min(t) AS HUGEINT) AS t0,
                   CAST(max(t) AS HUGEINT) AS t1,
                   CAST(max(t) - min(t) + 1 AS HUGEINT) AS n,
                   CAST(count(*) AS HUGEINT) AS sy,
                   CAST(sum(t) AS HUGEINT) AS sty
            FROM (
              SELECT node, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t
              FROM flagged WHERE is_error
            ) e GROUP BY node
          ) raw
        ) m
        """
    )

    # the streaming fold carries ONLY (t0, t1, Σy, Σty) per node
    # across micro-batches — shared oracle proves the 4-integer
    # state reconstructs the batch regression exactly
    o["streaming_trend_state"] = o["error_trend_ols"]

    # directional lead-lag: sparse dot products (no grid — zeros
    # contribute nothing), scaffold keeps silent pairs as zero rows,
    # argmax lag with smallest-lag tie-break; all-integer scores
    o["node_lead_lag"] = with_logs(
        """
        , counts AS (
          SELECT node,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
                 CAST(count(*) AS BIGINT) AS e
          FROM flagged WHERE is_error GROUP BY 1, 2
        ),
        lags AS (SELECT unnest(range(0, 4)) AS lag),
        scores AS (
          SELECT a.node AS node_a, b.node AS node_b, l.lag,
                 sum(a.e * b.e) AS s
          FROM counts a
          CROSS JOIN lags l
          JOIN counts b
            ON b.h = a.h + l.lag * 3600 AND b.node != a.node
          GROUP BY 1, 2, 3
        ),
        scaffold AS (
          SELECT na.node AS node_a, nb.node AS node_b, l.lag
          FROM (SELECT DISTINCT node FROM counts) na
          CROSS JOIN (SELECT DISTINCT node FROM counts) nb
          CROSS JOIN lags l
          WHERE na.node != nb.node
        ),
        filled AS (
          SELECT sc.node_a, sc.node_b, sc.lag,
                 coalesce(s.s, 0) AS s
          FROM scaffold sc
          LEFT JOIN scores s
            ON s.node_a = sc.node_a AND s.node_b = sc.node_b
               AND s.lag = sc.lag
        ),
        ranked AS (
          SELECT node_a, node_b, lag, s,
                 row_number() OVER (PARTITION BY node_a, node_b
                                    ORDER BY s DESC, lag ASC) AS rk,
                 max(CASE WHEN lag = 0 THEN s END)
                   OVER (PARTITION BY node_a, node_b) AS s0
          FROM filled
        )
        SELECT node_a, node_b,
               CAST(lag AS INT) AS best_lag_h,
               CAST(s AS BIGINT) AS best_score,
               CAST(s0 AS BIGINT) AS score_lag0
        FROM ranked WHERE rk = 1
        """
    )

    # medians of integer counts are integers or exact .5 midpoints, so
    # round(…,1) is lossless and the >2× comparison is identical IEEE
    # arithmetic on both engines.
    o["error_anomaly_hours"] = with_logs(
        """
        SELECT node, win_start, errors, median_errors FROM (
          SELECT node, win_start, errors,
                 round(quantile_cont(errors, 0.5)
                       OVER (PARTITION BY node), 1) AS median_errors
          FROM (
            SELECT node,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS win_start,
                   CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT)
                     AS errors
            FROM flagged GROUP BY 1, 2
          ) h
        ) t WHERE errors > 2 * median_errors
        """
    )

    # GROUPED_AGG pandas UDF twin: the Arrow UDAF must land the same
    # dyadic-rational median quantile_cont computes over the grid
    o["pandas_udaf_error_median"] = with_logs(
        """
        , hourly AS (
          SELECT node,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
                 CAST(count(*) AS BIGINT) AS x
          FROM flagged WHERE is_error GROUP BY 1, 2
        ),
        grid AS (
          SELECT g.node, CAST(coalesce(hr.x, 0) AS BIGINT) AS x
          FROM (
            SELECT node, unnest(generate_series(h0, h1, 3600)) AS h
            FROM (SELECT node, min(h) AS h0, max(h) AS h1
                  FROM hourly GROUP BY node) b
          ) g
          LEFT JOIN hourly hr ON hr.node = g.node AND hr.h = g.h
        )
        SELECT node, CAST(count(*) AS BIGINT) AS n_hours,
               CAST(max(x) AS BIGINT) AS max_hourly_errors,
               quantile_cont(x, 0.5) AS med_hourly_errors
        FROM grid GROUP BY node
        """
    )

    # the Python DataSource connector must deliver byte-identical
    # lines: graded through the standard pipeline vs the same oracle
    o["python_datasource_node_summary"] = o["node_summary"]

    # cogrouped as-of census: union + running max of warning ems
    # (warnings sort before errors at equal ems, matching the
    # kernel's side='right' searchsorted)
    from ..operators.analysis import ASOF_WARN_GAP_MS

    o["cogroup_error_warning_asof"] = with_logs(
        f"""
        SELECT node, CAST(count(*) AS BIGINT) AS n_errors,
               CAST(sum(CASE WHEN last_warn IS NOT NULL
                        AND ems - last_warn <= {ASOF_WARN_GAP_MS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
               CAST(sum(CASE WHEN last_warn IS NOT NULL
                        AND ems - last_warn <= {ASOF_WARN_GAP_MS}
                        THEN ems - last_warn ELSE 0 END) AS BIGINT)
                 AS sum_gap_ms
        FROM (
          SELECT node, ems, kind,
                 max(CASE WHEN kind = 0 THEN ems END) OVER (
                   PARTITION BY node ORDER BY ems, kind
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_warn
          FROM (
            SELECT node, epoch_ms(ts) AS ems, 1 AS kind
            FROM flagged WHERE is_error
            UNION ALL
            SELECT node, epoch_ms(ts), 0
            FROM flagged WHERE is_warning AND NOT is_error
          ) u
        ) c
        WHERE kind = 1 GROUP BY node
        """
    )

    # seasonal OLS: same zero-filled daily grid, Cramer determinants
    # as exact integer sums of products (DuckDB sums cast to BIGINT
    # before the products so HUGEINT never floats through pandas)
    o["error_trend_seasonal_ols"] = with_logs(
        """
        , hourly AS (
          SELECT node,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
                 CAST(count(*) AS BIGINT) AS x
          FROM flagged WHERE is_error GROUP BY 1, 2
        ),
        grid AS (
          SELECT node, unnest(generate_series(h0, h1, 3600)) AS h
          FROM (SELECT node, min(h) AS h0, max(h) AS h1
                FROM hourly GROUP BY node) b
        ),
        daily AS (
          SELECT g.node, g.h // 86400 AS d,
                 CAST(sum(coalesce(hr.x, 0)) AS BIGINT) AS y
          FROM grid g
          LEFT JOIN hourly hr ON hr.node = g.node AND hr.h = g.h
          GROUP BY 1, 2
        ),
        base AS (
          SELECT node, d - min(d) OVER (PARTITION BY node) AS t,
                 CASE WHEN (d + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END AS w,
                 y
          FROM daily
        ),
        m AS (
          SELECT node,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(t) AS BIGINT) AS st,
                 CAST(sum(w) AS BIGINT) AS sw,
                 CAST(sum(t * t) AS BIGINT) AS stt,
                 CAST(sum(t * w) AS BIGINT) AS stw,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(t * y) AS BIGINT) AS sty,
                 CAST(sum(w * y) AS BIGINT) AS swy
          FROM base GROUP BY node
        )
        SELECT node, n AS n_days,
               CAST(n * (stt * sw - stw * stw) - st * (st * sw - stw * sw) + sw * (st * stw - stt * sw) AS BIGINT) AS det,
               CAST(n * (sty * sw - stw * swy) - sy * (st * sw - stw * sw) + sw * (st * swy - sty * sw) AS BIGINT) AS slope_num,
               CAST(n * (stt * swy - sty * stw) - st * (st * swy - sty * sw) + sy * (st * stw - stt * sw) AS BIGINT) AS weekend_num,
               CASE WHEN (n * (stt * sw - stw * stw) - st * (st * sw - stw * sw) + sw * (st * stw - stt * sw)) != 0
                    THEN CAST((n * (sty * sw - stw * swy) - sy * (st * sw - stw * sw) + sw * (st * swy - sty * sw)) AS DOUBLE) / (n * (stt * sw - stw * stw) - st * (st * sw - stw * sw) + sw * (st * stw - stt * sw))
               END AS slope_per_day,
               CASE WHEN (n * (stt * sw - stw * stw) - st * (st * sw - stw * sw) + sw * (st * stw - stt * sw)) != 0
                    THEN CAST((n * (stt * swy - sty * stw) - st * (st * swy - sty * sw) + sy * (st * stw - stt * sw)) AS DOUBLE) / (n * (stt * sw - stw * stw) - st * (st * sw - stw * sw) + sw * (st * stw - stt * sw))
               END AS weekend_lift
        FROM m
        """
    )

    # Theil–Sen: zero-filled hourly grid rolled to days, all pairs per
    # node, LOWER median selected under (double slope, integer
    # tie-break) ordering — same selection rule as the Spark window
    o["error_trend_theilsen"] = with_logs(
        """
        , hourly AS (
          SELECT node,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
                 CAST(count(*) AS BIGINT) AS x
          FROM flagged WHERE is_error GROUP BY 1, 2
        ),
        grid AS (
          SELECT node, unnest(generate_series(h0, h1, 3600)) AS h
          FROM (SELECT node, min(h) AS h0, max(h) AS h1
                FROM hourly GROUP BY node) b
        ),
        d AS (
          SELECT g.node, g.h // 86400 AS d,
                 CAST(sum(coalesce(hr.x, 0)) AS BIGINT) AS x
          FROM grid g
          LEFT JOIN hourly hr ON hr.node = g.node AND hr.h = g.h
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT a.node, b.x - a.x AS dy, b.d - a.d AS dt,
                 a.d AS di, b.d AS dj
          FROM d a JOIN d b ON a.node = b.node AND a.d < b.d
        ),
        ranked AS (
          SELECT node, dy, dt,
                 row_number() OVER (PARTITION BY node
                   ORDER BY CAST(dy AS DOUBLE) / dt, dy, dt, di, dj)
                   AS rk,
                 count(*) OVER (PARTITION BY node) AS n_pairs
          FROM pairs
        ),
        nd AS (SELECT node, CAST(count(*) AS BIGINT) AS n_days
               FROM d GROUP BY node)
        SELECT node, n_days, CAST(n_pairs AS BIGINT) AS n_pairs,
               dy AS med_dy, dt AS med_dt,
               CAST(dy AS DOUBLE) / dt AS slope_per_day
        FROM ranked JOIN nd USING (node)
        WHERE rk = (n_pairs + 1) // 2
        """
    )

    # Mann-Kendall: same zero-filled daily grid as theilsen; S, the
    # tie census and the variance numerator are all exact integers
    o["error_trend_mannkendall"] = with_logs(
        """
        , hourly AS (
          SELECT node,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS h,
                 CAST(count(*) AS BIGINT) AS x
          FROM flagged WHERE is_error GROUP BY 1, 2
        ),
        grid AS (
          SELECT node, unnest(generate_series(h0, h1, 3600)) AS h
          FROM (SELECT node, min(h) AS h0, max(h) AS h1
                FROM hourly GROUP BY node) b
        ),
        d AS (
          SELECT g.node, g.h // 86400 AS d,
                 CAST(sum(coalesce(hr.x, 0)) AS BIGINT) AS x
          FROM grid g
          LEFT JOIN hourly hr ON hr.node = g.node AND hr.h = g.h
          GROUP BY 1, 2
        ),
        s AS (
          SELECT a.node,
                 CAST(sum(CASE WHEN b.x > a.x THEN 1
                          WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat,
                 CAST(count(*) AS BIGINT) AS n_pairs
          FROM d a JOIN d b ON a.node = b.node AND a.d < b.d
          GROUP BY 1
        ),
        ties AS (
          SELECT node,
                 CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
          FROM (SELECT node, x, count(*) AS t FROM d GROUP BY 1, 2) g
          GROUP BY node
        ),
        nd AS (SELECT node, CAST(count(*) AS BIGINT) AS n_days
               FROM d GROUP BY node)
        SELECT node, n_days, n_pairs, s_stat,
               CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
                    AS BIGINT) AS var_num18
        FROM s JOIN ties USING (node) JOIN nd USING (node)
        """
    )
    # the streaming MK fold carries the per-(node, day) error
    # histogram plus the span's min/max error hour — the minimal
    # sufficient statistic; the shared oracle proves the
    # state-rebuilt zero-filled daily frame lands the batch test's
    # exact integers
    o["streaming_mannkendall_state"] = o["error_trend_mannkendall"]

    # seasonal MAD: zero-filled hourly series (cusum's CTE, sans k),
    # per-(node, hour-of-day) median and MAD as window aggregates —
    # dyadic-rational percentiles, the proven cross-engine pairing
    o["error_seasonal_mad"] = with_logs(
        """
        SELECT node, hod, h AS hour_s, x AS n_errors,
               med AS med_errors, mad AS mad_errors
        FROM (
          SELECT node, hod, h, x, med,
                 quantile_cont(abs(x - med), 0.5)
                   OVER (PARTITION BY node, hod) AS mad
          FROM (
            SELECT node, h, x, (h // 3600) % 24 AS hod,
                   quantile_cont(x, 0.5) OVER (
                     PARTITION BY node, (h // 3600) % 24) AS med
            FROM (
              SELECT s.node, s.h, CAST(coalesce(hr.x, 0) AS BIGINT) AS x
              FROM (
                SELECT node, unnest(generate_series(h0, h1, 3600)) AS h
                FROM (
                  SELECT node, min(h) AS h0, max(h) AS h1
                  FROM (
                    SELECT node,
                           CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                             AS h
                    FROM flagged WHERE is_error GROUP BY 1, 2
                  ) hh GROUP BY node
                ) b
              ) s
              LEFT JOIN (
                SELECT node,
                       CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                         AS h,
                       CAST(count(*) AS BIGINT) AS x
                FROM flagged WHERE is_error GROUP BY 1, 2
              ) hr ON hr.node = s.node AND hr.h = s.h
            ) series
          ) m1
        ) m2
        WHERE abs(x - med) > 3 * mad AND abs(x - med) >= 3
        """
    )

    # the additive-rollup fold must reproduce the batch detector's
    # exact flag set — shared oracle across batch boundaries
    o["streaming_seasonal_mad"] = o["error_seasonal_mad"]


    # native session_window twin: Spark MERGES touching windows, so a
    # session closes only when the next event is STRICTLY > gap away
    # (verified by test_error_sessions_keeps_exact_gap_event); rule
    # applied at ms precision, end = last event + gap.
    from ..operators.analysis import SESSION_GAP_S

    sessions_body = f"""
        SELECT node,
               CAST(min(ems) // 1000 AS BIGINT) AS start_s,
               CAST(max(ems) // 1000 + {SESSION_GAP_S} AS BIGINT)
                 AS end_s_excl,
               CAST(count(*) AS BIGINT) AS n_events
        FROM (
          SELECT node, ems,
                 sum(new_s) OVER (PARTITION BY node ORDER BY ems, line_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM (
            SELECT node, line_id, epoch_ms(ts) AS ems,
                   CASE WHEN lag(epoch_ms(ts))
                             OVER (PARTITION BY node ORDER BY epoch_ms(ts),
                                   line_id) IS NULL
                             OR epoch_ms(ts) - lag(epoch_ms(ts))
                                OVER (PARTITION BY node ORDER BY epoch_ms(ts),
                                      line_id) > {SESSION_GAP_S * 1000}
                        THEN 1 ELSE 0 END AS new_s
            FROM flagged WHERE is_error
          ) m
        ) s
        GROUP BY node, sid
    """

    o["error_sessions"] = with_logs(sessions_body)

    # reliability rollup over the SAME session derivation: mean gap
    # between incident starts, mean incident span, availability —
    # integer floor-div on non-negative operands both engines
    o["node_mtbf"] = with_logs(
        f"""
        , sess AS ({sessions_body})
        SELECT node,
               CAST(count(*) AS BIGINT) AS n_incidents,
               CAST(CASE WHEN count(*) >= 2 THEN
                 (max(start_s) - min(start_s)) // (count(*) - 1)
               END AS BIGINT) AS mtbf_s,
               CAST(sum(end_s_excl - {SESSION_GAP_S} - start_s) // count(*)
                    AS BIGINT) AS mttr_s,
               CAST(CASE WHEN max(end_s_excl) - {SESSION_GAP_S} - min(start_s) > 0
                 THEN 1000 * (max(end_s_excl) - {SESSION_GAP_S} - min(start_s)
                              - sum(end_s_excl - {SESSION_GAP_S} - start_s))
                      // (max(end_s_excl) - {SESSION_GAP_S} - min(start_s))
               END AS BIGINT) AS availability_permille
        FROM sess GROUP BY node
        """
    )
    # the native session_window running UNDER readStream (complete
    # mode) must emit the exact batch sessions
    o["streaming_error_sessions"] = o["error_sessions"]
    # the exactly-once streaming silver sink must land the exact rows
    # the batch silver write produces
    o["streaming_silver_counts"] = o["silver_node_errors"]
    # the micro-batched merge must land the identical final table as
    # the one-shot batch merge — shared oracle IS the proof
    o["streaming_merge_upsert"] = o["silver_merge_upsert"]

    # dropDuplicatesWithinWatermark over the doubled landing must
    # reconstruct the duplicate-free source exactly: n_events==n_ids
    # per type, and the value sum catches double-counts
    o["streaming_dedup_watermarked"] = """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY event_type
        """

    bursts_body = BURSTS_BODY
    o["error_bursts"] = with_logs(bursts_body)

    # inter-burst gap stats build on the same burst rollup; the mean
    # divides exact integer sums (IEEE-identical on both engines).
    o["error_recovery"] = with_logs(
        f"""
        SELECT node, CAST(count(*) AS BIGINT) AS n_bursts,
               CAST(count(gap_s) AS BIGINT) AS n_gaps,
               CAST(sum(gap_s) AS BIGINT) / CAST(count(gap_s) AS BIGINT)
                 AS mean_gap_s,
               max(gap_s) AS max_gap_s, min(gap_s) AS min_gap_s
        FROM (
          SELECT node,
                 start_s - lag(end_s) OVER (
                   PARTITION BY node ORDER BY start_s, burst_id
                 ) AS gap_s
          FROM ({BURSTS_BODY}) b
        ) g
        GROUP BY node
        """
    )

    o["thread_hotspots"] = with_logs(
        """
        SELECT node, thread, n_lines, n_errors, node_errors,
               CASE WHEN node_errors > 0
                    THEN n_errors / node_errors ELSE 0.0
               END AS error_share
        FROM (
          SELECT node, thread,
                 CAST(count(*) AS BIGINT) AS n_lines,
                 CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_errors,
                 CAST(sum(sum(CASE WHEN is_error THEN 1 ELSE 0 END))
                      OVER (PARTITION BY node) AS BIGINT) AS node_errors
          FROM flagged GROUP BY node, thread
        ) t
        """
    )

    o["search_context"] = with_logs(
        f"""
        SELECT node, CAST(line_number AS INT) AS line_number, content,
               prev_line, next_line
        FROM (
          SELECT node, raw AS content,
                 row_number() OVER (PARTITION BY node ORDER BY line_id)
                   AS line_number,
                 lag(raw) OVER (PARTITION BY node ORDER BY line_id)
                   AS prev_line,
                 lead(raw) OVER (PARTITION BY node ORDER BY line_id)
                   AS next_line,
                 {_rx('raw', '(?i)tombstone')} AS hit
          FROM lines
        ) t WHERE hit
        """
    )

    # the streaming stateful operator emits only CLOSED bursts — every
    # burst except each node's final one.
    o["streaming_error_bursts"] = with_logs(
        f"""
        SELECT node, n_events, start_s, end_s FROM (
          SELECT b.*, max(burst_id) OVER (PARTITION BY node) AS max_bid
          FROM ({bursts_body}) b
        ) t WHERE burst_id < max_bid
        """
    )

    from ..operators.analysis import (
        DROPPED_REGEX,
        TEMPLATE_NUM_REGEX,
        TEMPLATE_NUM_TOKEN,
    )

    # DuckDB regexp_replace defaults to first-match-only; 'g' makes it
    # match Spark's replace-all semantics.
    o["log_templates"] = with_logs(
        f"""
        SELECT level,
               regexp_replace(message, '{TEMPLATE_NUM_REGEX}',
                              '{TEMPLATE_NUM_TOKEN}', 'g') AS template,
               CAST(count(*) AS BIGINT) AS n
        FROM logs GROUP BY 1, 2
        """
    )

    # emerging signatures: same masking, (level, template) rollup +
    # broadcast span end; epoch() of a TIMESTAMP is exact seconds here
    from ..operators.analysis import NEW_TEMPLATE_WINDOW_S

    o["new_template_alert"] = with_logs(
        f"""
        SELECT level,
               regexp_replace(message, '{TEMPLATE_NUM_REGEX}',
                              '{TEMPLATE_NUM_TOKEN}', 'g') AS template,
               CAST(min(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT)
                 AS first_seen_s,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(count(DISTINCT node) AS BIGINT) AS n_nodes,
               CAST(CASE WHEN min(CAST(floor(epoch(ts)) AS BIGINT))
                       >= (SELECT max(CAST(floor(epoch(ts)) AS BIGINT))
                           FROM logs
                           WHERE level IN ('ERROR', 'WARN'))
                          - {NEW_TEMPLATE_WINDOW_S}
                    THEN 1 ELSE 0 END AS BIGINT) AS is_new
        FROM logs WHERE level IN ('ERROR', 'WARN')
        GROUP BY 1, 2
        """
    )

    # heavy changers: identical masking, midpoint conditional sums,
    # same (abs desc, delta, level, template) rank order
    from ..operators.analysis import HEAVY_CHANGE_TOP_K

    o["template_heavy_changers"] = with_logs(
        f"""
        SELECT level, template, n_first, n_second, delta,
               CAST(rk AS BIGINT) AS rk
        FROM (
          SELECT *, row_number() OVER (ORDER BY abs(delta) DESC,
                      delta, level, template) AS rk
          FROM (
            SELECT level,
                   regexp_replace(message, '{TEMPLATE_NUM_REGEX}',
                                  '{TEMPLATE_NUM_TOKEN}', 'g')
                     AS template,
                   CAST(sum(CASE WHEN ep <= mid THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_first,
                   CAST(sum(CASE WHEN ep > mid THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_second,
                   CAST(sum(CASE WHEN ep > mid THEN 1 ELSE 0 END)
                        - sum(CASE WHEN ep <= mid THEN 1 ELSE 0 END)
                        AS BIGINT) AS delta
            FROM (
              SELECT level, message,
                     CAST(floor(epoch(ts)) AS BIGINT) AS ep
              FROM logs
            ) l,
            (SELECT (min(CAST(floor(epoch(ts)) AS BIGINT))
                     + max(CAST(floor(epoch(ts)) AS BIGINT))) // 2
                     AS mid FROM logs) m
            GROUP BY 1, 2
          ) c
        ) r
        WHERE rk <= {HEAVY_CHANGE_TOP_K}
        """
    )

    # decayed heavy hitters: the identical shift-decay restated; >>
    # on BIGINT is exact in both engines, shift clamped at 62
    from ..operators.analysis import TREND_TOP_K

    o["template_trending_decayed"] = with_logs(
        f"""
        SELECT level, template, decayed_score, raw_count, last_seen_d,
               CAST(rk AS INT) AS rk
        FROM (
          SELECT *, row_number() OVER (ORDER BY decayed_score DESC,
                    level, template) AS rk
          FROM (
            SELECT level, template,
                   CAST(sum(n >> CAST(least(last_d - d, 62) AS INT))
                     AS BIGINT) AS decayed_score,
                   CAST(sum(n) AS BIGINT) AS raw_count,
                   CAST(max(d) AS BIGINT) AS last_seen_d
            FROM (
              SELECT level,
                     regexp_replace(message, '{TEMPLATE_NUM_REGEX}',
                                    '{TEMPLATE_NUM_TOKEN}', 'g')
                       AS template,
                     CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
                     CAST(count(*) AS BIGINT) AS n
              FROM logs GROUP BY 1, 2, 3
            ) daily,
            (SELECT max(CAST(floor(epoch(ts) / 86400) AS BIGINT))
               AS last_d FROM logs) h
            GROUP BY level, template
          ) s
        ) r WHERE rk <= {TREND_TOP_K}
        """
    )

    from ..operators.analysis import TEMPLATES_PER_NODE_K

    o["top_templates_per_node"] = with_logs(
        f"""
        SELECT node, CAST(rk AS INT) AS rk, template, n,
               n / node_lines AS share
        FROM (
          SELECT node, template, n,
                 CAST(sum(n) OVER (PARTITION BY node) AS BIGINT)
                   AS node_lines,
                 row_number() OVER (PARTITION BY node
                                    ORDER BY n DESC, template) AS rk
          FROM (
            SELECT node,
                   regexp_replace(message, '{TEMPLATE_NUM_REGEX}',
                                  '{TEMPLATE_NUM_TOKEN}', 'g') AS template,
                   CAST(count(*) AS BIGINT) AS n
            FROM logs GROUP BY 1, 2
          ) a
        ) r WHERE rk <= {TEMPLATES_PER_NODE_K}
        """
    )

    # template share first-half vs second-half of the time range; all
    # divisions are exact-int / exact-int → bit-identical doubles.
    o["template_drift"] = with_logs(
        f"""
        SELECT template, n_early, n_late,
               n_early / tot_early AS early_share,
               n_late / tot_late AS late_share,
               n_late / tot_late - n_early / tot_early AS drift
        FROM (
          SELECT template,
                 CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_early,
                 CAST(sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_late,
                 CAST(sum(sum(CASE WHEN early THEN 1 ELSE 0 END))
                      OVER () AS BIGINT) AS tot_early,
                 CAST(sum(sum(CASE WHEN NOT early THEN 1 ELSE 0 END))
                      OVER () AS BIGINT) AS tot_late
          FROM (
            SELECT regexp_replace(message, '{TEMPLATE_NUM_REGEX}',
                                  '{TEMPLATE_NUM_TOKEN}', 'g') AS template,
                   CAST(floor(epoch(ts)) AS BIGINT)
                     <= (b.mn + b.mx) // 2 AS early
            FROM logs, (
              SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS mn,
                     max(CAST(floor(epoch(ts)) AS BIGINT)) AS mx
              FROM logs
            ) b
          ) h
          GROUP BY template
        ) a
        """
    )

    o["dropped_messages"] = with_logs(
        f"""
        SELECT node,
               regexp_extract(message, '{DROPPED_REGEX}', 2) AS msg_type,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(regexp_extract(message, '{DROPPED_REGEX}', 1)
                             AS BIGINT)) AS BIGINT) AS total_dropped
        FROM logs WHERE regexp_matches(message, '{DROPPED_REGEX}')
        GROUP BY 1, 2
        """
    )

    # health report card: the same three rollups composed in SQL,
    # integer penalty + relative grade cutoffs (no float protocol)
    from ..operators.analysis import (
        HEALTH_W_BURST,
        HEALTH_W_DROPPED,
        HEALTH_W_ERROR,
        HEALTH_W_WARN,
    )

    o["node_health_score"] = with_logs(
        f"""
        SELECT node, errors, warnings, n_bursts, n_dropped, penalty,
               CAST(row_number() OVER (ORDER BY penalty DESC, node)
                    AS INT) AS rank,
               CASE WHEN 4 * penalty >= 3 * max(penalty) OVER ()
                      THEN 'attention'
                    WHEN 2 * penalty >= max(penalty) OVER ()
                      THEN 'watch'
                    ELSE 'ok' END AS grade
        FROM (
          SELECT ns.node, ns.errors, ns.warnings,
                 coalesce(nb.n_bursts, 0) AS n_bursts,
                 coalesce(dr.n_dropped, 0) AS n_dropped,
                 {HEALTH_W_ERROR} * ns.errors
                   + {HEALTH_W_WARN} * ns.warnings
                   + {HEALTH_W_BURST} * coalesce(nb.n_bursts, 0)
                   + {HEALTH_W_DROPPED} * coalesce(dr.n_dropped, 0)
                     AS penalty
          FROM (
            SELECT node,
                   CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END)
                        AS BIGINT) AS errors,
                   CAST(sum(CASE WHEN is_warning THEN 1 ELSE 0 END)
                        AS BIGINT) AS warnings
            FROM flagged GROUP BY node
          ) ns
          LEFT JOIN (
            SELECT node, CAST(count(*) AS BIGINT) AS n_bursts
            FROM ({BURSTS_BODY}) b GROUP BY node
          ) nb ON nb.node = ns.node
          LEFT JOIN (
            SELECT node,
                   CAST(sum(CAST(regexp_extract(message,
                        '{DROPPED_REGEX}', 1) AS BIGINT)) AS BIGINT)
                     AS n_dropped
            FROM logs WHERE regexp_matches(message, '{DROPPED_REGEX}')
            GROUP BY 1
          ) dr ON dr.node = ns.node
        ) p
        """
    )

    # two-source correlation: metrics aggregate straight off events,
    # error counts off the parsed+flagged logs; percentile ==
    # quantile_cont (both linear-interpolate; same proven pairing as
    # event_value_percentiles).
    o["node_metrics_correlation"] = with_logs(
        f"""
        SELECT m.node, m.win_start, m.n_ops, m.p50_value, m.p95_value,
               e.n_errors
        FROM (
          SELECT 'node' || (user_id % {N_NODES}) AS node,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS win_start,
                 CAST(count(*) AS BIGINT) AS n_ops,
                 round(quantile_cont(value, 0.5), 4) AS p50_value,
                 round(quantile_cont(value, 0.95), 4) AS p95_value
          FROM events GROUP BY 1, 2
        ) m
        JOIN (
          SELECT node,
                 CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS win_start,
                 CAST(sum(CASE WHEN is_error THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_errors
          FROM flagged GROUP BY 1, 2
        ) e ON m.node = e.node AND m.win_start = e.win_start
        """
    )

    # range join: DuckDB evaluates the inequality join directly (its
    # IEJoin handles intervals); the Spark side proves the bucketed
    # equi-join formulation produces identical rows.
    o["burst_context"] = with_logs(
        f"""
        SELECT b.node, b.burst_id, b.start_s, b.end_s,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN l.level = 'WARN' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_warn,
               CAST(sum(CASE WHEN l.level = 'INFO' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_info
        FROM ({bursts_body}) b
        JOIN (SELECT node, level,
                     CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
              FROM logs) l
          ON l.node = b.node AND l.epoch_s BETWEEN b.start_s AND b.end_s
        GROUP BY b.node, b.burst_id, b.start_s, b.end_s
        """
    )

    # interarrival histogram: bit-length stands in for floor(log2)
    # (the doc_surprisal protocol — no libm)
    o["error_interarrival_histogram"] = with_logs("""
        SELECT node, CAST(length(bin(gap_s + 1)) - 1 AS INT)
                 AS gap_bucket,
               CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(min(gap_s) AS BIGINT) AS min_gap_s,
               CAST(max(gap_s) AS BIGINT) AS max_gap_s
        FROM (
          SELECT node,
                 CAST(floor(epoch(ts)) AS BIGINT)
                 - lag(CAST(floor(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY node ORDER BY ts, line_id)
                   AS gap_s
          FROM flagged WHERE is_error
        ) g
        WHERE gap_s IS NOT NULL
        GROUP BY node, gap_bucket
    """)


    from ..operators.analysis import TEMPLATE_TRANSITION_MIN_N

    o["template_transitions"] = with_logs(f"""
        SELECT node, prev, cur, n, n_out,
               CAST(1000 * n // n_out AS BIGINT) AS share_permille
        FROM (
          SELECT node, prev, cur, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(count(*)) OVER (PARTITION BY node, prev)
                      AS BIGINT) AS n_out
          FROM (
            SELECT node,
                   regexp_replace(message, '{TEMPLATE_NUM_REGEX}',
                                  '{TEMPLATE_NUM_TOKEN}', 'g') AS cur,
                   lag(regexp_replace(message, '{TEMPLATE_NUM_REGEX}',
                                      '{TEMPLATE_NUM_TOKEN}', 'g'))
                     OVER (PARTITION BY node ORDER BY ts, line_id)
                     AS prev
            FROM logs) s
          WHERE prev IS NOT NULL
          GROUP BY node, prev, cur) t
        WHERE n >= {TEMPLATE_TRANSITION_MIN_N}
    """)

    return o
