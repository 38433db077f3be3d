"""DuckDB oracle SQL for the §2C general-analytics queries."""

from __future__ import annotations


def analytics_oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    o["pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 2) AS avg_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
    """

    # market basket: same pair/support/lift arithmetic
    from ..operators.analytics import COPURCHASE_MIN_SUPPORT

    o["part_copurchase_rules"] = f"""
        WITH li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                 CAST(count(*) AS BIGINT) AS support
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= {COPURCHASE_MIN_SUPPORT}
        ),
        sup AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS s
                FROM li GROUP BY 1),
        n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
              FROM li)
        SELECT p.pa, p.pb, p.support,
               round(p.support / sa.s, 4) AS conf_a_to_b,
               round(p.support / sb.s, 4) AS conf_b_to_a,
               round(p.support * n.n / (sa.s * sb.s), 4) AS lift
        FROM pairs p
        JOIN sup sa ON sa.l_partkey = p.pa
        JOIN sup sb ON sb.l_partkey = p.pb
        CROSS JOIN n
    """

    # cascade erasure: every census figure from FK arithmetic
    from ..operators.analytics import ERASE_CUSTKEY

    o["cascade_erasure"] = f"""
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM customer
           WHERE c_custkey != {ERASE_CUSTKEY}) AS customers_left,
          (SELECT CAST(count(*) AS BIGINT) FROM orders
           WHERE o_custkey != {ERASE_CUSTKEY}) AS orders_left,
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
           WHERE NOT EXISTS (
             SELECT 1 FROM orders o
             WHERE o.o_orderkey = l.l_orderkey
               AND o.o_custkey = {ERASE_CUSTKEY}))
            AS lineitems_left,
          (SELECT CAST(count(*) AS BIGINT) FROM orders o
           WHERE o.o_custkey != {ERASE_CUSTKEY}
             AND NOT EXISTS (
               SELECT 1 FROM customer c
               WHERE c.c_custkey = o.o_custkey
                 AND c.c_custkey != {ERASE_CUSTKEY}))
            AS orphan_orders,
          (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
           WHERE NOT EXISTS (
             SELECT 1 FROM orders o
             WHERE o.o_orderkey = l.l_orderkey
               AND o.o_custkey = {ERASE_CUSTKEY})
             AND NOT EXISTS (
               SELECT 1 FROM orders o2
               WHERE o2.o_orderkey = l.l_orderkey
                 AND o2.o_custkey != {ERASE_CUSTKEY}))
            AS orphan_lineitems
    """

    # drift gate: same integer era split, per-band single division
    o["value_drift_eras"] = """
        SELECT event_type, band, early_n, late_n,
               round((early_n - late_n) * (early_n - late_n)
                     / (early_n + late_n), 4) AS divergence
        FROM (
          SELECT event_type,
                 CAST(floor(value / 50) * 50 AS BIGINT) AS band,
                 CAST(sum(CASE WHEN epoch <
                       (SELECT (min(CAST(floor(epoch(ts)) AS BIGINT))
                                + max(CAST(floor(epoch(ts)) AS BIGINT)))
                               // 2 FROM events)
                       THEN 1 ELSE 0 END) AS BIGINT) AS early_n,
                 CAST(sum(CASE WHEN epoch >=
                       (SELECT (min(CAST(floor(epoch(ts)) AS BIGINT))
                                + max(CAST(floor(epoch(ts)) AS BIGINT)))
                               // 2 FROM events)
                       THEN 1 ELSE 0 END) AS BIGINT) AS late_n
          FROM (SELECT event_type, value,
                       CAST(floor(epoch(ts)) AS BIGINT) AS epoch
                FROM events) e
          GROUP BY 1, 2
        ) h
    """

    # value-RANGE frame: identical RANGE bounds in ANSI SQL; the
    # trailing sum rounds per the double protocol, count is exact
    o["user_trailing_spend"] = """
        SELECT event_id, user_id, epoch, round(value, 2) AS value,
               coalesce(round(sum(value) OVER w, 2), 0.0)
                 AS trailing_1h_spend,
               CAST(count(*) OVER w AS BIGINT) AS n_prior_1h
        FROM (
          SELECT event_id, user_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS epoch, value
          FROM events WHERE event_type = 'purchase'
        ) t
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch
                     RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING)
    """

    # the spark.sql text formulation must hash-match the DataFrame
    # formulation — same logical plan, same oracle
    o["pricing_summary_sql"] = o["pricing_summary"]

    o["shipping_priority"] = """
        SELECT l_orderkey, revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
        FROM (
          SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
                 round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_mktsegment = 'MACHINERY'
            AND o.o_orderdate < TIMESTAMP '2000-01-01'
            AND l.l_shipdate > TIMESTAMP '2000-01-01'
          GROUP BY 1, 2, 3
        ) t
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """

    # the salted-join twin must produce the identical result set
    o["shipping_priority_salted"] = o["shipping_priority"]

    o["nation_volume"] = """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                 AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        WHERE sn.n_name IN ('NATION_1', 'NATION_2')
          AND cn.n_name IN ('NATION_1', 'NATION_2')
          AND sn.n_name != cn.n_name
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
    """

    # threshold in exact arithmetic: 5*q*n < sum(q) is the
    # decorrelated form of q < 0.2*avg(q) (see analytics.py)
    o["small_quantity_revenue"] = """
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
        JOIN (
          SELECT l2.l_partkey, sum(l2.l_quantity) AS sum_qty,
                 count(*) AS n_lines_part
          FROM lineitem l2
          JOIN part p2 ON p2.p_partkey = l2.l_partkey
                      AND p2.p_brand = 'Brand#1'
          GROUP BY 1
        ) st ON st.l_partkey = l.l_partkey
        WHERE 5.0 * l.l_quantity * st.n_lines_part < st.sum_qty
    """

    o["market_share"] = """
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               round(sum(CASE WHEN sn.n_name = 'NATION_3'
                         THEN l.l_extendedprice * (1 - l.l_discount)
                         ELSE 0.0 END), 2) AS target_revenue,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                 AS total_revenue,
               round(round(sum(CASE WHEN sn.n_name = 'NATION_3'
                         THEN l.l_extendedprice * (1 - l.l_discount)
                         ELSE 0.0 END), 2)
                     / round(sum(l.l_extendedprice * (1 - l.l_discount)), 2),
                     4) AS mkt_share
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = cn.n_regionkey
                     AND r.r_name = 'AMERICA'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    """

    from ..operators.analytics import PROMO_DISJUNCTS

    disjunct_sql = " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size <= {sz} AND l.l_quantity >= {q})"
        for b, sz, q in PROMO_DISJUNCTS
    )
    o["disjunctive_revenue"] = f"""
        SELECT p.p_brand,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                 AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE {disjunct_sql}
        GROUP BY 1
    """

    # independent derivation via the classic EXISTS/NOT-EXISTS shape
    # (DuckDB decorrelates it itself) — the Spark side's single-rollup
    # reformulation must produce identical blame counts
    # Q20 shape graded against the CORRELATED formulation (IN
    # subqueries + HAVING over the nested aggregate) — structurally
    # independent from the Spark broadcast-join plan; integral
    # quantities cast to BIGINT make the 2x threshold exact.
    o["excess_inventory_suppliers"] = """
        SELECT s.s_name,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(q.qw) AS BIGINT) AS qty_1997
        FROM (
          SELECT l_suppkey, l_partkey,
                 sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                           AND l_shipdate <  TIMESTAMP '1998-01-01'
                     THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS qw
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE '%widget')
          GROUP BY 1, 2
          HAVING 2 * sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                               AND l_shipdate <  TIMESTAMP '1998-01-01'
                          THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                 > sum(CAST(l_quantity AS BIGINT))
        ) q
        JOIN supplier s ON s.s_suppkey = q.l_suppkey
        WHERE s.s_nationkey IN (SELECT n_nationkey FROM nation
                                WHERE n_name = 'NATION_3')
        GROUP BY s.s_name
    """

    # KMV simulated identically: same md5 48-bit hashes, same k-th
    # minimum, same integer estimator — single-window formulation
    # (the Spark side's two-stage top-k must collapse to it)
    from ..operators.analytics import KMV_K, KMV_SPACE

    o["distinct_users_kmv"] = f"""
        WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
        hashed AS (
          SELECT event_type, user_id,
                 CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)
                      || ':kmv'), 1, 12) AS BIGINT) AS h
          FROM d
        ),
        ranked AS (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY h, user_id) AS rk
          FROM hashed
        ),
        sk AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
                 CAST(max(h) AS BIGINT) AS kth_hash
          FROM ranked WHERE rk <= {KMV_K} GROUP BY 1
        ),
        t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
              FROM d GROUP BY 1)
        SELECT event_type, n_true, n_kept, kth_hash,
               CAST(CASE WHEN n_kept < {KMV_K} THEN n_kept
                    ELSE (({KMV_K} - 1) * {KMV_SPACE}) // kth_hash
                    END AS BIGINT) AS est_users
        FROM sk JOIN t USING (event_type)
    """

    # the streaming k-set fold must land the batch sketch's exact
    # integers — shared oracle proves batch-boundary independence
    o["streaming_kmv_state"] = o["distinct_users_kmv"]

    # theta-sketch set algebra over the same KMV hash: three k-sets
    # (A, B, union) + the union k-set's overlap ratio; all-integer
    # estimators so the algebra itself hash-grades
    from ..operators.analytics import (
        KMV_K as _KK,
        KMV_SET_HI as _HI,
        KMV_SET_LO as _LO,
        KMV_SPACE as _KS,
    )

    o["kmv_set_ops"] = f"""
        WITH memb AS (
          SELECT user_id,
                 CAST(max(CASE WHEN value >= {_HI} THEN 1
                          ELSE 0 END) AS BIGINT) AS has_p,
                 CAST(max(CASE WHEN value < {_HI} THEN 1
                          ELSE 0 END) AS BIGINT) AS has_e
          FROM events
          WHERE event_type = 'purchase' AND value >= {_LO}
          GROUP BY user_id
        ),
        hashed AS (
          SELECT user_id, has_p, has_e,
                 CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                      || ':kmv'), 1, 12)) AS BIGINT) AS h
          FROM memb
        ),
        ka AS (
          SELECT CAST(count(*) AS BIGINT) AS ka_n,
                 CAST(max(h) AS BIGINT) AS ka_h
          FROM (SELECT h, row_number() OVER (ORDER BY h, user_id) AS rk
                FROM hashed WHERE has_p = 1) t
          WHERE rk <= {_KK}
        ),
        kb AS (
          SELECT CAST(count(*) AS BIGINT) AS kb_n,
                 CAST(max(h) AS BIGINT) AS kb_h
          FROM (SELECT h, row_number() OVER (ORDER BY h, user_id) AS rk
                FROM hashed WHERE has_e = 1) t
          WHERE rk <= {_KK}
        ),
        ku AS (
          SELECT CAST(count(*) AS BIGINT) AS ku_n,
                 CAST(max(h) AS BIGINT) AS ku_h,
                 CAST(sum(CASE WHEN has_p = 1 AND has_e = 1 THEN 1
                          ELSE 0 END) AS BIGINT) AS n_both
          FROM (SELECT h, has_p, has_e,
                       row_number() OVER (ORDER BY h, user_id) AS rk
                FROM hashed) t
          WHERE rk <= {_KK}
        ),
        truth AS (
          SELECT CAST(sum(has_p) AS BIGINT) AS true_a,
                 CAST(sum(has_e) AS BIGINT) AS true_b,
                 CAST(count(*) AS BIGINT) AS true_union,
                 CAST(sum(CASE WHEN has_p = 1 AND has_e = 1 THEN 1
                          ELSE 0 END) AS BIGINT) AS true_inter
          FROM memb
        )
        SELECT true_a, true_b, true_union, true_inter,
               CAST(CASE WHEN ka_n < {_KK} THEN ka_n
                    ELSE ({_KK} - 1) * {_KS} // ka_h END AS BIGINT)
                 AS est_a,
               CAST(CASE WHEN kb_n < {_KK} THEN kb_n
                    ELSE ({_KK} - 1) * {_KS} // kb_h END AS BIGINT)
                 AS est_b,
               CAST(CASE WHEN ku_n < {_KK} THEN ku_n
                    ELSE ({_KK} - 1) * {_KS} // ku_h END AS BIGINT)
                 AS est_union,
               CAST(n_both * (CASE WHEN ku_n < {_KK} THEN ku_n
                    ELSE ({_KK} - 1) * {_KS} // ku_h END)
                    // ku_n AS BIGINT) AS est_inter
        FROM truth, ka, kb, ku
    """

    # users-to-date: the oracle states the naive per-day distinct
    # union directly (correlated count over the full history per
    # day) — structurally independent from the first-seen rollup
    o["cumulative_distinct_users"] = """
        WITH ev AS (
          SELECT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        days AS (SELECT DISTINCT day FROM ev)
        SELECT CAST(d.day AS VARCHAR) AS day,
               (SELECT CAST(count(DISTINCT e.user_id) AS BIGINT)
                FROM ev e WHERE e.day = d.day) AS active_users,
               (SELECT CAST(count(DISTINCT e.user_id) AS BIGINT)
                FROM ev e WHERE e.day <= d.day)
               - coalesce((SELECT CAST(count(DISTINCT e.user_id) AS BIGINT)
                           FROM ev e WHERE e.day < d.day), 0) AS new_users,
               (SELECT CAST(count(DISTINCT e.user_id) AS BIGINT)
                FROM ev e WHERE e.day <= d.day) AS users_to_date
        FROM days d
    """

    # correlated formulation kept verbatim — the decorrelated
    # rollup+join plan must reproduce it; integer cents avoid the
    # float average entirely on the Spark side
    from ..operators.analytics import ABOVE_AVG_DEN, ABOVE_AVG_NUM

    o["above_avg_orders"] = f"""
        WITH o AS (
          SELECT o_orderkey, o_custkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        )
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_above,
               CAST(max(cents) AS BIGINT) AS max_cents
        FROM o o1
        WHERE {ABOVE_AVG_DEN} * (SELECT count(*) FROM o o2
                                 WHERE o2.o_custkey = o1.o_custkey)
                             * o1.cents
            > {ABOVE_AVG_NUM} * (SELECT sum(cents) FROM o o3
                                 WHERE o3.o_custkey = o1.o_custkey)
        GROUP BY o_custkey
    """

    # watermark drop semantics restated from first principles: the
    # feed construction guarantees wm after batch 1 = max_ts − delay
    # (file 1 holds the max), and a replayed row survives iff its
    # hour-window hasn't expired (window_end > wm); fresh-file rows
    # satisfy that bound trivially, so one rule covers both files
    from ..streaming.batch_bridge import LATE_DELAY_S

    o["streaming_late_data_drop"] = f"""
        WITH ev AS (
          SELECT date_trunc('second', ts) AS ts, event_type FROM events
        ),
        m AS (SELECT CAST(max(epoch(ts)) AS BIGINT) AS hi FROM ev)
        SELECT CAST(floor(epoch(e.ts) / 3600) AS BIGINT) * 3600
                 AS win_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM ev e, m
        WHERE CAST(floor(epoch(e.ts) / 3600) AS BIGINT) * 3600 + 3600
              > hi - {LATE_DELAY_S}
        GROUP BY 1, 2
    """

    # trigram paths: same µs ordering contract as event_transitions;
    # top-K re-ranked with identical (count desc, path) tie-break
    from ..operators.analytics import PATH_TOP_K

    o["event_path_trigrams"] = f"""
        WITH seq AS (
          SELECT user_id, event_type,
                 lag(event_type, 2) OVER w AS e1,
                 lag(event_type, 1) OVER w AS e2
          FROM events
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id)
        ),
        cnt AS (
          SELECT e1, e2, event_type AS e3,
                 CAST(count(*) AS BIGINT) AS n
          FROM seq WHERE e1 IS NOT NULL GROUP BY 1, 2, 3
        )
        SELECT e1 || '>' || e2 || '>' || e3 AS path, n,
               CAST(rk AS INT) AS rk
        FROM (
          SELECT e1, e2, e3, n,
                 row_number() OVER (ORDER BY n DESC, e1, e2, e3) AS rk
          FROM cnt
        ) t WHERE rk <= {PATH_TOP_K}
    """

    # feature matrix: mode via zero-padded "count:type" string max —
    # lexicographically identical to Spark's (n, type) struct max
    o["user_feature_matrix"] = """
        WITH ev AS (
          SELECT user_id, event_type, CAST(ts AS DATE) AS day,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        hi AS (SELECT max(day) AS hi FROM ev),
        pt AS (
          SELECT user_id, event_type,
                 CAST(count(*) AS BIGINT) AS n_t,
                 sum(CASE WHEN event_type = 'purchase' THEN cents
                     ELSE 0 END) AS pc,
                 max(day) AS last_t
          FROM ev GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(sum(n_t) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN n_t
                        ELSE 0 END) AS BIGINT) AS n_purchases,
               CAST(sum(pc) AS BIGINT) AS purchase_cents,
               CAST(count(*) AS INT) AS n_types,
               CAST(date_diff('day', max(last_t),
                              (SELECT hi FROM hi)) AS INT)
                 AS recency_days,
               split_part(max(lpad(CAST(n_t AS VARCHAR), 12, '0')
                              || ':' || event_type), ':', 2)
                 AS favorite_type
        FROM pt GROUP BY user_id
    """

    # integer-day percentiles: quantile_cont over integers lands on
    # exact quarter grid points, round(.,2) lossless on both engines
    o["ship_latency_percentiles"] = """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_lines,
               round(quantile_cont(days, 0.5), 2) AS p50_days,
               round(quantile_cont(days, 0.95), 2) AS p95_days,
               CAST(max(days) AS INT) AS max_days
        FROM (
          SELECT o.o_orderpriority,
                 date_diff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE)) AS days
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ) t GROUP BY o_orderpriority
    """

    # repeat purchase: stacked distinct rollups restated directly;
    # per-mille uses positive-operand integer division
    o["repeat_purchase_rate"] = """
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n_buyers,
               CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_repeat,
               CAST(1000 * sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0
                               END) // count(*) AS BIGINT)
                 AS repeat_permille
        FROM (
          SELECT l.l_partkey, o.o_custkey,
                 count(DISTINCT l.l_orderkey) AS n_orders
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          GROUP BY 1, 2
        ) b
        GROUP BY l_partkey
        HAVING count(*) >= 5
    """

    o["late_sole_suppliers"] = """
        SELECT s_name, numwait, CAST(rank AS INT) AS rank FROM (
          SELECT s.s_name, b.numwait,
                 row_number() OVER (ORDER BY b.numwait DESC, s.s_name)
                   AS rank
          FROM (
            SELECT l1.l_suppkey, CAST(count(*) AS BIGINT) AS numwait
            FROM (
              SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
              WHERE l_shipdate > TIMESTAMP '1999-06-30'
            ) l1
            WHERE EXISTS (
                    SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey != l1.l_suppkey
                  )
              AND NOT EXISTS (
                    SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey != l1.l_suppkey
                      AND l3.l_shipdate > TIMESTAMP '1999-06-30'
                  )
            GROUP BY l1.l_suppkey
          ) b
          JOIN supplier s ON s.s_suppkey = b.l_suppkey
        ) t WHERE rank <= 20
    """

    o["regional_revenue"] = """
        SELECT n.n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE c.c_nationkey = s.s_nationkey
          AND r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1998-01-01'
          AND o.o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY n.n_name
    """

    o["top_users_by_value"] = """
        SELECT event_type, user_id, total_value,
               CAST(n_events AS BIGINT) AS n_events, CAST(rn AS INT) AS rn
        FROM (
          SELECT event_type, user_id,
                 round(sum(value), 2) AS total_value,
                 count(*) AS n_events,
                 row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY round(sum(value), 2) DESC, user_id
                 ) AS rn
          FROM events
          GROUP BY event_type, user_id
        ) t WHERE rn <= 5
    """

    o["promo_revenue"] = """
        SELECT p.p_brand,
               round(sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END), 2) AS promo_revenue,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    """

    o["discount_band_revenue"] = """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """

    o["revenue_rollup"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """

    from ..operators.analytics import FUNNEL_STAGES, WEEK_S

    from ..operators.analytics import SESSION_GAP_S

    # session close rule: strictly > gap (Spark merges touching
    # windows — same semantics pinned for error_sessions), at the
    # microsecond precision of the events timestamps.
    o["user_sessions"] = f"""
        WITH m AS (
          SELECT user_id, epoch_us(ts) AS us,
                 CASE WHEN lag(epoch_us(ts))
                           OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                           IS NULL
                           OR epoch_us(ts) - lag(epoch_us(ts))
                              OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                              > {SESSION_GAP_S * 1_000_000}
                      THEN 1 ELSE 0 END AS new_s
          FROM events
        ),
        s AS (
          SELECT user_id,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM m
        ),
        per_sess AS (
          SELECT user_id, sid, count(*) AS n_events
          FROM s GROUP BY user_id, sid
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(n_events) AS BIGINT) AS total_events,
               round(sum(n_events) / count(*), 4) AS events_per_session
        FROM per_sess GROUP BY user_id
    """

    # ordering matches the Spark side exactly: epoch_us(ts) is the µs
    # value Spark's nanos→timestamp conversion produces, event_id
    # breaks ties — sub-µs nanos can never reorder a user's sequence.
    o["event_transitions"] = """
        WITH seq AS (
          SELECT event_type AS to_type,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ) AS from_type
          FROM events
        ),
        cnt AS (
          SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
          FROM seq WHERE from_type IS NOT NULL
          GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n,
               CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
                 AS n_from,
               n / sum(n) OVER (PARTITION BY from_type) AS p
        FROM cnt
    """

    o["retention_cohorts"] = f"""
        WITH ev AS (
          SELECT user_id,
                 CAST(floor(epoch(ts) / {WEEK_S}) AS BIGINT) * {WEEK_S} AS week
          FROM events
        ),
        c AS (
          SELECT user_id, week,
                 min(week) OVER (PARTITION BY user_id) AS cohort_week
          FROM ev
        )
        SELECT cohort_week,
               CAST((week - cohort_week) // {WEEK_S} AS INT) AS week_offset,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM c GROUP BY 1, 2
    """

    # chained conditional window mins — same derivation as the Spark
    # side, stage k's min constrained to at-or-after stage k-1's.
    stage_sql = "ev"
    prev = None
    for stage in FUNNEL_STAGES:
        cond = f"event_type = '{stage}'"
        if prev is not None:
            cond += f" AND us >= t_{prev}"
        stage_sql = f"""(SELECT *,
            min(CASE WHEN {cond} THEN us END)
              OVER (PARTITION BY user_id) AS t_{stage}
            FROM {stage_sql})"""
        prev = stage
    branch = " UNION ALL ".join(
        f"SELECT {i} AS stage_idx, '{stage}' AS stage, "
        f"CAST(count(t_{stage}) AS BIGINT) AS n_users FROM pu"
        for i, stage in enumerate(FUNNEL_STAGES)
    )
    o["event_funnel"] = f"""
        WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
                    FROM events),
        pu AS (
          SELECT user_id,
                 {", ".join(f"max(t_{s}) AS t_{s}" for s in FUNNEL_STAGES)}
          FROM {stage_sql} GROUP BY user_id
        )
        {branch}
    """

    # deadline-funnel: the chained conditional mins restated as three
    # nested window levels (each stage's CASE sees the previous
    # stage's min), same integer microsecond arithmetic
    from ..operators.analytics import (
        FUNNEL_CLICK_W_US as _FCW,
        FUNNEL_PURCH_W_US as _FPW,
    )

    o["funnel_time_bounded"] = f"""
        WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
                    FROM events),
        s1 AS (
          SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
                    OVER (PARTITION BY user_id) AS t_view
          FROM ev
        ),
        s2 AS (
          SELECT *, min(CASE WHEN event_type = 'click'
                             AND us >= t_view
                             AND us <= t_view + {_FCW} THEN us END)
                    OVER (PARTITION BY user_id) AS t_click
          FROM s1
        ),
        s3 AS (
          SELECT *, min(CASE WHEN event_type = 'purchase'
                             AND us >= t_click
                             AND us <= t_click + {_FPW} THEN us END)
                    OVER (PARTITION BY user_id) AS t_purch
          FROM s2
        ),
        pu AS (
          SELECT user_id,
                 max(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS v,
                 max(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS c,
                 max(CASE WHEN t_purch IS NOT NULL THEN 1 ELSE 0 END) AS p
          FROM s3 GROUP BY user_id
        ),
        a AS (
          SELECT CAST(sum(v) AS BIGINT) AS nv,
                 CAST(sum(c) AS BIGINT) AS nc,
                 CAST(sum(p) AS BIGINT) AS np
          FROM pu
        )
        SELECT '1_view' AS stage, nv AS n_users,
               CAST(NULL AS BIGINT) AS conv_permille FROM a
        UNION ALL
        SELECT '2_click_1h', nc,
               CASE WHEN nv = 0 THEN 0
                    ELSE CAST(1000 * nc // nv AS BIGINT) END FROM a
        UNION ALL
        SELECT '3_purchase_4h', np,
               CASE WHEN nc = 0 THEN 0
                    ELSE CAST(1000 * np // nc AS BIGINT) END FROM a
    """

    # the per-user state machine must land the batch windows' exact
    # stage counts — shared oracle IS the cross-batch-fold proof
    o["streaming_funnel_state"] = o["funnel_time_bounded"]

    o["event_value_percentiles"] = """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.95), 4) AS p95,
               round(quantile_cont(value, 0.99), 4) AS p99,
               round(avg(value), 4) AS mean,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """

    o["props_json_stats"] = """
        SELECT event_type,
               CAST(count(k) AS BIGINT) AS n_with_k,
               round(avg(k), 4) AS avg_k,
               min(k) AS min_k,
               max(k) AS max_k
        FROM (
          SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INT) AS k
          FROM events
        ) t GROUP BY event_type
    """

    # the VARIANT extraction must equal the JSON-path scan exactly
    o["props_variant_stats"] = o["props_json_stats"]


    o["asof_purchase_before_error"] = """
        SELECT event_id, user_id, err_epoch, last_purchase_epoch,
               err_epoch - last_purchase_epoch AS gap_s
        FROM (
          SELECT event_id, user_id, epoch AS err_epoch, is_purchase,
                 last_value(CASE WHEN is_purchase THEN epoch END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY epoch, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_purchase_epoch
          FROM (
            SELECT event_id, user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
                   event_type = 'purchase' AS is_purchase
            FROM events WHERE event_type IN ('purchase', 'error')
          ) t
        ) u WHERE NOT is_purchase
    """

    # the per-user carry-forward STATE operator must equal the batch
    # window formulation — shared oracle IS the proof
    o["streaming_asof_join"] = o["asof_purchase_before_error"]

    # last-touch attribution: same carry-forward shape, two IGNORE
    # NULLS carries (epoch + type always from the same touch row),
    # channel rollup over exact cents
    from ..operators.analytics import ATTRIB_WINDOW_S

    o["last_touch_attribution"] = f"""
        WITH ev AS (
          SELECT event_id, user_id, event_type,
                 CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 event_type != 'purchase' AS is_touch
          FROM events
        ),
        carried AS (
          SELECT *,
                 last_value(CASE WHEN is_touch THEN epoch END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY epoch, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS touch_epoch,
                 last_value(CASE WHEN is_touch THEN event_type END
                            IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY epoch, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS touch_type
          FROM ev
        ),
        per AS (
          SELECT CASE WHEN touch_epoch IS NOT NULL
                       AND epoch - touch_epoch <= {ATTRIB_WINDOW_S}
                      THEN touch_type ELSE 'direct' END AS channel,
                 CAST(count(*) AS BIGINT) AS n_purchases,
                 CAST(sum(cents) AS BIGINT) AS revenue_cents
          FROM carried WHERE NOT is_touch
          GROUP BY 1
        )
        SELECT channel, n_purchases, revenue_cents,
               CAST(1000 * revenue_cents
                    // (SELECT sum(revenue_cents) FROM per) AS BIGINT)
                 AS revenue_share_pm
        FROM per
    """

    o["late_shipment_priority"] = """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        )
        GROUP BY o_orderpriority
    """

    o["customer_order_distribution"] = """
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
          SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey
        ) t
        GROUP BY c_count
    """

    o["top_suppliers"] = """
        WITH rev AS (
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1998-01-01'
            AND l_shipdate < TIMESTAMP '1998-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """

    o["returned_item_customers"] = """
        SELECT c.c_custkey, c.c_name, r.revenue, c.c_acctbal, n.n_name
        FROM (
          SELECT o.o_custkey,
                 round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                   AS revenue
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_returnflag = 'R'
            AND o.o_orderdate >= TIMESTAMP '1998-01-01'
            AND o.o_orderdate < TIMESTAMP '1998-04-01'
          GROUP BY o.o_custkey
        ) r
        JOIN customer c ON r.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        ORDER BY r.revenue DESC, c.c_custkey
        LIMIT 20
    """

    o["shipmode_priority"] = """
        SELECT l.l_returnflag,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                 AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
          AND l.l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY l.l_returnflag
    """

    from ..operators.analytics import LARGE_ORDER_MIN_QTY

    o["large_orders"] = f"""
        SELECT o.o_orderkey, c.c_custkey, c.c_name, b.total_qty,
               o.o_totalprice
        FROM (
          SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING round(sum(l_quantity), 2) > {LARGE_ORDER_MIN_QTY}
        ) b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """

    from ..operators.analytics import IDLE_CUTOFF

    o["idle_customers"] = f"""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_custs,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (SELECT round(avg(c_acctbal), 4) FROM customer
                             WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}')
        GROUP BY c_mktsegment
    """

    o["event_seasonality"] = """
        SELECT event_type, hod, n,
               CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
                 AS type_total,
               n / CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
                 AS share
        FROM (
          SELECT event_type, CAST(hour(ts) AS INT) AS hod,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ) t
    """

    o["user_activity_pivot"] = """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(count(*) AS BIGINT) AS n_total
        FROM events
        GROUP BY user_id
    """

    # the stream-stream join's single-micro-batch result equals this
    # batch interval join exactly (see batch_bridge docstring)
    o["streaming_purchase_error_join"] = """
        SELECT p.user_id,
               p.event_id AS purchase_id,
               e.event_id AS error_id,
               epoch_us(p.ts) AS purchase_us,
               epoch_us(e.ts) AS error_us,
               round(p.value, 2) AS purchase_value
        FROM events p
        JOIN events e ON e.user_id = p.user_id
                     AND e.event_type = 'error'
                     AND e.ts >= p.ts
                     AND e.ts <= p.ts + INTERVAL 4 HOUR
        WHERE p.event_type = 'purchase'
    """

    # the outer variant: sentinel-advanced watermark flushes every
    # unmatched purchase, so the streaming result equals this batch
    # LEFT JOIN exactly (see streaming_purchase_error_left_join)
    o["streaming_purchase_error_left_join"] = """
        SELECT p.user_id,
               p.event_id AS purchase_id,
               e.event_id AS error_id,
               epoch_us(p.ts) AS purchase_us,
               epoch_us(e.ts) AS error_us,
               round(p.value, 2) AS purchase_value
        FROM events p
        LEFT JOIN events e ON e.user_id = p.user_id
                          AND e.event_type = 'error'
                          AND e.ts >= p.ts
                          AND e.ts <= p.ts + INTERVAL 4 HOUR
        WHERE p.event_type = 'purchase'
    """

    # full outer: both sides' unmatched rows must surface — the
    # streaming sentinel machinery now proves outer emission for the
    # error store too
    o["streaming_purchase_error_full_join"] = """
        SELECT coalesce(p.user_id, e.user_id) AS user_id,
               p.event_id AS purchase_id,
               e.event_id AS error_id,
               epoch_us(p.ts) AS purchase_us,
               epoch_us(e.ts) AS error_us,
               round(p.value, 2) AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        FULL JOIN (SELECT * FROM events WHERE event_type = 'error') e
          ON e.user_id = p.user_id
         AND e.ts >= p.ts
         AND e.ts <= p.ts + INTERVAL 4 HOUR
    """

    # KM risk table over inter-purchase gaps: per-user lead, horizon
    # censoring, day-offset rollup + descending tail sum restated
    # directly; hazard is positive //
    o["purchase_gap_hazard"] = """
        WITH ev AS (
          SELECT user_id, event_id, ts, event_type,
                 CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
          FROM events
        ),
        p AS (
          SELECT user_id, day,
                 lead(day) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS nxt
          FROM ev WHERE event_type = 'purchase'
        ),
        horizon AS (SELECT max(day) AS end_day FROM ev),
        lt AS (
          SELECT CASE WHEN p.nxt IS NOT NULL THEN 1 ELSE 0 END
                   AS observed,
                 CASE WHEN p.nxt IS NOT NULL THEN p.nxt - p.day
                      ELSE h.end_day - p.day END AS day_offset
          FROM p, horizon h
        ),
        per_t AS (
          SELECT day_offset,
                 CAST(count(*) AS BIGINT) AS n_ending,
                 CAST(sum(observed) AS BIGINT) AS n_repurchases
          FROM lt GROUP BY day_offset
        )
        SELECT day_offset,
               CAST(sum(n_ending) OVER (ORDER BY day_offset DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS at_risk,
               n_repurchases,
               CAST(1000 * n_repurchases
                    // sum(n_ending) OVER (ORDER BY day_offset DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS hazard_permille
        FROM per_t
    """

    # weighted quartiles: identical rollup → cumsum → integer
    # threshold chain; first() on the joined total is just the total
    o["weighted_price_quartiles"] = """
        WITH roll AS (
          SELECT l_returnflag,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
          FROM lineitem GROUP BY 1, 2
        ),
        cum AS (
          SELECT *, sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw
          FROM roll
        ),
        tot AS (
          SELECT l_returnflag, CAST(sum(w) AS BIGINT) AS total_w
          FROM roll GROUP BY 1
        )
        SELECT c.l_returnflag,
               CAST(t.total_w AS BIGINT) AS total_weight,
               CAST(min(CASE WHEN 4 * c.cw >= 1 * t.total_w
                             THEN c.cents END) AS BIGINT) AS q1_cents,
               CAST(min(CASE WHEN 4 * c.cw >= 2 * t.total_w
                             THEN c.cents END) AS BIGINT) AS median_cents,
               CAST(min(CASE WHEN 4 * c.cw >= 3 * t.total_w
                             THEN c.cents END) AS BIGINT) AS q3_cents
        FROM cum c JOIN tot t USING (l_returnflag)
        GROUP BY c.l_returnflag, t.total_w
    """

    # two-level exact median (same quantile_cont parity as
    # event_value_percentiles); both medians rounded before reuse so
    # dev and the 3*MAD threshold are identical IEEE ops in both
    # engines
    o["value_outliers_robust"] = """
        WITH med AS (
          SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med
          FROM events GROUP BY 1
        ), dev AS (
          SELECT e.event_id, e.event_type, e.value, m.med,
                 round(abs(e.value - m.med), 4) AS dev
          FROM events e JOIN med m USING (event_type)
        ), mad AS (
          SELECT event_type, round(quantile_cont(dev, 0.5), 4) AS mad
          FROM dev GROUP BY 1
        )
        SELECT d.event_id, d.event_type, d.value, d.med, d.dev, m.mad
        FROM dev d JOIN mad m USING (event_type)
        WHERE d.dev > 3 * m.mad
    """

    o["revenue_growth"] = """
        SELECT strftime(month, '%Y-%m-%d') AS month, revenue, n_orders,
               round(revenue - lag(revenue) OVER (ORDER BY month), 2)
                 AS growth_abs,
               round(revenue / lag(revenue) OVER (ORDER BY month) - 1, 4)
                 AS growth_pct
        FROM (
          SELECT date_trunc('month', o_orderdate) AS month,
                 round(sum(o_totalprice), 2) AS revenue,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1
        ) t
    """

    # independent derivation: a day-dim range join instead of the
    # Spark side's bounded x7 contribution fanout
    o["rolling_active_users"] = """
        WITH ud AS (
          SELECT DISTINCT
                 CAST(epoch_us(ts) // 86400000000 AS INT) AS dday,
                 user_id
          FROM events
        ), days AS (SELECT DISTINCT dday FROM ud)
        SELECT d.dday AS day_end,
               CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_active
        FROM days d
        JOIN ud u ON u.dday BETWEEN d.dday - 6 AND d.dday
        GROUP BY 1
    """

    # Q2-style groupwise-min: unit price is a single IEEE division per
    # row and MIN is order-independent, so no rounding is needed
    o["min_cost_supplier"] = """
        WITH rsupp AS (
          SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
          FROM supplier s
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'EUROPE'
        ), fpart AS (
          SELECT p_partkey, p_name FROM part
          WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
        ), offers AS (
          SELECT l.l_partkey, l.l_suppkey,
                 min(l.l_extendedprice / l.l_quantity) AS min_unit_price
          FROM lineitem l
          JOIN fpart p ON p.p_partkey = l.l_partkey
          JOIN rsupp s ON s.s_suppkey = l.l_suppkey
          GROUP BY 1, 2
        ), best AS (
          SELECT l_partkey, l_suppkey, min_unit_price,
                 row_number() OVER (
                   PARTITION BY l_partkey
                   ORDER BY min_unit_price, l_suppkey
                 ) AS rn
          FROM offers
        )
        SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_name,
               b.min_unit_price
        FROM best b
        JOIN rsupp s ON s.s_suppkey = b.l_suppkey
        JOIN fpart p ON p.p_partkey = b.l_partkey
        WHERE b.rn = 1
        ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
        LIMIT 100
    """

    o["profit_by_nation"] = """
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)
                         - 0.1 * p.p_retailprice * l.l_quantity), 2)
                 AS sum_profit,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
                   AND p.p_name LIKE 'red%'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    """

    # Q11-style scalar-subquery threshold in exact integer arithmetic:
    # per-part value snapped to ten-thousandth units, 1000*value > total
    o["important_parts"] = """
        WITH nsupp AS (
          SELECT s.s_suppkey
          FROM supplier s
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
          WHERE r.r_name = 'EUROPE'
        ), pv AS (
          SELECT l.l_partkey AS p_partkey,
                 CAST(round(sum(l.l_extendedprice * (1 - l.l_discount))
                            * 10000) AS BIGINT) AS value_du,
                 CAST(count(*) AS BIGINT) AS n_lines
          FROM lineitem l
          JOIN nsupp s ON s.s_suppkey = l.l_suppkey
          GROUP BY 1
        ), tot AS (SELECT sum(value_du) AS total_du FROM pv)
        SELECT p_partkey,
               round(value_du / 10000.0, 2) AS part_value,
               n_lines
        FROM pv, tot
        WHERE value_du * 1000 > total_du
    """

    o["supplier_part_counts"] = """
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part p ON p.p_partkey = ps.l_partkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
          AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
          AND ps.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
    """

    # Q20-style: 2*supp_qty > part_qty over integer-valued quantities
    # is exact in doubles — no boundary flips between engines
    o["dominant_part_suppliers"] = """
        WITH red AS (
          SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        ), pairs AS (
          SELECT l.l_partkey, l.l_suppkey, sum(l.l_quantity) AS supp_qty
          FROM lineitem l
          JOIN red p ON p.p_partkey = l.l_partkey
          WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY 1, 2
        ), wp AS (
          SELECT l_partkey, l_suppkey, supp_qty,
                 sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty,
                 count(*) OVER (PARTITION BY l_partkey) AS n_supp
          FROM pairs
        ), dom AS (
          SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_parts_dominated
          FROM wp
          WHERE n_supp >= 2 AND 2 * supp_qty > part_qty
          GROUP BY 1
        )
        SELECT s.s_name, n.n_name AS nation, d.n_parts_dominated
        FROM dom d
        JOIN supplier s ON s.s_suppkey = d.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    """

    # Mirrors operators/analytics.revenue_cube: DuckDB GROUPING()'s
    # bit vector (first argument = MSB) matches Spark's grouping_id().
    o["revenue_cube"] = """
        SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """

    # decimal money: identical explicit casts pin every scale; no
    # round() anywhere — exactness IS the protocol
    o["pricing_summary_decimal"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(qty) * 100 AS BIGINT) AS sum_qty_c2,
               CAST(sum(price) * 100 AS BIGINT) AS sum_base_c2,
               CAST(sum(CAST(price * (CAST(1 AS DECIMAL(12,2)) - disc)
                    AS DECIMAL(20,4))) * 10000 AS BIGINT)
                 AS sum_disc_price_c4,
               CAST(sum(CAST(price * (CAST(1 AS DECIMAL(12,2)) - disc)
                             * (CAST(1 AS DECIMAL(12,2)) + tax)
                    AS DECIMAL(24,6))) * 1000000 AS BIGINT)
                 AS sum_charge_c6,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM (
          SELECT l_returnflag, l_linestatus,
                 CAST(l_quantity AS DECIMAL(12,2)) AS qty,
                 CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
                 CAST(l_discount AS DECIMAL(12,2)) AS disc,
                 CAST(l_tax AS DECIMAL(12,2)) AS tax
          FROM lineitem
        ) t
        GROUP BY 1, 2
    """

    o["revenue_grouping_sets"] = """
        SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """

    # bloom_pruned_join's oracle is the PLAIN join: Bloom membership
    # is a strict superset of true membership, so the pruned plan must
    # hash-match the unpruned semantics exactly.
    o["bloom_pruned_join"] = """
        SELECT l.l_linestatus,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY l.l_linestatus
    """

    from ..operators.analytics import HV_VALUE_MIN, HV_WINDOW_S

    # interval_overlap_join's oracle is the naive inequality join the
    # binned plan replaces — semantics identical, O(|A|*|B|) shape.
    o["interval_overlap_join"] = f"""
        WITH hv AS (
          SELECT event_id AS hv_event_id, user_id AS hv_user_id,
                 epoch_us(ts) - {HV_WINDOW_S * 1_000_000} AS lo_us,
                 epoch_us(ts) + {HV_WINDOW_S * 1_000_000} AS hi_us
          FROM events
          WHERE event_type = 'purchase' AND value > {HV_VALUE_MIN}
        ), err AS (
          SELECT event_id AS err_event_id, user_id AS err_user_id,
                 epoch_us(ts) AS err_us
          FROM events WHERE event_type = 'error'
        ), hits AS (
          SELECT hv.hv_event_id,
                 CAST(count(*) AS BIGINT) AS n_errors,
                 CAST(count(DISTINCT err.err_user_id) AS BIGINT)
                   AS n_err_users
          FROM hv JOIN err
            ON err.err_us >= hv.lo_us AND err.err_us <= hv.hi_us
          GROUP BY 1
        )
        SELECT hv.hv_event_id, hv.hv_user_id,
               COALESCE(h.n_errors, 0) AS n_errors,
               COALESCE(h.n_err_users, 0) AS n_err_users
        FROM hv LEFT JOIN hits h USING (hv_event_id)
    """

    from ..sources.silver import (
        ZORDER_U_HI,
        ZORDER_U_LO,
        ZORDER_V_HI,
        ZORDER_V_LO,
    )


    o["table_profile"] = """
        WITH wide AS (
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
            CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id__nulls,
            CAST(count(DISTINCT event_id) AS BIGINT) AS event_id__ndv,
            CAST(min(event_id) AS VARCHAR) AS event_id__min,
            CAST(max(event_id) AS VARCHAR) AS event_id__max,
            CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id__nulls,
            CAST(count(DISTINCT user_id) AS BIGINT) AS user_id__ndv,
            CAST(min(user_id) AS VARCHAR) AS user_id__min,
            CAST(max(user_id) AS VARCHAR) AS user_id__max,
            CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type__nulls,
            CAST(count(DISTINCT event_type) AS BIGINT) AS event_type__ndv,
            CAST(min(event_type) AS VARCHAR) AS event_type__min,
            CAST(max(event_type) AS VARCHAR) AS event_type__max,
            CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value__nulls,
            CAST(count(DISTINCT value) AS BIGINT) AS value__ndv,
            CAST(min(value) AS VARCHAR) AS value__min,
            CAST(max(value) AS VARCHAR) AS value__max,
            CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props__nulls,
            CAST(count(DISTINCT props) AS BIGINT) AS props__ndv,
            CAST(min(props) AS VARCHAR) AS props__min,
            CAST(max(props) AS VARCHAR) AS props__max
          FROM events
        )
          SELECT 'event_id' AS "column", n_rows, event_id__nulls AS n_nulls,
                 event_id__ndv AS n_distinct, event_id__min AS min_value,
                 event_id__max AS max_value FROM wide
          UNION ALL
          SELECT 'user_id' AS "column", n_rows, user_id__nulls AS n_nulls,
                 user_id__ndv AS n_distinct, user_id__min AS min_value,
                 user_id__max AS max_value FROM wide
          UNION ALL
          SELECT 'event_type' AS "column", n_rows, event_type__nulls AS n_nulls,
                 event_type__ndv AS n_distinct, event_type__min AS min_value,
                 event_type__max AS max_value FROM wide
          UNION ALL
          SELECT 'value' AS "column", n_rows, value__nulls AS n_nulls,
                 value__ndv AS n_distinct, value__min AS min_value,
                 value__max AS max_value FROM wide
          UNION ALL
          SELECT 'props' AS "column", n_rows, props__nulls AS n_nulls,
                 props__ndv AS n_distinct, props__min AS min_value,
                 props__max AS max_value FROM wide
    """

    o["constraint_checks"] = """
        SELECT 'fk_lineitem_orders' AS "check",
               CAST(count(*) AS BIGINT) AS n_violations,
               count(*) = 0 AS passed
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        UNION ALL
        SELECT 'fk_orders_customer', CAST(count(*) AS BIGINT),
               count(*) = 0
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
        UNION ALL
        SELECT 'pk_orders_unique', CAST(count(*) AS BIGINT), count(*) = 0
        FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey
              HAVING count(*) > 1) t
        UNION ALL
        SELECT 'pk_lineitem_unique', CAST(count(*) AS BIGINT),
               count(*) = 0
        FROM (SELECT l_orderkey, l_linenumber FROM lineitem
              GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1) t
        UNION ALL
        SELECT 'lineitem_ranges', CAST(count(*) AS BIGINT), count(*) = 0
        FROM lineitem
        WHERE l_quantity <= 0 OR l_discount < 0 OR l_discount > 1
    """

    # interval cardinality via the same delta encoding: +1 at order
    # date, −1 at last shipment, running sum over the day rollup
    o["open_orders_timeline"] = """
        WITH iv AS (
          SELECT o.o_orderkey,
                 CAST(o.o_orderdate AS DATE) AS start_d,
                 CAST(max(l.l_shipdate) AS DATE) AS end_d
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2
        ), deltas AS (
          SELECT start_d AS day, 1 AS d FROM iv
          UNION ALL
          SELECT end_d AS day, -1 AS d FROM iv
        ), daily AS (
          SELECT day,
                 CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_starts,
                 CAST(sum(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ends,
                 sum(d) AS net
          FROM deltas GROUP BY day
        )
        SELECT strftime(day, '%Y-%m-%d') AS day, n_starts, n_ends,
               CAST(sum(net) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS n_open
        FROM daily
    """

    o["user_value_deciles"] = """
        WITH per_user AS (
          SELECT user_id, round(sum(value), 2) AS total_value
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id
        ), banded AS (
          SELECT total_value,
                 ntile(10) OVER (ORDER BY total_value DESC, user_id)
                   AS decile
          FROM per_user
        )
        SELECT CAST(decile AS INT) AS decile,
               CAST(count(*) AS BIGINT) AS n_users,
               round(sum(total_value), 2) AS sum_value,
               min(total_value) AS min_value,
               max(total_value) AS max_value
        FROM banded GROUP BY decile
    """

    # Mirrors sources/silver.schema_evolution_read: the same modular
    # drop split recomputed from the source table.
    # partition-layout evolution: the seam-spanning rollup restated
    # straight from the source table (same exact-integer midpoint)
    o["partition_evolution_read"] = """
        WITH ev AS (
          SELECT event_type,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
          FROM events
        ),
        b AS (SELECT (min(d) + max(d)) // 2 AS mid FROM ev)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT d) AS BIGINT) AS n_days,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM ev, b
        WHERE d BETWEEN mid - 3 AND mid + 3
        GROUP BY event_type
    """

    o["schema_evolution_read"] = """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_pre_evolution,
               CAST(count(DISTINCT CASE WHEN event_id % 2 = 1
                 THEN 'ch' || CAST(user_id % 4 AS VARCHAR) END)
                 AS BIGINT) AS n_channels,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY event_type
    """

    # zorder_layout's oracle recomputes the 2-D probe straight from
    # the source table — the z-ordered rewrite must be a pure layout
    # change (u_bucket = user_id & 255 on both engines).
    o["zorder_layout"] = f"""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               round(sum(value), 2) AS sum_value
        FROM events
        WHERE (user_id & 255) >= {ZORDER_U_LO}
          AND (user_id & 255) <= {ZORDER_U_HI}
          AND value >= {ZORDER_V_LO} AND value < {ZORDER_V_HI}
        GROUP BY event_type
    """
    # zone-map skipping census: epoch-day integers everywhere; probe
    # bounds are the SAME precomputed constants the Spark side embeds
    o["zone_map_skip_stats"] = """
        WITH base AS (
          SELECT o_orderkey,
                 date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS eday
          FROM orders
        ),
        b AS (SELECT min(eday) AS lo, max(eday) AS hi FROM base),
        assigned AS (
          SELECT eday,
                 CAST((eday - lo) * 32 // (hi - lo + 1) AS BIGINT)
                   AS clustered,
                 CAST(o_orderkey % 32 AS BIGINT) AS hashed
          FROM base, b
        ),
        u AS (
          SELECT eday, 'clustered' AS layout, clustered AS file_id
          FROM assigned
          UNION ALL
          SELECT eday, 'hashed', hashed FROM assigned
        ),
        zones AS (
          SELECT layout, file_id, min(eday) AS f_min, max(eday) AS f_max,
                 count(*) AS n_rows
          FROM u GROUP BY 1, 2
        ),
        probes(probe, p_lo, p_hi) AS (VALUES ('day', 10027, 10027), ('month', 9556, 9586), ('quarter', 10227, 10316), ('year', 10957, 11322)),
        per AS (
          SELECT layout, probe,
                 CAST(count(*) AS BIGINT) AS files_total,
                 CAST(sum(CASE WHEN f_max < p_lo OR f_min > p_hi
                          THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped,
                 CAST(sum(CASE WHEN f_max < p_lo OR f_min > p_hi
                          THEN 0 ELSE n_rows END) AS BIGINT)
                   AS rows_scanned
          FROM zones CROSS JOIN probes GROUP BY 1, 2
        ),
        m AS (
          SELECT probe, CAST(count(*) AS BIGINT) AS rows_matched
          FROM base JOIN probes ON eday BETWEEN p_lo AND p_hi
          GROUP BY 1
        )
        SELECT layout, probe, files_total, files_skipped, rows_scanned,
               COALESCE(rows_matched, 0) AS rows_matched
        FROM per LEFT JOIN m USING (probe)
    """
    # ANALYZE-style NDV stats: same md5 KMV arithmetic as
    # distinct_users_kmv, generalized over (table, column) pairs —
    # string tiebreak 'v' mirrors Spark's orderBy("h", "v")
    o["table_ndv_kmv"] = f"""
        WITH lf AS (
          SELECT 'lineitem' AS tbl, 'l_orderkey' AS col, CAST(l_orderkey AS VARCHAR) AS v FROM lineitem WHERE l_orderkey IS NOT NULL
          UNION ALL
          SELECT 'lineitem' AS tbl, 'l_suppkey' AS col, CAST(l_suppkey AS VARCHAR) AS v FROM lineitem WHERE l_suppkey IS NOT NULL
          UNION ALL
          SELECT 'orders' AS tbl, 'o_custkey' AS col, CAST(o_custkey AS VARCHAR) AS v FROM orders WHERE o_custkey IS NOT NULL
          UNION ALL
          SELECT 'orders' AS tbl, 'o_orderpriority' AS col, CAST(o_orderpriority AS VARCHAR) AS v FROM orders WHERE o_orderpriority IS NOT NULL
          UNION ALL
          SELECT 'events' AS tbl, 'user_id' AS col, CAST(user_id AS VARCHAR) AS v FROM events WHERE user_id IS NOT NULL
          UNION ALL
          SELECT 'events' AS tbl, 'event_type' AS col, CAST(event_type AS VARCHAR) AS v FROM events WHERE event_type IS NOT NULL
          UNION ALL
          SELECT 'documents' AS tbl, 'source' AS col, CAST(source AS VARCHAR) AS v FROM documents WHERE source IS NOT NULL
          UNION ALL
          SELECT 'documents' AS tbl, 'lang' AS col, CAST(lang AS VARCHAR) AS v FROM documents WHERE lang IS NOT NULL
        ),
        stats AS (
          SELECT tbl, col, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(count(DISTINCT v) AS BIGINT) AS ndv_exact
          FROM lf GROUP BY 1, 2
        ),
        d AS (SELECT DISTINCT tbl, col, v FROM lf),
        hashed AS (
          SELECT tbl, col, v,
                 CAST('0x' || substr(md5(v || ':kmv'), 1, 12) AS BIGINT)
                   AS h
          FROM d
        ),
        ranked AS (
          SELECT tbl, col, h,
                 row_number() OVER (PARTITION BY tbl, col
                                    ORDER BY h, v) AS rk
          FROM hashed
        ),
        sk AS (
          SELECT tbl, col, CAST(count(*) AS BIGINT) AS n_kept,
                 CAST(max(h) AS BIGINT) AS kth_hash
          FROM ranked WHERE rk <= {KMV_K} GROUP BY 1, 2
        )
        SELECT tbl, col, n_rows, ndv_exact, n_kept, kth_hash,
               CAST(CASE WHEN n_kept < {KMV_K} THEN n_kept
                    ELSE (({KMV_K} - 1) * {KMV_SPACE}) // kth_hash
                    END AS BIGINT) AS est_ndv
        FROM sk JOIN stats USING (tbl, col)
    """
    # System R containment estimate vs ground truth; integer div both
    # sides (operands non-negative, so // == div here)
    o["join_cardinality_eval"] = """
        SELECT 'orders_lineitem' AS join_name, n_left, n_right, ndv_left,
               ndv_right,
               CAST(n_left * n_right //
                    greatest(ndv_left, ndv_right) AS BIGINT) AS est_rows,
               actual_rows,
               CAST(1000 * (CAST(n_left * n_right //
                      greatest(ndv_left, ndv_right) AS BIGINT)
                      - actual_rows) AS DOUBLE) / actual_rows
                 AS err_permille
        FROM (SELECT CAST(count(*) AS BIGINT) AS n_left,
                     CAST(count(DISTINCT o_orderkey) AS BIGINT) AS ndv_left
              FROM orders WHERE o_orderkey IS NOT NULL) a
        CROSS JOIN
             (SELECT CAST(count(*) AS BIGINT) AS n_right,
                     CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ndv_right
              FROM lineitem WHERE l_orderkey IS NOT NULL) b
        CROSS JOIN
             (SELECT CAST(count(*) AS BIGINT) AS actual_rows
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey) c
        UNION ALL

        SELECT 'customer_orders' AS join_name, n_left, n_right, ndv_left,
               ndv_right,
               CAST(n_left * n_right //
                    greatest(ndv_left, ndv_right) AS BIGINT) AS est_rows,
               actual_rows,
               CAST(1000 * (CAST(n_left * n_right //
                      greatest(ndv_left, ndv_right) AS BIGINT)
                      - actual_rows) AS DOUBLE) / actual_rows
                 AS err_permille
        FROM (SELECT CAST(count(*) AS BIGINT) AS n_left,
                     CAST(count(DISTINCT c_custkey) AS BIGINT) AS ndv_left
              FROM customer WHERE c_custkey IS NOT NULL) a
        CROSS JOIN
             (SELECT CAST(count(*) AS BIGINT) AS n_right,
                     CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_right
              FROM orders WHERE o_custkey IS NOT NULL) b
        CROSS JOIN
             (SELECT CAST(count(*) AS BIGINT) AS actual_rows
              FROM customer JOIN orders ON c_custkey = o_custkey) c
        UNION ALL

        SELECT 'part_lineitem' AS join_name, n_left, n_right, ndv_left,
               ndv_right,
               CAST(n_left * n_right //
                    greatest(ndv_left, ndv_right) AS BIGINT) AS est_rows,
               actual_rows,
               CAST(1000 * (CAST(n_left * n_right //
                      greatest(ndv_left, ndv_right) AS BIGINT)
                      - actual_rows) AS DOUBLE) / actual_rows
                 AS err_permille
        FROM (SELECT CAST(count(*) AS BIGINT) AS n_left,
                     CAST(count(DISTINCT p_partkey) AS BIGINT) AS ndv_left
              FROM part WHERE p_partkey IS NOT NULL) a
        CROSS JOIN
             (SELECT CAST(count(*) AS BIGINT) AS n_right,
                     CAST(count(DISTINCT l_partkey) AS BIGINT) AS ndv_right
              FROM lineitem WHERE l_partkey IS NOT NULL) b
        CROSS JOIN
             (SELECT CAST(count(*) AS BIGINT) AS actual_rows
              FROM part JOIN lineitem ON p_partkey = l_partkey) c
    """
    # equi-depth boundaries: cumsum over the distinct-cents rollup,
    # smallest value reaching each floor-div rank target
    o["column_histogram_equidepth"] = """
        WITH roll AS (
          SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                 count(*) AS cnt
          FROM lineitem GROUP BY 1
        ),
        cum AS (
          SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum FROM roll
        ),
        n AS (SELECT sum(cnt) AS n FROM roll),
        t AS (
          SELECT bucket, (bucket * n) // 16 AS r
          FROM (SELECT unnest(range(1, 17)) AS bucket) b, n
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(min(cents) AS BIGINT) AS ub_cents,
               CAST(min_by(cum, cents) AS BIGINT) AS cum_rows
        FROM cum JOIN t ON cum >= r
        GROUP BY bucket
    """
    # range selectivity from the stored equi-depth histogram: same
    # bucket derivation (lag windows), same integer interpolation,
    # same degenerate point-mass rule
    o["range_selectivity_eval"] = """
        WITH roll AS (
          SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                 count(*) AS cnt
          FROM lineitem GROUP BY 1
        ),
        cum AS (
          SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum FROM roll
        ),
        n AS (SELECT sum(cnt) AS n FROM roll),
        t AS (
          SELECT bucket, (bucket * n) // 16 AS r
          FROM (SELECT unnest(range(1, 17)) AS bucket) b, n
        ),
        hist AS (
          SELECT CAST(bucket AS BIGINT) AS bucket,
                 CAST(min(cents) AS BIGINT) AS ub,
                 CAST(min_by(cum, cents) AS BIGINT) AS cum_rows
          FROM cum JOIN t ON cum >= r
          GROUP BY bucket
        ),
        mn AS (SELECT min(cents) AS min_cents FROM roll),
        buckets AS (
          SELECT bucket,
                 coalesce(lag(ub) OVER (ORDER BY bucket) + 1,
                          min_cents) AS lb,
                 ub,
                 cum_rows - coalesce(lag(cum_rows)
                   OVER (ORDER BY bucket), 0) AS depth
          FROM hist, mn
        ),
        probes(probe, lo, hi) AS (VALUES ('low', 1, 150000), ('narrow', 1000000, 1100000), ('mid', 2000000, 4000000), ('tail', 9000000, 20000000)),
        est AS (
          SELECT probe,
                 CAST(sum(CASE
                   WHEN lb > ub THEN
                     CASE WHEN ub BETWEEN lo AND hi THEN depth ELSE 0 END
                   WHEN least(hi, ub) >= greatest(lo, lb) THEN
                     depth * (least(hi, ub) - greatest(lo, lb) + 1)
                       // (ub - lb + 1)
                   ELSE 0 END) AS BIGINT) AS est_rows
          FROM buckets CROSS JOIN probes GROUP BY probe
        ),
        act AS (
          SELECT probe, CAST(count(*) AS BIGINT) AS actual_rows
          FROM (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                  AS cents FROM lineitem) li
          JOIN probes ON cents BETWEEN lo AND hi
          GROUP BY probe
        )
        SELECT probe, lo, hi,
               coalesce(est_rows, 0) AS est_rows,
               coalesce(actual_rows, 0) AS actual_rows,
               CAST(1000 * (coalesce(est_rows, 0)
                    - coalesce(actual_rows, 0)) AS DOUBLE)
                 / greatest(coalesce(actual_rows, 0), 1)
                 AS err_permille
        FROM probes
        LEFT JOIN est USING (probe)
        LEFT JOIN act USING (probe)
    """
    # encoding decision: same unpivot scan; bits via length(bin(n-1))
    # (identical binary rendering both engines), integer byte model
    o["encoding_plan_census"] = """
        WITH lf AS (
          SELECT 'lineitem' AS tbl, 'l_orderkey' AS col, CAST(l_orderkey AS VARCHAR) AS v FROM lineitem WHERE l_orderkey IS NOT NULL
          UNION ALL
          SELECT 'lineitem' AS tbl, 'l_suppkey' AS col, CAST(l_suppkey AS VARCHAR) AS v FROM lineitem WHERE l_suppkey IS NOT NULL
          UNION ALL
          SELECT 'orders' AS tbl, 'o_custkey' AS col, CAST(o_custkey AS VARCHAR) AS v FROM orders WHERE o_custkey IS NOT NULL
          UNION ALL
          SELECT 'orders' AS tbl, 'o_orderpriority' AS col, CAST(o_orderpriority AS VARCHAR) AS v FROM orders WHERE o_orderpriority IS NOT NULL
          UNION ALL
          SELECT 'events' AS tbl, 'user_id' AS col, CAST(user_id AS VARCHAR) AS v FROM events WHERE user_id IS NOT NULL
          UNION ALL
          SELECT 'events' AS tbl, 'event_type' AS col, CAST(event_type AS VARCHAR) AS v FROM events WHERE event_type IS NOT NULL
          UNION ALL
          SELECT 'documents' AS tbl, 'source' AS col, CAST(source AS VARCHAR) AS v FROM documents WHERE source IS NOT NULL
          UNION ALL
          SELECT 'documents' AS tbl, 'lang' AS col, CAST(lang AS VARCHAR) AS v FROM documents WHERE lang IS NOT NULL
        ),
        stats AS (
          SELECT tbl, col, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(length(v)) AS BIGINT) AS plain_bytes
          FROM lf GROUP BY 1, 2
        ),
        dstats AS (
          SELECT tbl, col, CAST(count(*) AS BIGINT) AS ndv,
                 CAST(sum(length(v)) AS BIGINT) AS dict_page_bytes
          FROM (SELECT DISTINCT tbl, col, v FROM lf) d GROUP BY 1, 2
        )
        SELECT tbl, col, n_rows, ndv,
               CAST(length(bin(ndv - 1)) AS BIGINT) AS bits_per_value,
               plain_bytes,
               CAST((n_rows * length(bin(ndv - 1)) + 7) // 8
                    + dict_page_bytes AS BIGINT) AS dict_bytes,
               CAST(CASE WHEN (n_rows * length(bin(ndv - 1)) + 7) // 8
                         + dict_page_bytes < plain_bytes
                    THEN 1 ELSE 0 END AS BIGINT) AS use_dict
        FROM stats JOIN dstats USING (tbl, col)
    """

    # RFM segmentation: exact cumulative-histogram quartiles — t_k is
    # the min value whose cum count reaches k*n/4 (4*cum >= k*n stays
    # integer); ties share a segment, so no ntile / row-order hazard.
    # Monetary thresholds on whole units (cents // 100) like Spark.
    def _rfm_thr(col: str) -> str:
        return f"""(
          SELECT min(CASE WHEN 4 * cum >= 1 * n THEN v END) AS t1,
                 min(CASE WHEN 4 * cum >= 2 * n THEN v END) AS t2,
                 min(CASE WHEN 4 * cum >= 3 * n THEN v END) AS t3
          FROM (
            SELECT v, sum(c) OVER (ORDER BY v) AS cum,
                   sum(c) OVER () AS n
            FROM (SELECT {col} AS v, count(*) AS c FROM m GROUP BY 1) h
          ) cw
        )"""

    o["user_rfm_segments"] = f"""
        WITH ev AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
                 event_type,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        um AS (
          SELECT user_id, max(epoch) AS last_epoch,
                 CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
                          ELSE 0 END) AS BIGINT) AS purchase_cents
          FROM ev GROUP BY user_id
        ),
        m AS (
          SELECT user_id,
                 (SELECT max(epoch) FROM ev) - last_epoch AS recency_s,
                 n_events, purchase_cents,
                 purchase_cents // 100 AS mon_units
          FROM um
        ),
        rt AS {_rfm_thr("recency_s")},
        ft AS {_rfm_thr("n_events")},
        mt AS {_rfm_thr("mon_units")}
        SELECT CAST(1 + (m.recency_s > rt.t1)::int
                      + (m.recency_s > rt.t2)::int
                      + (m.recency_s > rt.t3)::int AS INT) AS r_seg,
               CAST(1 + (m.n_events > ft.t1)::int
                      + (m.n_events > ft.t2)::int
                      + (m.n_events > ft.t3)::int AS INT) AS f_seg,
               CAST(1 + (m.mon_units > mt.t1)::int
                      + (m.mon_units > mt.t2)::int
                      + (m.mon_units > mt.t3)::int AS INT) AS m_seg,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(m.n_events) AS BIGINT) AS sum_events,
               CAST(sum(m.purchase_cents) AS BIGINT)
                 AS sum_purchase_cents
        FROM m, rt, ft, mt
        GROUP BY 1, 2, 3
    """

    # KS drift: same integer-midpoint era split as value_drift_eras;
    # the statistic stays an integer numerator until one division
    o["value_ks_drift"] = """
        WITH e AS (
          SELECT event_type, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS epoch
          FROM events
        ),
        mid AS (
          SELECT (min(epoch) + max(epoch)) // 2 AS m FROM e
        ),
        per_val AS (
          SELECT event_type, value,
                 CAST(sum(CASE WHEN epoch < (SELECT m FROM mid)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_e,
                 CAST(sum(CASE WHEN epoch >= (SELECT m FROM mid)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_l
          FROM e GROUP BY 1, 2
        ),
        scored AS (
          SELECT event_type, value,
                 sum(n_e) OVER (PARTITION BY event_type) AS n_early,
                 sum(n_l) OVER (PARTITION BY event_type) AS n_late,
                 abs(sum(n_e) OVER w * sum(n_l)
                       OVER (PARTITION BY event_type)
                     - sum(n_l) OVER w * sum(n_e)
                       OVER (PARTITION BY event_type)) AS ks_num
          FROM per_val
          WINDOW w AS (PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        top AS (
          SELECT event_type, n_early, n_late, max(ks_num) AS ks_num
          FROM scored GROUP BY 1, 2, 3
        )
        SELECT s.event_type,
               CAST(s.n_early AS BIGINT) AS n_early,
               CAST(s.n_late AS BIGINT) AS n_late,
               CAST(s.ks_num AS BIGINT) AS ks_num,
               s.ks_num / (s.n_early * s.n_late) AS d_stat,
               min(s.value) AS at_value
        FROM scored s JOIN top t
          ON s.event_type = t.event_type AND s.ks_num = t.ks_num
        GROUP BY 1, 2, 3, 4, 5
    """

    # Mann-Whitney: the doubled-midrank fold keeps ties integer
    # (2·midrank = 2·c_prev + e + l + 1); one division at the end
    o["mann_whitney_drift"] = """
        WITH e AS (
          SELECT event_type, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS epoch
          FROM events
        ),
        mid AS (
          SELECT (min(epoch) + max(epoch)) // 2 AS m FROM e
        ),
        per_val AS (
          SELECT event_type, value,
                 CAST(sum(CASE WHEN epoch < (SELECT m FROM mid)
                          THEN 1 ELSE 0 END) AS BIGINT) AS ne,
                 CAST(sum(CASE WHEN epoch >= (SELECT m FROM mid)
                          THEN 1 ELSE 0 END) AS BIGINT) AS nl
          FROM e GROUP BY 1, 2
        ),
        ranked AS (
          SELECT event_type, ne, nl,
                 coalesce(sum(ne + nl) OVER (
                   PARTITION BY event_type ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS c_prev
          FROM per_val
        ),
        folded AS (
          SELECT event_type,
                 CAST(sum(ne) AS BIGINT) AS n_early,
                 CAST(sum(nl) AS BIGINT) AS n_late,
                 CAST(sum(ne * (2 * c_prev + ne + nl + 1))
                      AS BIGINT) AS r1x2
          FROM ranked GROUP BY 1
        )
        SELECT event_type, n_early, n_late,
               CAST(r1x2 - n_early * (n_early + 1) AS BIGINT) AS u2_stat,
               (r1x2 - n_early * (n_early + 1))
                 / (2 * n_early * n_late) AS auc
        FROM folded
    """

    # Benford audit: the nine expectation constants are the SAME
    # decimal literals the Spark side parses (operators/analytics.py
    # BENFORD_P) — no libm log10 in either graded path
    from ..operators.analytics import BENFORD_P as _BENP

    _benford_rows = ", ".join(
        f"('{d + 1}', {p})" for d, p in enumerate(_BENP)
    )
    o["benford_check"] = f"""
        WITH digits AS (
          SELECT substr(regexp_replace(CAST(l_extendedprice AS VARCHAR),
                                       '[^1-9]', '', 'g'), 1, 1) AS digit
          FROM lineitem
        ),
        counts AS (
          SELECT digit, CAST(count(*) AS BIGINT) AS observed
          FROM digits WHERE digit != '' GROUP BY 1
        ),
        total AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total
                  FROM counts),
        -- p must be DOUBLE: bare decimal literals land as DECIMAL in
        -- DuckDB, whose exact arithmetic overflows DECIMAL(38) when
        -- squaring (obs − n·p) at sf0.1 row counts — and would not
        -- reproduce Spark's IEEE double math anyway
        expect AS (SELECT digit, CAST(p AS DOUBLE) AS p
                   FROM (VALUES {_benford_rows}) AS t(digit, p))
        SELECT e.digit,
               CAST(coalesce(c.observed, 0) AS BIGINT) AS observed,
               round(n_total * e.p, 4) AS expected,
               round((coalesce(c.observed, 0) - n_total * e.p)
                     * (coalesce(c.observed, 0) - n_total * e.p)
                     / (n_total * e.p), 4) AS chi2_term
        FROM expect e CROSS JOIN total LEFT JOIN counts c USING (digit)
    """

    return o
