"""General-operator correctness probes (SURVEY §2.8 P1-P30).

Each probe is a (spark_sql, duck_sql) pair over the driver testdata views —
usually the identical string; dialect swaps are marked. Determinism rules
(§2.8): every money/metric sum goes through DECIMAL so the aggregation is
exact and order-independent, then CASTs to DOUBLE so both engines output the
identical value with a plain schema; no double→int CASTs (Spark truncates,
DuckDB rounds — FLOOR first); deterministic ORDER BY everywhere a LIMIT
exists.

The Spark strings run through ``spark.sql`` against temp views registered by
``sources.register_views`` — i.e. straight through Catalyst: these probes are
exactly the declarative plans the engine's operators compile to.
"""

from __future__ import annotations

# name -> (spark_sql, duck_sql); duck_sql None means identical.
PROBES: dict[str, tuple[str, str | None]] = {}


def _p(name: str, spark_sql: str, duck_sql: str | None = None) -> None:
    PROBES[name] = (spark_sql, duck_sql)


# --- scans / filters / projections -----------------------------------------

_p(
    "p01_scan_filter_project",
    """SELECT event_id, user_id, value FROM events
       WHERE event_type = 'purchase' AND value > 100 ORDER BY event_id""",
)
_p(
    "p02_time_predicate",
    """SELECT event_id FROM events
       WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-07 00:00:00'
       ORDER BY event_id""",
)
_p(
    "p03_in_notin",
    """SELECT event_id FROM events
       WHERE lower(event_type) IN ('signup','error') AND user_id NOT IN (1,2,3)
       ORDER BY event_id""",
)
_p(
    "p04_like",
    "SELECT p_partkey FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey",
)

# --- aggregations ----------------------------------------------------------

_p(
    "p05_hash_agg",
    """SELECT user_id, COUNT(*) AS freq,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
              MIN(ts) AS first_seen, MAX(ts) AS last_seen
       FROM events GROUP BY user_id ORDER BY user_id""",
)
_p(
    "p06_having",
    """SELECT user_id, COUNT(*) AS c FROM events
       GROUP BY user_id HAVING COUNT(*) >= 30 ORDER BY user_id""",
)
_p(
    "p07_avg",
    """SELECT event_type,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
       FROM events GROUP BY event_type ORDER BY event_type""",
)
_p(
    "p08_count_distinct",
    "SELECT COUNT(DISTINCT user_id) AS u, COUNT(DISTINCT event_type) AS t FROM events",
)
_p(
    "p09_bucket_agg",
    """SELECT CASE WHEN value > 150 THEN 'slow' WHEN value > 50 THEN 'medium'
                   ELSE 'fast' END AS bucket, COUNT(*) AS n
       FROM events GROUP BY 1 ORDER BY 1""",
)

# --- joins -----------------------------------------------------------------

_p(
    "p10_join_agg",
    """SELECT c.c_mktsegment, COUNT(*) AS n,
              CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",
)
_p(
    "p11_dim_chain_join",
    """SELECT r.r_name, COUNT(*) AS n FROM nation n
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r.r_name ORDER BY r.r_name""",
)
_p(
    "p12_semi_join",
    """SELECT c_custkey FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
       ORDER BY c_custkey""",
)
_p(
    "p13_anti_join",
    """SELECT c_custkey FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY c_custkey""",
)
_p(
    "p14_left_outer_coalesce",
    """SELECT c.c_custkey,
              COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spend
       FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       GROUP BY c.c_custkey ORDER BY c.c_custkey""",
)
_p(
    "p15_five_way_join",
    """SELECT n.n_name,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY n.n_name ORDER BY n.n_name""",
)

# --- windows / sorts / limits ----------------------------------------------

_p(
    "p16_rownum_dedup_first",
    """SELECT event_id FROM (
         SELECT event_id, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         FROM events) t
       WHERE rn = 1 ORDER BY event_id""",
)
_p(
    "p17_running_sum",
    """SELECT event_id,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS run
       FROM events ORDER BY event_id""",
    """SELECT event_id,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS run
       FROM events ORDER BY event_id""",
)
_p(
    "p18_lag",
    """SELECT event_id,
              LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       FROM events ORDER BY event_id""",
)
_p(
    "p19_topk_per_group",
    """SELECT user_id, event_id FROM (
         SELECT user_id, event_id,
                RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
         FROM events WHERE event_type = 'purchase') t
       WHERE rk <= 3 ORDER BY user_id, event_id""",
)
_p(
    "p20_global_topk",
    "SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 10",
)
_p(
    "p21_offset",
    "SELECT event_id FROM events ORDER BY event_id LIMIT 20 OFFSET 40",
)

# --- set operations --------------------------------------------------------

_p(
    "p22_intersect",
    """SELECT user_id FROM events WHERE event_type='signup'
       INTERSECT
       SELECT user_id FROM events WHERE event_type='purchase'
       ORDER BY user_id""",
)
_p(
    "p23_except",
    """SELECT user_id FROM events
       EXCEPT
       SELECT user_id FROM events WHERE event_type='purchase'
       ORDER BY user_id""",
)
_p(
    "p24_union",
    """SELECT user_id FROM events WHERE value > 180
       UNION
       SELECT user_id FROM events WHERE event_type='error'
       ORDER BY user_id""",
)

# --- scalar functions ------------------------------------------------------

_p(
    "p25_string_fns",
    """SELECT doc_id, upper(lang) AS l, length(text) AS n, substr(text, 1, 10) AS head
       FROM documents ORDER BY doc_id""",
)
_p(
    "p26_regexp",
    """SELECT event_id, regexp_extract(props, '"k": ([0-9]+)', 1) AS k
       FROM events ORDER BY event_id""",
)
_p(
    "p27_date_fns",
    """SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events
       GROUP BY CAST(ts AS DATE) ORDER BY d""",
)
_p(
    "p28_json",
    """SELECT event_id, get_json_object(props, '$.k') AS k FROM events ORDER BY event_id""",
    """SELECT event_id, json_extract_string(props, '$.k') AS k FROM events ORDER BY event_id""",
)
_p(
    "p29_math",
    """SELECT event_id, ROUND(sqrt(value), 6) AS s,
              CAST(FLOOR(value) AS BIGINT) AS f,
              abs(value - 100) > 50 AS far
       FROM events ORDER BY event_id""",
)

# --- grouping extensions ---------------------------------------------------

_p(
    "p30_rollup",
    """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY ROLLUP(c_mktsegment, o_orderstatus)
       ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""",
)

_p(
    "p32_grouping_sets",
    """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
       ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""",
)
_p(
    "p33_cube",
    """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY CUBE(c_mktsegment, o_orderstatus)
       ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""",
)
_p(
    "p34_date_parts",
    """SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
              CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
              CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr, COUNT(*) AS n
       FROM events
       GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    # dialect swap: Spark EXTRACT(dow) is 1-based (Sunday=1), DuckDB's is
    # 0-based (Sunday=0) — the oracle shifts. date_trunc('week') is
    # Monday-start in both engines.
    """SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
              CAST(EXTRACT(dow FROM ts) + 1 AS BIGINT) AS dow,
              CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr, COUNT(*) AS n
       FROM events
       GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
)

_p(
    "p35_array_fns",
    """SELECT doc_id,
              size(split(text, ' ')) AS n_words,
              array_join(slice(sort_array(array_distinct(split(text, ' '))), 1, 3), ',')
                AS first3,
              array_contains(split(text, ' '), 'the') AS has_the
       FROM documents ORDER BY doc_id""",
    """SELECT doc_id,
              len(string_split(text, ' ')) AS n_words,
              array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
                AS first3,
              list_contains(string_split(text, ' '), 'the') AS has_the
       FROM documents ORDER BY doc_id""",
)
_p(
    "p36_struct_fns",
    """SELECT event_id,
              named_struct('u', user_id, 'v', value).u AS su,
              named_struct('u', user_id, 'v', value).v AS sv
       FROM events ORDER BY event_id""",
    """SELECT event_id,
              struct_pack(u := user_id, v := value).u AS su,
              struct_pack(u := user_id, v := value).v AS sv
       FROM events ORDER BY event_id""",
)

# --- sessionization ---------------------------------------------------------
# Spark's session_window merges an event into the current session while its
# timestamp is STRICTLY inside the previous event's [ts, ts+gap) window — an
# event exactly gap after the previous one starts a NEW session. The DuckDB
# oracle reproduces that as gaps-and-islands: new session when diff >= gap.
_p(
    "p31_session_window",
    """SELECT user_id, session_window.start AS session_start,
              session_window.end AS session_end, COUNT(*) AS n_events
       FROM events GROUP BY user_id, session_window(ts, '30 minutes')
       ORDER BY user_id, session_start""",
    """WITH o AS (
         SELECT user_id, ts,
                CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ),
       s AS (
         SELECT user_id, ts,
                SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
         FROM o
       )
       SELECT user_id, MIN(ts) AS session_start,
              MAX(ts) + INTERVAL 30 MINUTE AS session_end,
              COUNT(*) AS n_events
       FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
)

# --- window breadth ----------------------------------------------------------

_p(
    "p37_rank_family",
    """SELECT event_id,
              NTILE(4) OVER w AS quartile,
              DENSE_RANK() OVER w AS drk,
              PERCENT_RANK() OVER w AS prk,
              CUME_DIST() OVER w AS cd
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
       ORDER BY event_id""",
)
_p(
    "p38_window_frames",
    """SELECT event_id,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS run4,
              CAST(MAX(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS DOUBLE)
                AS prior_max
       FROM events ORDER BY event_id""",
)
_p(
    "p39_nth_value",
    """SELECT event_id,
              FIRST_VALUE(event_id) OVER w AS fv,
              LAST_VALUE(event_id) OVER w AS lv,
              NTH_VALUE(event_id, 2) OVER w AS nv2
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY event_id""",
)

# --- aggregation breadth -----------------------------------------------------

# variance/stddev via exact DECIMAL sums so both engines divide and sqrt the
# SAME doubles (direct stddev_samp accumulates doubles in engine-specific
# order — not bit-stable cross-engine)
_p(
    "p40_stats_exact",
    """SELECT event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
              CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                   AS DOUBLE) AS sq,
              ROUND(sqrt((CAST(SUM(CAST(value AS DECIMAL(18,2))
                                * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  - pow(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                    / COUNT(*)) / (COUNT(*) - 1)), 6) AS sd
       FROM events GROUP BY event_type ORDER BY event_type""",
)
_p(
    "p41_filtered_agg",
    """SELECT user_id,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_buy,
              COUNT(*) FILTER (WHERE value > 150) AS n_big,
              CAST(SUM(CAST(value AS DECIMAL(18,2)))
                   FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS buy_sum
       FROM events GROUP BY user_id ORDER BY user_id""",
)

# --- scalar breadth ----------------------------------------------------------

_p(
    "p42_string_fns2",
    """SELECT doc_id,
              lpad(lang, 5, '_') AS lp, rpad(lang, 5, '_') AS rp,
              replace(substr(text, 1, 20), ' ', '_') AS rep,
              reverse(lang) AS rev, repeat(lang, 2) AS rpt,
              left(text, 5) AS l5, right(text, 5) AS r5,
              instr(text, 'the') AS pos_the
       FROM documents ORDER BY doc_id""",
    """SELECT doc_id,
              lpad(lang, 5, '_') AS lp, rpad(lang, 5, '_') AS rp,
              replace(substr(text, 1, 20), ' ', '_') AS rep,
              reverse(lang) AS rev, repeat(lang, 2) AS rpt,
              left(text, 5) AS l5, right(text, 5) AS r5,
              CAST(strpos(text, 'the') AS BIGINT) AS pos_the
       FROM documents ORDER BY doc_id""",
)
_p(
    "p43_date_arith",
    """SELECT event_id,
              ts + INTERVAL 7 DAY AS wk_later,
              CAST(last_day(CAST(ts AS DATE)) AS DATE) AS eom,
              CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT) AS d_since,
              CAST(unix_timestamp(ts) AS BIGINT) AS epoch_s
       FROM events ORDER BY event_id""",
    """SELECT event_id,
              ts + INTERVAL 7 DAY AS wk_later,
              last_day(CAST(ts AS DATE)) AS eom,
              CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
                AS d_since,
              CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s
       FROM events ORDER BY event_id""",
)

# --- subqueries / generators / pivot ----------------------------------------

_p(
    "p44_exists_subquery",
    """SELECT c_custkey FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
         AND c_acctbal > 0
       ORDER BY c_custkey""",
)
_p(
    "p45_pivot",
    """SELECT * FROM (SELECT user_id % 4 AS ubucket, event_type FROM events)
       PIVOT (COUNT(*) AS n FOR event_type IN
              ('purchase' AS purchase, 'error' AS error, 'signup' AS signup))
       ORDER BY ubucket""",
    # DuckDB's PIVOT is a different statement form; the oracle states the
    # same contingency table as conditional aggregation
    """SELECT user_id % 4 AS ubucket,
              CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
                AS purchase,
              CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
              CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup
       FROM events GROUP BY user_id % 4 ORDER BY ubucket""",
)
_p(
    "p46_explode_wordcount",
    """SELECT w, COUNT(*) AS n
       FROM documents LATERAL VIEW explode(split(text, ' ')) t AS w
       GROUP BY w ORDER BY n DESC, w LIMIT 20""",
    """SELECT w, COUNT(*) AS n
       FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
       GROUP BY w ORDER BY n DESC, w LIMIT 20""",
)
_p(
    "p47_broadcast_hint",
    """SELECT /*+ BROADCAST(c) */ c_mktsegment, COUNT(*) AS n
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment""",
)
_p(
    "p48_repartition_hint",
    """SELECT /*+ REPARTITION(8, user_id) */ user_id, COUNT(*) AS n
       FROM events GROUP BY user_id ORDER BY user_id""",
)
_p(
    "p49_null_semantics",
    """SELECT t.k, t.v,
              t.v <=> NULL AS v_is_null_safe,
              nullif(t.v, 7) AS nn,
              nvl(t.v, -1) AS filled,
              coalesce(t.v, t.k, -9) AS first_set
       FROM (SELECT user_id % 5 AS k,
                    CASE WHEN user_id % 3 = 0 THEN NULL
                         ELSE user_id % 10 END AS v
             FROM events) t
       ORDER BY t.k NULLS FIRST, t.v NULLS LAST, filled""",
    """SELECT t.k, t.v,
              t.v IS NOT DISTINCT FROM NULL AS v_is_null_safe,
              nullif(t.v, 7) AS nn,
              coalesce(t.v, -1) AS filled,
              coalesce(t.v, t.k, -9) AS first_set
       FROM (SELECT user_id % 5 AS k,
                    CASE WHEN user_id % 3 = 0 THEN NULL
                         ELSE user_id % 10 END AS v
             FROM events) t
       ORDER BY t.k NULLS FIRST, t.v NULLS LAST, filled""",
)
_p(
    "p50_null_safe_join",
    """SELECT a.k AS ka, b.k AS kb, COUNT(*) AS n
       FROM (SELECT CASE WHEN user_id % 4 = 0 THEN NULL
                         ELSE user_id % 3 END AS k FROM events) a
       JOIN (SELECT CASE WHEN user_id % 5 = 0 THEN NULL
                         ELSE user_id % 3 END AS k FROM events) b
         ON a.k <=> b.k
       GROUP BY a.k, b.k ORDER BY ka NULLS FIRST, kb NULLS FIRST""",
    """SELECT a.k AS ka, b.k AS kb, COUNT(*) AS n
       FROM (SELECT CASE WHEN user_id % 4 = 0 THEN NULL
                         ELSE user_id % 3 END AS k FROM events) a
       JOIN (SELECT CASE WHEN user_id % 5 = 0 THEN NULL
                         ELSE user_id % 3 END AS k FROM events) b
         ON a.k IS NOT DISTINCT FROM b.k
       GROUP BY a.k, b.k ORDER BY ka NULLS FIRST, kb NULLS FIRST""",
)
_p(
    "p51_higher_order_fns",
    """SELECT doc_id,
              CAST(aggregate(transform(split(text, ' '), w -> length(w)),
                             0, (a, x) -> a + x) AS BIGINT) AS total_chars,
              CAST(size(filter(split(text, ' '), w -> length(w) > 4)) AS BIGINT)
                AS n_long,
              exists(split(text, ' '), w -> w = 'the') AS has_the
       FROM documents ORDER BY doc_id""",
    """SELECT doc_id,
              CAST(list_sum([length(w) for w in string_split(text, ' ')]) AS BIGINT)
                AS total_chars,
              CAST(len([w for w in string_split(text, ' ') if length(w) > 4])
                   AS BIGINT) AS n_long,
              list_contains(string_split(text, ' '), 'the') AS has_the
       FROM documents ORDER BY doc_id""",
)


# --- round-3 surface widening: lateral / unpivot / intervals / maps --------

_p(
    "p52_lateral_topk_per_row",
    """SELECT n.n_name, t.okey, t.total
       FROM nation n,
       LATERAL (
         SELECT o.o_orderkey AS okey,
                CAST(o.o_totalprice AS DOUBLE) AS total
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
       ) t
       ORDER BY n.n_name, t.okey""",
)
_p(
    "p53_unpivot",
    """SELECT event_type, metric, val FROM (
         SELECT event_type,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
                CAST(COUNT(*) AS DOUBLE) AS cnt
         FROM events GROUP BY event_type
       ) UNPIVOT (val FOR metric IN (total, cnt))
       ORDER BY event_type, metric""",
    """WITH base AS (
         SELECT event_type,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
                CAST(COUNT(*) AS DOUBLE) AS cnt
         FROM events GROUP BY event_type
       )
       SELECT event_type, metric, CAST(val AS DOUBLE) AS val
       FROM (UNPIVOT base ON total, cnt INTO NAME metric VALUE val)
       ORDER BY event_type, metric""",
)
_p(
    "p54_interval_arith",
    """SELECT event_id,
              ts + INTERVAL '90' MINUTE AS later,
              CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)
                AS days_in
       FROM events WHERE event_id < 50 ORDER BY event_id""",
    """SELECT event_id,
              ts + INTERVAL 90 MINUTE AS later,
              CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS days_in
       FROM events WHERE event_id < 50 ORDER BY event_id""",
)
_p(
    "p55_map_fns",
    """SELECT event_id,
              element_at(map('type', event_type, 'user',
                             CAST(user_id AS STRING)), 'type') AS m_type,
              size(map('a', 1, 'b', 2)) AS m_size
       FROM events WHERE event_id < 20 ORDER BY event_id""",
    """SELECT event_id,
              MAP(['type', 'user'],
                  [event_type, CAST(user_id AS VARCHAR)])['type'][1] AS m_type,
              CAST(cardinality(MAP(['a', 'b'], [1, 2])) AS INT) AS m_size
       FROM events WHERE event_id < 20 ORDER BY event_id""",
)
_p(
    "p56_range_interval_window",
    """SELECT event_id,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW
              ) AS DOUBLE) AS v_1h
       FROM events ORDER BY event_id""",
    """SELECT event_id,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
              ) AS DOUBLE) AS v_1h
       FROM events ORDER BY event_id""",
)
_p(
    "p57_exact_median_group",
    """SELECT event_type,
              ROUND(percentile(value, 0.5), 6) AS p50,
              ROUND(percentile(value, 0.9), 6) AS p90
       FROM events GROUP BY event_type ORDER BY event_type""",
    """SELECT event_type,
              ROUND(quantile_cont(value, 0.5), 6) AS p50,
              ROUND(quantile_cont(value, 0.9), 6) AS p90
       FROM events GROUP BY event_type ORDER BY event_type""",
)
_p(
    "p58_bitwise",
    """SELECT user_id,
              CAST(user_id & 255 AS BIGINT) AS b_and,
              CAST(user_id | 16 AS BIGINT) AS b_or,
              CAST(user_id ^ 85 AS BIGINT) AS b_xor,
              CAST(shiftleft(user_id, 2) AS BIGINT) AS b_shl
       FROM (SELECT DISTINCT user_id FROM events) ORDER BY user_id""",
    """SELECT user_id,
              CAST(user_id & 255 AS BIGINT) AS b_and,
              CAST(user_id | 16 AS BIGINT) AS b_or,
              CAST(xor(user_id, 85) AS BIGINT) AS b_xor,
              CAST(user_id << 2 AS BIGINT) AS b_shl
       FROM (SELECT DISTINCT user_id FROM events) ORDER BY user_id""",
)
_p(
    "p59_scalar_subquery",
    """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
       FROM orders
       WHERE CAST(o_totalprice AS DECIMAL(18,2)) > (
         SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
         FROM orders)
       ORDER BY o_orderkey LIMIT 50""",
)
_p(
    "p60_correlated_scalar_subquery",
    """SELECT c_custkey,
              CAST((SELECT COUNT(*) FROM orders o
                    WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders
       FROM customer c ORDER BY c_custkey LIMIT 100""",
)
_p(
    "p61_group_by_all",
    """SELECT event_type, user_id % 4 AS ubucket, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM events GROUP BY ALL ORDER BY event_type, ubucket""",
)
_p(
    "p62_ordered_string_agg",
    """SELECT user_id,
              concat_ws(',', sort_array(collect_set(event_type))) AS types
       FROM events GROUP BY user_id ORDER BY user_id""",
    """SELECT user_id,
              string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
       FROM events GROUP BY user_id ORDER BY user_id""",
)
_p(
    "p63_width_bucket_histogram",
    """SELECT width_bucket(CAST(o_totalprice AS DOUBLE), 0.0, 600000.0, 12)
             AS bucket,
              COUNT(*) AS n,
              CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
              CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
       FROM orders GROUP BY 1 ORDER BY 1""",
    # DuckDB has no width_bucket — replay Spark's formula: bucket =
    # floor((v - min) / ((max - min) / n)) + 1, clamped to [0, n+1]
    """SELECT CASE WHEN v < 0.0 THEN 0 WHEN v >= 600000.0 THEN 13
                   ELSE CAST(FLOOR((v - 0.0) / ((600000.0 - 0.0) / 12))
                             AS BIGINT) + 1 END AS bucket,
              COUNT(*) AS n,
              CAST(MIN(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS lo,
              CAST(MAX(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS hi
       FROM (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders)
       GROUP BY 1 ORDER BY 1""",
)
_p(
    "p64_gaps_islands",
    """WITH s AS (
         SELECT user_id, event_type, ts, event_id,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)
                - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS grp
         FROM events WHERE user_id < 30)
       SELECT user_id, event_type, grp, COUNT(*) AS run_len,
              MIN(ts) AS run_start, MAX(ts) AS run_end
       FROM s GROUP BY user_id, event_type, grp
       ORDER BY user_id, run_start, event_type""",
)
_p(
    "p65_missing_key_ranges",
    """WITH s AS (
         SELECT o_orderkey AS k,
                LEAD(o_orderkey) OVER (ORDER BY o_orderkey) AS nk
         FROM orders WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0)
       SELECT k + 1 AS gap_start, nk - 1 AS gap_end, nk - k - 1 AS gap_len
       FROM s WHERE nk - k > 1 ORDER BY gap_start LIMIT 1000""",
)
_p(
    "p66_cube",
    """SELECT event_type, user_id % 3 AS ub, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
              GROUPING(event_type) AS g_type, GROUPING(user_id % 3) AS g_ub
       FROM events GROUP BY CUBE(event_type, user_id % 3)
       ORDER BY g_type, g_ub, event_type NULLS FIRST, ub NULLS FIRST""",
)
_p(
    "p67_grouping_sets",
    """SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
              COUNT(*) AS n
       FROM events
       GROUP BY GROUPING SETS ((event_type), (hod), ())
       ORDER BY event_type NULLS FIRST, hod NULLS FIRST""",
)

# --- TPC-H-adapted composition probes (h-family) ----------------------------
# The classic decision-support suite re-parameterized for the synthetic
# testdata's actual domains (TIMESTAMP ship/order dates 1995-2001, nation
# names NATION_0..24, p_type in {PROMO,MEDIUM,...}). The corpus carries no
# partsupp / l_shipmode / l_receiptdate / c_phone, so the queries that need
# them are re-parameterized to preserve the PLAN SHAPE, not the exact TPC-H
# business text (round-6 VERDICT ask #2): lineitem's (l_partkey, l_suppkey)
# aggregates stand in for partsupp (h02/h11/h16/h20), l_shipdate lagging
# o_orderdate by an interval stands in for receipt-after-commit lateness
# (h04/h12/h21), a l_linenumber bucket for l_shipmode (h12), and
# c_custkey % 10 for the phone country code (h22). What the gate pins is
# the decorrelation pattern: Q2's correlated MIN, Q4/Q21's (NOT) EXISTS,
# Q13's outer-join count distribution, Q15's max-over-view, Q20's nested
# correlated agg under IN.
# These are COMPOSITION stress tests — multi-join + agg + subquery shapes
# flowing through Catalyst as one plan — with the §2.8 determinism rules
# (DECIMAL money sums, BIGINT years, tie-broken ORDER BY under every LIMIT;
# fraction-of-total thresholds are stated as exact-decimal cross
# multiplications, never engine-rounded AVG/division).

_p(
    "h01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))
                       * CAST(1 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
              CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
)
_p(
    "h02_min_cost_supplier",
    # Q2 shape: correlated scalar MIN subquery over the supply table (the
    # (part, supplier) MIN-price roll-up of lineitem plays partsupp), the
    # region-restricted "cheapest supplier per part" lookup. The correlated
    # MIN decorrelates into an aggregate + equi-join under both engines.
    """WITH ps AS (
         SELECT l_partkey, l_suppkey,
                MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
         FROM lineitem GROUP BY l_partkey, l_suppkey
       )
       SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
              p_partkey, p_brand, CAST(ps.cost AS DOUBLE) AS cost
       FROM part
       JOIN ps ON p_partkey = ps.l_partkey
       JOIN supplier ON ps.l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE p_size <= 12 AND p_type = 'PROMO' AND r_name = 'EUROPE'
         AND ps.cost = (
           SELECT MIN(ps2.cost) FROM ps ps2
           JOIN supplier s2 ON ps2.l_suppkey = s2.s_suppkey
           JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
           JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
           WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
)
_p(
    "h03_shipping_priority",
    """SELECT l_orderkey,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
              o_orderdate, o_orderpriority
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
         AND l_shipdate > TIMESTAMP '1997-06-15 00:00:00'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",
)
_p(
    "h04_order_priority_check",
    # Q4 shape: EXISTS semi-join against lineitem with a non-trivial
    # predicate (shipped more than 60 days after ordering — the corpus's
    # receipt-after-commit lateness analog), count by priority.
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
         AND EXISTS (
           SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey
             AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)
_p(
    "h05_local_supplier_volume",
    """SELECT n_name,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name
       ORDER BY revenue DESC, n_name""",
)
_p(
    "h06_forecast_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
_p(
    "h07_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year,
              CAST(SUM(volume) AS DOUBLE) AS revenue
       FROM (
         SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(18,2)) AS volume
         FROM supplier
         JOIN lineitem ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
           AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1998-12-31 00:00:00'
       ) shipping
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year""",
)
_p(
    "h08_market_share",
    """SELECT o_year,
              ROUND(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                    / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
       FROM (
         SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(18,2)) AS volume,
                n2.n_name AS nation
         FROM part
         JOIN lineitem ON p_partkey = l_partkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region ON n1.n_regionkey = r_regionkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE r_name = 'AMERICA' AND p_type = 'MEDIUM'
           AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                               AND TIMESTAMP '1998-12-31 00:00:00'
       ) all_nations
       GROUP BY o_year ORDER BY o_year""",
)
_p(
    "h09_product_type_profit",
    # Q9 shape: 5-way join with a part-name LIKE filter, per-(nation, year)
    # profit where cost = 10% of retail price per unit (the ps_supplycost
    # analog) — all-decimal arithmetic: (18,2)x(18,2) and (18,2)x(2,1)
    # products stay exact, so both engines sum identical values.
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
       FROM (
         SELECT n_name AS nation,
                CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(18,2))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(0.1 AS DECIMAL(2,1)) AS amount
         FROM part
         JOIN lineitem ON p_partkey = l_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%red%'
       ) profit
       GROUP BY nation, o_year
       ORDER BY nation, o_year DESC""",
)
_p(
    "h10_returned_items",
    """SELECT c_custkey, c_name,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
              CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
         AND l_returnflag = 'R'
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
_p(
    "h11_important_stock",
    # Q11 shape: group-HAVING against an uncorrelated scalar aggregate of
    # the SAME grouped view — parts whose nation-local supply value exceeds
    # 3x the average part value (scale-free, unlike a fixed fraction of
    # total, which empties as the part count grows with SF). The threshold
    # is cross-multiplied (value * n > 3 * total) to stay exact-decimal.
    """WITH ps AS (
         SELECT l_partkey,
                SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_3'
         GROUP BY l_partkey
       )
       SELECT l_partkey, CAST(value AS DOUBLE) AS value
       FROM ps
       WHERE value * (SELECT COUNT(*) FROM ps) > 3 * (SELECT SUM(value) FROM ps)
       ORDER BY value DESC, l_partkey""",
)
_p(
    "h12_late_shipment_modes",
    # Q12 shape: lineitem->orders join, a two-sided lateness window on the
    # dates, priority split counted per "ship mode" (the l_linenumber
    # bucket stands in for l_shipmode). COUNT FILTER keeps BIGINT on both
    # engines (DuckDB SUM(int) would widen to HUGEINT).
    """SELECT ship_bucket,
              COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
                AS high_line_count,
              COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                AS low_line_count
       FROM (
         SELECT CASE WHEN l_linenumber <= 2 THEN 'PRIORITY' ELSE 'BULK' END
                  AS ship_bucket,
                o_orderpriority
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
           AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') t
       GROUP BY ship_bucket ORDER BY ship_bucket""",
)
_p(
    "h13_customer_order_distribution",
    # Q13 shape: LEFT OUTER join with a filter on the JOIN side (kept in
    # the ON clause so customers with only urgent orders still count as
    # zero), then the distribution of per-customer counts — the classic
    # double aggregation over an outer join.
    """SELECT c_count, COUNT(*) AS custdist
       FROM (
         SELECT c_custkey, COUNT(o_orderkey) AS c_count
         FROM customer LEFT JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
         GROUP BY c_custkey) c_orders
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC""",
)
_p(
    "h14_promo_effect",
    """SELECT ROUND(
                100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE),
                6) AS promo_revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""",
)
_p(
    "h15_top_supplier",
    # Q15 shape: max-over-view — the revenue CTE is consumed twice (join
    # source + scalar MAX threshold); exact-decimal equality keeps the
    # "ties all qualify" semantics engine-identical.
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
       FROM supplier JOIN revenue ON s_suppkey = supplier_no
       WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       ORDER BY s_suppkey""",
)
_p(
    "h16_parts_supplier_count",
    # Q16 shape: NOT IN anti-subquery (the complaints-comment analog is a
    # supplier-name LIKE) + COUNT(DISTINCT) grouped by part attributes.
    """SELECT p_brand, p_type, p_size,
              COUNT(DISTINCT l_suppkey) AS supplier_cnt
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE p_brand <> 'Brand#45'
         AND p_type <> 'PROMO'
         AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
         AND l_suppkey NOT IN (
           SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
       GROUP BY p_brand, p_type, p_size
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
)
_p(
    "h17_small_quantity_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS avg_yearly
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE p_brand = 'Brand#23'
         AND l_quantity < (
           SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
           WHERE l2.l_partkey = lineitem.l_partkey)""",
    # correlated column qualification: DuckDB resolves the outer column
    # through the table name exactly like Spark; identical string works —
    # kept as one text on purpose.
)
_p(
    "h18_large_volume_customers",
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
              CAST(o_totalprice AS DOUBLE) AS o_totalprice,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       WHERE o_orderkey IN (
         SELECT l_orderkey FROM lineitem
         GROUP BY l_orderkey
         HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 170)
       GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
       ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""",
)
_p(
    "h19_discounted_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 20 AND 30)""",
)

_p(
    "h20_potential_promotion",
    # Q20 shape: nested correlated aggregate under IN — suppliers (in one
    # region; single nations are unpopulated at sf0.001's 100-supplier
    # scale) holding a red part whose all-time supplied quantity is more
    # than double the 1997 demand for that exact (part, supplier) pair;
    # the inner SUM correlates on BOTH grouping keys of the supply view.
    """WITH ps AS (
         SELECT l_partkey AS pk, l_suppkey AS sk,
                SUM(CAST(l_quantity AS DECIMAL(18,2))) AS availqty
         FROM lineitem GROUP BY l_partkey, l_suppkey)
       SELECT s_suppkey, s_name
       FROM supplier
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'EUROPE'
         AND s_suppkey IN (
           SELECT sk FROM ps
           WHERE pk IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
             AND availqty > 2 * (
               SELECT COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2))),
                               CAST(0 AS DECIMAL(18,2)))
               FROM lineitem
               WHERE l_partkey = pk AND l_suppkey = sk
                 AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                 AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
       ORDER BY s_suppkey""",
)
_p(
    "h21_suppliers_kept_waiting",
    # Q21 shape: the multi-(NOT-)EXISTS self-join pileup — late suppliers
    # on finished multi-supplier orders where NO OTHER supplier was late on
    # the same order. Lateness = shipped >90 days after ordering; both
    # subqueries re-join orders internally so every correlation stays a
    # plain l_orderkey equality (semi/anti hash joins, no cartesian).
    """SELECT s_name, COUNT(*) AS numwait
       FROM supplier
       JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
       JOIN orders ON o_orderkey = l1.l_orderkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderstatus = 'F'
         AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
         AND EXISTS (
           SELECT 1 FROM lineitem l2
           WHERE l2.l_orderkey = l1.l_orderkey
             AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (
           SELECT 1 FROM lineitem l3
           JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
           WHERE l3.l_orderkey = l1.l_orderkey
             AND l3.l_suppkey <> l1.l_suppkey
             AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
       GROUP BY s_name
       ORDER BY numwait DESC, s_name LIMIT 20""",
)
_p(
    "h22_global_sales_opportunity",
    # Q22 shape: scalar-average threshold + NOT EXISTS anti-join over a
    # derived "country code" (c_custkey % 10 stands in for the phone
    # prefix; "never placed an order" becomes "never placed an URGENT
    # order" — this generator gives every customer orders, so the literal
    # predicate is vacuous). The avg comparison is cross-multiplied —
    # acctbal * n > total — so the threshold never passes through
    # engine-specific AVG/division rounding.
    """SELECT cntrycode, COUNT(*) AS numcust,
              CAST(SUM(acctbal) AS DOUBLE) AS totacctbal
       FROM (
         SELECT CAST(c_custkey % 10 AS STRING) AS cntrycode,
                CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
         FROM customer
         WHERE CAST(c_custkey % 10 AS STRING) IN ('1', '3', '5', '7', '9')
           AND CAST(c_acctbal AS DECIMAL(18,2)) * (
                 SELECT COUNT(*) FROM customer
                 WHERE c_acctbal > 0.0
                   AND CAST(c_custkey % 10 AS STRING)
                       IN ('1', '3', '5', '7', '9'))
               > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
                  WHERE c_acctbal > 0.0
                    AND CAST(c_custkey % 10 AS STRING)
                        IN ('1', '3', '5', '7', '9'))
           AND NOT EXISTS (
             SELECT 1 FROM orders
             WHERE o_custkey = c_custkey
               AND o_orderpriority = '1-URGENT')) custsale
       GROUP BY cntrycode ORDER BY cntrycode""",
)

# --- semi-structured: Spark 4 VARIANT --------------------------------------
_p(
    "p68_variant_extract",
    """SELECT event_type,
              COUNT(*) AS n,
              SUM(CAST(variant_get(parse_json(props), '$.k', 'long')
                       AS BIGINT)) AS sum_k,
              MIN(CAST(variant_get(parse_json(props), '$.k', 'long')
                       AS BIGINT)) AS min_k,
              MAX(CAST(variant_get(parse_json(props), '$.k', 'long')
                       AS BIGINT)) AS max_k
       FROM events GROUP BY event_type ORDER BY event_type""",
    # DuckDB replay via its JSON path extraction — same values, no
    # VARIANT type on that side (Spark's open binary JSON encoding vs
    # DuckDB's text JSON; the EXTRACTED longs are the comparable surface)
    """SELECT event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                   AS BIGINT) AS sum_k,
              MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
              MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
       FROM events GROUP BY event_type ORDER BY event_type""",
)
