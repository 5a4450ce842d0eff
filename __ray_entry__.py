"""Driver contract for the qwery_ray engine (Ray Data target).

``entry()``: flagship CDC replay at sf0.001 (synthesized change-event tail →
partitioned parquet lake via the exactly-once engine), returns the lake.

``queries()``: one entry per implemented operator family from SURVEY.md §2
plus the training-data ops. SQL-surface entries run through the qwery dialect
compiler (qwery_ray.sqlc); the paired ``oracle_sql()`` strings are ANSI
DuckDB equivalents with IDENTICAL output column names.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    from qwery_ray.cdc.engine import CDCLakeEngine
    from qwery_ray.cdc.synth import synth_change_events
    import shutil

    work = "/tmp/qwery_ray_driver/entry"
    shutil.rmtree(work, ignore_errors=True)
    synth_change_events(f"{work}/events", n_keys=500, n_events=3000, seed=42,
                        n_segments=4, evolve_after_lsn=2000)
    lake = CDCLakeEngine(f"{work}/lake", num_partitions=8)
    lake.replay(f"{work}/events", chunk_lsns=1000)
    return lake.dataset()


def _sql(sf_dir: str, text: str):
    from qwery_ray import QweryEngine

    return QweryEngine(table_root=sf_dir).sql(text)


_SQL_QUERIES: dict[str, tuple[str, str | None]] = {
    # name: (qwery-dialect SQL for the Ray engine, oracle SQL or None if same)
    # Float-sum note (q1 / global_aggregates / events_user_stats): DuckDB's
    # SUM(DOUBLE) uses SIMD-chunked accumulation whose exact rounding is not
    # reproducible by any other summation order; the engine produces the
    # exactly-rounded sum (math.fsum merge — order-independent, deterministic
    # at any parallelism). Both engines' results sit within ~1e-13 relative of
    # the true decimal value (money/value columns are 2-decimal data), so
    # ROUND(sum * 10^k, 0) / 10^k snaps both to the SAME exactly-representable
    # integer-valued double (ROUND(x, k) directly is not bit-stable across
    # engines: the nearest double to the k-decimal value is implementation-
    # dependent at large magnitudes). AVGs are phrased snapped-SUM / COUNT so
    # both sides divide bit-identical operands.
    "q1_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, "
        "SUM(l_quantity) AS sum_qty, "
        "ROUND(SUM(l_extendedprice) * 100, 0) / 100 AS sum_base_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)) * 10000, 0) / 10000 "
        "AS sum_disc_price, "
        "AVG(l_quantity) AS avg_qty, "
        "ROUND(SUM(l_discount) * 100, 0) / 100 / COUNT(l_discount) "
        "AS avg_disc, "
        "COUNT(*) AS count_order "
        "FROM lineitem WHERE l_quantity < 50 "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus",
        None),
    "filter_project": (
        "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders "
        "WHERE o_totalprice > 200000 AND o_orderstatus = 'O'",
        None),
    "corr_scalar_select": (
        # correlated scalar subqueries in the SELECT list — decorrelated
        # into LEFT JOINs against grouped subqueries (compiler
        # _decorrelate_select_scalar). COUNT over customers with no
        # matching orders must be 0, MAX stays NULL; the SUM uses the
        # ROUND-snap idiom (see float-sum note above)
        "SELECT c_custkey, c_mktsegment, "
        "(SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) "
        "AS n_orders, "
        "(SELECT MAX(o_orderkey) FROM orders WHERE o_custkey = c_custkey) "
        "AS max_ok, "
        "(SELECT ROUND(SUM(o_totalprice) * 100, 0) / 100 FROM orders "
        "WHERE o_custkey = c_custkey AND o_orderstatus = 'O') "
        "AS open_total "
        "FROM customer WHERE c_custkey % 3 = 0 ORDER BY c_custkey",
        None),
    "computed_column": (
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge "
        "FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07",
        None),
    "case_cast": (
        "SELECT p_partkey, "
        "CASE WHEN p_size > 30 THEN 'large' WHEN p_size > 10 THEN 'medium' "
        "ELSE 'small' END AS size_class, "
        "CAST(p_retailprice AS INT) AS price_int "
        "FROM part WHERE p_brand LIKE 'Brand%'",
        # dialect note: qwery CAST(double AS INT) truncates (reference
        # Expression.getAsInt semantics); DuckDB CAST rounds → FLOOR here
        "SELECT p_partkey, "
        "CASE WHEN p_size > 30 THEN 'large' WHEN p_size > 10 THEN 'medium' "
        "ELSE 'small' END AS size_class, "
        "CAST(FLOOR(p_retailprice) AS INT) AS price_int "
        "FROM part WHERE p_brand LIKE 'Brand%'"),
    "string_funcs": (
        "SELECT c_custkey, UPPER(c_mktsegment) AS seg_upper, "
        "SUBSTRING(c_name, 1, 8) AS name_prefix, "
        "LEN(TRIM(c_name)) AS name_len "
        "FROM customer WHERE c_acctbal > 0",
        "SELECT c_custkey, UPPER(c_mktsegment) AS seg_upper, "
        "SUBSTRING(c_name, 1, 8) AS name_prefix, "
        "LENGTH(TRIM(c_name)) AS name_len "
        "FROM customer WHERE c_acctbal > 0"),
    "sort_limit_topk": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20",
        None),
    "sort_limit_offset": (
        # LIMIT + OFFSET pagination with explicit NULLS placement (fully
        # tie-broken ⇒ deterministic page on both engines)
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC NULLS LAST, o_orderkey "
        "LIMIT 15 OFFSET 5",
        None),
    "union_all_names": (
        "SELECT r_name AS name FROM region UNION ALL "
        "SELECT n_name AS name FROM nation",
        None),
    "distinct_status": (
        "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
        None),
    "global_aggregates": (
        "SELECT COUNT(*) AS n, "
        "ROUND(SUM(o_totalprice) * 100, 0) / 100 AS total, "
        "ROUND(SUM(o_totalprice) * 100, 0) / 100 / COUNT(o_totalprice) "
        "AS mean_price, "
        "MIN(o_totalprice) AS lo, "
        "MAX(o_totalprice) AS hi FROM orders",
        None),
    "group_having": (
        "SELECT o_custkey, COUNT(*) AS n_orders, "
        "ROUND(SUM(o_totalprice) * 100, 0) / 100 AS spend "
        "FROM orders GROUP BY o_custkey HAVING COUNT(*) > 15",
        None),
    "count_distinct_cust": (
        "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers "
        "FROM orders GROUP BY o_orderstatus",
        None),
    "join_broadcast_dims": (
        "SELECT n.n_name, r.r_name FROM nation n "
        "INNER JOIN region r ON n.n_regionkey = r.r_regionkey",
        "SELECT n.n_name, r.r_name FROM nation n "
        "JOIN region r ON n.n_regionkey = r.r_regionkey"),
    "join_filter_agg": (
        "SELECT c.c_mktsegment, COUNT(*) AS n, "
        "ROUND(SUM(o.o_totalprice) * 100, 0) / 100 AS revenue "
        "FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE o.o_orderstatus = 'F' GROUP BY c.c_mktsegment",
        "SELECT c.c_mktsegment, COUNT(*) AS n, "
        "ROUND(SUM(o.o_totalprice) * 100, 0) / 100 AS revenue "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE o.o_orderstatus = 'F' GROUP BY c.c_mktsegment"),
    "join_three_way": (
        "SELECT r.r_name, COUNT(*) AS n_suppliers FROM supplier s "
        "INNER JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "INNER JOIN region r ON n.n_regionkey = r.r_regionkey "
        "GROUP BY r.r_name",
        "SELECT r.r_name, COUNT(*) AS n_suppliers FROM supplier s "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "GROUP BY r.r_name"),
    "left_join_counts": (
        "SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders "
        "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_custkey",
        None),
    "scalar_subquery_filter": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)",
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)"),
    "subquery_source": (
        "SELECT seg, n FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n "
        "FROM customer GROUP BY c_mktsegment) WHERE n > 10",
        "SELECT seg, n FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n "
        "FROM customer GROUP BY c_mktsegment) t WHERE n > 10"),
    "events_hourly_window": (
        "SELECT DATE_TRUNC('hour', ts) AS hour_bucket, event_type, "
        "COUNT(*) AS n_events, "
        "ROUND(SUM(value) * 100, 0) / 100 AS total_value "
        "FROM events GROUP BY DATE_TRUNC('hour', ts), event_type",
        "SELECT DATE_TRUNC('hour', ts) AS hour_bucket, event_type, "
        "COUNT(*) AS n_events, "
        "ROUND(SUM(value) * 100, 0) / 100 AS total_value "
        "FROM events GROUP BY 1, 2"),
    "events_user_stats": (
        "SELECT user_id, COUNT(*) AS n, "
        "ROUND(SUM(value) * 100, 0) / 100 / COUNT(value) AS avg_value, "
        "MAX(value) AS max_value FROM events "
        "WHERE event_type != 'heartbeat' GROUP BY user_id HAVING COUNT(*) > 3",
        None),
    "in_list_filter": (
        "SELECT s_suppkey, s_name FROM supplier "
        "WHERE s_nationkey IN (1, 3, 5) AND s_acctbal IS NOT NULL",
        None),
    "like_filter": (
        "SELECT p_partkey, p_name FROM part "
        "WHERE p_name LIKE '%iv%' OR p_type LIKE 'SMALL%'",
        None),
    "union_distinct_status": (
        "SELECT o_orderstatus AS s FROM orders UNION DISTINCT "
        "SELECT l_linestatus AS s FROM lineitem",
        None),
    # stddev: the engine computes moments (Σx, Σx²) with exact fsum merge,
    # DuckDB streams Welford — agreement is ~1e-7 absolute at these
    # magnitudes, so snap both to cents like the money sums
    "quantile_pricing": (
        # exact holistic quantiles (QUANTILE_CONT linear / MEDIAN): the
        # 0.25/0.75 interpolation of 2-decimal prices lands on quarter
        # cents — snap at 1e4 (interpolation formulas differ in the last
        # ulp between engines; the snapped integer-valued double doesn't)
        "SELECT o_orderstatus, "
        "ROUND(QUANTILE_CONT(o_totalprice, 0.25) * 10000, 0) / 10000 AS q1, "
        "ROUND(QUANTILE_CONT(o_totalprice, 0.75) * 10000, 0) / 10000 AS q3, "
        "ROUND(MEDIAN(o_totalprice) * 10000, 0) / 10000 AS med "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
        "SELECT o_orderstatus, "
        "ROUND(quantile_cont(o_totalprice, 0.25) * 10000, 0) / 10000 AS q1, "
        "ROUND(quantile_cont(o_totalprice, 0.75) * 10000, 0) / 10000 AS q3, "
        "ROUND(median(o_totalprice) * 10000, 0) / 10000 AS med "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "stddev_agg": (
        "SELECT o_orderstatus, "
        "ROUND(STDDEV(o_totalprice) * 100, 0) / 100 AS sd "
        "FROM orders GROUP BY o_orderstatus",
        "SELECT o_orderstatus, "
        "ROUND(STDDEV_SAMP(o_totalprice) * 100, 0) / 100 AS sd "
        "FROM orders GROUP BY o_orderstatus"),
    "semi_join_in_subquery": (
        "SELECT s_suppkey, s_name FROM supplier WHERE s_nationkey IN "
        "(SELECT n_nationkey FROM nation WHERE n_regionkey = 2)",
        None),
    "window_latest_per_customer": (
        "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate DESC, o_orderkey) AS rn FROM orders"
        ") WHERE rn = 1",
        "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate DESC, o_orderkey) AS rn FROM orders"
        ") t WHERE rn = 1"),
    "window_running_total": (
        "SELECT o_custkey, o_orderkey, "
        "SUM(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderkey) AS running_total "
        "FROM orders WHERE o_custkey < 100",
        None),
    "except_setop": (
        "SELECT o_custkey FROM orders EXCEPT "
        "SELECT c_custkey FROM customer WHERE c_acctbal > 5000",
        None),
    "intersect_setop": (
        "SELECT o_custkey FROM orders INTERSECT "
        "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'",
        None),
    "right_join_parts": (
        # RIGHT JOIN with a non-equi residual: unmatched right rows must
        # survive null-extended (the round-1 advisor's outer-join finding)
        "SELECT p.p_partkey, p.p_name, s.s_acctbal AS supp_bal "
        "FROM supplier s "
        "RIGHT JOIN part p ON s.s_suppkey = p.p_partkey AND s.s_acctbal > 0 "
        "WHERE p.p_partkey < 200",
        "SELECT p.p_partkey, p.p_name, s.s_acctbal AS supp_bal "
        "FROM supplier s "
        "RIGHT JOIN part p ON s.s_suppkey = p.p_partkey AND s.s_acctbal > 0 "
        "WHERE p.p_partkey < 200"),
    "full_join_keys": (
        "SELECT o_custkey AS k, COUNT(*) AS n FROM ("
        "SELECT o.o_custkey FROM orders o "
        "FULL JOIN customer c ON o.o_custkey = c.c_custkey"
        ") GROUP BY o_custkey",
        "SELECT COALESCE(o.o_custkey, c.c_custkey) AS k, COUNT(*) AS n "
        "FROM orders o FULL JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY COALESCE(o.o_custkey, c.c_custkey)"),
    # 4-row moving average of 2-decimal prices = quarter-cents exactly, so
    # snap at 10^4 (integer-valued target; a cent snap would sit ON the
    # half boundary and ulp noise would flip it per engine)
    "window_moving_avg": (
        "SELECT o_orderkey, "
        "ROUND(AVG(o_totalprice) OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) "
        "* 10000, 0) / 10000 AS ma "
        "FROM orders WHERE o_custkey < 100",
        None),
    "tpch_q3_shape": (
        # TPC-H Q3 shape: 3-way join + filter + grouped revenue + top-k
        "SELECT o.o_orderkey AS l_orderkey, "  # key coalesces to the left name
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) "
        "/ 10000 AS revenue, o.o_orderdate "
        "FROM customer c "
        "INNER JOIN orders o ON c.c_custkey = o.o_custkey "
        "INNER JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < DATE_PARSE('1998-01-01', 'yyyy-MM-dd') "
        "AND l.l_shipdate > DATE_PARSE('1998-01-01', 'yyyy-MM-dd') "
        "GROUP BY o.o_orderkey, o.o_orderdate "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10",
        "SELECT o.o_orderkey AS l_orderkey, "  # key coalesces to the left name
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) "
        "/ 10000 AS revenue, o.o_orderdate "
        "FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
        "AND l.l_shipdate > TIMESTAMP '1998-01-01' "
        "GROUP BY o.o_orderkey, o.o_orderdate "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "tpch_q4_shape": (
        # TPC-H Q4 shape: date-filtered orders counted by priority, gated
        # on a correlated EXISTS against lineitem (decorrelated semi-join);
        # COUNT(*) is integer-exact on both engines
        "SELECT o.o_orderpriority, COUNT(*) AS order_count FROM orders o "
        "WHERE o.o_orderdate >= DATE_PARSE('1997-01-01', 'yyyy-MM-dd') "
        "AND EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') "
        "GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority",
        "SELECT o.o_orderpriority, COUNT(*) AS order_count FROM orders o "
        "WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' "
        "AND EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') "
        "GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"),
    "tpch_q5_shape": (
        # TPC-H Q5 shape: 5-way join through region, grouped revenue
        "SELECT n.n_name, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) "
        "/ 10000 AS revenue "
        "FROM customer c "
        "INNER JOIN orders o ON c.c_custkey = o.o_custkey "
        "INNER JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "INNER JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "INNER JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'ASIA' "
        "GROUP BY n.n_name ORDER BY revenue DESC",
        "SELECT n.n_name, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) "
        "/ 10000 AS revenue "
        "FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'ASIA' "
        "GROUP BY n.n_name ORDER BY revenue DESC"),
    "corr_above_cust_avg": (
        # equality-correlated scalar subquery (decorrelated to a grouped
        # join); inner aggregate snapped so both engines compare against
        # bit-identical thresholds
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders o "
        "WHERE o_totalprice > (SELECT ROUND(SUM(o2.o_totalprice) * 100, 0) "
        "/ 100 / COUNT(o2.o_totalprice) * 1.2 FROM orders o2 "
        "WHERE o2.o_custkey = o.o_custkey)",
        None),
    "window_range_frame": (
        # RANGE value-offset frame; l_quantity is integer-valued so the
        # windowed sums are exact doubles on both engines, and RANGE peer
        # semantics make the result independent of tie order
        "SELECT l_orderkey, l_linenumber, l_quantity, "
        "SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_quantity "
        "RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS qty_range_sum "
        "FROM lineitem WHERE l_orderkey < 3000",
        None),
    "quantified_all_any": (
        # op ALL / ANY quantified subqueries (reduced to one aggregate pass
        # + literal-bound comparison); integer-exact COUNT outputs
        "SELECT COUNT(*) AS n_above_all, "
        "(SELECT COUNT(*) FROM customer WHERE c_acctbal < ANY "
        "(SELECT o_totalprice / 100 FROM orders WHERE o_orderstatus = 'P')) "
        "AS n_below_any "
        "FROM orders WHERE o_totalprice > ALL "
        "(SELECT c_acctbal FROM customer)",
        None),
    "tpch_q6_shape": (
        # TPC-H Q6 shape: date-window via DATE literal + INTERVAL
        # arithmetic, BETWEEN on discount, global sum. Discount×price
        # products are quarter-cent-granular → snap at 1e4 scale.
        "SELECT ROUND(SUM(l_extendedprice * l_discount) * 10000, 0) "
        "/ 10000 AS revenue FROM lineitem "
        "WHERE l_shipdate >= DATE '1995-01-01' "
        "AND l_shipdate < DATE '1995-01-01' + INTERVAL 1 YEAR "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24",
        None),
    "rollup_pricing": (
        # ROLLUP subtotals + GROUPING() masks; one input shuffle, coarser
        # levels re-aggregate the finest partials. Sums snapped to integer
        # cents for cross-engine bit-stability.
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        "ROUND(SUM(l_quantity) * 100, 0) / 100 AS sum_qty, "
        "ROUND(SUM(l_extendedprice) * 100, 0) / 100 AS sum_price, "
        "GROUPING(l_returnflag) AS g1, GROUPING(l_linestatus) AS g2 "
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)",
        None),
    "window_centered_frame": (
        # general ROWS frame (PRECEDING AND FOLLOWING): centered moving
        # sum over integer-valued quantities with fully tie-broken order
        # (ROWS under ties is order-nondeterministic on any engine)
        "SELECT l_orderkey, l_linenumber, l_extendedprice, "
        "SUM(l_quantity) OVER (PARTITION BY l_orderkey "
        "ORDER BY l_linenumber, l_extendedprice, l_quantity "
        "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS ctr_sum "
        "FROM lineitem WHERE l_orderkey < 3000",
        None),
    "window_time_range": (
        # time-based RANGE frames (INTERVAL offsets on a timestamp ORDER BY
        # key). COUNT is integer-exact; the windowed SUM over 2-decimal
        # values is snapped to integer cents so both engines compare
        # bit-identical doubles. RANGE peer semantics ⇒ tie-order free.
        "SELECT event_id, "
        "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING "
        "AND INTERVAL 30 MINUTE FOLLOWING) AS n_near, "
        "ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
        "* 100, 0) / 100 AS s_trailing_hr "
        "FROM events",
        None),
    "exists_semijoin": (
        # correlated EXISTS → left_semi join on the correlation key
        "SELECT c_custkey, c_name FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 200000) ORDER BY c_custkey",
        None),
    "not_exists_antijoin": (
        # correlated NOT EXISTS → left_anti join (null keys never match on
        # either engine — ANSI EXISTS semantics need no NOT-IN null dance)
        "SELECT c_custkey, c_acctbal FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 300000) ORDER BY c_custkey",
        None),
    "between_filter": (
        "SELECT l_orderkey, l_quantity FROM lineitem "
        "WHERE l_quantity BETWEEN 10 AND 12 AND l_returnflag = 'R'",
        None),
    "tpch_q13_shape": (
        # TPC-H Q13 shape: order-count distribution — LEFT JOIN with a
        # non-equi/LIKE residual (unmatched customers count 0), grouped
        # twice; all-integer outputs
        "SELECT c_count, COUNT(*) AS custdist FROM ("
        "SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count "
        "FROM customer c LEFT JOIN orders o "
        "ON c.c_custkey = o.o_custkey AND o.o_orderpriority LIKE '1%' "
        "GROUP BY c.c_custkey"
        ") GROUP BY c_count ORDER BY custdist DESC, c_count DESC",
        "SELECT c_count, COUNT(*) AS custdist FROM ("
        "SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count "
        "FROM customer c LEFT JOIN orders o "
        "ON c.c_custkey = o.o_custkey AND o.o_orderpriority LIKE '1%' "
        "GROUP BY c.c_custkey"
        ") t GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
    "tpch_q14_shape": (
        # TPC-H Q14 shape: promo revenue ratio — conditional SUM over a
        # join, date window. Numerator and denominator are snapped to
        # integer-valued doubles separately, so the quotient divides
        # bit-identical operands on both engines
        "SELECT ROUND(SUM(CASE WHEN p.p_type = 'PROMO' "
        "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) * 10000, 0) "
        "/ ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) "
        "AS promo_frac "
        "FROM lineitem l INNER JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE l.l_shipdate >= DATE '1997-01-01' "
        "AND l.l_shipdate < DATE '1997-01-01' + INTERVAL 3 MONTH",
        "SELECT ROUND(SUM(CASE WHEN p.p_type = 'PROMO' "
        "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) * 10000, 0) "
        "/ ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) "
        "AS promo_frac "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l.l_shipdate < TIMESTAMP '1997-04-01'"),
    "tpch_q17_shape": (
        # TPC-H Q17 shape: small-quantity orders — correlated scalar AVG
        # per part, decorrelated to a grouped join. l_quantity is
        # integer-valued so AVG = exact-sum / count is bit-stable
        "SELECT ROUND(SUM(l.l_extendedprice) * 100, 0) / 100 AS total_price "
        "FROM lineitem l INNER JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE p.p_brand = 'Brand#23' "
        "AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 "
        "WHERE l2.l_partkey = l.l_partkey)",
        "SELECT ROUND(SUM(l.l_extendedprice) * 100, 0) / 100 AS total_price "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE p.p_brand = 'Brand#23' "
        "AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 "
        "WHERE l2.l_partkey = l.l_partkey)"),
    "tpch_q18_shape": (
        # TPC-H Q18 shape: large-volume orders — IN over a grouped HAVING
        # subquery (semi-join), topped and limited; SUM(int-valued) exact
        "SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice "
        "FROM customer c INNER JOIN orders o ON c.c_custkey = o.o_custkey "
        "WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem "
        "GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) "
        "ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100",
        "SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem "
        "GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) "
        "ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100"),
    "tpch_q19_shape": (
        # TPC-H Q19 shape: disjunctive brand/quantity/size predicates over
        # a join (no p_container in the test schema; brand+size stand in)
        "SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000, 0)"
        " / 10000 AS revenue "
        "FROM lineitem l INNER JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11 "
        "AND p.p_size BETWEEN 1 AND 5) "
        "OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20 "
        "AND p.p_size BETWEEN 1 AND 10) "
        "OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30 "
        "AND p.p_size BETWEEN 1 AND 15)",
        "SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000, 0)"
        " / 10000 AS revenue "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11 "
        "AND p.p_size BETWEEN 1 AND 5) "
        "OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20 "
        "AND p.p_size BETWEEN 1 AND 10) "
        "OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30 "
        "AND p.p_size BETWEEN 1 AND 15)"),
    "tpch_q21_shape": (
        # TPC-H Q21 shape: suppliers on returned multi-supplier orders —
        # correlated EXISTS with a NON-EQUI residual (l2.l_suppkey <>
        # l1.l_suppkey) decorrelated to a residual-filtered semi-join
        "SELECT s.s_name, COUNT(*) AS numwait "
        "FROM supplier s INNER JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey "
        "WHERE l1.l_returnflag = 'R' "
        "AND EXISTS (SELECT 1 FROM lineitem l2 "
        "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey != l1.l_suppkey) "
        "GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 20",
        "SELECT s.s_name, COUNT(*) AS numwait "
        "FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey "
        "WHERE l1.l_returnflag = 'R' "
        "AND EXISTS (SELECT 1 FROM lineitem l2 "
        "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) "
        "GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 20"),
    "tpch_q22_shape": (
        # TPC-H Q22 shape: country-code aggregate over customers above the
        # (snapped) mean balance with no big orders — scalar subquery +
        # correlated NOT EXISTS in one WHERE, SUBSTR-derived group key
        "SELECT cntrycode, COUNT(*) AS numcust, "
        "ROUND(SUM(acctbal) * 100, 0) / 100 AS totacctbal "
        "FROM (SELECT RIGHT(c.c_name, 2) AS cntrycode, c.c_acctbal AS acctbal "
        "FROM customer c "
        "WHERE c.c_acctbal > (SELECT ROUND(SUM(c2.c_acctbal) * 100, 0) / 100 "
        "/ COUNT(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0) "
        "AND NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)) "
        "GROUP BY cntrycode ORDER BY cntrycode",
        "SELECT cntrycode, COUNT(*) AS numcust, "
        "ROUND(SUM(acctbal) * 100, 0) / 100 AS totacctbal "
        "FROM (SELECT RIGHT(c.c_name, 2) AS cntrycode, c.c_acctbal AS acctbal "
        "FROM customer c "
        "WHERE c.c_acctbal > (SELECT ROUND(SUM(c2.c_acctbal) * 100, 0) / 100 "
        "/ COUNT(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0) "
        "AND NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)) t "
        "GROUP BY cntrycode ORDER BY cntrycode"),
    "tpch_q11_shape": (
        # TPC-H Q11 shape: group sums filtered by a fraction of the global
        # sum — scalar subquery inside HAVING; both sides snapped
        "SELECT s_nationkey, ROUND(SUM(s_acctbal) * 100, 0) / 100 AS bal "
        "FROM supplier GROUP BY s_nationkey "
        "HAVING ROUND(SUM(s_acctbal) * 100, 0) / 100 > "
        "(SELECT ROUND(SUM(s2.s_acctbal) * 100, 0) / 100 * 0.04 "
        "FROM supplier s2) ORDER BY bal DESC",
        None),
    "tpch_q7_shape": (
        # TPC-H Q7 shape: bilateral nation trade volume — nation joined
        # TWICE under different aliases (supplier's and customer's side),
        # disjunctive pair filter, YEAR() bucket, snapped revenue
        "SELECT supp_nation, cust_nation, l_year, "
        "ROUND(SUM(volume) * 10000, 0) / 10000 AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "YEAR(l.l_shipdate) AS l_year, "
        "l.l_extendedprice * (1 - l.l_discount) AS volume "
        "FROM supplier s "
        "INNER JOIN lineitem l ON s.s_suppkey = l.l_suppkey "
        "INNER JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "INNER JOIN customer c ON c.c_custkey = o.o_custkey "
        "INNER JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
        "INNER JOIN nation n2 ON c.c_nationkey = n2.n_nationkey "
        "WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10') "
        "OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9')"
        ") GROUP BY supp_nation, cust_nation, l_year "
        "ORDER BY supp_nation, cust_nation, l_year",
        "SELECT supp_nation, cust_nation, l_year, "
        "ROUND(SUM(volume) * 10000, 0) / 10000 AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "year(l.l_shipdate) AS l_year, "
        "l.l_extendedprice * (1 - l.l_discount) AS volume "
        "FROM supplier s "
        "JOIN lineitem l ON s.s_suppkey = l.l_suppkey "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey "
        "WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10') "
        "OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9')"
        ") t GROUP BY supp_nation, cust_nation, l_year "
        "ORDER BY supp_nation, cust_nation, l_year"),
    "tpch_q8_shape": (
        # TPC-H Q8 shape: market share = conditional-SUM ratio per year;
        # numerator and denominator snapped separately so the quotient
        # divides bit-identical integer-valued doubles
        "SELECT l_year, "
        "ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) "
        "* 10000, 0) / ROUND(SUM(volume) * 10000, 0) AS mkt_share FROM ("
        "SELECT YEAR(o.o_orderdate) AS l_year, "
        "l.l_extendedprice * (1 - l.l_discount) AS volume, "
        "n1.n_name AS nation "
        "FROM part p "
        "INNER JOIN lineitem l ON p.p_partkey = l.l_partkey "
        "INNER JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "INNER JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "INNER JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
        "WHERE p.p_type = 'PROMO'"
        ") GROUP BY l_year ORDER BY l_year",
        "SELECT l_year, "
        "ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) "
        "* 10000, 0) / ROUND(SUM(volume) * 10000, 0) AS mkt_share FROM ("
        "SELECT year(o.o_orderdate) AS l_year, "
        "l.l_extendedprice * (1 - l.l_discount) AS volume, "
        "n1.n_name AS nation "
        "FROM part p "
        "JOIN lineitem l ON p.p_partkey = l.l_partkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
        "WHERE p.p_type = 'PROMO'"
        ") t GROUP BY l_year ORDER BY l_year"),
    "tpch_q10_shape": (
        # TPC-H Q10 shape: returned-item revenue per customer over a date
        # window — 4-way join, grouped snapped revenue, top-k
        "SELECT c.c_custkey, c.c_name, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) "
        "/ 10000 AS revenue, n.n_name "
        "FROM customer c "
        "INNER JOIN orders o ON c.c_custkey = o.o_custkey "
        "INNER JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "INNER JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE o.o_orderdate >= DATE '1996-01-01' "
        "AND o.o_orderdate < DATE '1996-04-01' AND l.l_returnflag = 'R' "
        "GROUP BY c.c_custkey, c.c_name, n.n_name "
        "ORDER BY revenue DESC, c.c_custkey LIMIT 20",
        "SELECT c.c_custkey, c.c_name, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) "
        "/ 10000 AS revenue, n.n_name "
        "FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE o.o_orderdate >= DATE '1996-01-01' "
        "AND o.o_orderdate < DATE '1996-04-01' AND l.l_returnflag = 'R' "
        "GROUP BY c.c_custkey, c.c_name, n.n_name "
        "ORDER BY revenue DESC, c.c_custkey LIMIT 20"),
    "tpch_q15_shape": (
        # TPC-H Q15 shape: WITH revenue CTE (grouped snapped sums), join
        # to supplier, filter to the CTE's MAX via an uncorrelated scalar
        # subquery OVER THE CTE — exercises statement-scoped views
        "WITH revenue AS (SELECT l_suppkey, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)) * 10000, 0) / 10000 "
        "AS total_rev FROM lineitem GROUP BY l_suppkey) "
        "SELECT s.s_suppkey, s.s_name, r.total_rev FROM supplier s "
        "INNER JOIN revenue r ON s.s_suppkey = r.l_suppkey "
        "WHERE r.total_rev = (SELECT MAX(r2.total_rev) FROM revenue r2) "
        "ORDER BY s.s_suppkey",
        "WITH revenue AS (SELECT l_suppkey, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)) * 10000, 0) / 10000 "
        "AS total_rev FROM lineitem GROUP BY l_suppkey) "
        "SELECT s.s_suppkey, s.s_name, r.total_rev FROM supplier s "
        "JOIN revenue r ON s.s_suppkey = r.l_suppkey "
        "WHERE r.total_rev = (SELECT MAX(r2.total_rev) FROM revenue r2) "
        "ORDER BY s.s_suppkey"),
    "corr_max_per_nation": (
        # TPC-H Q2 shape (no partsupp in the test schema): row = the
        # groupwise MAX via an equality-correlated scalar subquery; MAX
        # picks an existing double so = compares bit-identical values
        "SELECT s.s_suppkey, s.s_name, s.s_acctbal FROM supplier s "
        "WHERE s.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2 "
        "WHERE s2.s_nationkey = s.s_nationkey) ORDER BY s.s_suppkey",
        None),
    "asof_join_events": (
        # ASOF JOIN (time-series nearest-match; DuckDB-compatible syntax
        # and semantics): each purchase pairs with the same user's latest
        # click at-or-before it. Subquery sides exercise the bucket-shuffle
        # path; (user_id, ts) is unique in the generator, so the match is
        # deterministic. qwery_ray/sqlc/asof.py
        "SELECT p.event_id, p.user_id, p.ts, "
        "c.event_id AS click_id, c.ts AS click_ts "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts",
        None),
    "semi_anti_join": (
        # SEMI/ANTI JOIN surface (DuckDB syntax): customers with an order
        # over 100k but no order under 5k — key-only probe ships only key
        # columns; compiler._compile_semi_anti
        "SELECT c.c_custkey, c.c_acctbal FROM customer c "
        "SEMI JOIN (SELECT * FROM orders WHERE o_totalprice > 100000) big "
        "ON big.o_custkey = c.c_custkey "
        "ANTI JOIN (SELECT * FROM orders WHERE o_totalprice < 5000) small "
        "ON small.o_custkey = c.c_custkey",
        None),
    "pivot_events": (
        # dynamic PIVOT (DuckDB simplified syntax): one SUM column per
        # event_type, discovered sorted; rewrites to CASE-filtered
        # aggregates in ONE groupby pass (sqlc/parser.py pivot_to_select).
        # SUM over cent-snapped integers is order-independent → bit-equal
        # to DuckDB regardless of summation order (q1 idiom)
        "PIVOT events ON event_type USING SUM(ROUND(value * 100, 0)) "
        "GROUP BY user_id",
        None),
    "unpivot_events": (
        # UNPIVOT wide→long: streams per batch, no shuffle; NULLs excluded
        "UNPIVOT (SELECT user_id, event_id, value FROM events "
        "WHERE event_id < 500) ON event_id, value INTO NAME metric VALUE v",
        None),
    "unnest_embedding_stats": (
        # UNNEST explodes list<float> vectors to one row per element
        # (streaming flat_map — pc.list_flatten + parent-index take, no
        # shuffle), then re-aggregates. MIN/MAX/COUNT are exact (no float
        # accumulation), so the value hash is stable across engines.
        "SELECT vec_id, COUNT(*) AS n, "
        "ROUND(CAST(MIN(v) AS DOUBLE), 5) AS mn, "
        "ROUND(CAST(MAX(v) AS DOUBLE), 5) AS mx "
        "FROM (SELECT vec_id, UNNEST(embedding) AS v FROM embeddings) "
        "GROUP BY vec_id ORDER BY vec_id LIMIT 200",
        None),
    "list_membership_counts": (
        # list literals + LIST_CONTAINS membership over a computed key
        "SELECT list_contains([2, 3, 5, 7], CAST(vec_id % 10 AS INT)) "
        "AS hit, COUNT(*) AS n FROM embeddings GROUP BY hit ORDER BY hit",
        None),
    "list_string_ops": (
        # list_sort / array_to_string over split() output (char-class split
        # is qwery dialect — the oracle spells it str_split_regex)
        "SELECT doc_id, array_to_string(list_sort(split(lang, '[-]')), '|') "
        "AS lang_key FROM documents ORDER BY doc_id LIMIT 500",
        "SELECT doc_id, array_to_string(list_sort(str_split_regex(lang, "
        "'[-]')), '|') AS lang_key FROM documents ORDER BY doc_id "
        "LIMIT 500"),
    "recursive_spine": (
        # WITH RECURSIVE (semi-naive fixpoint, sqlc/recursive.py): a
        # generated 1..50 quantity spine LEFT-joined to lineitem — each
        # fixpoint iteration is a full distributed query; only the working
        # table materializes. Integer COUNT/SUM keep the value hash exact.
        # Identical text runs on DuckDB (l_quantity is integral, so cast
        # truncation == rounding). CAST idiom (r3 verdict): literal spines
        # type as int32 in DuckDB and SUM(INT) widens to HUGEINT/decimal —
        # spell explicit BIGINT casts on the spine column AND the SUM so
        # both engines emit int64 (same trap as json_props_rollup; apply to
        # any future recursive / integer-literal shape).
        "WITH RECURSIVE qty(q) AS (SELECT 1 UNION ALL "
        "SELECT q + 1 FROM qty WHERE q < 50) "
        "SELECT CAST(q.q AS BIGINT) AS q, COUNT(l.l_orderkey) AS n_items, "
        "CAST(COALESCE(SUM(CAST(l.l_quantity AS INT)), 0) AS BIGINT) "
        "AS sum_qty "
        "FROM qty q LEFT JOIN lineitem l ON CAST(l.l_quantity AS INT) = q.q "
        "GROUP BY q.q ORDER BY q.q",
        None),
    "recursive_paths": (
        # Second WITH RECURSIVE shape (r3 verdict item 10): a deterministic
        # pseudo-random walk accumulating a STRING path (|| concat inside
        # the recursive term) then joined back to a real table — exercises
        # recursion state wider than one int and the CAST idiom documented
        # on recursive_spine (every numeric column spelled BIGINT on both
        # engines; strings hash identically by construction).
        "WITH RECURSIVE walk(d, nk, path) AS ("
        "SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'N0' "
        "UNION ALL SELECT d + 1, (nk * 7 + 3) % 25, "
        "path || '>N' || CAST((nk * 7 + 3) % 25 AS VARCHAR) "
        "FROM walk WHERE d < 20) "
        "SELECT w.d, w.nk, w.path, n.n_name "
        "FROM walk w JOIN nation n ON CAST(n.n_nationkey AS BIGINT) = w.nk "
        "ORDER BY w.d",
        None),
    "window_exclude": (
        # ANSI frame EXCLUDE (CURRENT ROW) over a ROWS frame — integer-cent
        # sums keep the hash exact; ORDER BY fully tie-broken. GROUPS-mode
        # frames are golden-tested (this DuckDB predates GROUPS support).
        "SELECT event_id, "
        "SUM(ROUND(value * 100, 0)) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING "
        "EXCLUDE CURRENT ROW) AS s_cents "
        "FROM events ORDER BY event_id LIMIT 1000",
        None),
    "lateral_unnest": (
        # FROM-clause lateral UNNEST (explode against the left frame —
        # list_parent_indices + take per batch, zero shuffle). MIN/MAX/
        # COUNT only → bit-stable hash (same idiom as
        # unnest_embedding_stats, which covers SELECT-level UNNEST).
        "SELECT vec_id, COUNT(*) AS n, "
        "ROUND(CAST(MIN(v) AS DOUBLE), 5) AS mn, "
        "ROUND(CAST(MAX(v) AS DOUBLE), 5) AS mx "
        "FROM embeddings, UNNEST(embedding) AS u(v) "
        "GROUP BY vec_id ORDER BY vec_id LIMIT 200",
        None),
    "implicit_join_series": (
        # SQL-92 implicit (comma) joins — WHERE equality conjuncts promote
        # into real equi-joins (compiler._promote_cross_equi), never a
        # filtered cartesian — plus the GENERATE_SERIES table function
        # (lazy distributed ray.data.range). Integer/string outputs only →
        # bit-stable hash.
        "SELECT n_name, x, COUNT(*) AS n "
        "FROM nation, region, generate_series(1, 2) t(x) "
        "WHERE n_regionkey = r_regionkey AND r_name = 'ASIA' "
        "GROUP BY n_name, x ORDER BY n_name, x",
        None),
    "covar_regression": (
        # two-argument (co)moment family (COVAR/CORR/REGR_*): shared
        # (cnt,Σx,Σy,Σx²,Σy²,Σxy) partials, exact order-independent fsum
        # merge (compiler.BIMOMENT_AGGS). DuckDB computes these with online
        # Welford updates vs our raw-moment sums — agreement is ~1e-9
        # relative, so every float output is snapped (q1 idiom) to a grid
        # both engines round identically.
        "SELECT l_returnflag, "
        "REGR_COUNT(l_extendedprice, l_quantity) AS n_pairs, "
        "ROUND(CORR(l_extendedprice, l_quantity) * 1000000, 0) / 1000000 "
        "AS corr6, "
        "ROUND(REGR_SLOPE(l_extendedprice, l_quantity) * 10000, 0) / 10000 "
        "AS slope4, "
        "ROUND(COVAR_POP(l_extendedprice, l_quantity) * 100, 0) / 100 "
        "AS covp2, "
        "ROUND(REGR_AVGX(l_extendedprice, l_quantity) * 10000, 0) / 10000 "
        "AS avgx4 "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
        None),
    "vocab_topk": (
        # corpus vocabulary head: lateral UNNEST of a computed list
        # (SPLIT, the reference's char-class splitter — qwery
        # StringFunctions Split) feeding a grouped count + top-k. The
        # oracle spells the same explode in DuckDB syntax (string_split);
        # single-space delimiter makes the two splitters identical.
        "SELECT tok AS word, COUNT(*) AS n FROM documents, "
        "UNNEST(SPLIT(text, ' ')) AS u(tok) "
        "GROUP BY tok ORDER BY n DESC, word LIMIT 100",
        "SELECT tok AS word, COUNT(*) AS n FROM (SELECT "
        "unnest(string_split(text, ' ')) AS tok FROM documents) "
        "GROUP BY tok ORDER BY n DESC, word LIMIT 100"),
    "json_props_rollup": (
        # JSON extraction over the events.props JSON-string column: the
        # ->> operator feeds a grouped integer metric. Oracle is the SAME
        # SQL (DuckDB's json extension) with the engine-side SUM cast
        # spelled identically so the hash matches HUGEINT vs int64.
        "SELECT event_type, "
        "CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_total, "
        "COUNT(*) AS n FROM events WHERE json_valid(props) "
        "GROUP BY event_type ORDER BY event_type",
        None),
    "having_exists": (
        # r5: [NOT] EXISTS in HAVING (deferred past the aggregate,
        # decorrelated against the grouped frame). Standard-form
        # correlation; same ANSI text runs on both engines.
        "SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM customer GROUP BY 1 HAVING EXISTS (SELECT 1 FROM nation "
        "WHERE n_nationkey = c_nationkey AND n_regionkey <= 1) "
        "ORDER BY k",
        None),
    "exists_in_case": (
        # r5: correlated [NOT] EXISTS nested inside CASE — in the SELECT
        # list (count-subquery decorrelation into a grouped LEFT JOIN)
        # and under a WHERE CASE. Same ANSI text runs on both engines.
        "SELECT c_custkey AS c0, CASE WHEN EXISTS (SELECT 1 FROM orders "
        "WHERE o_custkey = c_custkey AND o_totalprice > 200000) THEN 1 "
        "WHEN c_acctbal < 0 THEN 2 ELSE 0 END AS c1 "
        "FROM customer ORDER BY c0",
        None),
}


# The driver's CORRECTNESS file records only the FIRST 50 queries() entries
# (insertion order). Round 2 left the 13 ops entries and 9 late TPC-H shapes
# outside that window with no driver-verified row. This list pins the checked
# window: the flagship CDC replay + every training-data op first, then the
# never-yet-driver-verified SQL shapes, then one representative per SQL
# operator family. Entries past position 50 all have green CORRECTNESS_r02
# rows (they were inside round 2's window).
_DRIVER_WINDOW_PRIORITY = [
    # ROUND-5 WINDOW (r4 verdict item 1): (a) the two previously-no_oracle
    # rows, now given full DuckDB oracles via pinned centroids, plus
    # merge_apply, whose file-target source side was re-bounded this round
    # — all three re-verify post-change; (b) the two set-op rows touched
    # by this round's _drop_empty_blocks hardening; (c) the 45 entries
    # last driver-verified in r3 — BEFORE round 4's fuzz-driven compiler
    # fixes (empty set-op sides, IN three-valued NULLs, LPAD/RPAD,
    # grouping-sets-empty, LAG/LEAD signed literals) — rotated back in for
    # a post-fix record. Everything below the boundary was driver-green in
    # r4 (CORRECTNESS_r04.json) and stays covered by gate_sim locally.
    "embedding_kmeans", "semantic_dedup", "merge_apply",
    # (a') r5 NEW surfaces, driver-rowed immediately: MERGE INTO lake and
    # nested-EXISTS-in-CASE (the two lowest-risk twice-green tail entries,
    # filter_project and using_sample, move below the boundary to make
    # room — both stay gate_sim-covered; using_sample is rows-only anyway)
    "lake_merge_apply", "exists_in_case",
    # (b) set-op rows over the hardened empty-block path
    "union_all_names", "distinct_status",
    # (c) the r3-verified tail, in r3 window order
    "cdc_replay", "events_lake_lww", "exact_dedup", "token_count",
    "text_quality", "doc_fingerprint", "minhash_near_dups",
    "simhash_signatures", "embedding_dups",
    "events_sliding_window", "events_sessions", "pii_redact",
    "repetition_quality", "decontaminate_docs", "stratified_sample",
    "gopher_filter", "asof_join_events", "bm25_scores",
    "covar_regression", "implicit_join_series", "lateral_unnest",
    "pack_sequences", "lm_quality_score",
    "chunk_documents", "block_dedup_docs", "dup_span_docs", "vocab_topk",
    "dsir_weights", "bpe_tokens", "streaming_window",
    "tpch_q19_shape", "tpch_q21_shape", "tpch_q22_shape", "tpch_q11_shape",
    "tpch_q15_shape", "corr_max_per_nation",
    "pivot_events", "unpivot_events", "semi_anti_join", "window_exclude",
    "list_membership_counts", "list_string_ops", "unnest_embedding_stats",
    # --- window boundary (50) ---
    "filter_project", "using_sample", "having_exists",
    # r4-green entries (CORRECTNESS_r04.json rows all green), kept below
    # the window in r4 order; gate_sim still checks them locally
    "recursive_spine", "recursive_paths",
    "string_funcs", "quantile_pricing", "stddev_agg", "rollup_pricing",
    "window_latest_per_customer", "window_running_total",
    "window_moving_avg", "window_range_frame", "window_centered_frame",
    "window_time_range",
    "tpch_q3_shape", "tpch_q4_shape", "tpch_q5_shape", "tpch_q6_shape",
    "tpch_q13_shape", "tpch_q14_shape", "tpch_q17_shape", "tpch_q18_shape",
    "json_props_rollup", "subquery_source",
    "q1_pricing_summary", "global_aggregates",
    "case_cast", "sort_limit_offset",
    "group_having", "count_distinct_cust",
    "join_filter_agg", "join_three_way", "left_join_counts",
    "full_join_keys", "scalar_subquery_filter",
    "semi_join_in_subquery", "exists_semijoin", "not_exists_antijoin",
    "corr_above_cust_avg", "quantified_all_any", "events_hourly_window",
    "tpch_q7_shape", "tpch_q8_shape", "tpch_q10_shape",
    "near_dup_components", "ann_topk", "corr_scalar_select",
]


def _window_order(d: dict) -> dict:
    out = {n: d[n] for n in _DRIVER_WINDOW_PRIORITY if n in d}
    out.update({n: v for n, v in d.items() if n not in out})
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from qwery_ray.pipelines import driver_queries as dq

    out: dict[str, Callable[[str], Any]] = {}
    for name, (sql_text, _oracle) in _SQL_QUERIES.items():
        out[name] = (lambda sf_dir, _s=sql_text: _sql(sf_dir, _s))
    out.update({
        "cdc_replay": dq.cdc_replay,
        "events_lake_lww": dq.events_lake_lww,
        "lake_merge_apply": dq.lake_merge_apply,    # full SQL oracle (r5)
        "exact_dedup": dq.exact_dedup_docs,
        "token_count": dq.token_counts,
        "text_quality": dq.text_quality,          # full SQL oracle
        # doc_fingerprint: NO SQL ORACLE — the 64-bit rolling polynomial
        # min-hash over byte k-grams has no DuckDB equivalent; instead an
        # independent pure-Python reimplementation gates it in
        # tests/test_ops.py (golden cross-check), driver records rows-only.
        "doc_fingerprint": dq.doc_fingerprints,
        # minhash_near_dups: NO SQL ORACLE — probabilistic LSH sketch; the
        # query SELF-CHECKS recall against exact n-gram Jaccard at gate
        # scale (raises if any true J≥0.9 pair beyond 1% is missed).
        "minhash_near_dups": dq.minhash_near_dups,
        "simhash_signatures": dq.simhash_sigs,    # full SQL oracle (md5 bits)
        "ann_topk": dq.ann_topk,
        "embedding_dups": dq.embedding_dups,
        "events_sliding_window": dq.events_sliding_window,  # SQL oracle
        "events_sessions": dq.events_sessions,              # SQL oracle
        "pii_redact": dq.pii_redact,                        # SQL oracle
        "repetition_quality": dq.repetition_quality,        # SQL oracle
        "decontaminate_docs": dq.decontaminate_docs,        # SQL oracle
        "stratified_sample": dq.stratified_docs,            # SQL oracle
        # embedding_kmeans / semantic_dedup: FULL SQL ORACLES as of r5 —
        # both driver rows pin the centroids (deterministic smallest-id
        # init, zero Lloyd iterations) so assignment is a CROSS JOIN
        # argmin and the dedup winner a self-join window in DuckDB; the
        # ITERATIVE paths stay gated by the naive-numpy references +
        # layout-invariance tests in tests/test_clustering.py.
        "embedding_kmeans": dq.embedding_kmeans,
        "semantic_dedup": dq.semantic_dedup_docs,
        "gopher_filter": dq.gopher_filter,                  # SQL oracle
        "merge_apply": dq.merge_apply,                      # SQL oracle
        "bm25_scores": dq.bm25_keyword_scores,              # SQL oracle
        # pack_sequences / lm_quality_score: NO SQL ORACLE (greedy bin
        # assignment / log-space model scoring); independent naive
        # references + invariance gates in tests/test_packing.py, and
        # pack_sequences self-checks its invariants at gate scale.
        "pack_sequences": dq.pack_sequences_docs,
        "lm_quality_score": dq.lm_quality_score,
        # using_sample: NO SQL ORACLE possible (DuckDB samples via RNG;
        # this engine samples via seeded content hash — deterministic,
        # so the rows-only record is stable); tests/test_sample.py.
        "using_sample": dq.using_sample_rows,
        "chunk_documents": dq.chunk_documents,   # full SQL oracle
        "near_dup_components": dq.near_dup_components,  # full SQL oracle
        "block_dedup_docs": dq.block_dedup_docs,  # full SQL oracle
        "dup_span_docs": dq.dup_span_docs,        # full SQL oracle
        "dsir_weights": dq.dsir_weights_docs,     # full SQL oracle
        "streaming_window": dq.streaming_window,  # full SQL oracle
        # bpe_tokens: NO SQL ORACLE (iterative merge loop); gated by the
        # independent naive-reference + reconstruction-invariant tests in
        # tests/test_bpe.py. Integer-only outputs — rows-only record is
        # stable at any parallelism.
        "bpe_tokens": dq.bpe_tokens,
    })
    return _window_order(out)


def oracle_sql() -> dict[str, str]:
    from qwery_ray.cdc.synth import events_from_documents_sql

    out = {name: (oracle or mine)
           for name, (mine, oracle) in _SQL_QUERIES.items()}
    from qwery_ray.ops.curation import chunk_oracle_sql
    out["chunk_documents"] = chunk_oracle_sql(max_tokens=128, overlap=16)
    out["near_dup_components"] = """
WITH RECURSIVE edges AS (
  SELECT a.doc_id AS s, b.doc_id AS d FROM documents a
  JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 7 < 3
), sym AS (
  SELECT s, d FROM edges UNION SELECT d, s FROM edges
), reach(x, y) AS (
  SELECT s, d FROM sym
  UNION
  SELECT r.x, e.d FROM reach r JOIN sym e ON e.s = r.y
)
SELECT x AS id, LEAST(x, MIN(y)) AS component
FROM reach GROUP BY x ORDER BY id
"""
    out["cdc_replay"] = events_from_documents_sql()
    from qwery_ray.pipelines.driver_queries import lake_merge_oracle_sql

    out["lake_merge_apply"] = lake_merge_oracle_sql()
    out["events_lake_lww"] = """
SELECT e.user_id, e.event_type, e.event_id AS lsn, e.value
FROM events e
JOIN (SELECT user_id, event_type, MAX(event_id) AS m
      FROM events GROUP BY user_id, event_type) x
  ON e.user_id = x.user_id AND e.event_type = x.event_type
 AND e.event_id = x.m
"""
    out["exact_dedup"] = (
        "SELECT * FROM documents WHERE doc_id IN "
        "(SELECT MIN(doc_id) FROM documents GROUP BY text)")
    out["token_count"] = (
        "SELECT doc_id, CAST(length(regexp_extract_all(text, "
        "'[A-Za-z]+|[0-9]+|[^\\w\\s]')) AS BIGINT) AS n_tokens FROM documents")
    from qwery_ray.pipelines.oracles import simhash_oracle, text_quality_oracle

    out["text_quality"] = text_quality_oracle()
    out["simhash_signatures"] = simhash_oracle()
    from qwery_ray.pipelines.driver_queries import sliding_window_oracle

    out["events_sliding_window"] = sliding_window_oracle()
    from qwery_ray.pipelines.driver_queries import session_window_oracle

    out["events_sessions"] = session_window_oracle()
    from qwery_ray.ops.text import redact_oracle_sql

    out["pii_redact"] = redact_oracle_sql()
    from qwery_ray.ops.curation import (decontaminate_oracle_sql,
                                        repetition_oracle_sql,
                                        stratified_oracle_sql)

    out["repetition_quality"] = repetition_oracle_sql()
    out["decontaminate_docs"] = decontaminate_oracle_sql(n=4, bench_mod=97)
    from qwery_ray.ops.curation import gopher_oracle_sql

    out["gopher_filter"] = gopher_oracle_sql()
    from qwery_ray.ops.curation import dsir_oracle_sql

    out["dsir_weights"] = dsir_oracle_sql(target_mod=10, n_buckets=4096)
    from qwery_ray.pipelines.driver_queries import streaming_window_oracle_sql

    out["streaming_window"] = streaming_window_oracle_sql()
    from qwery_ray.pipelines.driver_queries import merge_apply_oracle_sql

    out["merge_apply"] = merge_apply_oracle_sql()
    from qwery_ray.ops.bm25 import bm25_oracle_sql

    out["bm25_scores"] = bm25_oracle_sql(["join", "hash", "vector", "merge"])
    out["stratified_sample"] = stratified_oracle_sql(
        {"en": 2500}, default_bps=7500)
    out["ann_topk"] = """
WITH q AS (
  SELECT vec_id, embedding FROM embeddings
  ORDER BY vec_id LIMIT 5
),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, e.embedding) AS score
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS BIGINT) AS nn_rank
FROM scored
QUALIFY nn_rank <= 10
"""
    out["embedding_dups"] = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 1000 AND b.vec_id < 1000
  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.99
"""
    # pinned-centroid assignment (k=8 smallest-id vectors, cluster index =
    # rank by vec_id) — same argmin the distributed _Assign computes;
    # Euclidean argmin ties break to the lowest cluster index on both
    # engines. Margins ≥4e-4 at sf0.01 (see driver_queries.embedding_kmeans).
    _ASSIGN_CTE = """
WITH c AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster,
         embedding
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
),
scored AS (
  SELECT e.vec_id, e.embedding, c.cluster,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_distance(e.embedding, c.embedding),
                      c.cluster) AS rn
  FROM embeddings e CROSS JOIN c
),
assign AS (SELECT vec_id, embedding, cluster FROM scored WHERE rn = 1)
"""
    out["embedding_kmeans"] = _ASSIGN_CTE + """
SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(vec_id) AS BIGINT) AS min_vec_id,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
FROM assign GROUP BY cluster ORDER BY cluster
"""
    # first-order winner step: drop a row iff a LOWER-id cluster-mate has
    # cosine >= tau; rep = max-cosine such row (ties -> lowest id), the
    # same first-max rule _lower_id_winner_group's argmax applies.
    out["semantic_dedup"] = _ASSIGN_CTE + """,
pairs AS (
  SELECT a.vec_id, a.cluster, b.vec_id AS rep_id,
         list_cosine_similarity(a.embedding, b.embedding) AS cos
  FROM assign a JOIN assign b
    ON a.cluster = b.cluster AND b.vec_id < a.vec_id
),
best AS (
  SELECT vec_id, cluster, rep_id, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, rep_id) AS rn
  FROM pairs
)
SELECT vec_id, cluster, rep_id FROM best
WHERE rn = 1 AND cos >= 0.45 ORDER BY vec_id
"""
    from qwery_ray.ops.corpus import (block_dedup_oracle_sql,
                                      dup_span_oracle_sql)
    out["block_dedup_docs"] = block_dedup_oracle_sql(block_tokens=16)
    out["dup_span_docs"] = dup_span_oracle_sql(w=8)
    return _window_order(out)
