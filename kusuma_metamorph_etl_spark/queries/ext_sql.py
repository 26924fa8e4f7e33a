"""[EXT] TPC-H-shape SQL catalog queries (the 22 classic shapes on
the driver tables) — split from ``ext.py`` (r13)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from kusuma_metamorph_etl_spark.registry import register
from kusuma_metamorph_etl_spark.sources.catalog import load_table as t

@register(
    "sql_shipping_priority",
    """SELECT o.o_orderkey,
              CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                  AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
              CAST(o.o_orderdate AS DATE) AS order_date
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
       GROUP BY 1, 3
       ORDER BY revenue DESC, o.o_orderkey
       LIMIT 10""",
)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second pure-SQL entry point (TPC-H Q3 shape — the multi-join
    analytic `sql_pricing_summary`'s single-table Q1 does not cover):
    three-table star join + exact-decimal revenue + deterministic
    top-10, identical SQL text on both engines.  Catalyst turns the
    ORDER BY/LIMIT into TakeOrderedAndProject (no global sort) and
    broadcast-joins the filtered customer dim."""
    for name in ("customer", "orders", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(
        """SELECT o.o_orderkey,
                  CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                      AS DECIMAL(38,6))), 2) AS DOUBLE)
                      AS revenue,
                  CAST(o.o_orderdate AS DATE) AS order_date
           FROM customer_v c
           JOIN orders_v o ON c.c_custkey = o.o_custkey
           JOIN lineitem_v l ON l.l_orderkey = o.o_orderkey
           WHERE c.c_mktsegment = 'BUILDING'
           GROUP BY 1, 3
           ORDER BY revenue DESC, o.o_orderkey
           LIMIT 10"""
    )

_SQL_LOCAL_SUPPLIER_VOLUME = """SELECT n.n_name AS nation,
              CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                  AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
       FROM customer{v} c
       JOIN orders{v} o ON c.c_custkey = o.o_custkey
       JOIN lineitem{v} l ON l.l_orderkey = o.o_orderkey
       JOIN supplier{v} s ON l.l_suppkey = s.s_suppkey
                         AND c.c_nationkey = s.s_nationkey
       JOIN nation{v} n ON s.s_nationkey = n.n_nationkey
       JOIN region{v} r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA'
         AND o.o_orderdate >= TIMESTAMP '1996-01-01'
         AND o.o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY 1"""

@register("sql_local_supplier_volume", _SQL_LOCAL_SUPPLIER_VOLUME.format(v=""))
def sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third pure-SQL entry (TPC-H Q5 shape): the deepest join tree in
    the suite — six tables, with the local-supplier condition
    (``c_nationkey = s_nationkey``) joining two independent dim chains
    through the fact.  Identical SQL text on both engines; Catalyst
    broadcast-joins every dim (region→nation prunes first) and the date
    range pushes to the orders scan — plan-tested alongside Q3."""
    for name in (
        "region", "nation", "customer", "supplier", "orders", "lineitem"
    ):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_LOCAL_SUPPLIER_VOLUME.format(v="_v"))

_SQL_RETURNED_ITEMS = """SELECT c.c_custkey,
              CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                  AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
              n.n_name AS nation
       FROM customer{v} c
       JOIN orders{v} o ON c.c_custkey = o.o_custkey
       JOIN lineitem{v} l ON l.l_orderkey = o.o_orderkey
       JOIN nation{v} n ON c.c_nationkey = n.n_nationkey
       WHERE l.l_returnflag = 'R'
       GROUP BY 1, 3
       ORDER BY revenue DESC, c.c_custkey
       LIMIT 20"""

@register("sql_returned_items", _SQL_RETURNED_ITEMS.format(v=""))
def sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth pure-SQL entry (TPC-H Q10 shape): the churn-analysis
    readout — top-20 customers by revenue lost to returned items.  The
    returnflag filter pushes to the lineitem scan, dims broadcast, and
    the ORDER BY/LIMIT compiles to TakeOrderedAndProject (top-k, no
    global sort) — the same plan contract as Q3, asserted in
    tests/test_plans.py."""
    for name in ("nation", "customer", "orders", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_RETURNED_ITEMS.format(v="_v"))

# ------------------------------------------------------------------ r9
# additions: TPC-H-shaped SQL parity (Q14/Q18), skew-salted join
# equivalence, data-layout operators, k-core, Adam7 PNG.


_SQL_PROMO_REVENUE = """WITH j AS (
         SELECT CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(38,6)) AS rev,
                p.p_type AS p_type
         FROM lineitem{v} l
         JOIN part{v} p ON l.l_partkey = p.p_partkey
         WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
           AND l.l_shipdate < TIMESTAMP '1997-01-01')
       SELECT CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN rev
                                  ELSE CAST(0 AS DECIMAL(38,6)) END), 2)
                   AS DOUBLE) AS promo_revenue,
              CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS total_revenue,
              100.0 * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN rev
                                          ELSE CAST(0 AS DECIMAL(38,6)) END),
                                 2) AS DOUBLE)
                    / CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS promo_pct
       FROM j"""

@register("sql_promo_revenue", _SQL_PROMO_REVENUE.format(v=""))
def sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth pure-SQL entry (TPC-H Q14 shape): promotion-revenue share —
    fact ⋈ dim with a conditional aggregate over the joined rows.  Both
    sums run in exact DECIMAL (order-independent) and round before the
    ratio, so the double division is bit-identical on both engines; the
    shipdate range pushes to the lineitem scan and part broadcasts."""
    for name in ("part", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_PROMO_REVENUE.format(v="_v"))

_SQL_LARGE_VOLUME = """WITH big AS (
         SELECT l_orderkey,
                CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,6))), 2)
                     AS DOUBLE) AS sum_qty
         FROM lineitem{v}
         GROUP BY 1
         HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 300)
       SELECT c.c_custkey, o.o_orderkey,
              CAST(o.o_orderdate AS DATE) AS order_date,
              o.o_totalprice, b.sum_qty
       FROM big b
       JOIN orders{v} o ON o.o_orderkey = b.l_orderkey
       JOIN customer{v} c ON c.c_custkey = o.o_custkey
       ORDER BY o.o_totalprice DESC, o.o_orderkey
       LIMIT 20"""

@register("sql_large_volume_customers", _SQL_LARGE_VOLUME.format(v=""))
def sql_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixth pure-SQL entry (TPC-H Q18 shape): large-volume orders — an
    aggregate-then-HAVING subquery joined BACK to its fact's dims, the
    canonical "filter by group property" plan.  The HAVING compares the
    exact DECIMAL sum (no double drift in the cut), the big-order key
    set is tiny so both joins broadcast it, and ORDER BY/LIMIT compiles
    to TakeOrderedAndProject."""
    for name in ("customer", "orders", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_LARGE_VOLUME.format(v="_v"))

_SQL_LATE_SHIPMENT = """SELECT o.o_orderpriority,
              CAST(count(*) AS BIGINT) AS n_orders
       FROM orders{v} o
       WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
         AND o.o_orderdate < TIMESTAMP '1996-04-01'
         AND EXISTS (SELECT 1 FROM lineitem{v} l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
       GROUP BY 1"""

@register("sql_late_shipment_priority", _SQL_LATE_SHIPMENT.format(v=""))
def sql_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seventh pure-SQL entry (TPC-H Q4 shape): order-priority counts
    over orders with at least one late line — the correlated-EXISTS
    pattern, which Catalyst rewrites to a LEFT SEMI join (one pass over
    each table, no row duplication however many lines are late; the
    shape a hand-written inner-join + distinct gets wrong or pays a
    dedup shuffle for).  The quarter filter pushes to the orders scan;
    the semi-join keys on orderkey with the date comparison as the join
    residual.  Identical SQL text on both engines."""
    for name in ("orders", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_LATE_SHIPMENT.format(v="_v"))

_SQL_DISJUNCTIVE_REVENUE = """SELECT
         CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
         CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem{v} l
       JOIN part{v} p ON p.p_partkey = l.l_partkey
       WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
              AND l.l_quantity >= 10)
          OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 16 AND 30
              AND l.l_quantity >= 20)
          OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 31 AND 50
              AND l.l_quantity >= 5)"""

@register("sql_disjunctive_revenue", _SQL_DISJUNCTIVE_REVENUE.format(v=""))
def sql_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eighth pure-SQL entry (TPC-H Q19 shape): revenue under a
    three-branch DISJUNCTION of conjunctive brand/size/quantity clauses
    — the predicate form that breaks naive pushdown.  Catalyst extracts
    the common-prefix constraints per side (the quantity disjunct
    `l_quantity >= 5` lower bound and the brand IN-set reach the scans)
    and evaluates the residual OR as the join filter; exact-decimal sum
    as the family convention."""
    for name in ("part", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_DISJUNCTIVE_REVENUE.format(v="_v"))

_SQL_TOP_SUPPLIER = """WITH r AS (
         SELECT l_suppkey,
                CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(38,6))), 2) AS DOUBLE)
                    AS total_rev
         FROM lineitem{v}
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'
         GROUP BY 1)
       SELECT s.s_suppkey, s.s_name, r.total_rev
       FROM r
       JOIN supplier{v} s ON s.s_suppkey = r.l_suppkey
       WHERE r.total_rev = (SELECT max(total_rev) FROM r)"""

@register("sql_top_supplier", _SQL_TOP_SUPPLIER.format(v=""))
def sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ninth pure-SQL entry (TPC-H Q15 shape): the quarter's
    maximum-revenue supplier(s) via a scalar subquery over the SAME
    aggregate the outer query reads (the reused-CTE max-of-agg
    pattern); ties all surface, the equality is on the ROUNDED decimal
    (exact, so both engines agree on who is top), and the supplier dim
    broadcasts."""
    for name in ("supplier", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_TOP_SUPPLIER.format(v="_v"))

_SQL_WAITING_ORDERS = """SELECT s.s_name,
              CAST(count(*) AS BIGINT) AS numwait
       FROM supplier{v} s
       JOIN lineitem{v} l1 ON l1.l_suppkey = s.s_suppkey
       JOIN orders{v} o ON o.o_orderkey = l1.l_orderkey
       WHERE o.o_orderstatus = 'F'
         AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
         AND EXISTS (SELECT 1 FROM lineitem{v} l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem{v} l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_shipdate
                               > o.o_orderdate + INTERVAL 60 DAY)
       GROUP BY s.s_name
       ORDER BY numwait DESC, s.s_name
       LIMIT 100"""

@register("sql_waiting_orders", _SQL_WAITING_ORDERS.format(v=""))
def sql_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tenth pure-SQL entry (TPC-H Q21 shape, VERDICT r10 Next #6):
    suppliers who were the SOLE late supplier on a finished
    multi-supplier order — the one classic join shape the family
    lacked: a fact self-joined THREE ways, once as the driving scan,
    once under correlated EXISTS (another supplier participated), once
    under correlated NOT EXISTS (nobody else was late).  The reference
    schema has no commitdate/receiptdate, so "late" is shipdate more
    than 60 days after the order date — the SAME correlated predicate
    Q21 binds to the outer order row, here reaching o from both l1 and
    the l3 subquery.  Catalyst plans the EXISTS as a LEFT SEMI and the
    NOT EXISTS as a LEFT ANTI join keyed on l_orderkey (inequality
    residuals on suppkey/shipdate), so each lineitem replay is one
    hash-join pass, no row duplication and no cartesian corner —
    `tests/test_plans.py` pins semi+anti+no-cartesian.  ORDER BY is
    total (numwait DESC, unique s_name) so LIMIT 100 is deterministic
    across engines.  Identical SQL text on both engines."""
    for name in ("supplier", "lineitem", "orders"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_WAITING_ORDERS.format(v="_v"))

_SQL_CUSTOMER_DISTRIBUTION = """WITH co AS (
         SELECT c.c_custkey,
                CAST(count(o.o_orderkey) AS BIGINT) AS c_count
         FROM customer{v} c
         LEFT JOIN orders{v} o
           ON o.o_custkey = c.c_custkey
          AND o.o_orderpriority <> '1-URGENT'
         GROUP BY c.c_custkey)
       SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
       FROM co
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC"""

@register(
    "sql_customer_distribution", _SQL_CUSTOMER_DISTRIBUTION.format(v="")
)
def sql_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eleventh pure-SQL entry (TPC-H Q13 shape): the order-count
    histogram over ALL customers — the one aggregation shape that needs
    a LEFT OUTER join (zero-order customers must survive into the
    c_count=0 bucket; an inner join silently drops the most interesting
    bar of the histogram) with the priority predicate in the JOIN
    CONDITION, not the WHERE clause (in WHERE it would turn the outer
    join back into an inner one).  Double aggregation: per-customer
    count, then the count-of-counts.  ORDER BY is total (c_count unique
    per row).  Identical SQL text on both engines."""
    for name in ("customer", "orders"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_CUSTOMER_DISTRIBUTION.format(v="_v"))

_SQL_SMALL_QTY_REVENUE = """SELECT
         CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))), 2)
              AS DOUBLE) AS total_revenue,
         CAST(count(*) AS BIGINT) AS n_items
       FROM lineitem{v} l
       JOIN part{v} p ON p.p_partkey = l.l_partkey
       WHERE p.p_brand = 'Brand#1'
         AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                             FROM lineitem{v} l2
                             WHERE l2.l_partkey = p.p_partkey)"""

@register("sql_small_qty_revenue", _SQL_SMALL_QTY_REVENUE.format(v=""))
def sql_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Twelfth pure-SQL entry (TPC-H Q17 shape): revenue from orders
    below 20% of the part's OWN average quantity — the correlated
    scalar-AVG subquery over the same fact the outer query scans.
    Catalyst de-correlates it into a per-partkey aggregate joined back
    on the correlation key (one extra pass over lineitem, never a
    per-row re-scan); the brand filter broadcasts the surviving part
    keys.  The 0.2·avg threshold compares raw doubles, but the operands
    differ by orders of magnitude from any tie boundary (quantities are
    integers ≥ 1; avg/5 lands on .2 grids), so the comparison is
    engine-stable.  Output keeps the family's exact-decimal sum
    convention instead of Q17's /7.0 double division (a rounded double
    quotient can straddle a half-penny tie across engines — the
    registry's round-on-raw-doubles rule)."""
    for name in ("part", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_SMALL_QTY_REVENUE.format(v="_v"))

_SQL_SALES_OPPORTUNITY = """WITH thresh AS (
         SELECT round(avg(c_acctbal), 6) AS ab
         FROM customer{v} WHERE c_acctbal > 0)
       SELECT c.c_nationkey,
              CAST(count(*) AS BIGINT) AS numcust,
              CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))), 2)
                   AS DOUBLE) AS totacctbal
       FROM customer{v} c
       WHERE c.c_acctbal > (SELECT ab FROM thresh)
         AND NOT EXISTS (SELECT 1 FROM orders{v} o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')
       GROUP BY c.c_nationkey"""

@register("sql_sales_opportunity", _SQL_SALES_OPPORTUNITY.format(v=""))
def sql_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thirteenth pure-SQL entry (TPC-H Q22 shape): above-average-balance
    customers with no urgent orders, rolled up per nation — the
    uncorrelated scalar subquery (global avg threshold, computed once
    and broadcast) combined with a correlated NOT EXISTS anti-join on a
    FILTERED subquery (the filter stays inside the subquery; hoisting it
    to the outer WHERE would change which customers qualify).  The
    reference schema has no phone column, so Q22's cntrycode prefix
    becomes c_nationkey.  The avg threshold is rounded to 6 dp on both
    engines before comparing: account balances carry 2 decimals, so a
    last-ulp sum-order difference in the raw avg can never flip a
    customer across the rounded boundary.  Money sum per the family
    convention."""
    for name in ("customer", "orders"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_SALES_OPPORTUNITY.format(v="_v"))

_SQL_MIN_COST_SUPPLIER = """WITH cost AS (
         SELECT l_partkey, l_suppkey,
                MIN(l_extendedprice / l_quantity) AS unit_cost
         FROM lineitem{v} GROUP BY 1, 2)
       SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
       FROM part{v} p
       JOIN cost c ON c.l_partkey = p.p_partkey
       JOIN supplier{v} s ON s.s_suppkey = c.l_suppkey
       JOIN nation{v} n ON n.n_nationkey = s.s_nationkey
       JOIN region{v} r ON r.r_regionkey = n.n_regionkey
       WHERE p.p_size <= 10 AND p.p_type = 'STANDARD'
         AND r.r_name = 'EUROPE'
         AND c.unit_cost = (SELECT MIN(c2.unit_cost)
                            FROM cost c2
                            JOIN supplier{v} s2 ON s2.s_suppkey = c2.l_suppkey
                            JOIN nation{v} n2
                              ON n2.n_nationkey = s2.s_nationkey
                            JOIN region{v} r2
                              ON r2.r_regionkey = n2.n_regionkey
                            WHERE c2.l_partkey = p.p_partkey
                              AND r2.r_name = 'EUROPE')
       ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
       LIMIT 100"""

@register("sql_min_cost_supplier", _SQL_MIN_COST_SUPPLIER.format(v=""))
def sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourteenth pure-SQL entry (TPC-H Q2 shape): for every qualifying
    part, the EUROPE supplier(s) offering its minimum unit cost — the
    correlated scalar-MIN subquery whose inner query repeats the outer's
    dimension chain (supplier -> nation -> region) so the minimum is
    taken over the same region the outer row competes in.  The reference
    schema has no partsupp table, so unit cost derives from the fact
    itself (min extendedprice/quantity per part-supplier pair, shared
    via a CTE both sides reference).  Catalyst de-correlates the MIN
    into a per-partkey aggregate joined back on the correlation key;
    the equality compares doubles both engines computed from identical
    inputs with order-independent MIN, so it is engine-stable.  ORDER BY
    is total ((s_name, p_partkey) is unique per row), making LIMIT 100
    deterministic.  Identical SQL text on both engines."""
    for name in ("part", "supplier", "lineitem", "nation", "region"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_MIN_COST_SUPPLIER.format(v="_v"))

_SQL_PART_VALUE_SHARE = """WITH val AS (
         SELECT l.l_partkey AS partkey,
                SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS value
         FROM lineitem{v} l
         JOIN supplier{v} s ON s.s_suppkey = l.l_suppkey
         JOIN nation{v} n ON n.n_nationkey = s.s_nationkey
         WHERE n.n_name = 'NATION_7' GROUP BY 1)
       SELECT partkey, CAST(ROUND(value, 2) AS DOUBLE) AS part_value
       FROM val
       WHERE CAST(value AS DOUBLE) >
             (SELECT 3.0 * CAST(SUM(value) AS DOUBLE) / COUNT(*) FROM val)
       ORDER BY part_value DESC, partkey"""

@register("sql_part_value_share", _SQL_PART_VALUE_SHARE.format(v=""))
def sql_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifteenth pure-SQL entry (TPC-H Q11 shape): parts whose revenue
    through one nation's suppliers exceeds a threshold derived from the
    WHOLE group — the uncorrelated scalar aggregate-over-aggregate
    subquery scanning the same CTE the outer query filters (Q11's
    HAVING-against-global-total shape).  Q11's fixed fraction threshold
    degenerates with scale (every part's share shrinks as the part count
    grows), so the threshold is 3x the MEAN part value — scale-invariant
    and non-empty at every test SF.  The exact DECIMAL(38,6) sums are
    cast to DOUBLE only at the comparison and presentation edges, per
    the registry money convention; both engines compare doubles derived
    from identical exact sums.  ORDER BY is total (partkey unique).
    Identical SQL text on both engines."""
    for name in ("lineitem", "supplier", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_PART_VALUE_SHARE.format(v="_v"))

_SQL_PART_SUPPLIER_COUNTS = """SELECT p.p_brand, p.p_type, p.p_size,
              CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
       FROM part{v} p
       JOIN lineitem{v} l ON l.l_partkey = p.p_partkey
       WHERE p.p_brand <> 'Brand#5'
         AND p.p_type NOT LIKE 'MEDIUM%'
         AND p.p_size IN (1, 4, 7, 10, 23, 36, 45, 49)
         AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier{v}
                                 WHERE s_acctbal < 0)
       GROUP BY 1, 2, 3
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

@register("sql_part_supplier_counts", _SQL_PART_SUPPLIER_COUNTS.format(v=""))
def sql_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixteenth pure-SQL entry (TPC-H Q16 shape): how many distinct
    suppliers ship each surviving (brand, type, size) part descriptor —
    COUNT(DISTINCT) under a NOT-IN subquery excluding flagged suppliers
    (negative account balance stands in for Q16's complaints LIKE; the
    exclusion list is tiny and broadcasts as a null-aware anti join,
    Catalyst's NOT-IN plan).  The <>/NOT LIKE/IN trio on part attributes
    mirrors Q16's mixed predicate block and prunes at the part scan.
    ORDER BY is total (the full group key breaks supplier_cnt ties).
    Identical SQL text on both engines."""
    for name in ("part", "lineitem", "supplier"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_PART_SUPPLIER_COUNTS.format(v="_v"))

_SQL_CONCENTRATED_SUPPLIERS = """SELECT s.s_name, s.s_acctbal
       FROM supplier{v} s
       JOIN nation{v} n ON n.n_nationkey = s.s_nationkey
       WHERE n.n_name IN ('NATION_3', 'NATION_4')
         AND s.s_suppkey IN (
           SELECT q.l_suppkey
           FROM (SELECT l_suppkey, l_partkey,
                        SUM(l_quantity) AS qty_year
                 FROM lineitem{v}
                 WHERE l_shipdate >= DATE '1996-01-01'
                   AND l_shipdate < DATE '1997-01-01'
                   AND l_partkey IN (SELECT p_partkey FROM part{v}
                                     WHERE p_name LIKE 'red%')
                 GROUP BY 1, 2) q
           WHERE q.qty_year > 0.5 * (SELECT SUM(l2.l_quantity)
                                     FROM lineitem{v} l2
                                     WHERE l2.l_partkey = q.l_partkey
                                       AND l2.l_suppkey = q.l_suppkey))
       ORDER BY s.s_name"""

@register(
    "sql_concentrated_suppliers", _SQL_CONCENTRATED_SUPPLIERS.format(v="")
)
def sql_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seventeenth pure-SQL entry (TPC-H Q20 shape): suppliers in two
    nations who shipped more than half their ALL-TIME volume of some
    red part within one year — the nested-subquery tower Q20 is known
    for: an IN whose subquery aggregates the fact, itself filtered by
    another IN on a dimension LIKE, with a correlated scalar-SUM in its
    WHERE comparing against the group's own history (availqty > half of
    shipped, re-read as year-share > half of total).  Catalyst
    de-correlates the scalar SUM into a (partkey, suppkey) aggregate
    joined back on both correlation keys, and the outer IN plans as a
    LEFT SEMI — one pass per lineitem replay, no per-row re-scans.
    Quantities are integer-valued doubles, so the 0.5x comparison sits
    far from any representable-tie boundary.  ORDER BY s_name is total
    (unique).  Identical SQL text on both engines."""
    for name in ("supplier", "nation", "lineitem", "part"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_CONCENTRATED_SUPPLIERS.format(v="_v"))

_SQL_FORECAST_REVENUE = """SELECT
         CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
                             AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
         CAST(count(*) AS BIGINT) AS n_lines
       FROM lineitem{v}
       WHERE l_shipdate >= DATE '1996-01-01'
         AND l_shipdate < DATE '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24"""

@register("sql_forecast_revenue", _SQL_FORECAST_REVENUE.format(v=""))
def sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eighteenth pure-SQL entry (TPC-H Q6 shape): the pure scan-side
    query — a conjunctive range block (date window, discount band,
    quantity cap) over the bare fact with a single global aggregate and
    no join at all.  Its value is the plan it must compile to: every
    predicate pushed into the parquet scan, one partial+final aggregate
    pair, zero exchanges beyond the final gather — the shape the
    pushdown contracts in tests/test_plans.py exist to keep.  The
    discount BETWEEN compares doubles to two-decimal literals the data
    itself carries (0.00–0.10 grid), so the band edges are exact.
    Identical SQL text on both engines."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(_SQL_FORECAST_REVENUE.format(v="_v"))

_SQL_VOLUME_SHIPPING = """SELECT supp_nation, cust_nation, l_year,
              CAST(ROUND(SUM(CAST(volume AS DECIMAL(38,6))), 2)
                   AS DOUBLE) AS revenue
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER)
                        AS l_year,
                    l.l_extendedprice * (1 - l.l_discount) AS volume
             FROM supplier{v} s
             JOIN lineitem{v} l ON s.s_suppkey = l.l_suppkey
             JOIN orders{v} o ON o.o_orderkey = l.l_orderkey
             JOIN customer{v} c ON c.c_custkey = o.o_custkey
             JOIN nation{v} n1 ON n1.n_nationkey = s.s_nationkey
             JOIN nation{v} n2 ON n2.n_nationkey = c.c_nationkey
             WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
               AND l.l_shipdate >= DATE '1996-01-01'
               AND l.l_shipdate < DATE '1998-01-01') shipping
       GROUP BY 1, 2, 3
       ORDER BY 1, 2, 3"""

@register("sql_volume_shipping", _SQL_VOLUME_SHIPPING.format(v=""))
def sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nineteenth pure-SQL entry (TPC-H Q7 shape): bilateral trade
    volume between two nations by ship year — the SAME dimension joined
    TWICE under different roles (nation as supplier country n1 AND as
    customer country n2) with a disjunctive cross-role predicate that
    must stay attached to the join pair, plus EXTRACT(year) bucketing.
    Both nation sides broadcast; the disjunction cannot be pushed to
    either scan alone, so it evaluates post-join — exactly once.  ORDER
    BY is total (the full group key).  Identical SQL text on both
    engines."""
    for name in ("supplier", "lineitem", "orders", "customer", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_VOLUME_SHIPPING.format(v="_v"))

_SQL_MARKET_SHARE = """SELECT o_year,
              CAST(ROUND(
                   CAST(SUM(CASE WHEN nation = 'NATION_5' THEN vol_d
                                 ELSE CAST(0 AS DECIMAL(38,6)) END)
                        AS DOUBLE)
                   / CAST(SUM(vol_d) AS DOUBLE), 6) AS DOUBLE)
                  AS mkt_share
       FROM (SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER)
                        AS o_year,
                    CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6)) AS vol_d,
                    n2.n_name AS nation
             FROM part{v} p
             JOIN lineitem{v} l ON p.p_partkey = l.l_partkey
             JOIN supplier{v} s ON s.s_suppkey = l.l_suppkey
             JOIN orders{v} o ON o.o_orderkey = l.l_orderkey
             JOIN customer{v} c ON c.c_custkey = o.o_custkey
             JOIN nation{v} n1 ON n1.n_nationkey = c.c_nationkey
             JOIN region{v} r ON r.r_regionkey = n1.n_regionkey
             JOIN nation{v} n2 ON n2.n_nationkey = s.s_nationkey
             WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
               AND o.o_orderdate >= DATE '1996-01-01'
               AND o.o_orderdate < DATE '1998-01-01') all_nations
       GROUP BY o_year
       ORDER BY o_year"""

@register("sql_market_share", _SQL_MARKET_SHARE.format(v=""))
def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Twentieth pure-SQL entry (TPC-H Q8 shape): one nation's share of
    regional order volume by year — the deepest join tree in the catalog
    (seven tables, nation joined twice: once through the customer side
    to filter the market region, once through the supplier side to label
    the competitor) feeding a conditional-sum ratio.  Both the filtered
    and the total volume are summed as exact DECIMAL(38,6) and cast to
    DOUBLE only for the final division, so the engines divide identical
    doubles and the 6-dp round can never straddle a sum-order ulp.
    Identical SQL text on both engines."""
    for name in (
        "part", "supplier", "lineitem", "orders",
        "customer", "nation", "region",
    ):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_MARKET_SHARE.format(v="_v"))

_SQL_PRODUCT_PROFIT = """SELECT nation, o_year,
              CAST(ROUND(SUM(CAST(amount AS DECIMAL(38,6))), 2)
                   AS DOUBLE) AS sum_profit
       FROM (SELECT n.n_name AS nation,
                    CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER)
                        AS o_year,
                    l.l_extendedprice * (1 - l.l_discount)
                      - p.p_retailprice * l.l_quantity AS amount
             FROM part{v} p
             JOIN lineitem{v} l ON p.p_partkey = l.l_partkey
             JOIN supplier{v} s ON s.s_suppkey = l.l_suppkey
             JOIN orders{v} o ON o.o_orderkey = l.l_orderkey
             JOIN nation{v} n ON n.n_nationkey = s.s_nationkey
             WHERE p.p_name LIKE '%red%') profit
       GROUP BY 1, 2
       ORDER BY nation, o_year DESC"""

@register("sql_product_profit", _SQL_PRODUCT_PROFIT.format(v=""))
def sql_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Twenty-first pure-SQL entry (TPC-H Q9 shape): per-nation,
    per-year profit on one product line — the infix-substring dimension
    filter (LIKE '%red%', no prefix to push as a range) driving a
    five-table join whose measure SUBTRACTS cost from revenue (the
    reference schema has no partsupp, so p_retailprice·quantity stands
    in for Q9's supplycost·quantity).  Negative amounts are the point:
    the profit sum exercises signed DECIMAL aggregation, where a
    double-sum's cancellation error would be engine-visible.  ORDER BY
    nation, o_year DESC mirrors Q9's presentation order and is total.
    Identical SQL text on both engines."""
    for name in ("part", "lineitem", "supplier", "orders", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_PRODUCT_PROFIT.format(v="_v"))

_SQL_PRIORITY_LINES = """SELECT l.l_linestatus,
              CAST(SUM(CASE WHEN o.o_orderpriority IN
                                 ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                  AS high_line_count,
              CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                                 ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                  AS low_line_count
       FROM orders{v} o
       JOIN lineitem{v} l ON o.o_orderkey = l.l_orderkey
       WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
         AND l.l_shipdate < DATE '1998-01-01'
       GROUP BY 1
       ORDER BY 1"""

@register("sql_priority_lines", _SQL_PRIORITY_LINES.format(v=""))
def sql_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Twenty-second pure-SQL entry (TPC-H Q12 shape, completing the
    22-query catalog): order-priority split of slow shipments — the
    pivot-by-CASE pattern (two complementary conditional counts in one
    aggregation pass, Q12's signature) under a cross-table inequality
    (shipdate vs orderdate + 30 days) that must ride the join output,
    while the absolute date cap pushes to the lineitem scan.  The
    reference schema has no l_shipmode/commitdate/receiptdate, so
    l_linestatus buckets the rows and shipdate lag defines "slow".
    ORDER BY is total (l_linestatus unique per row).  Identical SQL
    text on both engines."""
    for name in ("orders", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"{name}_v")
    return spark.sql(_SQL_PRIORITY_LINES.format(v="_v"))
