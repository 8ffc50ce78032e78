"""Wider TPC-H-shape coverage (adapted to the reduced driver corpus —
no partsupp / l_shipmode / l_receiptdate columns, so each query keeps
the ORIGINAL's operator shape with predicates re-targeted at columns
that exist). Every entry is oracle-backed.

Why these shapes matter at 100 TB (one line each, details per query):
correlated EXISTS/NOT EXISTS become semi/anti joins (q4, q21), scalar
subqueries become broadcast 1-row joins (q15, q22), correlated
aggregates become a pre-aggregation joined back on the correlation key
(q17), disjunctive predicates stay a single scan pass (q19), and
conditional aggregation replaces self-joins (q8, q12, q14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, query

_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
_DISC = "CAST(l_discount AS DECIMAL(4,2))"
_REV = f"{_PRICE} * (1 - {_DISC})"


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape (correlated EXISTS): orders with any line shipped
    after the order date. The EXISTS is a LEFT SEMI join with a
    non-equi residual — one pass over lineitem, no distinct needed
    (semi joins never duplicate the probe side)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-04-01 00:00:00")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({_PRICE} * {_DISC}) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: pure scan-filter-aggregate — the query whose
    entire cost is how much of the scan the pushed-down predicates and
    2-column pruning eliminate. No joins, no shuffle beyond the final
    1-row combine."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01 00:00:00")
            & (F.col("l_shipdate") < "1998-01-01 00:00:00")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             {_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bi-directional trade volume between two nations
    by ship year. lineitem⋈orders is the only guaranteed shuffle pair;
    the nation aliases are hint-broadcast (25 rows at any scale), while
    supplier/customer carry NO forced hint — they are broadcast-sized
    at test scale but grow with SF, so the engine lets size statistics
    and AQE choose (a forced hint would OOM a 100 TB run)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_REV} AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: a supplier nation's share of PROMO volume sold
    into one region, per year — conditional aggregation over an
    8-table star; nation/region hint-broadcast (bounded size),
    part/customer/supplier left to size statistics and AQE. The share ratio divides two exact decimal sums cast to
    double (deterministic at any parallelism)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    vol = F.col("volume")
    zero = F.lit(0).cast("decimal(22,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _rev().alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@query(
    "q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape (l_shipmode → l_linestatus, which this corpus
    has): one join + two conditional counts in a single aggregation
    pass instead of two filtered scans."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: distribution of per-customer order counts — a
    LEFT OUTER join with a predicate INSIDE the join condition (so
    customers keep their zero row), then an aggregation of an
    aggregation. count(o_orderkey) counts only matched rows, exactly
    like SQL's count(col)."""
    customer = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                       ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
                / CAST(SUM({_REV}) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: PROMO revenue share in one month — conditional
    numerator and unconditional denominator from the SAME aggregation
    pass (no second scan); the part join is AQE-sized, not forced."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01 00:00:00")
        & (F.col("l_shipdate") < "1997-10-01 00:00:00")
    )
    zero = F.lit(0).cast("decimal(22,4)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(_rev().alias("volume"), "p_type")
        .agg(
            (
                F.lit(100.00)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("volume")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("volume").cast("double")
            )
            .cast("double")
            .alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: the view + scalar MAX subquery becomes a reused
    aggregate joined against its own broadcast 1-row maximum. The
    revenue aggregate is computed once per branch off a shared plan;
    equality on the exact decimal-sum-cast-double is deterministic."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-04-01 00:00:00")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    supplier = load(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(supplier, F.col("supplier_no") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape (correlated scalar AVG): the per-part average
    becomes ONE pre-aggregation on the correlation key joined back to
    the filtered fact — no per-row subquery. l_quantity is
    integer-valued, so its double average is exact and
    order-independent (safe to compare across engines)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_rev",
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: OR-of-AND predicate groups across both join
    sides, evaluated in ONE pass after the broadcast join (naive plans
    union three scans). Catalyst additionally extracts the common
    l_quantity/p_size bounds as pushable conjuncts."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    size = F.col("p_size")

    def grp(brand: str, smax: int, qlo: int, qhi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & size.between(1, smax)
            & qty.between(qlo, qhi)
        )

    cond = (
        grp("Brand#13", 15, 1, 11)
        | grp("Brand#20", 25, 10, 20)
        | grp("Brand#23", 35, 20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape ("late" = shipped >60 days after order date,
    from the columns this corpus has): the only supplier who shipped
    late in a finished multi-supplier order. EXISTS → LEFT SEMI,
    NOT EXISTS → LEFT ANTI, both correlated on the order key with
    inequality residuals — three passes over lineitem co-partitioned
    on l_orderkey, dims broadcast."""
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_ok"),
        F.col("l_suppkey").alias("l3_sk"),
        F.col("l_shipdate").alias("l3_ship"),
    )
    waiting = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_ok"))
        & (F.col("l_suppkey") != F.col("l2_sk")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("l3_ok"))
        & (F.col("l_suppkey") != F.col("l3_sk"))
        & (
            F.col("l3_ship")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_anti",
    )
    return (
        waiting.join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q22_idle_balance",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*) AS ab
      FROM customer WHERE c_acctbal > 0.00
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= DATE '2001-01-01')
    GROUP BY c_nationkey
    """,
)
def q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape (cntrycode → c_nationkey, which this corpus
    has): above-average-balance customers with no RECENT order (no
    order this year — on this corpus every customer has ~10 orders
    lifetime, so the classic never-ordered form is vacuously empty;
    the recent-idle form asks the same business question and keeps
    the anti-join exercised). The
    global-average scalar subquery is a broadcast 1-row cross join
    (decimal-summed so the threshold is bit-identical across engines);
    NOT EXISTS is a LEFT ANTI against the orders key set."""
    customer = load(spark, sf_dir, "customer")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("date"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.00).agg(
        (F.sum(bal).cast("double") / F.count("*")).alias("ab")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS (
      SELECT DISTINCT l_partkey, l_suppkey,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS cost
      FROM lineitem
    ),
    min_cost AS (
      SELECT l_partkey, min(cost) AS mc FROM supply GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           CAST(cost AS DOUBLE) AS supply_cost
    FROM part
    JOIN supply ON p_partkey = l_partkey
    JOIN min_cost ON supply.l_partkey = min_cost.l_partkey
                 AND supply.cost = min_cost.mc
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size <= 15 AND p_type LIKE '%DARD' AND r_name = 'EUROPE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape (minimum-cost supplier; partsupp re-targeted at
    the lineitem part-supplier relation this corpus has, unit cost =
    extended price). The correlated MIN subquery is the classic
    pre-aggregate-and-join-back: one groupBy builds the per-part
    minimum, an equi-join on (part, cost) keeps exactly the argmin
    pairs — no window, no per-row subquery. Dims
    (supplier/nation/region) broadcast; part's size/type filters push
    into its scan BEFORE the join, so the supply relation is probed
    only for qualifying parts. Exact DECIMAL cost keeps argmin ties
    bit-identical across engines, and the ORDER BY key
    (acctbal, nation, supplier, part) is a total order on the output,
    so the LIMIT 100 frontier is deterministic. TakeOrdered: no global
    sort at any scale."""
    supply = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            F.col("l_extendedprice").cast("decimal(18,2)").alias("cost"),
        )
        .distinct()
    )
    min_cost = supply.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("cost").alias("mc")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & F.col("p_type").like("%DARD")
    )
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        part.join(supply, part.p_partkey == supply.l_partkey)
        .join(
            min_cost,
            (F.col("l_partkey") == F.col("__pk")) & (F.col("cost") == F.col("mc")),
        )
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("cost").cast("double").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_REV} - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(0.10 AS DECIMAL(4,2)) AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape (product-type profit; ps_supplycost re-targeted
    as a retail-price-derived unit cost, this corpus having no
    partsupp). The LIKE '%red%' part filter cannot push below the scan
    (unanchored pattern) but DOES prune the join: part is filtered
    before joining, so only ~1/4 of lineitem survives the first probe.
    Join order fact→part→supplier→orders→nation lets AQE broadcast
    every dim; all arithmetic is exact DECIMAL until the final
    per-group cast to double."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load(spark, sf_dir, "nation")
    amount = _rev() - (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
        * F.lit(0.10).cast("decimal(4,2)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS partkey,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2)) AS value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    ),
    total AS (SELECT SUM(value) AS tv FROM supply)
    SELECT partkey, CAST(SUM(value) AS DOUBLE) AS part_value
    FROM supply, total
    GROUP BY partkey, tv
    HAVING SUM(value) > tv * CAST(0.001 AS DECIMAL(6,4))
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape (important stock: parts whose supply value from
    one nation exceeds a fraction of that nation's total). The scalar
    total is a 1-row aggregate broadcast-crossed onto the per-part
    aggregate — the HAVING-vs-global-subquery pattern with zero extra
    shuffles (the per-part groupBy output is reused; the total is a
    second pass over the SAME shuffled aggregate, not the raw fact).
    Exact DECIMAL sums on both sides make the > threshold comparison
    bit-identical — a double-summed total could flip rows at the
    boundary on a different partitioning."""
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    value = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    supply = (
        li.join(supplier, li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey").alias("partkey"), value.alias("value"))
    )
    # persist the diamond node: both the output rows and the global
    # total consume per_part — without it the join+groupBy over the
    # fact table runs twice (one full extra pass at 100 TB)
    per_part = (
        supply.groupBy("partkey").agg(F.sum("value").alias("sv")).persist()
    )
    total = per_part.agg(F.sum("sv").alias("tv"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("sv") > F.col("tv") * F.lit(0.001).cast("decimal(6,4)"))
        .select("partkey", F.col("sv").cast("double").alias("part_value"))
    )


@query(
    "q16_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#9'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 24, 28, 31)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape (supplier-relationship: distinct suppliers per
    part segment, minus a denylist; the comment-LIKE denylist
    re-targeted at negative account balance). The NOT IN becomes a
    LEFT ANTI join against the (tiny, broadcast) excluded-supplier
    set — s_suppkey is non-null so NOT IN and anti-join agree. The
    negated brand / NOT LIKE / IN-list predicates all push into the
    part scan; count(DISTINCT) shuffles only after both filters have
    pruned the fact."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 31)
    )
    excluded = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(excluded, "l_suppkey", "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "q20_excess_supply",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 40
      )
    """,
)
def q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape (nested IN chain with a correlated HAVING
    aggregate: suppliers who moved >40 units of any 'small%' part in
    1997; availqty re-targeted at shipped quantity). Inner query:
    part-filter semi-prunes lineitem, then ONE groupBy on the
    composite (supplier, part) key evaluates every correlated
    aggregate at once — the set-based rewrite of the per-row
    subquery. The outer IN is a LEFT SEMI join, so suppliers
    qualifying via many parts still emit once."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    qualifying = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 40)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, "s_suppkey", "left_semi")
        .select("s_name", "s_acctbal")
    )
