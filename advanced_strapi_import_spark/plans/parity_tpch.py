"""TPC-H-shaped queries chosen to cover the join/aggregate classes the
reference never needed (SURVEY §2.3 note): semi join (Q4), two-role
dimension join (Q7), top-k revenue (Q10), conditional CASE aggregation
(Q12/Q14), outer-join distribution (Q13), max-over-view (Q15), anti
join + distinct agg (Q16), decorrelated scalar avg (Q17), HAVING over
grouped agg (Q18), disjunctive multi-predicate join (Q19), correlated
EXISTS/NOT EXISTS (Q21), scalar-subquery gate + anti join (Q22).
Adapted to the driver's column subset; each is Catalyst's job to plan —
`tools/explain_audit.py` shows the shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from advanced_strapi_import_spark.plans.registry import load, query


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS n
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape: EXISTS -> left-semi join, then agg.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    semi = o.join(
        l,
        (l["l_orderkey"] == o["o_orderkey"]) & (l["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) t
GROUP BY c_count
""",
    doc="TPC-H Q13 shape: left outer join with an extra join predicate, "
        "double aggregation (count distribution).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q16_supplier_cnt",
    oracle="""
SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size >= 20
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand
""",
    doc="TPC-H Q16 shape: NOT IN -> left-anti join, distinct aggregate.",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        l.join(bad, "l_suppkey", "left_anti")
        .join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
SELECT c.c_name, o.o_orderkey, round(o.o_totalprice, 2) AS totalprice, b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    doc="TPC-H Q18 shape: grouped HAVING feeding joins back to dims.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .filter(F.col("__sq") > 250)
        .select("l_orderkey", F.round("__sq", 2).alias("sum_qty"))
    )
    return (
        big.join(o, o["o_orderkey"] == big["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .select(
            "c_name", "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"), "sum_qty",
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
""",
    doc="TPC-H Q15 shape: scalar max over an aggregated view joined "
        "back to pick the top supplier(s). Revenue rounded BEFORE the "
        "max-equality so the cross-engine compare is ulp-safe.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev["total_rev"] == mx["__mx"])
        .join(s, s["s_suppkey"] == rev["l_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_lim
      FROM lineitem GROUP BY l_partkey) a
  ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND l.l_quantity < a.qty_lim
""",
    doc="TPC-H Q17 shape: correlated scalar avg decorrelated to a "
        "group-avg joined back on the key (what Catalyst's "
        "RewriteCorrelatedScalarSubquery emits).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    lim = l.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_lim")
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(lim, l["l_partkey"] == lim["__pk"])
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q21_waiting_supplier",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
""",
    doc="TPC-H Q21 shape (adapted: returnflag stands in for the missing "
        "receipt/commit dates): double-correlated EXISTS + NOT EXISTS "
        "on a self-joined fact -> left-semi then left-anti join.",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    )
    s = load(spark, sf_dir, "supplier")
    waiting = (
        l1.join(
            l2,
            (l1["l_orderkey"] == l2["__ok"]) & (l1["l_suppkey"] != l2["__sk"]),
            "left_semi",
        )
        .join(
            l3,
            (l1["l_orderkey"] == l3["__ok"]) & (l1["l_suppkey"] != l3["__sk"]),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), s["s_suppkey"] == waiting["l_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
SELECT c.c_nationkey, count(*) AS numcust, round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
""",
    doc="TPC-H Q22 shape (nationkey stands in for the phone prefix; "
        "'no urgent order' stands in for 'no order' so the anti join "
        "keeps rows in the dense synthetic data): scalar avg subquery "
        "gating + NOT EXISTS -> broadcast scalar filter + left-anti join.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    return (
        c.join(F.broadcast(avg_bal), c["c_acctbal"] > avg_bal["__avg"])
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q19_disjunctive",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 40 AND l_quantity BETWEEN 20 AND 50)
""",
    doc="TPC-H Q19 shape: disjunction of conjunctive ranges across both "
        "join sides — Catalyst pushes the common join key, evaluates "
        "the OR post-join.",
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = l.join(p, l["l_partkey"] == p["p_partkey"])
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(20, 40) & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@query(
    "q7_nation_volume",
    oracle="""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(strftime(l.l_shipdate, '%Y') AS INT) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
    OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
GROUP BY ns.n_name, nc.n_name, l_year
""",
    doc="TPC-H Q7 shape: fact joined to two roles of the same dimension "
        "(supplier nation / customer nation) with a symmetric pair "
        "predicate and per-year aggregation.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("__cnk"), F.col("n_name").alias("cust_nation"))
    j = (
        l.join(o, o["o_orderkey"] == l["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(s), s["s_suppkey"] == l["l_suppkey"])
        .join(F.broadcast(ns), F.col("__snk") == s["s_nationkey"])
        .join(F.broadcast(nc), F.col("__cnk") == c["c_nationkey"])
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(c.c_acctbal, 2) AS acctbal, n.n_name AS nation
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20 "
        "with a deterministic tiebreak on the key.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q12_priority_buckets",
    oracle="""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
""",
    doc="TPC-H Q12 shape (orderpriority stands in for the missing "
        "shipmode): conditional CASE aggregation splitting one pass "
        "into two counters.",
)
def q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle="""
SELECT round(100.00 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS promo_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'
""",
    doc="TPC-H Q14 shape: LIKE-prefix conditional revenue share — "
        "CASE-gated numerator over the same single-pass aggregate.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), p["p_partkey"] == l["l_partkey"])
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 2).alias("promo_revenue")
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape: single-table selective filter + aggregate — "
        "the pure predicate-pushdown / scan-efficiency probe.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle="""
SELECT CAST(strftime(o.o_orderdate, '%Y') AS INT) AS o_year,
       round(sum(CASE WHEN ns.n_name = 'NATION_5'
                      THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = nc.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY o_year
""",
    doc="TPC-H Q8 shape: market share — CASE-gated numerator over the "
        "same aggregate, two nation roles plus a region gate.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    ns = n.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("__cnk"), F.col("n_regionkey").alias("__crk"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    gated = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0.0))
    return (
        l.join(o, o["o_orderkey"] == l["l_orderkey"])
        .join(F.broadcast(s), s["s_suppkey"] == l["l_suppkey"])
        .join(F.broadcast(ns), F.col("__snk") == s["s_nationkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(nc), F.col("__cnk") == c["c_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == F.col("__crk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(gated) / F.sum(rev), 4).alias("mkt_share"))
    )


# ---------------------------------------------------------------------------
# Q2/Q9/Q11/Q20 shapes. The driver's schema has no partsupp table, so the
# supply relation is derived from lineitem: distinct (l_partkey, l_suppkey)
# with min unit price standing in for ps_supplycost and total shipped
# quantity standing in for ps_availqty. The JOIN/AGG shapes (correlated
# MIN, profit multi-join, global-fraction gate, nested agg-threshold semi
# join) are the TPC-H ones; only the source of the supply rows differs.
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH supply AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
eur AS (
  SELECT u.l_partkey, u.l_suppkey, u.unit_cost, s.s_name, s.s_acctbal, n.n_name
  FROM supply u
  JOIN supplier s ON s.s_suppkey = u.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'),
best AS (SELECT l_partkey, min(unit_cost) AS min_cost FROM eur GROUP BY l_partkey)
SELECT e.s_name, round(e.s_acctbal, 2) AS acctbal, e.n_name,
       p.p_partkey, p.p_name, round(e.unit_cost, 2) AS unit_cost
FROM eur e
JOIN best b ON b.l_partkey = e.l_partkey AND e.unit_cost = b.min_cost
JOIN part p ON p.p_partkey = e.l_partkey
WHERE p.p_size >= 30 AND p.p_type = 'SMALL'
""",
    doc="TPC-H Q2 shape: correlated MIN-cost subquery over the supply "
        "relation gated by a region, joined back on the minimum. The "
        "supply side shuffles once on (part, supp); suppliers/nations/"
        "region broadcast.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") >= 30) & (F.col("p_type") == "SMALL")
    )
    # Push the (selective) part predicate BELOW the supply aggregation:
    # the per-part minimum only depends on that part's own supply rows,
    # so semi-joining lineitem to the filtered part keys first shrinks
    # the big (partkey, suppkey) shuffle by the part filter's
    # selectivity — the difference between aggregating all supply and
    # ~1% of it at 100 TB.
    supply = (
        l.join(F.broadcast(p.select("p_partkey")),
               l["l_partkey"] == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eur = (
        supply.join(F.broadcast(s), s["s_suppkey"] == F.col("l_suppkey"))
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"])
        .select("l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    )
    # min-cost row selection as a window over the same l_partkey
    # partitioning (one shuffle) instead of agg + self-join, which
    # executed the whole supply subtree twice
    w = Window.partitionBy("l_partkey")
    return (
        eur.withColumn("__min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("__min_cost"))
        .join(F.broadcast(p), p["p_partkey"] == F.col("l_partkey"))
        .select(
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            "n_name",
            "p_partkey",
            "p_name",
            F.round("unit_cost", 2).alias("unit_cost"),
        )
    )


@query(
    "q9_product_profit",
    oracle="""
SELECT n.n_name AS nation, CAST(strftime(o.o_orderdate, '%Y') AS INT) AS o_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)
                 - 0.1 * p.p_retailprice * l.l_quantity), 2) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, o_year
""",
    doc="TPC-H Q9 shape: profit by supplier nation and order year — "
        "fact-fact join (lineitem x orders) with three broadcast dims "
        "and an expression aggregate (revenue minus imputed supply "
        "cost; 0.1 * retailprice stands in for ps_supplycost).",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), p["p_partkey"] == l["l_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == l["l_suppkey"])
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(o, o["o_orderkey"] == l["l_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@query(
    "q11_important_parts",
    oracle="""
WITH pv AS (
  SELECT l.l_partkey, sum(l.l_extendedprice * l.l_quantity) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey < 5
  GROUP BY l.l_partkey)
SELECT l_partkey, round(value, 2) AS value
FROM pv
WHERE value > (SELECT avg(value) * 2.0 FROM pv)
""",
    doc="TPC-H Q11 shape: per-part value vs a scalar global gate (scalar "
        "subquery -> 1-row broadcast); the supply value is aggregated "
        "once and reused for both sides. TPC-H uses sum(value)*fraction; "
        "a mean multiple keeps the gate selective at every SF (the "
        "driver's part count scales with SF, so a fixed fraction of the "
        "total empties out).",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    pv = (
        l.join(F.broadcast(s), s["s_suppkey"] == l["l_suppkey"], "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    threshold = pv.agg((F.avg("value") * 2.0).alias("__thr"))
    return (
        pv.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("__thr"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


@query(
    "q20_excess_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         sum(l_quantity) AS total_qty,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                  THEN l_quantity ELSE 0 END) AS qty97
  FROM lineitem GROUP BY l_partkey, l_suppkey),
cand AS (
  SELECT DISTINCT sh.l_suppkey
  FROM shipped sh
  JOIN part p ON p.p_partkey = sh.l_partkey
  WHERE p.p_name LIKE 'small%' AND sh.total_qty > 2.5 * sh.qty97)
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM cand)
  AND n.n_regionkey = 1
""",
    doc="TPC-H Q20 shape: nested agg-threshold subquery (per part+supp "
        "total vs in-window quantity) -> DISTINCT supplier keys -> "
        "left-semi join into the supplier dim, region-gated. One "
        "lineitem shuffle computes both aggregates via a CASE arm.",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    in97 = (
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    shipped = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("total_qty"),
        F.sum(F.when(in97, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qty97"),
    )
    cand = (
        shipped.join(F.broadcast(p), p["p_partkey"] == F.col("l_partkey"), "left_semi")
        .filter(F.col("total_qty") > 2.5 * F.col("qty97"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(cand, cand["l_suppkey"] == s["s_suppkey"], "left_semi")
        .select("s_name", "n_name")
    )
