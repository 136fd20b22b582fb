package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** TPC-H-shaped relational queries exercising the P-layer algebra at
  * bench scale: multi-way joins (broadcast dims + shuffled facts),
  * group-by-having, and top-k — the shapes that dominate 100 TB plans.
  * Small dimensions are explicitly broadcast; fact-fact joins shuffle on
  * the join key and AQE handles skew at scale. */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  def queries: Map[String, Q] = Map(
    // Q3-shape: segment join + top-k by exact revenue
    "q3_shipping_priority" -> { (s, dir) =>
      import s.implicits._
      val c = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      val o = Tables.orders(s, dir).filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir).filter($"l_shipdate" > lit("1996-06-30").cast("timestamp"))
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },
    // Q5-shape: 5-way join, revenue per nation in one region
    "q5_local_supplier" -> { (s, dir) =>
      import s.implicits._
      val r = Tables.region(s, dir).filter($"r_name" === "ASIA")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey" &&
          $"s_nationkey" === $"c_nationkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    },
    // Q4-shape: EXISTS (left_semi) + priority rollup
    "q4_order_priority" -> { (s, dir) =>
      import s.implicits._
      val o = Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      val lateLines = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_shipdate")
      o.join(lateLines, $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },
    // Q16-shape: distinct-count per group with an exclusion filter
    "q16_supplier_variety" -> { (s, dir) =>
      import s.implicits._
      val p = Tables.part(s, dir).filter($"p_brand" =!= "Brand#1" && $"p_size".isin(1, 5, 9, 13))
      val l = Tables.lineitem(s, dir).select($"l_partkey", $"l_suppkey")
      p.join(l, $"p_partkey" === $"l_partkey")
        .groupBy($"p_brand", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"),
          count(lit(1)).as("n_lines"))
        .orderBy($"p_brand", $"p_size")
    },
    // Q7-shape: volume between two nations — double broadcast-dim join
    // through supplier and customer, grouped by year
    "q7_nation_volume" -> { (s, dir) =>
      import s.implicits._
      val n1 = Tables.nation(s, dir).select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
      val n2 = Tables.nation(s, dir).select($"n_nationkey".as("ck"), $"n_name".as("cust_nation"))
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(n1), $"s_nationkey" === $"sk")
        .join(broadcast(n2), $"c_nationkey" === $"ck")
        .filter(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
          ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("long").as("l_year"))
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("volume"))
        .orderBy($"supp_nation", $"cust_nation", $"l_year")
    },
    // Q10-shape: returned-item revenue per customer, top 20
    "q10_returned_items" -> { (s, dir) =>
      import s.implicits._
      val l = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
      val o = Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-07-01").cast("timestamp"))
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },
    // Q14-shape: conditional-ratio aggregate (promo revenue share)
    "q14_promo_revenue" -> { (s, dir) =>
      import s.implicits._
      val l = Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      val p = Tables.part(s, dir)
      l.join(broadcast(p), $"l_partkey" === $"p_partkey")
        .agg(
          (lit(100.0) *
            dsum(when($"p_type".startsWith("PROMO"),
              $"l_extendedprice" * (lit(1.0) - $"l_discount")).otherwise(0.0)) /
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
            .as("promo_share"),
          count(lit(1)).as("n_items"))
    },
    // Q19-shape: OR-of-conjuncts quals over a broadcast dim join — the
    // disjunctive-pushdown shape
    "q19_discounted_revenue" -> { (s, dir) =>
      import s.implicits._
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      l.join(broadcast(p), $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#1" && $"p_size" <= 5 &&
            $"l_quantity" >= 1 && $"l_quantity" <= 11) ||
          ($"p_brand" === "Brand#2" && $"p_size" <= 10 &&
            $"l_quantity" >= 10 && $"l_quantity" <= 20) ||
          ($"p_brand" === "Brand#3" && $"p_size" <= 15 &&
            $"l_quantity" >= 20 && $"l_quantity" <= 30))
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    // Q18-shape: group-by-having over the fact, then enrich
    "q18_large_orders" -> { (s, dir) =>
      import s.implicits._
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val big = l.groupBy($"l_orderkey")
        .agg(dsum($"l_quantity").as("total_qty"))
        .filter($"total_qty" > 150.0)
      big.join(o, $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"o_orderpriority", $"total_qty")
        .orderBy($"l_orderkey")
    },
  )

  def oracles: Map[String, String] = Map(
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-06-30'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt, COUNT(*) AS n_lines
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13)
        |GROUP BY p_brand, p_size ORDER BY p_brand, p_size""".stripMargin,
    "q7_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
        |   OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT
        |  100.0 * CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
        |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
        |      AS DECIMAL(18,4))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS promo_share,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q19_discounted_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size <= 5 AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#2' AND p_size <= 10 AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#3' AND p_size <= 15 AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 150.0)
        |SELECT l_orderkey, o_orderpriority, total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey""".stripMargin,
  )
}
