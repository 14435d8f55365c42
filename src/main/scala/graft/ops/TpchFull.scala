package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.gen.TpchGen

/** Published TPC-H shapes that need tables/columns BEYOND the driver fixture
  * subset — partsupp above all — run over graft-GENERATED full-schema TPC-H
  * parquet (reference schemas /root/reference/src/tpch.rs:140-241; same
  * generate-once cache pattern as [[Tpcds]]). Q2, Q9, Q11, Q16 and Q20 are
  * the five published queries whose plans hinge on partsupp: min-cost-
  * supplier decorrelation, the profit join chain, the value-threshold scalar
  * subquery, the complaint anti-join, and the nested-IN promotion chain.
  *
  * Same exactness rules as [[Tpch]]: DECIMAL until one final DOUBLE cast,
  * scalar subqueries as 1-row broadcast hash joins on nullable-derived
  * constant keys, LIMIT only on a total order. The DuckDB oracle reads the
  * SAME generated parquet via paths pinned to the driver's correctness
  * scale. */
object TpchFull {
  private val root = s"/tmp/graft_tpchfull/gen${TpchGen.genVersion}"

  def ensure(spark: SparkSession, sfDir: String): String =
    graft.gen.GenCache.ensure(spark, root, sfDir) { (s, sf, tmp) =>
      TpchGen.generateParquet(s, sf, 16, tmp)
    }

  /** The one fixture scale whose generated data the static oracle SQL
    * reads (see [[Tpcds.oracleScale]] for the rationale). */
  val oracleScale = "sf0.01"
  def oracleCompatible(sfDir: String): Boolean =
    new java.io.File(sfDir).getName == oracleScale
  private def P(name: String) = s"'$root/$oracleScale/$name.parquet/*.parquet'"

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
  private val D = DoubleType

  /** [Q-tpch-q2] TPC-H Q2 (minimum-cost supplier): the correlated MIN
    * subquery over region-local partsupp decorrelated into a keyed
    * min-aggregate joined back on (partkey, exact DECIMAL cost equality).
    * The region⋈nation⋈supplier slice broadcasts into partsupp; the part
    * filter broadcasts too, so partsupp — the big side — never shuffles
    * except its own group-by on partkey. Top-100 on the published total
    * order. */
  def q_tpch_q2(s: SparkSession, d: String): DataFrame = {
    val dir = ensure(s, d)
    val pf = t(s, dir, "part")
      .filter(col("p_size") === 15 && col("p_type").like("%BRASS"))
      .select("p_partkey", "p_mfgr")
    val eurSupp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
    val ps = t(s, dir, "partsupp")
      .join(broadcast(pf), col("ps_partkey") === col("p_partkey"))
      .join(eurSupp, col("ps_suppkey") === col("s_suppkey"))
    val mn = ps.groupBy(col("ps_partkey").as("mn_key"))
      .agg(min(col("ps_supplycost")).as("mn_cost"))
    ps.join(broadcast(mn), col("ps_partkey") === col("mn_key") &&
        col("ps_supplycost") === col("mn_cost"))
      .select(col("s_acctbal").cast(D).as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_mfgr"), col("s_address"),
        col("s_phone"), col("s_comment"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** [Q-tpch-q9] TPC-H Q9 (product-type profit): the profit join chain —
    * lineitem ⋈ partsupp on the composite (partkey, suppkey) PK is the
    * one fact⋈fact shuffle; part (filtered), supplier and nation
    * broadcast; profit = revenue − supply cost stays DECIMAL until the
    * final cast. Grouped by nation × order year. */
  def q_tpch_q9(s: SparkSession, d: String): DataFrame = {
    val dir = ensure(s, d)
    // published parameter is '%green%'; graft part names draw from the
    // public TPC-H color vocabulary, which has no green — blue is in it
    val pf = t(s, dir, "part").filter(col("p_name").contains("blue"))
      .select("p_partkey")
    val profit =
      t(s, dir, "lineitem")
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "partsupp"),
          col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .withColumn("amount",
          col("l_extendedprice") * (lit(1) - col("l_discount")) -
            col("ps_supplycost") * col("l_quantity"))
    profit.groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(col("amount")).cast(D).as("sum_profit"))
  }

  /** [Q-tpch-q11] TPC-H Q11 (important stock): national partsupp value
    * over a scalar fraction-of-total threshold. The total is the SAME
    * aggregate re-run and attached as a 1-row broadcast hash join on a
    * nullable-derived constant key; both sides stay DECIMAL so the
    * threshold comparison is exact. */
  def q_tpch_q11(s: SparkSession, d: String): DataFrame = {
    val dir = ensure(s, d)
    val de = t(s, dir, "partsupp")
      .join(t(s, dir, "supplier"), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "GERMANY")),
        col("s_nationkey") === col("n_nationkey"))
      .withColumn("v", col("ps_supplycost") * col("ps_availqty"))
    val grouped = de.groupBy(col("ps_partkey")).agg(sum(col("v")).as("value_d"))
    val thr = de.agg((sum(col("v")) * lit(BigDecimal("0.0001"))).as("thr"))
      .withColumn("jk", (col("thr") * 0).cast(IntegerType))
    grouped.withColumn("jk", (col("value_d") * 0).cast(IntegerType))
      .join(broadcast(thr), Seq("jk"))
      .filter(col("value_d") > col("thr"))
      .select(col("ps_partkey"), col("value_d").cast(D).as("value"))
  }

  /** [Q-tpch-q16] TPC-H Q16 (parts/supplier relationship): excluded-brand
    * part slice, complaint suppliers removed by a broadcast ANTI join,
    * then a distinct-supplier count per (brand, type, size). Adapted
    * complaint predicate: dbgen plants the literal "Customer Complaints"
    * in s_comment; graft comments draw from the public TPC-H vocabulary,
    * so the pattern is '%ironic%requests%' — same two-wildcard LIKE
    * shape, nonzero selectivity on generated text. */
  def q_tpch_q16(s: SparkSession, d: String): DataFrame = {
    val dir = ensure(s, d)
    val pf = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#45" &&
        !col("p_type").like("MEDIUM POLISHED%") &&
        col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complainers = t(s, dir, "supplier")
      .filter(col("s_comment").like("%ironic%requests%"))
      .select(col("s_suppkey").as("bad_key"))
    t(s, dir, "partsupp")
      .join(broadcast(pf), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(complainers), col("ps_suppkey") === col("bad_key"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
  }

  /** [Q-tpch-q20] TPC-H Q20 (potential part promotion): the nested-IN
    * chain — suppliers whose stock of forest parts exceeds half a year's
    * shipments. Decorrelated bottom-up: per-(part, supplier) shipment
    * halves (one keyed aggregate), joined to partsupp on the composite
    * key with the availability inequality as a residual, then a SEMI
    * join up to the national supplier list. Adapted window: the published
    * single-year slice leaves the (part, supplier) pairs empty at the
    * small verification scales (a pair averages ~3 lines TOTAL), so the
    * half-shipment aggregate spans all years — same nested-IN chain,
    * same plan. */
  def q_tpch_q20(s: SparkSession, d: String): DataFrame = {
    val dir = ensure(s, d)
    val pf = t(s, dir, "part").filter(col("p_name").like("almond%"))
      .select("p_partkey")
    val half = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((sum(col("l_quantity")) * lit(BigDecimal("0.5"))).as("half_qty"))
    val qualifying = t(s, dir, "partsupp")
      .join(broadcast(pf), col("ps_partkey") === col("p_partkey"))
      .join(half, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey") &&
        col("ps_availqty") > col("half_qty"))
      .select(col("ps_suppkey").as("q_key"))
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "CANADA")),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("q_key"), "left_semi")
      .select(col("s_name"), col("s_address"))
      .orderBy(col("s_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q2" -> q_tpch_q2,
    "q_tpch_q9" -> q_tpch_q9,
    "q_tpch_q11" -> q_tpch_q11,
    "q_tpch_q16" -> q_tpch_q16,
    "q_tpch_q20" -> q_tpch_q20)

  val oracle: Map[String, String] = Map(
    "q_tpch_q2" ->
      s"""SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
         | p_partkey, p_mfgr, s_address, s_phone, s_comment
         |FROM ${P("part")}, ${P("supplier")}, ${P("partsupp")}, ${P("nation")}, ${P("region")}
         |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         | AND p_size = 15 AND p_type LIKE '%BRASS'
         | AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         | AND r_name = 'EUROPE'
         | AND ps_supplycost = (
         |  SELECT min(ps_supplycost)
         |  FROM ${P("partsupp")} ps2, ${P("supplier")} s2, ${P("nation")} n2, ${P("region")} r2
         |  WHERE p_partkey = ps2.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
         |   AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
         |   AND r2.r_name = 'EUROPE')
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    "q_tpch_q9" ->
      s"""SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
         |FROM (
         | SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         |  l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
         | FROM ${P("part")}, ${P("supplier")}, ${P("lineitem")}, ${P("partsupp")},
         |  ${P("orders")}, ${P("nation")}
         | WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
         |  AND ps_partkey = l_partkey AND p_partkey = l_partkey
         |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
         |  AND p_name LIKE '%blue%') profit
         |GROUP BY nation, o_year""".stripMargin,
    "q_tpch_q11" ->
      s"""SELECT ps_partkey, CAST(sum(ps_supplycost * ps_availqty) AS DOUBLE) AS value
         |FROM ${P("partsupp")}, ${P("supplier")}, ${P("nation")}
         |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         | AND n_name = 'GERMANY'
         |GROUP BY ps_partkey
         |HAVING sum(ps_supplycost * ps_availqty) > (
         | SELECT sum(ps_supplycost * ps_availqty) * 0.0001
         | FROM ${P("partsupp")}, ${P("supplier")}, ${P("nation")}
         | WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |  AND n_name = 'GERMANY')""".stripMargin,
    "q_tpch_q16" ->
      s"""SELECT p_brand, p_type, p_size,
         | count(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM ${P("partsupp")}, ${P("part")}
         |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#45'
         | AND p_type NOT LIKE 'MEDIUM POLISHED%'
         | AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
         | AND ps_suppkey NOT IN (
         |  SELECT s_suppkey FROM ${P("supplier")}
         |  WHERE s_comment LIKE '%ironic%requests%')
         |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q20" ->
      s"""SELECT s_name, s_address FROM ${P("supplier")}, ${P("nation")}
         |WHERE s_suppkey IN (
         |  SELECT ps_suppkey FROM ${P("partsupp")}
         |  WHERE ps_partkey IN (
         |    SELECT p_partkey FROM ${P("part")} WHERE p_name LIKE 'almond%')
         |  AND ps_availqty > (
         |    SELECT 0.5 * sum(l_quantity) FROM ${P("lineitem")}
         |    WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey))
         | AND s_nationkey = n_nationkey AND n_name = 'CANADA'
         |ORDER BY s_name""".stripMargin)
}
