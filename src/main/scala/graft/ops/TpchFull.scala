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
  /** SUM input at DECIMAL(8,2) — the generated TPC-H columns are (11,2)
    * (reference schema), whose sums run on BigDecimal-backed (21,2)
    * buffers; p ≤ 8 keeps the sum on Catalyst's DecimalAggregates long
    * path. Exact for the TPC-H value domains (quantity ≤ 50, prices
    * < $1M, acctbal ±11k); an out-of-domain value throws loudly under
    * ANSI. See graft.ops.Relational.dec8 (r18). */
  private def dec8(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(8, 2))

  /** Default root anchors the pinned oracle paths; the live cache follows
    * `spark.graft.cacheRoot` ([[graft.gen.GenCache.rootFor]]) so cluster
    * deployments can point it at a shared filesystem. */
  private val root = s"/tmp/graft_tpchfull/gen${TpchGen.genVersion}"

  def ensure(spark: SparkSession, sfDir: String): String = {
    val dir = graft.gen.GenCache.ensure(spark,
      graft.gen.GenCache.rootFor(spark, s"graft_tpchfull/gen${TpchGen.genVersion}"),
      sfDir) { (s, sf, tmp) =>
      TpchGen.generateParquet(s, sf, 16, tmp)
    }
    // partitions ∝ data (see ShuffleScale — the r14 sf100 Q72 OOM finding)
    graft.plans.ShuffleScale.tuneFor(spark, dir)
    dir
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
    // r19: the threshold total now derives from the part-grain aggregate
    // itself (Σ of per-part sums — identical exact decimal value) instead
    // of re-running the whole German partsupp pipeline, and the aggregate
    // materializes once (graft.plans.Materialize scaladoc) so the two
    // consumers cannot be re-specialized into two scans
    // (plans/r19/q_tpch_q11_{before,after}.txt: partsupp 2 → 1 scans).
    val grouped = graft.plans.Materialize.concurrently(Seq(
      de.groupBy(col("ps_partkey")).agg(sum(col("v")).as("value_d")))).head
    val thr = grouped
      .agg((sum(col("value_d")) * lit(BigDecimal("0.0001"))).as("thr"))
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
    // r18: only almond-part groups survive the inner join with the
    // pf-gated partsupp below, so the same broadcast part slice prunes
    // lineitem BEFORE the (part, supplier) aggregate — the biggest shuffle
    // of the query drops by the part-name selectivity (~1/55 of parts at
    // every sf; guide §3.2 pre-filter the big side / §2.3 shuffle fewer
    // bytes). Result-identical: the semi join removes only groups the
    // downstream equi-join would discard.
    val half = t(s, dir, "lineitem")
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((sum(dec8(col("l_quantity"))) * lit(BigDecimal("0.5"))).as("half_qty"))
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

  /** [Q-tpch-q12] TPC-H Q12 (shipping modes and order priority), PUBLISHED
    * predicates — the last of the 22 published TPC-H queries to land, now
    * that the generator carries l_shipmode/l_commitdate/l_receiptdate
    * (reference cols src/tpch.rs:215-218). One fact⋈fact equi-join on the
    * order key (the mode+date filter prunes lineitem ~25x first, but at
    * scale both sides stay corpus-sized — no broadcast), then a two-bucket
    * conditional count per ship mode. */
  def q_tpch_q12(s: SparkSession, d: String): DataFrame = {
    val dir = ensure(s, d)
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
        col("l_commitdate") < col("l_receiptdate") &&
        col("l_shipdate") < col("l_commitdate") &&
        col("l_receiptdate") >= lit("1994-01-01").cast(DateType) &&
        col("l_receiptdate") < lit("1995-01-01").cast(DateType))
      .select("l_orderkey", "l_shipmode")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_shipmode"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
  }

  /** [Q-tpch-q4-full] TPC-H Q4 with the PUBLISHED late-line predicate
    * (l_commitdate < l_receiptdate) over the generated full-schema parquet —
    * the published-predicate twin of the fixture-adapted
    * [[Tpch.q_tpch_q4]]. Same plan: EXISTS folded into a LEFT SEMI join on
    * the order key with the late condition pushed into the probe side's
    * scan filter. */
  def q_tpch_q4_full(s: SparkSession, d: String): DataFrame = {
    val dir = ensure(s, d)
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1993-07-01").cast(DateType) &&
        col("o_orderdate") < lit("1993-10-01").cast(DateType))
      .join(t(s, dir, "lineitem")
          .filter(col("l_commitdate") < col("l_receiptdate"))
          .select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** [Q-tpch-q21-full] TPC-H Q21 with the PUBLISHED fault predicate
    * (l_receiptdate > l_commitdate) and nation/status filters — the twin of
    * the fixture-adapted [[Tpch.q_tpch_q21]], same double-correlated
    * decorrelation: EXISTS (another supplier) AND NOT EXISTS (another
    * faulty supplier) collapse to ONE per-order aggregate of two distinct
    * counts, attached back by a semi join on the order key. F-status
    * orders prune via a second semi join; supplier⋈nation broadcasts. */
  def q_tpch_q21_full(s: SparkSession, d: String): DataFrame = {
    val dir = ensure(s, d)
    val li = t(s, dir, "lineitem")
    val late = col("l_receiptdate") > col("l_commitdate")
    // two-level aggregate in place of a double countDistinct — avoids the
    // multi-distinct Expand, same as [[Tpch.q_tpch_q21]]
    val perOrder = li
      .groupBy(col("l_orderkey").as("po_key"), col("l_suppkey").as("po_supp"))
      .agg(max(when(late, 1).otherwise(0)).as("fault"))
      .groupBy(col("po_key"))
      .agg(count(lit(1)).as("n_supp"), sum(col("fault")).as("n_fault"))
      .filter(col("n_supp") >= 2 && col("n_fault") === 1)
      .select("po_key")
    val saudi = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "SAUDI ARABIA")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    li.filter(late)
      .select("l_orderkey", "l_suppkey")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(perOrder, col("l_orderkey") === col("po_key"), "left_semi")
      .join(saudi, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** [Q-tpch-q17-full] TPC-H Q17 with the PUBLISHED part slice (Brand#23,
    * MED BOX) — the published-predicate twin of the fixture-adapted
    * [[Tpch.q_tpch_q17]] (the fixture has no p_container). Same
    * decorrelation: the per-part 20%-of-average quantity threshold is a
    * keyed aggregate joined back on partkey; the filtered part dim
    * broadcasts into both the aggregate and the probe so lineitem is
    * sliced before either shuffle. One final DOUBLE division by 7.0. */
  def q_tpch_q17_full(s: SparkSession, d: String): DataFrame = {
    val dir = ensure(s, d)
    val pf = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#23" && col("p_container") === "MED BOX")
      .select("p_partkey")
    val li = t(s, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"), "left_semi")
    val thr = li.groupBy(col("l_partkey").as("t_key"))
      .agg((sum(dec8(col("l_quantity"))).cast(D) / count(col("l_quantity")) * 0.2)
        .as("t_avg"))
    li.join(thr, col("l_partkey") === col("t_key"))
      .filter(col("l_quantity").cast(D) < col("t_avg"))
      .agg((sum(dec8(col("l_extendedprice"))).cast(D) / 7.0).as("avg_yearly"))
  }

  /** [Q-tpch-q19-full] TPC-H Q19 with the PUBLISHED three-branch
    * disjunction (brand × container-class × quantity band × size band ×
    * air shipping, in person) — the twin of the fixture-adapted
    * [[Tpch.q_tpch_q19]]. One adapted literal: the published 'AIR REG'
    * mode is 'REG AIR' in the generated domain (dbgen's actual mode
    * list). Catalyst keeps the partkey equi-join, pushes the
    * mode/instruct conjuncts shared by every branch into the lineitem
    * scan, and evaluates the disjunctive residue post-join. */
  def q_tpch_q19_full(s: SparkSession, d: String): DataFrame = {
    val dir = ensure(s, d)
    def branch(brand: String, containers: Seq[String], qlo: Int, qhi: Int,
               szHi: Int) =
      col("p_brand") === brand && col("p_container").isin(containers: _*) &&
        col("l_quantity") >= qlo && col("l_quantity") <= qhi &&
        col("p_size").between(1, szHi)
    t(s, dir, "lineitem")
      .filter(col("l_shipmode").isin("AIR", "REG AIR") &&
        col("l_shipinstruct") === "DELIVER IN PERSON")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(t(s, dir, "part")
          .select("p_partkey", "p_brand", "p_container", "p_size")),
        col("p_partkey") === col("l_partkey"))
      .filter(
        branch("Brand#12", Seq("SM CASE", "SM BOX", "SM PACK", "SM PKG"), 1, 11, 5) ||
        branch("Brand#23", Seq("MED BAG", "MED BOX", "MED PKG", "MED PACK"), 10, 20, 10) ||
        branch("Brand#34", Seq("LG CASE", "LG BOX", "LG PACK", "LG PKG"), 20, 30, 15))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(D).as("revenue"))
  }

  /** [Q-tpch-q22-full] TPC-H Q22 with the PUBLISHED phone-prefix country
    * codes — the twin of the fixture-adapted [[Tpch.q_tpch_q22]] (the
    * fixture has no c_phone; the generated one carries the spec's
    * 'CC-nnn-nnn-nnnn' shape). Positive-balance average over the 7-code
    * cohort attaches as a 1-row broadcast HASH join on a nullable-derived
    * key; NOT EXISTS folds to LEFT ANTI on the customer key. */
  def q_tpch_q22_full(s: SparkSession, d: String): DataFrame = {
    val dir = ensure(s, d)
    val codes = Seq("13", "31", "23", "29", "30", "18", "17")
    val cohort = t(s, dir, "customer")
      .withColumn("cntrycode", substring(col("c_phone"), 1, 2))
      .filter(col("cntrycode").isin(codes: _*))
      .select("c_custkey", "c_acctbal", "cntrycode")
    val avgBal = cohort.filter(col("c_acctbal") > 0)
      .agg((sum(dec8(col("c_acctbal"))).cast(D) / count(col("c_acctbal"))).as("ab"))
      .withColumn("jk", coalesce(col("ab") * 0, lit(0)).cast(IntegerType))
    cohort
      .withColumn("jk", coalesce(col("c_acctbal") * 0, lit(0)).cast(IntegerType))
      .join(broadcast(avgBal), Seq("jk"))
      .filter(col("c_acctbal").cast(D) > col("ab"))
      .join(t(s, dir, "orders").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec8(col("c_acctbal"))).cast(D).as("totacctbal"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q2" -> q_tpch_q2,
    "q_tpch_q9" -> q_tpch_q9,
    "q_tpch_q11" -> q_tpch_q11,
    "q_tpch_q16" -> q_tpch_q16,
    "q_tpch_q20" -> q_tpch_q20,
    "q_tpch_q12" -> q_tpch_q12,
    "q_tpch_q4_full" -> q_tpch_q4_full,
    "q_tpch_q21_full" -> q_tpch_q21_full,
    "q_tpch_q17_full" -> q_tpch_q17_full,
    "q_tpch_q19_full" -> q_tpch_q19_full,
    "q_tpch_q22_full" -> q_tpch_q22_full)

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
         |ORDER BY s_name""".stripMargin,
    "q_tpch_q12" ->
      s"""SELECT l_shipmode,
         | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
         |   THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         |FROM ${P("orders")}, ${P("lineitem")}
         |WHERE o_orderkey = l_orderkey AND l_shipmode IN ('MAIL', 'SHIP')
         | AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
         | AND l_receiptdate >= DATE '1994-01-01'
         | AND l_receiptdate < DATE '1995-01-01'
         |GROUP BY l_shipmode""".stripMargin,
    "q_tpch_q4_full" ->
      s"""SELECT o_orderpriority, count(*) AS order_count FROM ${P("orders")}
         |WHERE o_orderdate >= DATE '1993-07-01'
         | AND o_orderdate < DATE '1993-10-01'
         | AND EXISTS (SELECT 1 FROM ${P("lineitem")}
         |  WHERE l_orderkey = o_orderkey AND l_commitdate < l_receiptdate)
         |GROUP BY o_orderpriority""".stripMargin,
    // the oracle keeps the published CORRELATED form (EXISTS + NOT EXISTS)
    // so the per-order-aggregate decorrelation is externally cross-checked
    "q_tpch_q21_full" ->
      s"""SELECT s_name, count(*) AS numwait
         |FROM ${P("lineitem")} l1, ${P("orders")}, ${P("supplier")}, ${P("nation")}
         |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         | AND o_orderstatus = 'F' AND l1.l_receiptdate > l1.l_commitdate
         | AND EXISTS (SELECT 1 FROM ${P("lineitem")} l2
         |  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
         | AND NOT EXISTS (SELECT 1 FROM ${P("lineitem")} l3
         |  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
         |   AND l3.l_receiptdate > l3.l_commitdate)
         | AND s_nationkey = n_nationkey AND n_name = 'SAUDI ARABIA'
         |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    // the oracle keeps the published CORRELATED per-part average
    "q_tpch_q17_full" ->
      s"""SELECT CAST(sum(l_extendedprice) AS DOUBLE) / 7.0 AS avg_yearly
         |FROM ${P("lineitem")} l1, ${P("part")}
         |WHERE p_partkey = l1.l_partkey AND p_brand = 'Brand#23'
         | AND p_container = 'MED BOX'
         | AND CAST(l1.l_quantity AS DOUBLE) < (
         |  SELECT CAST(sum(l2.l_quantity) AS DOUBLE) / count(l2.l_quantity) * 0.2
         |  FROM ${P("lineitem")} l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q_tpch_q19_full" ->
      s"""SELECT CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS revenue
         |FROM ${P("lineitem")}, ${P("part")}
         |WHERE p_partkey = l_partkey
         | AND l_shipmode IN ('AIR', 'REG AIR')
         | AND l_shipinstruct = 'DELIVER IN PERSON'
         | AND ((p_brand = 'Brand#12'
         |   AND p_container IN ('SM CASE', 'SM BOX', 'SM PACK', 'SM PKG')
         |   AND l_quantity >= 1 AND l_quantity <= 11
         |   AND p_size BETWEEN 1 AND 5)
         |  OR (p_brand = 'Brand#23'
         |   AND p_container IN ('MED BAG', 'MED BOX', 'MED PKG', 'MED PACK')
         |   AND l_quantity >= 10 AND l_quantity <= 20
         |   AND p_size BETWEEN 1 AND 10)
         |  OR (p_brand = 'Brand#34'
         |   AND p_container IN ('LG CASE', 'LG BOX', 'LG PACK', 'LG PKG')
         |   AND l_quantity >= 20 AND l_quantity <= 30
         |   AND p_size BETWEEN 1 AND 15))""".stripMargin,
    "q_tpch_q22_full" ->
      s"""SELECT cntrycode, count(*) AS numcust,
         | CAST(sum(c_acctbal) AS DOUBLE) AS totacctbal
         |FROM (
         | SELECT substr(c_phone, 1, 2) AS cntrycode, c_acctbal, c_custkey
         | FROM ${P("customer")}
         | WHERE substr(c_phone, 1, 2) IN ('13','31','23','29','30','18','17')
         |  AND CAST(c_acctbal AS DOUBLE) > (
         |   SELECT CAST(sum(c_acctbal) AS DOUBLE) / count(c_acctbal)
         |   FROM ${P("customer")}
         |   WHERE c_acctbal > 0
         |    AND substr(c_phone, 1, 2) IN ('13','31','23','29','30','18','17'))
         |  AND NOT EXISTS (SELECT 1 FROM ${P("orders")}
         |   WHERE o_custkey = c_custkey)) c
         |GROUP BY cntrycode""".stripMargin)
}
