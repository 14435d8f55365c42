package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.gen.TpcdsGen

/** TPC-DS query shapes over graft-generated TPC-DS parquet.
  *
  * The reference generates TPC-DS data precisely so engines can run the
  * TPC-DS workload over it (/root/reference/README.md:3-6; schemas
  * /root/reference/src/tpcds.rs:135-636). These queries close that loop:
  * each materializes the generated tables at the fixture-matched scale
  * (deterministic, generated once, cached on disk) and runs a published
  * TPC-DS query shape over them. Filters use the generator's spec-true
  * dictionary columns (i_category, cd_*, p_channel_*, t_meal_time) rather
  * than dsdgen's id-specific predicates — hash-uniform ids make a
  * single-manufact filter empty at test scale, while the dictionary
  * domains carry the published queries' selectivity shape.
  *
  * Scale design: every dimension side is explicitly broadcast (date_dim's
  * filtered slice, item, promotion, demographics, time_dim — all
  * fixed-cardinality or sublinear in sf); the only shuffles are the
  * fact-side group-bys and the returns⋈sales PK join, which IS the
  * workload. At 100 TB the facts stream map-side through the broadcast
  * joins and shuffle only the (few-hundred-group) aggregation rows.
  *
  * Oracle note: the DuckDB oracle reads the SAME generated parquet via
  * absolute paths pinned to the driver's correctness scale (sf0.01) —
  * these entries therefore hash-match only when checked at sf0.01, which
  * is the driver's gate. Money aggregates stay DECIMAL (exact, order-
  * independent) until a single final CAST AS DOUBLE on both sides;
  * averages are computed as exact-sum ÷ count so both engines divide the
  * same two exact values once.
  */
object Tpcds {
  private val root = "/tmp/graft_tpcds"

  /** TPC-DS materialization dir for a fixture sf dir (basename-keyed:
    * /root/testdata/sf0.01 → /tmp/graft_tpcds/sf0.01). */
  def dataDir(sfDir: String): String = {
    val base = new java.io.File(sfDir).getName
    require(base.startsWith("sf") && base.drop(2).toDoubleOption.nonEmpty,
      s"cannot derive a TPC-DS scale from fixture dir '$sfDir'")
    s"$root/$base"
  }

  /** Generate-once: all 24 tables at the fixture-matched scale. Safe across
    * THREADS (JVM `synchronized` — also keeps FileChannel.lock from throwing
    * OverlappingFileLockException) and across PROCESSES (an exclusive
    * FileChannel lock on `<sf>.lock` serializes generators, and the dir is
    * built in a temp sibling then ATOMIC_MOVE'd into place with the
    * `_GRAFT_COMPLETE` marker already inside — so the marker is only ever
    * visible in a fully-written dir, and no JVM deletes a dir that carries
    * it). Generation is deterministic and partition-count invariant
    * (GenSpec); a partial dir from a crashed run has no marker and is swept
    * under the lock. */
  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
    val dir = dataDir(sfDir)
    val dirPath = Paths.get(dir)
    val marker = dirPath.resolve("_GRAFT_COMPLETE")
    if (!Files.exists(marker)) {
      Files.createDirectories(Paths.get(root))
      val lockPath = Paths.get(root, s"${dirPath.getFileName}.lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock() // blocks until any concurrent generator finishes
        try {
          if (!Files.exists(marker)) { // re-check under the lock
            def sweep(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
              val it = Files.walk(p).sorted(java.util.Comparator.reverseOrder())
              try it.forEach(f => Files.delete(f)) finally it.close()
            }
            sweep(dirPath) // markerless partial from a crashed run
            val tmp = Paths.get(root, s".${dirPath.getFileName}.tmp")
            sweep(tmp)
            val sf = new java.io.File(sfDir).getName.drop(2).toDouble
            TpcdsGen.generateParquet(spark, sf, 16, tmp.toString)
            Files.createFile(tmp.resolve("_GRAFT_COMPLETE"))
            Files.move(tmp, dirPath, StandardCopyOption.ATOMIC_MOVE)
          }
        } finally lock.release()
      } finally ch.close()
    }
    dir
  }

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** [Q-tpcds-q3] TPC-DS Q3 shape: store_sales ⋈ date_dim ⋈ item, November
    * slice of one category, brand-level revenue. Facts stream through two
    * broadcast hash joins; the only shuffle carries ≤ |years|×|brands|
    * aggregation rows. */
  def q_tpcds_q3(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensure(spark, sfDir)
    val dd = t(spark, dir, "date_dim").filter(col("d_moy") === 11)
      .select("d_date_sk", "d_year")
    val it = t(spark, dir, "item").filter(col("i_category") === "Books")
      .select("i_item_sk", "i_brand_id", "i_brand")
    t(spark, dir, "store_sales")
      .join(broadcast(dd), col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(it), col("ss_item_sk") === col("i_item_sk"))
      .groupBy(col("d_year"), col("i_brand_id"), col("i_brand"))
      .agg(sum(col("ss_ext_sales_price")).cast(DoubleType).as("ext_price"))
  }

  /** [Q-tpcds-q7] TPC-DS Q7 shape: store_sales star over demographics +
    * promotion + date + item, per-item average quantities/prices. Four
    * broadcast dimension joins; averages as exact-sum ÷ count. */
  def q_tpcds_q7(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensure(spark, sfDir)
    val cd = t(spark, dir, "customer_demographics")
      .filter(col("cd_gender") === "M" && col("cd_marital_status") === "S" &&
        col("cd_education_status") === "College")
      .select("cd_demo_sk")
    val dd = t(spark, dir, "date_dim").filter(col("d_year") === 2000)
      .select("d_date_sk")
    val pr = t(spark, dir, "promotion")
      .filter(col("p_channel_email") === "N" || col("p_channel_event") === "N")
      .select("p_promo_sk")
    val it = t(spark, dir, "item").select("i_item_sk", "i_item_id")
    def avgOf(c: String) = sum(col(c)).cast(DoubleType) / count(col(c))
    t(spark, dir, "store_sales")
      .join(broadcast(cd), col("ss_cdemo_sk") === col("cd_demo_sk"))
      .join(broadcast(dd), col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(pr), col("ss_promo_sk") === col("p_promo_sk"))
      .join(broadcast(it), col("ss_item_sk") === col("i_item_sk"))
      .groupBy(col("i_item_id"))
      .agg(avgOf("ss_quantity").as("agg1"), avgOf("ss_list_price").as("agg2"),
        avgOf("ss_coupon_amt").as("agg3"), avgOf("ss_sales_price").as("agg4"))
  }

  /** [Q-tpcds-returns] store_returns ⋈ store_sales on the (ticket, item)
    * PK — the linkage TpcdsGen.returnsCols guarantees — rolled up to
    * category return totals for one year. The fact⋈fact join shuffles on
    * the join key (both sides hash-partitioned, no broadcast: at scale BOTH
    * sides are corpus-sized); everything else is broadcast. */
  def q_tpcds_returns(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensure(spark, sfDir)
    val ss = t(spark, dir, "store_sales")
      .select("ss_ticket_number", "ss_item_sk", "ss_net_paid")
    val dd = t(spark, dir, "date_dim").filter(col("d_year") === 2000)
      .select("d_date_sk")
    val it = t(spark, dir, "item").select("i_item_sk", "i_category")
    t(spark, dir, "store_returns")
      .join(ss, col("sr_ticket_number") === col("ss_ticket_number") &&
        col("sr_item_sk") === col("ss_item_sk"))
      .join(broadcast(dd), col("sr_returned_date_sk") === col("d_date_sk"))
      .join(broadcast(it), col("sr_item_sk") === col("i_item_sk"))
      .groupBy(col("i_category"))
      .agg(count(lit(1)).as("n_returns"),
        sum(col("sr_return_quantity")).as("returned_qty"),
        sum(col("sr_return_amt")).cast(DoubleType).as("returned_amt"),
        sum(col("ss_net_paid")).cast(DoubleType).as("sold_amt"))
  }

  /** [Q-tpcds-q22] TPC-DS Q22 shape: inventory ⋈ date_dim ⋈ item, one
    * d_month_seq year, average quantity-on-hand by ROLLUP of the item
    * hierarchy. inventory is the largest generated fact (11.7M rows/sf). */
  def q_tpcds_q22(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensure(spark, sfDir)
    val dd = t(spark, dir, "date_dim")
      .filter(col("d_month_seq").between(1200, 1211)).select("d_date_sk")
    val it = t(spark, dir, "item")
      .select("i_item_sk", "i_product_name", "i_brand", "i_class", "i_category")
    t(spark, dir, "inventory")
      .join(broadcast(dd), col("inv_date_sk") === col("d_date_sk"))
      .join(broadcast(it), col("inv_item_sk") === col("i_item_sk"))
      .rollup(col("i_product_name"), col("i_brand"), col("i_class"), col("i_category"))
      .agg((sum(col("inv_quantity_on_hand")).cast(DoubleType) /
        count(col("inv_quantity_on_hand"))).as("qoh"))
  }

  /** [Q-tpcds-q71] TPC-DS Q71 shape: the three sales channels UNION ALL'd,
    * one brand category in one month, revenue by brand × meal-time hour
    * (exercises time_dim's derived bands). Each channel's scan streams
    * through the same three broadcast dims before the union — no
    * channel-sized shuffle. */
  def q_tpcds_q71(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensure(spark, sfDir)
    def chan(name: String, pfx: String): DataFrame =
      t(spark, dir, name).select(
        col(s"${pfx}_ext_sales_price").as("price"), col(s"${pfx}_item_sk").as("item"),
        col(s"${pfx}_sold_time_sk").as("tim"), col(s"${pfx}_sold_date_sk").as("dat"))
    val sales = chan("web_sales", "ws")
      .union(chan("catalog_sales", "cs")).union(chan("store_sales", "ss"))
    val dd = t(spark, dir, "date_dim")
      .filter(col("d_moy") === 11 && col("d_year") === 2000).select("d_date_sk")
    val it = t(spark, dir, "item").filter(col("i_category") === "Electronics")
      .select("i_item_sk", "i_brand_id", "i_brand")
    val td = t(spark, dir, "time_dim")
      .filter(col("t_meal_time").isin("breakfast", "dinner"))
      .select("t_time_sk", "t_hour")
    sales.join(broadcast(dd), col("dat") === col("d_date_sk"))
      .join(broadcast(it), col("item") === col("i_item_sk"))
      .join(broadcast(td), col("tim") === col("t_time_sk"))
      .groupBy(col("i_brand_id"), col("i_brand"), col("t_hour"))
      .agg(sum(col("price")).cast(DoubleType).as("ext_price"))
  }

  /** The one fixture scale whose generated data the static oracle SQL reads.
    * [[graft.Verify]] enforces this structurally: verifying a q_tpcds_* at
    * any other fixture scale fails with an explanatory error instead of an
    * opaque wrong-scale hash mismatch. Bench (no oracle) runs at any scale. */
  val oracleScale = "sf0.01"

  /** True iff `sfDir`'s generated data is what [[oracle]]'s pinned paths read. */
  def oracleCompatible(sfDir: String): Boolean =
    new java.io.File(sfDir).getName == oracleScale

  /** DuckDB oracle SQL over the SAME generated parquet, path-pinned to the
    * driver's correctness scale ([[oracleScale]]). */
  private def P(name: String) = s"'$root/$oracleScale/$name.parquet/*.parquet'"

  val oracle: Map[String, String] = Map(
    "q_tpcds_q3" ->
      s"""SELECT d_year, i_brand_id, i_brand,
         | CAST(sum(ss_ext_sales_price) AS DOUBLE) AS ext_price
         |FROM ${P("store_sales")} JOIN ${P("date_dim")} ON ss_sold_date_sk = d_date_sk
         |JOIN ${P("item")} ON ss_item_sk = i_item_sk
         |WHERE d_moy = 11 AND i_category = 'Books'
         |GROUP BY d_year, i_brand_id, i_brand""".stripMargin,
    "q_tpcds_q7" ->
      s"""SELECT i_item_id,
         | CAST(sum(ss_quantity) AS DOUBLE) / count(ss_quantity) AS agg1,
         | CAST(sum(ss_list_price) AS DOUBLE) / count(ss_list_price) AS agg2,
         | CAST(sum(ss_coupon_amt) AS DOUBLE) / count(ss_coupon_amt) AS agg3,
         | CAST(sum(ss_sales_price) AS DOUBLE) / count(ss_sales_price) AS agg4
         |FROM ${P("store_sales")}
         |JOIN ${P("customer_demographics")} ON ss_cdemo_sk = cd_demo_sk
         |JOIN ${P("date_dim")} ON ss_sold_date_sk = d_date_sk
         |JOIN ${P("promotion")} ON ss_promo_sk = p_promo_sk
         |JOIN ${P("item")} ON ss_item_sk = i_item_sk
         |WHERE cd_gender = 'M' AND cd_marital_status = 'S'
         |  AND cd_education_status = 'College'
         |  AND (p_channel_email = 'N' OR p_channel_event = 'N') AND d_year = 2000
         |GROUP BY i_item_id""".stripMargin,
    "q_tpcds_returns" ->
      s"""SELECT i_category, count(*) AS n_returns,
         | CAST(sum(sr_return_quantity) AS BIGINT) AS returned_qty,
         | CAST(sum(sr_return_amt) AS DOUBLE) AS returned_amt,
         | CAST(sum(ss_net_paid) AS DOUBLE) AS sold_amt
         |FROM ${P("store_returns")}
         |JOIN ${P("store_sales")}
         |  ON sr_ticket_number = ss_ticket_number AND sr_item_sk = ss_item_sk
         |JOIN ${P("date_dim")} ON sr_returned_date_sk = d_date_sk
         |JOIN ${P("item")} ON sr_item_sk = i_item_sk
         |WHERE d_year = 2000
         |GROUP BY i_category""".stripMargin,
    "q_tpcds_q22" ->
      s"""SELECT i_product_name, i_brand, i_class, i_category,
         | CAST(sum(inv_quantity_on_hand) AS DOUBLE) / count(inv_quantity_on_hand) AS qoh
         |FROM ${P("inventory")} JOIN ${P("date_dim")} ON inv_date_sk = d_date_sk
         |JOIN ${P("item")} ON inv_item_sk = i_item_sk
         |WHERE d_month_seq BETWEEN 1200 AND 1211
         |GROUP BY ROLLUP(i_product_name, i_brand, i_class, i_category)""".stripMargin,
    "q_tpcds_q71" ->
      s"""SELECT i_brand_id, i_brand, t_hour, CAST(sum(price) AS DOUBLE) AS ext_price
         |FROM (
         |  SELECT ws_ext_sales_price AS price, ws_item_sk AS item,
         |         ws_sold_time_sk AS tim, ws_sold_date_sk AS dat FROM ${P("web_sales")}
         |  UNION ALL SELECT cs_ext_sales_price, cs_item_sk, cs_sold_time_sk,
         |         cs_sold_date_sk FROM ${P("catalog_sales")}
         |  UNION ALL SELECT ss_ext_sales_price, ss_item_sk, ss_sold_time_sk,
         |         ss_sold_date_sk FROM ${P("store_sales")}
         |) s
         |JOIN ${P("date_dim")} ON dat = d_date_sk
         |JOIN ${P("item")} ON item = i_item_sk
         |JOIN ${P("time_dim")} ON tim = t_time_sk
         |WHERE d_moy = 11 AND d_year = 2000 AND i_category = 'Electronics'
         |  AND t_meal_time IN ('breakfast', 'dinner')
         |GROUP BY i_brand_id, i_brand, t_hour""".stripMargin)

  /** SparkEntry glue: name → query fn for every declared q_tpcds_*. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpcds_q3" -> q_tpcds_q3,
    "q_tpcds_q7" -> q_tpcds_q7,
    "q_tpcds_returns" -> q_tpcds_returns,
    "q_tpcds_q22" -> q_tpcds_q22,
    "q_tpcds_q71" -> q_tpcds_q71)
}
