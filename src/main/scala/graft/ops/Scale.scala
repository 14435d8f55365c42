package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-shaping utilities for the 100 TB design point.
  *
  * These are the two standard levers when a keyed join stops scaling:
  *  - `bucketize`/`coLocatedJoin` — pre-shuffle both fact tables into the
  *    same bucket layout ONCE at write time, so every subsequent join on the
  *    bucket key is exchange-free (the per-query shuffle disappears; at
  *    100 TB the join shuffle IS the cost, and repeated joins on the same
  *    key amortize to zero exchanges).
  *  - `saltedJoin` — when one key's row count dwarfs the rest (a hot user,
  *    an empty-string document), split the hot key across `saltFactor`
  *    sub-keys: the big side salts deterministically, the dim side explodes
  *    over all salt values, the join stays equi, and no single task owns
  *    the hot key alone. (AQE's skew-join split handles moderate skew at
  *    runtime; salting is the static escalation for pathological keys.)
  */
object Scale {

  /** Write `df` as a bucketed, bucket-sorted table: rows are hash-placed by
    * `key` into `buckets` files per partition, the layout Spark's scan
    * reports as a valid HashPartitioning — joins/aggregations on `key`
    * between tables bucketed the same way plan NO Exchange. */
  def bucketize(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — exchange-free by
    * construction (assert with PlanGuard-style checks in tests). */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Write `df` hive-partitioned by `partCol` — the date-partitioned lake
    * layout. A reader filtering on `partCol` plans PartitionFilters and
    * never opens non-matching directories; at 100 TB this is the difference
    * between scanning a day and scanning a decade. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.partitionBy(partCol).mode("overwrite").parquet(path)

  /** Write `df` range-clustered on `cols`: repartitionByRange splits the
    * key space into contiguous slices (range-partition shuffle with sampled
    * bounds), sortWithinPartitions orders rows inside each file — so every
    * parquet file and every row group covers a NARROW, mostly-disjoint key
    * range. A reader filtering on `cols` then skips whole files/row groups
    * from footer min/max stats alone (plus partition-level pruning when
    * combined with writePartitioned). At 100 TB this data-CLUSTERING lever
    * is what makes point/range lookups not scan the corpus; it composes
    * with, and differs from, bucketize (join co-location) and
    * writePartitioned (coarse directory pruning). */
  def sortForSkipping(df: DataFrame, path: String, numFiles: Int,
                      cols: String*): Unit = {
    val cs = cols.map(col)
    df.repartitionByRange(numFiles, cs: _*)
      .sortWithinPartitions(cs: _*)
      .write.mode(SaveMode.ErrorIfExists).parquet(path)
  }

  /** Write `df` Z-ORDER clustered on TWO numeric columns: each column
    * equi-width-buckets into 2^bits cells (`width_bucket` — row-local,
    * codegen'd; the min/max scalars are one cheap aggregate, a write-path
    * cost, not a per-query one), the two bucket ids bit-INTERLEAVE into a
    * z-value, and the data range-partitions + sorts on z. Because the
    * z-curve is locality-preserving in BOTH dimensions, every output file
    * covers a compact rectangle of (c1, c2) space — so footer min/max
    * stats prune lookups filtering on EITHER column, where a plain sort on
    * c1 leaves every file spanning c2's full range. The two-dimensional
    * complement of [[sortForSkipping]]. */
  def zorderWrite(df: DataFrame, path: String, numFiles: Int,
                  c1: String, c2: String, bits: Int = 8): Unit = {
    require(bits >= 1 && bits <= 15, s"bits must be in [1,15], got $bits")
    val r = df.agg(
      min(col(c1).cast("double")), max(col(c1).cast("double")),
      min(col(c2).cast("double")), max(col(c2).cast("double"))).head()
    val (lo1, hi1, lo2, hi2) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    require(hi1 > lo1 && hi2 > lo2,
      s"z-order needs non-degenerate ranges: [$lo1,$hi1] [$lo2,$hi2]")
    val n = 1 << bits
    def bucket(c: String, lo: Double, hi: Double) =
      least(greatest(
        expr(s"width_bucket(CAST($c AS DOUBLE), ${lo}d, ${hi}d, $n)") - 1,
        lit(0)), lit(n - 1)).cast("long")
    val b1 = bucket(c1, lo1, hi1)
    val b2 = bucket(c2, lo2, hi2)
    val z = (0 until bits).map(i =>
      shiftleft(b1.bitwiseAND(lit(1L << i)), i) +
        shiftleft(b2.bitwiseAND(lit(1L << i)), i + 1))
      .reduce(_ + _)
    val cols = df.columns.map(col).toSeq
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .select(cols: _*)
      .write.mode(SaveMode.ErrorIfExists).parquet(path)
  }

  /** Equi-join `big ⋈ dim` on `key` with the dim side replicated over
    * `saltFactor` sub-keys. The big side's salt is derived from xxhash64 of
    * the whole row (deterministic, uniform); the dim side explodes to all
    * salt values, so every (key, salt) pair finds its match and the result
    * equals the unsalted join exactly. Dim-side blowup is saltFactor×dim —
    * use for big⋈small joins where one big-side key is pathologically hot. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(saltFactor)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** [Q-join-salted] the salted skew join DECLARED — revenue per market
    * segment through `saltedJoin(orders ⋈ customer)` with 8 salt sub-keys.
    * The oracle is the PLAIN equi-join SQL: the driver's DuckDB hash-match
    * is the proof that salting is purely a physical-layout transform (the
    * ScalaTest equality check, made external). This is the static escalation
    * for a pathologically hot key that AQE's runtime skew split can't fix
    * (one logical key too big for ANY single task). */
  def q_join_salted(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val big = graft.Tables(s, d, "orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val dim = graft.Tables(s, d, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    saltedJoin(big, dim, "custkey", saltFactor = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType)
          .as("sum_price"))
  }
}
