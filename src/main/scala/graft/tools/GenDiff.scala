package graft.tools

import org.apache.spark.sql.SparkSession

/** Bit-identity diff of freshly generated TPC-DS tables against the
  * on-disk gen-cache parquet for the CURRENT genVersion. Run after any
  * generator refactor that is supposed to be value-preserving (e.g. the
  * staged-projection CSE rework): every table must come back IDENTICAL,
  * otherwise the refactor changed data and genVersion must bump.
  * Usage: `runMain graft.tools.GenDiff [sf]` (default 0.01). */
object GenDiff {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.nonEmpty) args(0).toDouble else 0.01
    val cache = s"/tmp/graft_tpcds/gen${graft.gen.TpcdsGen.genVersion}/sf$sf"
    require(new java.io.File(cache).isDirectory,
      s"no gen cache at $cache — run a query once to materialize it")
    var bad = 0
    for (tbl <- graft.gen.TpcdsGen.tableNames) {
      val fresh = graft.gen.TpcdsGen.table(spark, tbl, sf, 8)
      val cached = spark.read.parquet(s"$cache/$tbl.parquet")
      val a = fresh.exceptAll(cached).count()
      val b = cached.exceptAll(fresh).count()
      val n = fresh.count()
      if (a != 0 || b != 0) {
        bad += 1
        println(s"MISMATCH $tbl rows=$n freshOnly=$a cachedOnly=$b")
      } else println(s"IDENTICAL $tbl rows=$n")
    }
    println(if (bad == 0) "ALL TABLES BIT-IDENTICAL" else s"$bad TABLES MISMATCH")
    spark.stop()
    if (bad != 0) sys.exit(1)
  }
}
