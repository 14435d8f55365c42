package graft.tools

import org.apache.spark.sql.SparkSession

/** Bump-scope verifier (the verify-skill protocol step for a SEMANTIC
  * genVersion bump): freshly generates every TPC-DS table at the CURRENT
  * genVersion and diffs it against an OLD generation's on-disk cache,
  * asserting the change touched EXACTLY the declared columns. Every table
  * other than `changedTable` must be bit-identical; `changedTable` must be
  * bit-identical after dropping `changedCols`. Run BEFORE warming the new
  * cache (warming sweeps the old generation's directory, destroying the
  * only copy of the old values).
  *
  * Usage: `runMain graft.tools.GenScopeDiff <oldCacheSfDir> <sf>
  *   <changedTable> <changedCols...>`
  * e.g. `GenScopeDiff /tmp/graft_tpcds/gen19/sf0.01 0.01 item i_units`. */
object GenScopeDiff {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: GenScopeDiff <oldCacheSfDir> <sf> <changedTable> <cols...>")
    val oldDir = args(0)
    val sf = args(1).toDouble
    val changedTable = args(2)
    val changedCols = args.drop(3).toSeq
    require(new java.io.File(oldDir).isDirectory, s"no old cache at $oldDir")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var bad = 0
    for (tbl <- graft.gen.TpcdsGen.tableNames) {
      val fresh0 = graft.gen.TpcdsGen.table(spark, tbl, sf, 8)
      val cached0 = spark.read.parquet(s"$oldDir/$tbl.parquet")
      val (fresh, cached, scope) =
        if (tbl == changedTable)
          (fresh0.drop(changedCols: _*), cached0.drop(changedCols: _*),
            s" (ignoring ${changedCols.mkString(",")})")
        else (fresh0, cached0, "")
      val a = fresh.exceptAll(cached).count()
      val b = cached.exceptAll(fresh).count()
      if (a != 0 || b != 0) {
        bad += 1
        println(s"OUT-OF-SCOPE $tbl$scope freshOnly=$a cachedOnly=$b")
      } else println(s"IN-SCOPE $tbl$scope identical")
    }
    println(if (bad == 0) s"SCOPE OK: only $changedTable.{${changedCols.mkString(",")}} moved"
            else s"$bad TABLES OUT OF SCOPE")
    spark.stop()
    if (bad != 0) sys.exit(1)
  }
}
