package graft.tools

import org.apache.spark.sql.SparkSession

/** Materialize the TPC-DS generate-once cache for the named scales at the
  * CURRENT genVersion (the first ensure of a new generation also sweeps
  * stale sibling generations). Usage:
  * `runMain graft.tools.WarmCache <sf...>` e.g. `WarmCache sf0.01 sf1`. */
object WarmCache {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: WarmCache <sfBasename...>")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- args) {
      val t0 = System.nanoTime()
      val dir = graft.ops.Tpcds.ensure(spark, sf)
      println(f"[warm] $dir ready in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
