package graft.tools

import org.apache.spark.sql.SparkSession
import graft.gen.{TpchGen, TpcdsGen}

/** Per-table generation timing: writes each named table to a noop-like
  * temp parquet dir and prints wall-clock seconds. Usage:
  *   runMain graft.tools.GenTime <tpch|tpcds> <sf> <partitions> [table...]
  * (all tables if none named). Used to attribute generation cost — the
  * whole-benchmark number can't tell a slow table from a slow machine. */
object GenTime {
  def main(args: Array[String]): Unit = {
    val bench = if (args(0) == "tpcds") TpcdsGen else TpchGen
    val sf = args(1).toDouble
    val parts = args(2).toInt
    val names = if (args.length > 3) args.drop(3).toSeq else bench.tableNames
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("GRAFT_WSCG", "true"))
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("GRAFT_HUGE_LIMIT", "65535"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tbl(t: String) = bench match {
      case TpchGen => TpchGen.table(spark, t, sf, parts)
      case _ => TpcdsGen.table(spark, t, sf, parts)
    }
    names.foreach { t =>
      val t0 = System.nanoTime()
      val df = tbl(t)
      if (sys.env.contains("GRAFT_DEBUG_CODEGEN")) {
        import org.apache.spark.sql.execution.debug._
        df.debugCodegen()
      }
      df.write.format("noop").mode("overwrite").save()
      println(f"[gentime] $t%-12s ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
