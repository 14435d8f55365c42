package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line on stdout with per-query wall-clock seconds.
  *
  * Each query is forced through FULL execution with the noop sink (a bare
  * count() would let Catalyst prune the projected columns and under-measure).
  * A query that throws is reported in "failed" — never as a timing row; the
  * headline metric sums successful queries only and "n_failed" makes a
  * partial run impossible to mistake for a clean one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT, codegen compilation, parquet-reader and
    // noop-writer classloading would otherwise all be billed to whichever
    // query happens to run first (region is a 5-row table — the point is
    // exercising the scan → exchange → aggregate → sink code paths, not
    // moving data)
    spark.range(1L << 20).selectExpr("sum(id) AS s")
      .write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().orderBy("r_name")
      .write.format("noop").mode("overwrite").save()
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // stable name order: Map iteration order varies per build, which would
    // shuffle warmup/cache attribution between rounds
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
      }
    }
    val qs = timings.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val fl = failed.map(n => s""""$n"""").mkString("[", ",", "]")
    val total = timings.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"n_failed":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(0) // failures are visible in the JSON itself
  }
}
