package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan-audit helper: prints the formatted physical plan for the named
  * queries (all queries if none named). Usage:
  *   runMain graft.tools.Explain <sfDir> [queryName...]
  * Used to check the properties the 100 TB design cares about: joins are
  * keyed (no BroadcastNestedLoopJoin outside fenced baselines), filters are
  * pushed to the scan, scans prune columns, WholeStageCodegen spans are wide.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    val b = graft.plans.SessionDefaults.tuned(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // audit plans against a relocated cache (e.g. the sf100 probe root)
    sys.env.get("SPARK_GRAFT_CACHE_ROOT")
      .foreach(r => b.config("spark.graft.cacheRoot", r))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // provenance header: the session defaults in force when these plans
    // were captured (committed plan files should be self-describing)
    graft.plans.SessionDefaults.defaults.foreach { case (k, _) =>
      println(s"[conf] $k=${spark.conf.get(k)}") }
    val (executed, qnames) = names.partition(_ == "--executed")
    qnames.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (executed.nonEmpty) {
        // drive THIS df's own QueryExecution to completion, then print its
        // FINAL adaptive plan — runtime stage reuse (ReusedExchange /
        // ReusedSubquery) and AQE join re-plans only show up
        // post-execution. A noop write (or foreach/rdd) would NOT do: each
        // wraps the plan in a fresh QueryExecution, leaving
        // df.queryExecution un-executed (isFinalPlan=false) — the r18
        // session caught this tool printing initial plans under the
        // --executed flag. collect() is the one action wired to the
        // Dataset's OWN QueryExecution; declared-query results are
        // bounded (aggregates/top-k), so the driver pull is fine for a
        // diagnostic tool.
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
