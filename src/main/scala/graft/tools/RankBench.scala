package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Scale

/** A/B harness for the two global-rank shapes: [[Scale.globalRank]]'s
  * two-phase slice plan vs the plain unpartitioned `rank().over(
  * Window.orderBy)` single-task sort. Asserts identical output first,
  * then times warm repeats of each over the orders fixture. The point is
  * an HONEST local record of where the crossover is NOT: on one JVM a
  * single-task sort of even millions of rows is fast, so the two-phase
  * form's win case (a straggler- or memory-bound one-task sort at
  * cluster row counts) does not reproduce locally — measure before
  * claiming either way. Usage:
  * runMain graft.tools.RankBench [sfDir] [reps] [copies]
  * `copies` unions the orders table N× (ranking frame = N·|orders|). */
object RankBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val copies = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val one = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    // key-offset replicas keep ranks meaningful (ties only within a copy)
    val df = (0 until copies).map(i =>
        one.select((col("o_orderkey") + lit(i.toLong * 1000000000L)).as("o_orderkey"),
          col("o_totalprice")))
      .reduce(_ union _)
    val twoPhase = Scale.globalRank(df, "o_totalprice", ascending = false, "rnk")
    val single = df.withColumn("rnk",
      rank().over(Window.orderBy(col("o_totalprice").desc)))
    val diff = twoPhase.exceptAll(single).count() +
      single.exceptAll(twoPhase).count()
    require(diff == 0, s"plans disagree on $diff rows")
    println(s"[rankbench] identical output over ${df.count()} rows")
    def time(name: String, plan: org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        plan.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[rankbench] $name%-10s " + times.map(t => f"$t%.2f").mkString(" "))
    }
    time("two-phase", twoPhase)
    time("window", single)
    spark.stop()
  }
}
