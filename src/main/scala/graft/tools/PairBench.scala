package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Dedup

/** A/B harness for the ngram candidate-pair generation shapes:
  * two-sided merge self-join (production, [[Dedup.ngramPairs]]) vs
  * per-shingle group-collect + in-row expansion
  * ([[Dedup.ngramPairsGrouped]]). Asserts identical output first, then
  * times warm repeats of each. Usage:
  * runMain graft.tools.PairBench [sfDir] [reps]
  */
object PairBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    val joined = Dedup.ngramPairs(docs, 0.2)
    val grouped = Dedup.ngramPairsGrouped(docs, 0.2)
    val j = joined.withColumn("jacc", round(col("jacc"), 9))
    val g = grouped.withColumn("jacc", round(col("jacc"), 9))
    val d1 = j.exceptAll(g).count()
    val d2 = g.exceptAll(j).count()
    println(s"[pairbench] output diff: $d1 + $d2 rows (must be 0)")
    require(d1 == 0 && d2 == 0, "pair shapes disagree")
    def time(tag: String, f: () => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pairbench] $tag%-10s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    time("self-join", () =>
      Dedup.ngramPairs(docs, 0.2).write.format("noop").mode("overwrite").save())
    time("grouped", () =>
      Dedup.ngramPairsGrouped(docs, 0.2).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
