package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Drift-free config A/B: run each named query with conf-set A and conf-set
  * B INTERLEAVED in one JVM (A,B,A,B,...), so ambient load and JVM aging hit
  * both legs equally — the failure mode of back-to-back TimeQuery A/Bs on a
  * contended host (r18). Both keys are runtime SQL confs, so spark.conf.set
  * flips them between runs; each leg gets one untimed warmup.
  *
  * Usage: runMain graft.tools.ConfAB <sfDir> <reps-per-leg> \
  *   "<kA=vA;kA2=vA2>" "<kB=vB;...>" <queryName...>
  */
object ConfAB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 5, "usage: ConfAB <sfDir> <reps> <confA> <confB> <name...>")
    val sfDir = args(0)
    val reps = args(1).toInt.max(1)
    def parse(s: String): Seq[(String, String)] =
      s.split(";").map(_.trim).filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }.toSeq
    val confA = parse(args(2))
    val confB = parse(args(3))
    val names = args.drop(4).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def run(conf: Seq[(String, String)]): Double = {
        conf.foreach { case (k, v) => spark.conf.set(k, v) }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(confA); run(confB) // one untimed warmup per leg
      val (as, bs) = (1 to reps).map(_ => (run(confA), run(confB))).unzip
      println(f"[confab] $n%-22s A=${med(as)}%.2f B=${med(bs)}%.2f  (A: ${as.map(x => f"$x%.2f").mkString(",")} | B: ${bs.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
