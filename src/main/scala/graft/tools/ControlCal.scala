package graft.tools

import org.apache.spark.sql.SparkSession

/** Calibration harness for [[graft.Bench.controlRef]]: runs the three
  * synthetic contention-control tasks N times back-to-back in the current
  * window and prints per-control medians (plus min/max). Run it in an IDLE
  * window and copy the medians into `Bench.controlRef` whenever a control
  * task changes — the committed reference is what lets any later bench
  * record report its own ambient-contention level as a ratio.
  *
  * Usage: runMain graft.tools.ControlCal [reps=15] [cpus=32]
  *
  * HOST PORTABILITY (r14 verdict #8): the medians alone are a magic
  * threshold on a new machine. So the run also emits a full JSON record —
  * every raw sample per control plus the host shape (cores, heap, JVM) —
  * to SPARK_GRAFT_CONTROL_OUT (default /tmp/graft_control_cal.json). The
  * committed copy (tools/control_ref.json) is the calibration's
  * provenance: a different box re-runs this main in an idle window,
  * commits the new record, and copies ITS medians into Bench.controlRef —
  * the recalibration rule BASELINE.md §contention documents.
  */
object ControlCal {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(15)
    val cpus = args.drop(1).headOption.getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val controls = graft.Bench.controlTasks(spark)
    controls.foreach { case (_, run) => run() } // warm: codegen compile out
    val samples = controls.map { case (name, run) =>
      name -> (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.sorted
    }
    samples.foreach { case (name, xs) =>
      println(f"""$name%-12s median=${xs(xs.size / 2)}%.3f min=${xs.head}%.3f max=${xs.last}%.3f n=$reps""")
    }
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val ctl = samples.map { case (name, xs) =>
      s""""$name":{"median":${f(xs(xs.size / 2))},"samples":[${xs.map(f).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val rec = s"""{"harness":"ControlCal","reps":$reps,"cpus":"$cpus",""" +
      s""""host_cores":${Runtime.getRuntime.availableProcessors()},""" +
      s""""heap_mib":${Runtime.getRuntime.maxMemory() / (1L << 20)},""" +
      s""""jvm":"${System.getProperty("java.version")}",""" +
      s""""spark":"${spark.version}","controls":$ctl,""" +
      s""""committed_ref":${graft.Bench.controlRef.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")}}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_CONTROL_OUT", "/tmp/graft_control_cal.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (rec + "\n").getBytes("UTF-8"))
    println(s"raw record -> $out ; copy the medians into graft.Bench.controlRef")
    spark.stop()
  }
}
