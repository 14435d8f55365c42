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
    println("copy the medians into graft.Bench.controlRef")
    spark.stop()
  }
}
