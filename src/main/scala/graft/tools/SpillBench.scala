package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Constrained-memory spill validation (r12 verdict #4): runs named declared
  * queries and reports, per query, wall-clock plus the executor spill the
  * listener saw (memoryBytesSpilled / diskBytesSpilled summed over tasks)
  * and the peak single-task execution memory. The 100 TB argument needs the
  * sort/aggregate/join SPILL paths shown working, not just plans that fit
  * in 128 GiB of headroom: run this twice — once at the default heap and
  * once with SPARK_DRIVER_MEM cut ~4× — and commit both records. A query
  * that spills and still finishes with the same result is the evidence; a
  * query that OOMs is a finding.
  *
  * Usage: SPARK_DRIVER_MEM=2g sbt "runMain graft.tools.SpillBench <sfDir> <name...>"
  */
object SpillBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SpillBench <sfDir> <name...>")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the heap ladder studies per-task memory at FIXED concurrency and
      // partitioning — pin the count so ShuffleScale's data-proportional
      // derivation doesn't move the denominator between ladder rungs
      .config("spark.graft.fixedShuffle", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val heap = Runtime.getRuntime.maxMemory() / (1L << 20)
    println(s"[spill] heap=${heap}MiB cpus=$cpus sf=$sfDir")
    // task-end accumulation; reset between queries (queries run serially,
    // so attribution by window is exact)
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    val peakTask = new java.util.concurrent.atomic.AtomicLong
    val failedTasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakTask.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
        }
        if (!te.reason.toString.startsWith("Success")) failedTasks.incrementAndGet()
      }
    })
    def mb(b: Long): String = f"${b / 1048576.0}%.0f"
    names.foreach { n =>
      memSpill.set(0); diskSpill.set(0); peakTask.set(0); failedTasks.set(0)
      val t0 = System.nanoTime()
      val outcome =
        try {
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          "ok"
        } catch { case e: Throwable => s"FAILED ${e.getClass.getSimpleName}" }
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously (the bus-drain API is
      // private[spark]) — a short settle keeps attribution honest for
      // queries that just finished their last stage
      Thread.sleep(1000)
      println(f"[spill] $n%-22s $outcome%-8s ${secs}%7.1f s  " +
        s"memSpill=${mb(memSpill.get)}MiB diskSpill=${mb(diskSpill.get)}MiB " +
        s"peakTaskMem=${mb(peakTask.get)}MiB taskRetries=${failedTasks.get}")
    }
    spark.stop()
  }
}
