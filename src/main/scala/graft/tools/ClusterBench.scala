package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** `local[32]` → `local-cluster` seam check (r12 verdict #8): runs named
  * declared queries on `local-cluster[workers,cores,memMB]` — separate
  * executor JVMs on this box, so every exchange pays REAL serialization +
  * network loopback and every broadcast actually ships — and prints warm
  * medians to compare against the same queries under plain local[N].
  * This retires the one structural difference between the committed
  * single-JVM curves and a real cluster (task results, broadcasts and
  * shuffle blocks crossing process boundaries).
  *
  * Needs the classes visible to executor JVMs: run `sbt package` first;
  * the packaged jar is registered via spark.jars (custom Catalyst
  * expressions and generator lambdas deserialize on executors).
  *
  * Usage: runMain graft.tools.ClusterBench <sfDir> <reps> <name...>
  *   env: SPARK_GRAFT_CLUSTER=workers,cores,memMB (default 4,8,4096)
  */
object ClusterBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ClusterBench <sfDir> <reps> <name...>")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val Array(w, c, m) = sys.env.getOrElse("SPARK_GRAFT_CLUSTER", "4,8,4096")
      .split(",").map(_.trim)
    val jar = {
      val dir = new java.io.File("target/scala-2.13")
      val jars = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("tpctoolsspark") &&
          f.getName.endsWith(".jar"))
      require(jars.nonEmpty, "run `sbt package` first — executors need the jar")
      jars.maxBy(_.lastModified).getAbsolutePath
    }
    val spark = SparkSession.builder()
      .master(s"local-cluster[$w,$c,$m]")
      .config("spark.jars", jar)
      .config("spark.executor.memory", s"${m}m")
      .config("spark.sql.shuffle.partitions", (w.toInt * c.toInt).toString)
      // the seam comparison holds partitioning equal to the committed
      // single-JVM record — pin against ShuffleScale's derivation
      .config("spark.graft.fixedShuffle", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[cluster] master=local-cluster[$w,$c,$m] jar=$jar")
    // SPARK_GRAFT_CLUSTER_DUMP=<outDir>: instead of timing, dump each
    // query's RESULT (computed entirely through the multi-JVM seam) plus
    // the matching oracle_sql.json slice, VerifySome-style — then
    // tools/check.py + tools/driversim.py prove the seam ORACLE-EXACT,
    // not just crash-free (broadcasts, exchanges and custom expressions
    // all serialized for real).
    sys.env.get("SPARK_GRAFT_CLUSTER_DUMP") match {
      case Some(outDir) =>
        new java.io.File(outDir).mkdirs()
        names.foreach { n =>
          try {
            SparkEntry.queries(n)(spark, sfDir).coalesce(1)
              .write.mode("overwrite").parquet(s"$outDir/$n")
            println(s"[cluster] dumped $n")
          } catch { case e: Throwable =>
            println(s"[cluster] $n FAILED: ${e.getClass.getSimpleName} ${e.getMessage}")
          }
        }
        def q(s: String): String = "\"" + s.flatMap {
          case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
          case '\r' => "\\r"; case '\t' => "\\t"
          case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
          case ch => ch.toString
        } + "\""
        val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
          .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
      case None =>
        names.foreach { n =>
          try {
            val times = (1 to reps).map { _ =>
              val t0 = System.nanoTime()
              SparkEntry.queries(n)(spark, sfDir)
                .write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }.sorted
            println(f"[cluster] $n%-22s median=${times(times.size / 2)}%.2f  " +
              times.map(t => f"$t%.2f").mkString(" "))
          } catch {
            case e: Throwable =>
              println(s"[cluster] $n FAILED: ${e.getClass.getSimpleName} ${e.getMessage}")
          }
        }
    }
    spark.stop()
  }
}
