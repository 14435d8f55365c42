package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Subset correctness dump for fast iteration: like [[graft.Verify]] but
  * only for the named queries — dump each result plus the matching
  * oracle_sql.json slice into `outDir`, then `tools/check.py <sfDir>
  * <outDir>` compares just those. Usage:
  * `runMain graft.tools.VerifySome <sfDir> <outDir> <name...>` */
object VerifySome {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifySome <sfDir> <outDir> <name...>")
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.plans.SessionDefaults.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same gate as graft.Verify: oracle SQL pins paths under the default
    // /tmp cache root, so an override would compare against different data.
    val cacheRoot = spark.conf.get("spark.graft.cacheRoot", "/tmp")
    require(cacheRoot == "/tmp",
      s"correctness gate must run without a spark.graft.cacheRoot override " +
        s"(found '$cacheRoot'): the DuckDB oracle SQL pins paths under /tmp.")
    new java.io.File(outDir).mkdirs()
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { name =>
      try graft.SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        // NonFatal only (matches Bench): a fatal error leaves the JVM
        // suspect — later dumps may be garbage, so abort instead.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    def esc(s: String) = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val json = names.flatMap(n => graft.SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (n, sql) => s""""${esc(n)}": "${esc(sql)}"""" }
      .mkString("{", ", ", "}")
    Files.write(Paths.get(outDir, "oracle_sql.json"), json.getBytes("UTF-8"))
    spark.stop()
  }
}
