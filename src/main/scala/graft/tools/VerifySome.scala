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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { name =>
      try graft.SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
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
