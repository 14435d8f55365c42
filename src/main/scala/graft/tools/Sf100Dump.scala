package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** sf100 correctness dumps (r14 verdict #1: "sf100 correctness, not just
  * sf100 timing").
  *
  * Runs named declared queries against an sf100 probe cache (built by
  * [[Sf100Probe]] `--keep-all`) and writes each result as a 1-file parquet
  * dump plus the oracle_sql.json slice — the same artifact shape as
  * VerifySome, checked driver-side by `tools/sf100_check.py`, which
  * rewrites the pinned sf0.01 oracle paths to the sf100 cache and runs
  * DuckDB under an explicit memory/temp/wall budget (the r13 runaway-Q64
  * lesson), falling back to dual-run + invariant checking where DuckDB
  * can't finish.
  *
  * `--alt-partitioning` is the dual-run determinism leg: the session pins
  * a DIFFERENT shuffle partition count (96 vs the derived ~360) and a
  * different scan split size (32 MiB vs the 128 MiB default), so both the
  * scan parallelism and every exchange differ — a cell-exact match across
  * the two runs demonstrates partitioning-independence of the result at
  * sf100 (the determinism contract GenSpec pins at gate scale).
  *
  * Usage: SPARK_DRIVER_MEM=48g runMain graft.tools.Sf100Dump
  *   <probeRoot> <outDir> [--alt-partitioning] [--sf=sfN] <query...>
  *
  * `--sf=sf10` retargets the dump at another generated scale (r16: the
  * strict DuckDB sweep of the WHOLE TPC-DS + TpchFull suite at sf10 —
  * inside DuckDB's budget, unlike sf100's heavies — with
  * probeRoot=/tmp so the default gen caches are reused).
  */
object Sf100Dump {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    require(pos.length >= 3, "usage: Sf100Dump <probeRoot> <outDir> [--alt-partitioning] [--sf=sfN] <query...>")
    val alt = flags.contains("--alt-partitioning")
    val sfName = flags.collectFirst { case f if f.startsWith("--sf=") =>
      f.stripPrefix("--sf=") }.getOrElse("sf100")
    val (probeRoot, outDir, names) = (pos(0), pos(1), pos.drop(2).toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.cacheRoot", probeRoot)
    if (alt) {
      b.config("spark.sql.shuffle.partitions", "96")
      b.config("spark.graft.fixedShuffle", "true")
      b.config("spark.sql.files.maxPartitionBytes", s"${32L << 20}")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        // repartition(1), NOT coalesce(1): coalesce merges into the parent
        // stage and runs the query's final aggregate single-threaded — at
        // sf100 that turned q72's 120 GB-spill aggregation into a one-task
        // crawl. The extra exchange carries only the result rows.
        graft.SparkEntry.queries(name)(spark, sfName).repartition(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        println(f"""{"query":"$name","dumped_s":${(System.nanoTime() - t0) / 1e9}%.1f,"alt":$alt}""")
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[sf100dump] $name failed: ${e.getMessage}")
      }
      // shuffle files persist until driver GC (the Sf100Probe ENOSPC
      // lesson): a whole-suite sweep accumulates every query's map
      // outputs in spark.local.dir unless the driver GCs between them
      System.gc()
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
