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
  *
  * `--per-jvm` (r17 verdict #7 — the three sweep traps, automated): the
  * main becomes an ORCHESTRATOR that spawns one fresh child JVM per
  * query. Each child gets a PINNED `spark.local.dir` under the dump dir
  * (via `--local-dir=`), which the orchestrator deletes after the child
  * exits — so (a) no cross-query shuffle-scratch accumulation (the r17
  * 18 GB single-JVM ENOSPC), and (b) a crashed child's blockmgr scratch
  * is reclaimed deterministically without ever touching another live
  * JVM's /tmp/blockmgr-*. Trap (c), oracle_sql.json overwrite, is closed
  * for EVERY mode below: the slice is rebuilt from all dump dirs present
  * in outDir, so top-up runs merge instead of clobbering.
  */
object Sf100Dump {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    require(pos.length >= 3, "usage: Sf100Dump <probeRoot> <outDir> [--per-jvm] [--alt-partitioning] [--sf=sfN] <query...>")
    val alt = flags.contains("--alt-partitioning")
    val sfName = flags.collectFirst { case f if f.startsWith("--sf=") =>
      f.stripPrefix("--sf=") }.getOrElse("sf100")
    val (probeRoot, outDir, names) = (pos(0), pos(1), pos.drop(2).toSeq)
    if (flags.contains("--per-jvm")) { orchestrate(probeRoot, outDir, alt, sfName, names); return }
    val localDir = flags.collectFirst { case f if f.startsWith("--local-dir=") =>
      f.stripPrefix("--local-dir=") }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = graft.plans.SessionDefaults.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.cacheRoot", probeRoot)
    localDir.foreach(d => b.config("spark.local.dir", d))
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
    writeOracleSlice(outDir, names)
    spark.stop()
  }

  /** (Re)write `outDir/oracle_sql.json` covering EVERY dump dir present in
    * outDir plus `names` — not just this run's names. The slice is fully
    * derivable from SparkEntry.oracleSql, so rebuilding from the dir
    * listing makes top-up runs (heavies re-dumped one-per-JVM after a
    * sweep) MERGE instead of clobbering the earlier queries' oracle SQL
    * (r17 trap #2). */
  private def writeOracleSlice(outDir: String, names: Seq[String]): Unit = {
    def esc(s: String) = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val present = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.isDirectory).map(_.getName).toSeq
    val json = (present ++ names).distinct.sorted
      .flatMap(n => graft.SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (n, sql) => s""""${esc(n)}": "${esc(sql)}"""" }
      .mkString("{", ", ", "}")
    Files.write(Paths.get(outDir, "oracle_sql.json"), json.getBytes("UTF-8"))
  }

  /** One fresh child JVM per query, each with a pinned-and-swept
    * spark.local.dir (r17 traps #1/#3). Child failures are recorded and
    * the sweep continues — a missing dump shows up as `no-dump` in
    * sf100_check.py, never as a silently absent row. */
  private def orchestrate(probeRoot: String, outDir: String, alt: Boolean,
                          sfName: String, names: Seq[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    new java.io.File(outDir).mkdirs()
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList.sliding(2).collect {
        case List(flag, v) if flag == "--add-opens" || flag == "--add-exports" =>
          List(flag, v)
      }.flatten.toList
    val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")
    var failed = List.empty[String]
    names.foreach { name =>
      val local = Paths.get(outDir, s".local-$name")
      val childOut = Files.createTempFile(s"graft_dump_$name", ".out").toFile
      val p = new ProcessBuilder(
        (List(javaBin) ++ jvmArgs ++ List(s"-Xmx$mem",
          "-Dspark.ui.enabled=false",
          "-cp", System.getProperty("java.class.path"),
          "graft.tools.Sf100Dump", probeRoot, outDir,
          s"--sf=$sfName", s"--local-dir=$local") ++
          (if (alt) List("--alt-partitioning") else Nil) ++ List(name)).asJava)
        .redirectErrorStream(true)
        .redirectOutput(childOut)
        .start()
      val done = p.waitFor(3600, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) p.destroyForcibly()
      val log = new String(Files.readAllBytes(childOut.toPath))
      log.linesIterator.filter(l => l.startsWith("{\"query\"")).foreach(println)
      if (!done || p.exitValue() != 0 || !log.contains("\"dumped_s\"")) {
        failed ::= name
        System.err.println(s"[sf100dump] $name child " +
          (if (!done) "timed out" else s"exited ${p.exitValue()}") +
          s":\n${log.takeRight(1500)}")
      }
      // the child is provably dead here — its pinned scratch (blockmgr-*,
      // spark-*) is reclaimable no matter how it exited
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(local.toFile)
    }
    writeOracleSlice(outDir, names)
    println(s"""{"per_jvm_sweep":${names.length},"failed":${failed.length}}""")
    if (failed.nonEmpty) {
      System.err.println(s"[sf100dump] failed: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
  }
}
