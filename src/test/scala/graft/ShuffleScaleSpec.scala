package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ShuffleScale

/** Data-proportional shuffle sizing (r14 verdict #2 closure; r15
  * verdict #1 + ADVICE hardening).
  *
  * The derivation contract: `ceil(inputBytes / 128 MiB)` clamped to
  * [session parallelism, 32768]. The r14 sf100 finding this encodes:
  * 48.2 GB of input at 32 partitions OOM'd a 48 GiB heap on Q72's
  * fact⋈fact join; the engine must pick the count from the data. The r15
  * hardening this pins: bytes are measured through the Hadoop FileSystem
  * API (so `hdfs:`/`s3a:` URIs measure correctly, not 0), the session
  * conf only ratchets UP (lazy DataFrames execute at action-time conf —
  * touching a small dir must not drag a pending large query down), and
  * missing-dir measurements are never cached.
  */
class ShuffleScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("derive: floor at small input, proportional at scale, capped") {
    // gate scale: a few MB of input never exceeds the session floor
    assert(ShuffleScale.derive(0L, 32) === 32)
    assert(ShuffleScale.derive(66L << 20, 32) === 32)
    // the measured r14 decade point: 48.2 GB → 360 partitions (≥ the 256
    // that already ran Q72's sf100 clean; each carries ≤128 MiB parquet)
    assert(ShuffleScale.derive(48_200_000_000L, 32) === 360)
    // exact boundary: one byte over a multiple adds a partition
    assert(ShuffleScale.derive(ShuffleScale.targetBytesPerPartition, 1) === 1)
    assert(ShuffleScale.derive(ShuffleScale.targetBytesPerPartition + 1, 1) === 2)
    // runaway input hits the sanity cap, never Int overflow
    assert(ShuffleScale.derive(Long.MaxValue / 2, 32) === ShuffleScale.maxPartitions)
    // the cap is a session conf, not a law: a 100 TB deployment raises it
    // (100 TB at 128 MiB/partition needs ~800k — the default cap would
    // silently coarsen tasks to ~3 GB)
    assert(ShuffleScale.derive(100L << 40, 32, cap = 1_000_000) === 819200)
    val before = spark.conf.getOption("spark.graft.maxShufflePartitions")
    try {
      spark.conf.set("spark.graft.maxShufflePartitions", "65536")
      assert(ShuffleScale.capFor(spark) === 65536)
    } finally before match {
      case Some(v) => spark.conf.set("spark.graft.maxShufflePartitions", v)
      case None    => spark.conf.unset("spark.graft.maxShufflePartitions")
    }
  }

  test("dirBytes goes through Hadoop FS: schemeful URIs and bare paths agree") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shufscale-fs")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("t.parquet"))
    val raf = new java.io.RandomAccessFile(sub.resolve("part-0.parquet").toFile, "rw")
    try raf.setLength(1L << 30) finally raf.close() // sparse 1 GiB
    // a schemeful URI — the java.nio walk this replaced measured 0 here
    // (Paths.get("file:/…") names a literal "./file:" dir), silently
    // pinning a cluster session at the floor (r15 verdict #1)
    assert(ShuffleScale.dirBytes(spark, s"file:$dir") === (1L << 30))
    // bare path resolves against fs.defaultFS, same as spark.read
    assert(ShuffleScale.dirBytes(spark, dir.toString) === (1L << 30))
  }

  test("missing dir measures 0 and is NOT cached; invalidate drops subtree") {
    val parent = java.nio.file.Files.createTempDirectory("graft-shufscale-miss")
    val dir = parent.resolve("later").toString
    assert(ShuffleScale.dirBytes(spark, dir) === 0L) // before materialization
    // materialize: a fresh call must see the bytes, not a cached zero
    val sub = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "t.parquet"))
    val raf = new java.io.RandomAccessFile(sub.resolve("p0").toFile, "rw")
    try raf.setLength(300L << 20) finally raf.close()
    assert(ShuffleScale.dirBytes(spark, dir) === (300L << 20))
    // positive sizes ARE cached (cache dirs are immutable once marker'd)…
    java.nio.file.Files.delete(sub.resolve("p0"))
    assert(ShuffleScale.dirBytes(spark, dir) === (300L << 20))
    // …until GenCache invalidates after regenerating/sweeping the tree
    ShuffleScale.invalidate(spark, parent.toString)
    assert(ShuffleScale.dirBytes(spark, dir) === 0L)
  }

  test("cache keys are FS-qualified: invalidating the bare path clears a file:-cached alias") {
    // r16 ADVICE: the cache was keyed on the raw string, so the SAME dir
    // measured as "file:/x" and invalidated as "/x" kept a stale positive
    // byte count alive — under-partitioning the next query over it.
    val parent = java.nio.file.Files.createTempDirectory("graft-shufscale-alias")
    val dir = parent.resolve("d")
    val sub = java.nio.file.Files.createDirectories(dir.resolve("t.parquet"))
    def sparse(name: String, bytes: Long): Unit = {
      val raf = new java.io.RandomAccessFile(sub.resolve(name).toFile, "rw")
      try raf.setLength(bytes) finally raf.close()
    }
    sparse("p0", 100L << 20)
    // measure (and cache) under the SCHEMEFUL spelling
    assert(ShuffleScale.dirBytes(spark, s"file:$dir") === (100L << 20))
    // the dir grows, then GenCache-style invalidation uses the BARE spelling
    sparse("p1", 100L << 20)
    ShuffleScale.invalidate(spark, dir.toString)
    // BOTH spellings must see the new size — no stale alias survives
    assert(ShuffleScale.dirBytes(spark, dir.toString) === (200L << 20))
    assert(ShuffleScale.dirBytes(spark, s"file:$dir") === (200L << 20))
  }

  test("maxShufflePartitions is a live session knob: 10 TB derives past the default cap when raised") {
    val tenTB = 10L << 40 // ceil(10 TB / 128 MiB) = 81920 — past the 32768 default
    assert(ShuffleScale.derive(tenTB, 32) === ShuffleScale.maxPartitions)
    assert(ShuffleScale.derive(tenTB, 32, cap = 131072) === 81920)
    // end-to-end through tuneFor: a sparse 10 TB dir (no disk cost) first
    // clamps at the default cap, then a session that raises the conf —
    // the documented 100 TB deployment move — gets the proportional count
    val dir = java.nio.file.Files.createTempDirectory("graft-shufscale-cap")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("t.parquet"))
    val raf = new java.io.RandomAccessFile(sub.resolve("part-0.parquet").toFile, "rw")
    try raf.setLength(tenTB) finally raf.close()
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val beforeCap = spark.conf.getOption("spark.graft.maxShufflePartitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(ShuffleScale.tuneFor(spark, dir.toString) === ShuffleScale.maxPartitions)
      spark.conf.set("spark.graft.maxShufflePartitions", "131072")
      assert(ShuffleScale.tuneFor(spark, dir.toString) === 81920)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "81920")
    } finally {
      beforeCap match {
        case Some(v) => spark.conf.set("spark.graft.maxShufflePartitions", v)
        case None    => spark.conf.unset("spark.graft.maxShufflePartitions")
      }
      spark.conf.set("spark.sql.shuffle.partitions", before)
    }
  }

  test("tuneFor ratchets up, never down; fixedShuffle pins") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shufscale")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("t.parquet"))
    val raf = new java.io.RandomAccessFile(sub.resolve("part-0.parquet").toFile, "rw")
    try raf.setLength(1L << 30) finally raf.close() // 1 GiB → ceil(1024/128) = 8

    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val n = ShuffleScale.tuneFor(spark, dir.toString)
      assert(n === 8) // > the 4-core test floor, so the conf must move
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "8")

      // RATCHET: a later touch of a small/empty dir leaves the raised
      // count in place — a lazily-built query over the big dir executes
      // at action-time conf, so lowering here would run it under-
      // partitioned (the r15 ADVICE last-dir-wins OOM path)
      val tiny = java.nio.file.Files.createTempDirectory("graft-shufscale-tiny")
      assert(ShuffleScale.tuneFor(spark, tiny.toString) === 8)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "8")

      // a user-raised count is respected (ratchet works both ways up)
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      assert(ShuffleScale.tuneFor(spark, dir.toString) === 16)

      // pinned session: the derivation stands down (A/B + CLI escape hatch)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.graft.fixedShuffle", "true")
      assert(ShuffleScale.tuneFor(spark, dir.toString) === 4)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
    } finally {
      spark.conf.unset("spark.graft.fixedShuffle")
      spark.conf.set("spark.sql.shuffle.partitions", before)
    }
  }

  test("gate-scale ensure keeps the session at its floor (byte-identical gate)") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.sparkContext.defaultParallelism.toString)
    graft.ops.Tpcds.ensure(spark, TestSpark.sf0001)
    // sf0.001 materialization is ~1 MB: derived = floor = defaultParallelism
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ===
      spark.sparkContext.defaultParallelism)
    spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("fixture reads tune too, and stay at the floor at gate scale") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.sparkContext.defaultParallelism.toString)
    graft.Tables(spark, TestSpark.sf0001, "orders")
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ===
      spark.sparkContext.defaultParallelism)
    spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
