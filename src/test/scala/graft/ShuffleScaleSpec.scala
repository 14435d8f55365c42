package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ShuffleScale

/** Data-proportional shuffle sizing (r14 verdict #2 closure).
  *
  * The derivation contract: `ceil(inputBytes / 128 MiB)` clamped to
  * [session parallelism, 32768]. The r14 sf100 finding this encodes:
  * 48.2 GB of input at 32 partitions OOM'd a 48 GiB heap on Q72's
  * fact⋈fact join; the engine must pick the count from the data.
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
  }

  test("dirBytes measures recursively; tuneFor sets the session conf") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shufscale")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("t.parquet"))
    // sparse file: logical size without disk cost — dirBytes reads size()
    val raf = new java.io.RandomAccessFile(sub.resolve("part-0.parquet").toFile, "rw")
    try raf.setLength(1L << 30) finally raf.close() // 1 GiB → ceil(1024/128) = 8
    assert(ShuffleScale.dirBytes(dir.toString) === (1L << 30))

    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val n = ShuffleScale.tuneFor(spark, dir.toString)
      assert(n === 8) // > the 4-core test floor, so the conf must move
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "8")

      // pinned session: the derivation stands down (A/B escape hatch)
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
    graft.ops.Tpcds.ensure(spark, TestSpark.sf0001)
    // sf0.001 materialization is ~1 MB: derived = floor = defaultParallelism
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ===
      spark.sparkContext.defaultParallelism)
    spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("fixture reads tune too, and stay at the floor at gate scale") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    graft.Tables(spark, TestSpark.sf0001, "orders")
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ===
      spark.sparkContext.defaultParallelism)
    spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
