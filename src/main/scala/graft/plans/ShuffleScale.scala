package graft.plans

import org.apache.spark.sql.SparkSession

/** Data-proportional shuffle sizing — the engine derives shuffle
  * partition count from measured input bytes instead of inheriting a
  * fixed session default (r14 verdict #2).
  *
  * Why: a FIXED partition count is a latent OOM one decade up. The r14
  * sf100 probe measured it exactly: at shuffle.partitions = 32, 1/32nd of
  * Q72's catalog_sales⋈inventory build side no longer fit one task's
  * execution memory and a 48 GiB heap died (SparkOutOfMemoryError); the
  * same query at 256 partitions spilled 165 GB gracefully with zero task
  * retries (SCALE.md §5). The deployment contract is partitions ∝ data —
  * so the engine computes the count where it first learns the data size.
  *
  * How: [[tuneFor]] runs right after a scale-dependent materialization
  * resolves its table directory ([[graft.ops.Tpcds.ensure]] /
  * [[graft.ops.TpchFull.ensure]] — the single chokepoint every generated-
  * scale query passes through). It measures the directory's on-disk bytes
  * (cached; cache dirs are immutable once marker'd) and sets
  * `spark.sql.shuffle.partitions` to `ceil(bytes / 128 MiB)`, floored at
  * the session's core parallelism and capped at [[maxPartitions]]. AQE
  * (on by default in Spark 4) then coalesces DOWN per-stage to its
  * advisory size — so a scale-safe ceiling costs small queries nothing,
  * while the reverse (a small default exploding UP) is impossible for AQE
  * and fatal at scale. At the sf0.01 correctness gate and the sf0.1 bench
  * the derived value equals the session floor, so gate behavior is
  * byte-identical to the pre-derivation engine.
  *
  * 128 MiB of COMPRESSED parquet input per partition keeps the per-task
  * uncompressed working set in the hundreds of MB — under the ≈150 MiB
  * execution-memory-per-task boundary SCALE.md §1 measured only via
  * spill, never via failure, and ~3× finer than the 256 that already ran
  * Q72's sf100 decade clean.
  *
  * Escape hatch: a session that must PIN its shuffle count for an A/B
  * (SpillBench heap ladders, the probe's SPARK_GRAFT_SHUFFLE override)
  * sets `spark.graft.fixedShuffle=true` and tuneFor leaves the session
  * untouched.
  */
object ShuffleScale {
  /** Compressed input bytes one shuffle partition should carry. */
  val targetBytesPerPartition: Long = 128L << 20

  /** Sanity ceiling (≈4 TB of compressed input before tasks coarsen;
    * a real 100 TB cluster raises it with executor count). */
  val maxPartitions: Int = 32768

  /** Pure derivation: `clamp(ceil(bytes / 128 MiB), floor, cap)`. */
  def derive(inputBytes: Long, floor: Int): Int = {
    val need = math.ceil(inputBytes.toDouble / targetBytesPerPartition)
    math.min(math.max(need, floor.toDouble), maxPartitions.toDouble).toInt
  }

  private val bytesCache = new scala.collection.concurrent.TrieMap[String, Long]

  /** Recursive on-disk size of a materialized dir (POSIX path — the same
    * constraint GenCache already carries). 0 for a missing path. */
  def dirBytes(path: String): Long = bytesCache.getOrElseUpdate(path, {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  })

  /** Set the session's shuffle partitions from `dir`'s measured bytes;
    * returns the count in force. No-op under `spark.graft.fixedShuffle`. */
  def tuneFor(spark: SparkSession, dir: String): Int =
    if (spark.conf.get("spark.graft.fixedShuffle", "false") == "true")
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    else {
      val n = derive(dirBytes(dir), spark.sparkContext.defaultParallelism)
      if (spark.conf.get("spark.sql.shuffle.partitions") != n.toString)
        spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      n
    }
}
