package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loader (TESTDATA.md / FIXTURES.md).
  *
  * `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark's parquet
  * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it via the
  * `nanosAsLong` escape hatch (ns since epoch as LongType) and floor-divide
  * to microseconds. This is exactly DuckDB's `CAST(ts_ns AS TIMESTAMP)`
  * truncation, so oracle comparisons on event timestamps line up bit-for-bit.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
