package graft.convert

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — an EXTENSION beyond the reference's csv|parquet
  * surface (/root/reference/src/lib.rs:184-212 rejects everything else):
  * JSONL (one JSON object per line) is the de-facto interchange format for
  * LLM training corpora, so a training-data engine needs it as a first-class
  * edge format even though the benchmark tooling doesn't.
  *
  * Same design rules as [[Convert]]:
  *  - schema-APPLIED reads, never inferred (inference is a full extra pass
  *    over 100 TB and can mistype sparse columns);
  *  - fail-fast writes (SaveMode.ErrorIfExists);
  *  - explicit codec whitelist. JSONL's whitelist differs from parquet's
  *    deliberately: text-line formats use stream codecs (gzip is the
  *    ecosystem standard for .jsonl.gz corpora; lzo isn't wired for text
  *    sources in Spark), and an unsplittable-codec caveat is part of the
  *    contract — a 100 GB .jsonl.gz file is ONE task, so large exports
  *    should write many part files (control via repartition upstream).
  */
object Jsonl {

  /** Codec whitelist for text-line output. `gzip` is allowed here (unlike
    * the parquet whitelist) because .jsonl.gz is the corpus-exchange
    * standard; note gzip parts are not splittable — size parts accordingly. */
  def validateCodec(codec: String): String = codec.toLowerCase match {
    case "none" | "uncompressed" => "none"
    case "gzip"   => "gzip"
    case "lz4"    => "lz4"
    case "snappy" => "snappy"
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported JSONL codec: $other (supported: none, gzip, lz4, snappy)")
  }

  /** Schema-applied JSONL scan. Rows failing the schema surface in the
    * `_corrupt_record`-free PERMISSIVE default as nulls; pass
    * `mode=FAILFAST` to abort on malformed input instead. */
  def read(spark: SparkSession, path: String, schema: StructType,
           mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)

  /** Write one JSON object per row to `path/part-*.json[.codec]`. */
  def write(df: DataFrame, path: String, codec: String = "none"): Unit =
    df.write.mode(SaveMode.ErrorIfExists)
      .option("compression", validateCodec(codec))
      .json(path)
}
