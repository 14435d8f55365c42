package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle hashing — the text-side counterpart of VectorDot.
  *
  * Every shingle-based operator (n-gram Jaccard, MinHash, decontamination,
  * repetition ratio) starts from the same HOF chain:
  * `transform(sequence(...), i -> concat_ws(' ', slice(toks, i, k)))` →
  * `array_distinct` → `transform(sh, t -> xxhash64(t))`. Each step evaluates
  * an interpreted lambda per shingle position — for a 300-token document
  * that is ~900 interpreted expression evals plus two intermediate string
  * arrays per row, and profiling shows it dominating the row-local cost of
  * the dedup family (q_text_repetition: 1.3 s vs 0.26 s for a comparable
  * non-shingle scan at sf0.1). This expression produces the IDENTICAL result
  * in one tight JVM loop: tokenize on single spaces, hash each k-token
  * shingle with xxhash64 seed 42 (Spark's xxhash64 seed, over the same
  * UTF-8 bytes — so values are bit-equal to the HOF form, asserted in
  * FunctionsSpec), dedup via a hash set preserving first-occurrence order
  * (array_distinct's order).
  *
  * Contract match with TextOps.shingleExpr(k): texts with fewer than k
  * tokens yield the single hash of the whole text.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${other.simpleString}")
  }

  private def hashOf(str: String): Long = {
    val b = str.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }

  def compute(s: UTF8String): Any = {
    val text = s.toString
    // String.split(" ", -1) matches Spark's split(text, ' ') exactly
    // (trailing empties kept; the pattern has no regex metacharacters)
    val toks = text.split(" ", -1)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array(hashOf(text)))
    val seen = new java.util.HashSet[java.lang.Long](math.min(n, 1024))
    val out = new Array[Long](n - k + 1)
    var m = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = hashOf(sb.toString)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Column-API surface for the native text expressions. */
object txt {
  /** Distinct k-token shingle hashes of `text` (xxhash64, seed 42) — the
    * array the dedup family joins/aggregates on. Bit-equal to
    * `transform(array_distinct(shingles), t -> xxhash64(t))`. */
  def shingle_hashes(text: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(text), k))
}
