package graft.gen

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types._

/** Per-order lineitem derivation for TpchGen.orders as ONE native
  * expression: struct(total_cents, n_open, n_lines) from the order's range
  * id, folding the ≤7 lines in a tight JVM loop.
  *
  * Why not plain Catalyst expressions: the unrolled 7-line × (charge +
  * status) column trees compile into a single whole-stage-codegen method of
  * ~14 KB bytecode — past HotSpot's 8 KB DontCompileHugeMethods limit — so
  * the hot projection ran INTERPRETED and orders generation was 5.4x slower
  * than round 2. This expression is one small call site in the generated
  * code; the loop body below JITs like any Scala method.
  *
  * Bit-exact contract with TpchGen's lineitem columns (GenSpec asserts both
  * derivations): hashes replicate Catalyst's xxhash64(expr, tag) chain
  * (seed 42, children left-to-right), field slices replicate
  * pmod(shiftrightunsigned(H, k), m), and the charge fold replicates
  * qty * retail_cents * (100+tax%) * (100-disc%) in micro-dollars with
  * HALF_UP cents rounding.
  */
case class TpchOrderDerived(child: Expression, nParts: Long)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("total_cents", LongType, nullable = false),
    StructField("n_open", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "tpch_order_derived"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected bigint range id, got ${other.simpleString}")
  }

  /** xxhash64(v: long, tag: int) exactly as Catalyst evaluates the 2-child
    * expression: seed 42, then each child folds left-to-right. */
  private def hashTag(v: Long, tag: Int): Long = {
    val h1 = XxHash64Function.hash(v, LongType, 42L)
    XxHash64Function.hash(tag, IntegerType, h1)
  }

  private val epoch19920101 = java.time.LocalDate.of(1992, 1, 1).toEpochDay
  private val cutoffDay = java.time.LocalDate.of(1995, 6, 17).toEpochDay

  def compute(id: Long): InternalRow = {
    val okey = id + 1
    val nl = (java.lang.Math.floorMod(hashTag(id, 157), 7L) + 1L).toInt
    val odateDay = epoch19920101 + java.lang.Math.floorMod(hashTag(id, 137), 2406L)
    var micro = 0L
    var nOpen = 0
    var i = 1
    while (i <= nl) {
      val hh = hashTag(okey * 8 + i, 163)
      val qty = java.lang.Math.floorMod(hh >>> 8, 50L) + 1L
      val pk = java.lang.Math.floorMod(hh, nParts) + 1L
      val rc = 90000L + pk % 20001L + pk % 1000L * 100L
      val tax = java.lang.Math.floorMod(hh >>> 14, 9L)
      val disc = java.lang.Math.floorMod(hh >>> 18, 11L)
      micro += qty * rc * (100L + tax) * (100L - disc)
      val shipDay = odateDay + java.lang.Math.floorMod(hh >>> 25, 121L) + 1L
      if (shipDay > cutoffDay) nOpen += 1
      i += 1
    }
    InternalRow((micro + 5000L) / 10000L, nOpen, nl)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ordDrv", this, classOf[TpchOrderDerived].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TpchOrderDerived =
    copy(child = newChild)
}

object TpchOrderDerived {
  def column(id: Column, nParts: Long): Column =
    GraftColumnBridge.column(TpchOrderDerived(
      GraftColumnBridge.expression(id), nParts))
}
