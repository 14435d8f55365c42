package graft.gen

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** dbgen-shaped comment text as ONE native expression: a 1–2 sentence
  * string following the TPC-H comment grammar SHAPE (noun phrase, verb
  * phrase, prepositional phrase) over dbgen-flavored part-of-speech lists
  * (public TPC-H sample-output vocabulary). Exact RNG streams / byte parity
  * with dbgen remain a documented non-goal.
  *
  * Why native: the equivalent Column tree (16 element_at picks over literal
  * arrays + conditional second sentence) pushed whole-table codegen methods
  * past HotSpot's 8 KB JIT limit (lineitem 9.5 KB → interpreted → 6x
  * slower). Here the generated code is one call; the word picks run in a
  * JIT'd method. Deterministic and partition-count-invariant: pure function
  * of (range id, tag). */
case class CommentText(child: Expression, tag: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "comment_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected bigint range id, got ${other.simpleString}")
  }

  private def hashTag(v: Long, t: Int): Long = {
    val h1 = XxHash64Function.hash(v, LongType, 42L)
    XxHash64Function.hash(t, IntegerType, h1)
  }

  import CommentText._

  private def pick(h: Long, shift: Int, ws: Array[String]): String =
    ws(java.lang.Math.floorMod(h >>> shift, ws.length.toLong).toInt)

  private def sentenceOf(h: Long): String =
    pick(h, 0, advs) + " " + pick(h, 8, adjs) + " " + pick(h, 16, nouns) +
      " " + pick(h, 24, verbs) + " " + pick(h, 32, preps) + " the " +
      pick(h, 40, adjs) + " " + pick(h, 48, nouns)

  def compute(id: Long): UTF8String = {
    val h1 = hashTag(id, tag)
    val s =
      if (java.lang.Math.floorMod(h1 >>> 56, 2L) == 0L) sentenceOf(h1)
      else sentenceOf(h1) + ". " + sentenceOf(hashTag(id, tag * 31 + 7))
    UTF8String.fromString(s)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmt", this, classOf[CommentText].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CommentText =
    copy(child = newChild)
}

object CommentText {
  private[gen] val advs = Array("blithely", "carefully", "quickly", "slyly",
    "furiously", "daringly", "fluffily", "ruthlessly")
  private[gen] val adjs = Array("ironic", "final", "express", "regular",
    "special", "pending", "even", "silent", "bold", "unusual", "busy", "close")
  private[gen] val nouns = Array("deposits", "requests", "accounts",
    "packages", "theodolites", "instructions", "platelets", "foxes", "ideas",
    "dependencies", "pinto beans", "excuses", "asymptotes", "courts")
  private[gen] val verbs = Array("sleep", "haggle", "nag", "wake", "cajole",
    "detect", "integrate", "boost", "affix", "doze", "engage", "mold")
  private[gen] val preps = Array("about", "above", "across", "against",
    "along", "among", "around", "behind")

  def column(id: Column, tag: Int): Column =
    GraftColumnBridge.column(CommentText(GraftColumnBridge.expression(id), tag))
}
