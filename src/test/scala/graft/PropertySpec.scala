package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.types._
import graft.functions.{LshSignature, VectorDot}
import graft.ops.{Dedup, Scale}

/** ScalaCheck properties (SURVEY §5.3). Pure-JVM expression properties run
  * the full 100 cases; Spark-job-backed properties run a handful (each case
  * is a distributed job). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(prop: Prop, cases: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private val floatVec: Gen[Array[Float]] =
    Gen.chooseNum(1, 128).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10f, 10f)).map(_.toArray))

  test("VectorDot.compute equals the plain left-to-right fold, bit-exact") {
    check(Prop.forAll(floatVec) { v =>
      val e = VectorDot(
        BoundReference(0, ArrayType(FloatType), nullable = false),
        BoundReference(0, ArrayType(FloatType), nullable = false))
      val got = e.compute(new GenericArrayData(v), new GenericArrayData(v))
      val want = v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      got == want
    })
  }

  test("ShingleHashes/SimHash64 equal their HOF/aggregate forms on random text") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // random strings over a space-heavy alphabet (runs of spaces, unicode,
    // punctuation) — the token-boundary edge cases a fixture can't cover
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      1 -> Gen.oneOf('é', 'ß', '中', '!', '.', '-'))
    val strGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, charGen).map(_.mkString))
    val strs = Gen.listOfN(300, strGen).sample.getOrElse(Nil)
    assert(strs.nonEmpty)
    val df = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").cache()
    val badShingle = df
      .select(graft.ops.TextOps.shingleExpr(3).as("sh"),
        graft.functions.txt.shingle_hashes(col("text"), 3).as("nat"))
      .select(expr("transform(sh, t -> xxhash64(t))").as("hof"), col("nat"))
      .filter(not(col("hof") === col("nat")))
    assert(badShingle.count() == 0, "ShingleHashes diverged on random text")
    val badSim = Dedup.simhash(df)
      .join(Dedup.simhashAgg(df).withColumnRenamed("simhash", "agg"), "doc_id")
      .filter(col("simhash") =!= col("agg"))
    assert(badSim.count() == 0, "SimHash64 diverged on random text")
    df.unpersist()
  }

  test("LshSignature: shape, range, determinism, equal-input equality") {
    check(Prop.forAll(floatVec, Gen.chooseNum(1, 8), Gen.chooseNum(1, 16)) {
      (v, bands, bits) =>
        val e = LshSignature(Literal.create(v, ArrayType(FloatType)), bands, bits)
        val a = e.compute(new GenericArrayData(v))
          .asInstanceOf[GenericArrayData].toLongArray()
        val b = e.compute(new GenericArrayData(v.clone()))
          .asInstanceOf[GenericArrayData].toLongArray()
        a.length == bands &&
          a.forall(s => s >= 0 && s < (1L << bits)) &&
          a.sameElements(b)
    })
  }

  private val edgeList: Gen[List[(Long, Long)]] =
    Gen.listOfN(20, for {
      a <- Gen.chooseNum(0L, 14L)
      b <- Gen.chooseNum(0L, 14L) if a != b
    } yield (math.min(a, b), math.max(a, b))).map(_.distinct)

  /** Driver-side union-find as the in-test oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents matches union-find on arbitrary edge lists") {
    import spark.implicits._
    check(Prop.forAll(edgeList.suchThat(_.nonEmpty)) { edges =>
      val df = edges.toDF("a_id", "b_id")
      val got = Dedup.connectedComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(edges)
    }, cases = 8)
  }

  test("saltedJoin equals the plain join for arbitrary salt factors") {
    import spark.implicits._
    val data: Gen[(List[(Long, Int)], Int)] = for {
      rows <- Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0, 99)))
      salt <- Gen.chooseNum(1, 16)
    } yield (rows, salt)
    check(Prop.forAll(data) { case (rows, salt) =>
      val big = rows.toDF("k", "v")
      val dim = (0L to 5L).map(k => (k, s"name$k")).toDF("k", "name")
      val plain = big.join(dim, "k")
      val salted = Scale.saltedJoin(big, dim, "k", salt)
      salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0
    }, cases = 5)
  }

  test("integral micro-ratio equals BigDecimal HALF_UP to 2 decimals (Q78/Q2 output idiom)") {
    // floor((a*200 + b) / (2b)) / 100 must be EXACTLY round-half-up(a/b, 2)
    // for positive longs — the engine-independent ROUND the TPC-DS outputs
    // emit. Pure arithmetic, no Spark job.
    val ab: Gen[(Long, Long)] =
      Gen.zip(Gen.chooseNum(0L, 2000000000L), Gen.chooseNum(1L, 2000000000L))
    check(Prop.forAll(ab) { case (a, b) =>
      val micro = (a * 200 + b) / (2 * b)
      val expect = (BigDecimal(a) / BigDecimal(b))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      BigDecimal(micro, 2) == expect
    })
  }
}
