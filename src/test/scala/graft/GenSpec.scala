package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gen.{TpchGen, TpcdsGen}

/** Generator properties (SURVEY §5.3): partition-count invariance mirrors
  * dbgen's -C/-S chunking contract (src/tpch.rs:69-72) — same (table, sf)
  * content for ANY partition count; TPC-DS tables match their declared
  * schemas and scaled row counts. */
class GenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("TPC-H generation is partition-count invariant") {
    Seq("supplier", "orders", "lineitem").foreach { t =>
      val p1 = TpchGen.table(spark, t, 0.001, 1)
      val p7 = TpchGen.table(spark, t, 0.001, 7)
      val p32 = TpchGen.table(spark, t, 0.001, 32)
      assert(p1.exceptAll(p7).count() == 0 && p7.exceptAll(p1).count() == 0,
        s"$t differs between 1 and 7 partitions")
      assert(p1.exceptAll(p32).count() == 0 && p32.exceptAll(p1).count() == 0,
        s"$t differs between 1 and 32 partitions")
    }
  }

  test("TPC-H generated tables match the registry schema (minus ignore)") {
    TpchGen.tableNames.foreach { t =>
      val expected = TpchGen.schema(t).fields.filterNot(_.name == "ignore")
        .map(f => (f.name, f.dataType)).toSeq
      val actual = TpchGen.table(spark, t, 0.001, 2).schema.fields
        .map(f => (f.name, f.dataType)).toSeq
      assert(actual == expected, s"$t schema mismatch")
    }
  }

  test("TPC-H FK domains are valid at sf0.001") {
    import org.apache.spark.sql.functions._
    val sf = 0.001
    val li = TpchGen.table(spark, "lineitem", sf, 2)
    val nOrders = TpchGen.table(spark, "orders", sf, 2).count()
    val nParts = TpchGen.table(spark, "part", sf, 2).count()
    val bad = li.filter(col("l_orderkey") < 1 || col("l_orderkey") > nOrders ||
      col("l_partkey") < 1 || col("l_partkey") > nParts).count()
    assert(bad == 0)
    assert(li.groupBy("l_orderkey", "l_linenumber").count()
      .filter(col("count") > 1).count() == 0, "duplicate line numbers")
  }

  test("all 24 TPC-DS tables generate with exact schema and scaled row count") {
    TpcdsGen.tableNames.foreach { t =>
      val df = TpcdsGen.table(spark, t, 0.001, 2)
      val expected = TpcdsGen.schema(t).fields.map(f => (f.name, f.dataType)).toSeq
      val actual = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      assert(actual == expected, s"$t schema mismatch")
      assert(df.count() == TpcdsGen.rowCount(t, 0.001), s"$t row count")
    }
  }

  test("TPC-DS generation is partition-count invariant") {
    Seq("item", "store_sales").foreach { t =>
      val p1 = TpcdsGen.table(spark, t, 0.001, 1)
      val p9 = TpcdsGen.table(spark, t, 0.001, 9)
      assert(p1.exceptAll(p9).count() == 0 && p9.exceptAll(p1).count() == 0, t)
    }
  }

  test("fixed-cardinality TPC-DS dims ignore scale factor") {
    Seq("date_dim", "time_dim", "income_band", "ship_mode").foreach { t =>
      assert(TpcdsGen.rowCount(t, 0.001) == TpcdsGen.rowCount(t, 100.0), t)
    }
  }
}
