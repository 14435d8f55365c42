package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.schema.{Benchmark, TpchSchemas, TpcdsSchemas}

/** Schema-registry units (SURVEY §5.1): every table resolves, unknown names
  * throw — mirroring the reference panics at src/tpch.rs:239 and
  * src/tpcds.rs:634. */
class SchemaSpec extends AnyFunSuite {

  test("all 8 TPC-H tables resolve with the raw-file ignore column last") {
    assert(TpchSchemas.tableNames.size == 8)
    TpchSchemas.tableNames.foreach { t =>
      val st = TpchSchemas(t)
      assert(st.fields.nonEmpty, t)
      assert(st.fields.last.name == "ignore",
        s"$t must end with dbgen's trailing-delimiter column (SURVEY §1.2)")
      assert(st.fields.last.nullable)
    }
  }

  test("all 24 TPC-DS tables resolve with at least one non-null key column") {
    assert(TpcdsSchemas.tableNames.size == 24)
    TpcdsSchemas.tableNames.foreach { t =>
      val st = TpcdsSchemas(t)
      assert(st.fields.nonEmpty, t)
      // the reference marks primary/surrogate keys non-null and everything
      // else nullable; fact tables lead with a NULLABLE date FK
      // (src/tpcds.rs:609) so the invariant is existence, not position
      assert(st.fields.exists(f => !f.nullable && f.name.endsWith("_sk")),
        s"$t must declare a non-null surrogate key")
      assert(!st.fields.exists(_.name == "ignore"),
        s"$t: TPC-DS schemas carry no ignore column (SURVEY §1.2)")
    }
  }

  test("unknown table names throw") {
    assertThrows[IllegalArgumentException](TpchSchemas("nope"))
    assertThrows[IllegalArgumentException](TpcdsSchemas("nope"))
  }

  test("benchmark resolution incl. reference CLI aliases (src/main.rs:113-119)") {
    assert(Benchmark("tpch").name == "tpch")
    assert(Benchmark("tpc-h").name == "tpch")
    assert(Benchmark("TPC-H").name == "tpch")
    assert(Benchmark("tpcds").name == "tpcds")
    assert(Benchmark("tpc-ds").name == "tpcds")
    assertThrows[IllegalArgumentException](Benchmark("tpcx"))
  }
}
