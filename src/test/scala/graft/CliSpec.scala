package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cli.Main
import graft.cli.Main.{ConvertCmd, Export, Generate, ListQueries, Query}

/** CLI arg parsing (R10, SURVEY §5.1): subcommands, short/long flags,
  * benchmark aliases, validation errors — mirroring src/main.rs:22-119. */
class CliSpec extends AnyFunSuite {

  test("generate: long flags") {
    val c = Main.parse(Seq("generate", "--benchmark", "tpch", "--scale", "1",
      "--partitions", "8", "--output", "/tmp/x"))
    assert(c == Generate("tpch", 1.0, 8, "/tmp/x", "raw", "snappy"))
  }

  test("generate: short flags and parquet fast path") {
    val c = Main.parse(Seq("generate", "-b", "tpc-ds", "-s", "0.01", "-p", "4",
      "-o", "/tmp/y", "-f", "parquet", "-c", "lz4"))
    assert(c == Generate("tpc-ds", 0.01, 4, "/tmp/y", "parquet", "lz4"))
  }

  test("convert: both benchmarks with aliases resolve") {
    Seq("tpch", "tpc-h", "tpcds", "tpc-ds").foreach { b =>
      val c = Main.parse(Seq("convert", "-b", b, "-i", "/in", "-o", "/out"))
      assert(c == ConvertCmd(b, "/in", "/out", "snappy"))
    }
  }

  test("invalid invocations throw") {
    assertThrows[IllegalArgumentException](Main.parse(Seq.empty))
    assertThrows[IllegalArgumentException](Main.parse(Seq("frobnicate")))
    assertThrows[IllegalArgumentException](Main.parse(Seq("generate", "-b", "tpcx",
      "-s", "1", "-o", "/tmp/x")))
    assertThrows[IllegalArgumentException](Main.parse(Seq("generate", "-b", "tpch")))
    assertThrows[IllegalArgumentException](Main.parse(Seq("convert", "-b", "tpch",
      "-i", "/in")))
    assertThrows[IllegalArgumentException](Main.parse(Seq("generate", "--wat", "x",
      "-b", "tpch", "-s", "1", "-o", "/tmp/x")))
  }

  test("query: name validation, defaults, --list") {
    val c = Main.parse(Seq("query", "-q", "q_agg_pricing", "-i", "/data/sf1"))
    assert(c == Query("q_agg_pricing", "/data/sf1", None, 20))
    val w = Main.parse(Seq("query", "--query", "q_topk", "--input", "/d",
      "--output", "/out", "--limit", "5"))
    assert(w == Query("q_topk", "/d", Some("/out"), 5))
    assert(Main.parse(Seq("query", "--list")) == ListQueries)
    assertThrows[IllegalArgumentException](
      Main.parse(Seq("query", "-q", "q_nope", "-i", "/d")))
    assertThrows[IllegalArgumentException](Main.parse(Seq("query", "-i", "/d")))
  }

  test("export: table or query (exactly one), codec validated at parse time") {
    val t = Main.parse(Seq("export", "-t", "documents", "-i", "/d", "-o", "/out"))
    assert(t == Export(Some("documents"), None, "/d", "/out", "none"))
    val q = Main.parse(Seq("export", "--query", "q_text_quality", "--input", "/d",
      "--output", "/out", "--codec", "gzip"))
    assert(q == Export(None, Some("q_text_quality"), "/d", "/out", "gzip"))
    // neither / both / unknown query / bad codec all fail at parse time
    assertThrows[IllegalArgumentException](
      Main.parse(Seq("export", "-i", "/d", "-o", "/out")))
    assertThrows[IllegalArgumentException](
      Main.parse(Seq("export", "-t", "x", "-q", "q_topk", "-i", "/d", "-o", "/o")))
    assertThrows[IllegalArgumentException](
      Main.parse(Seq("export", "-q", "q_nope", "-i", "/d", "-o", "/o")))
    assertThrows[IllegalArgumentException](
      Main.parse(Seq("export", "-t", "documents", "-i", "/d", "-o", "/o",
        "-c", "brotli")))
  }

  test("generator-path is accepted and ignored (Spark-native generation)") {
    val c = Main.parse(Seq("generate", "-b", "tpch", "-s", "1", "-o", "/tmp/x",
      "-g", "/opt/dbgen"))
    assert(c == Generate("tpch", 1.0, 1, "/tmp/x", "raw", "snappy"))
  }
}
