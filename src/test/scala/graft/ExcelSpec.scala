package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Excel

/** S1/S6 — dependency-free XLSX round trips, plus the full reference flow
  * workbook → pipeline → workbook.
  */
class ExcelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String) =
    s"/root/repo/target/tmp/${name}_${System.nanoTime()}.xlsx"

  test("colIndex / colRef round-trip") {
    assert(Excel.colIndex("A1") == 0 && Excel.colIndex("Z9") == 25 && Excel.colIndex("AA3") == 26)
    assert(Excel.colRef(0) == "A" && Excel.colRef(25) == "Z" && Excel.colRef(26) == "AA")
    (0 until 200).foreach(i => assert(Excel.colIndex(Excel.colRef(i) + "1") == i))
  }

  test("sheetName sanitizes and truncates to 31 chars (app.py:55)") {
    assert(Excel.sheetName("a/b*c?") == "a_b_c_")
    assert(Excel.sheetName("x" * 40).length == 31)
  }

  test("write → read round-trip preserves cells, nulls, sparse rows, escapes") {
    val rows: Seq[Seq[Any]] = Seq(
      Seq("Header A", "B & <C>", "D"),
      Seq("v1", null, "v3"),
      Seq(null, "only-b", null),
      Seq())
    val p = tmp("roundtrip")
    Excel.writeRaw(p, Seq("S1" -> rows))
    val back = Excel.readRaw(p)
    assert(back(0) == Seq("Header A", "B & <C>", "D"))
    assert(back(1) == Seq("v1", null, "v3"))
    assert(back(2) == Seq(null, "only-b"))
    assert(back(3) == Seq())
  }

  test("multi-sheet workbook: first sheet wins on read; all sheets written") {
    val p = tmp("multi")
    Excel.writeRaw(p, Seq("first" -> Seq(Seq("a")), "second" -> Seq(Seq("b"))))
    assert(Excel.readRaw(p) == Seq(Seq("a")))
  }

  test("end-to-end: xlsx upload → pipeline → xlsx export (the reference flow)") {
    val upload: Seq[Seq[Any]] = Seq(
      Seq("Relatório Cortex", null, null, null),
      Seq("Endpoint Name", "Endpoint Type", "Operating System", "Agent Version"),
      Seq("host-x", "SERVER", "Linux", "8.0"),
      Seq("host-y", "SERVER", null, "7.9"))
    val in = tmp("upload")
    Excel.writeRaw(in, Seq("export" -> upload))
    val df = Pipeline.ingestExcel(spark, in)
    assert(df.columns.toSeq ==
      Seq("endpoint_name", "endpoint_type", "operating_system", "agent_version"))
    assert(df.count() == 2)
    val catalog = Pipeline.run(Seq(df), dedupKeys = Seq("endpoint_name"))
    val out = tmp("result")
    Pipeline.exportCatalogXlsx(catalog, out)
    val sheet1 = Excel.readRaw(out) // base_limpa: header + 2 rows
    assert(sheet1.head.contains("endpoint_name"))
    assert(sheet1.length == 3)
  }
}
