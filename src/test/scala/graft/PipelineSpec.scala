package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end test of the §3.1 pipeline replica over the `endpoints`
  * fixture (FIXTURES.md §2): title row + all-null row/column exercise header
  * detection and pruning; duplicate keys exercise dedup; NULL OS exercises
  * the dropna=False group; garbage dates exercise coercion.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // upload 1, raw form: title line above header, an all-null column and row
  private val raw1: Seq[Seq[Any]] = Seq(
    Seq("Relatório Cortex XDR", null, null, null, null, null, null, null),
    Seq("Endpoint Name", "Endpoint Alias", "Endpoint Type", "Operating System",
      "Agent Version", "Endpoint Status", "Last Seen", "Last Upgrade Status"),
    Seq("host-a", "alias-a", "WORKSTATION", "Windows 10", "7.9", " connected ",
      "2024-01-10 10:00:00", "SUCCESS"),
    Seq(null, null, null, null, null, null, null, null),
    Seq("host-b", "alias-b", "SERVER", null, "7.8", "DISCONNECTED",
      "2024-01-09 09:00:00", "Failed"))

  // upload 2: same host-a with a NEWER last_seen (must win dedup), plus
  // a failure row with reason + unparseable date
  private val raw2: Seq[Seq[Any]] = Seq(
    Seq("Endpoint Name", "Endpoint Alias", "Endpoint Type", "Operating System",
      "Agent Version", "Endpoint Status", "Last Seen", "Last Upgrade Status",
      "Last Upgrade Failure Reason", "IP Address"),
    Seq("host-a", "alias-a", "WORKSTATION", "Windows 11", "8.0", "connected",
      "2024-01-12 10:00:00", "SUCCESS", null, "10.0.0.1, 192.168.1.9"),
    Seq("host-c", "alias-c", "SERVER", "Linux", "7.7", "Lost Contact",
      "not a date", "Timed Out", "error code 5", "n/a"))

  private lazy val catalog = Pipeline.run(Seq(
    Pipeline.ingestRaw(spark, raw1),
    Pipeline.ingestRaw(spark, raw2)))

  test("header detection skips the title row; all-null row and column pruned") {
    val df = Pipeline.ingestRaw(spark, raw1)
    assert(df.columns.contains("endpoint_name"))
    assert(df.count() == 2) // all-null row dropped
  }

  test("base_limpa dedups keeping the most recent last_seen") {
    val base = catalog("base_limpa")
    assert(base.count() == 3) // host-a (newer), host-b, host-c
    val hostA = base.filter($"endpoint_name" === "host-a").head()
    assert(hostA.getAs[String]("operating_system") == "Windows 11")
  }

  test("normalization: status title-cased, dates coerced, ipv4 extracted") {
    val base = catalog("base_limpa")
    val hostC = base.filter($"endpoint_name" === "host-c").head()
    assert(hostC.getAs[String]("endpoint_status") == "Lost Contact")
    assert(hostC.isNullAt(hostC.fieldIndex("last_seen"))) // garbage → NULL
    assert(hostC.getAs[String]("ipv4") == null)           // "n/a" → NULL
    val hostA = base.filter($"endpoint_name" === "host-a").head()
    assert(hostA.getAs[String]("ipv4") == "10.0.0.1")
  }

  test("resumo_os keeps the NULL group (dropna=False, app.py:247)") {
    val os = catalog("resumo_os").collect()
    assert(os.exists(r => r.isNullAt(0) && r.getLong(1) == 1)) // host-b NULL OS
  }

  test("falhas_upgrade matches keyword rows across status AND reason columns") {
    val falhas = catalog("falhas_upgrade")
      .select("endpoint_name").as[String].collect().toSet
    assert(falhas == Set("host-b", "host-c")) // Failed, Timed Out/error
  }

  test("exportCatalogPartitioned writes hive-partitioned output with pruning") {
    val dir = s"/root/repo/target/tmp/pipeline_part_${System.nanoTime()}"
    Pipeline.exportCatalogPartitioned(catalog, dir,
      Map("base_limpa" -> Seq("endpoint_type")))
    val back = spark.read.parquet(s"$dir/base_limpa")
    assert(back.count() == 3)
    // partition pruning: only the SERVER directory is scanned
    val pruned = back.filter($"endpoint_type" === "SERVER")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(endpoint_type"))
    assert(pruned.count() == 2)
  }

  test("exportCatalog writes one parquet dir per table (S6)") {
    val dir = s"/root/repo/target/tmp/pipeline_export_${System.nanoTime()}"
    Pipeline.exportCatalog(catalog, dir)
    val base = spark.read.parquet(s"$dir/base_limpa")
    assert(base.count() == 3)
  }
}
