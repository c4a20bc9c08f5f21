package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ops._

/** The reference's full product, §3.1 of SURVEY.md: ingest 1..N raw uploads
  * → per-file normalize (`app.py:165-216`) → union (`app.py:325`) → dedup
  * keep-most-recent (`app.py:233-242`) → summaries + failure filter
  * (`app.py:245-270`) → named result catalog (`app.py:272-278`).
  *
  * Spark-first shape: [[ingestRaw]] resolves schema driver-side (a schema
  * must exist before a plan does), then everything through the catalog is
  * ONE lazy plan per output table — Catalyst fuses the whole normalize chain
  * into the scan stage, and the only shuffles are the dedup window and the
  * two group-by summaries.
  */
object Pipeline {

  /** S1/S2 — raw positional rows (an Excel sheet read header-less; any cell
    * may be null) → typed DataFrame: detect the header row against the
    * sentinel set, re-header, prune all-null rows/columns, normalize names.
    */
  def ingestRaw(spark: SparkSession, rows: Seq[Seq[Any]]): DataFrame = {
    val idx            = Ingest.detectHeaderIndex(rows)
    val (names, data)  = Ingest.reHeader(rows, idx)
    val width          = names.length
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    val padded = data.map { r =>
      val cells = r.map(v => if (v == null) null else v.toString).padTo(width, null)
      Row.fromSeq(cells.take(width))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(padded.toIndexedSeq), schema)
    Ingest.dropAllNullColumns(Ingest.dropAllNullRows(df))
  }

  /** Per-upload normalization (`parse_cortex_excel`, `app.py:165-216`):
    * snake-case names, coerce the date columns, title-case the status,
    * extract first IPv4/IPv6. Every step is schema-conditional, mirroring
    * the reference's graceful degradation (`app.py:184,189,197,205`).
    */
  def normalizeUpload(df: DataFrame): DataFrame = {
    val n = Clean.normColumns(df)
    def ifHas(c: String)(f: DataFrame => DataFrame): DataFrame => DataFrame =
      d => if (d.columns.contains(c)) f(d) else d
    val steps: Seq[DataFrame => DataFrame] = Seq(
      ifHas("last_seen")(d => d.withColumn("last_seen", Clean.parseTs(col("last_seen")))),
      ifHas("last_upgrade_status_time")(d =>
        d.withColumn("last_upgrade_status_time", Clean.parseTs(col("last_upgrade_status_time")))),
      ifHas("endpoint_status")(d =>
        d.withColumn("endpoint_status", Clean.titleCase(col("endpoint_status")))),
      ifHas("ip_address")(d => d.withColumn("ipv4", Clean.firstIpv4(col("ip_address")))),
      ifHas("ipv6_address")(d => d.withColumn("ipv6", Clean.firstIpv6(col("ipv6_address")))))
    steps.foldLeft(n)((d, f) => f(d))
  }

  /** The consolidated run (`unify_cortex` + catalog assembly,
    * `app.py:219-278`). Returns the named result catalog; every value is a
    * lazy DataFrame — materialization happens only at export/display.
    *
    * Dedup determinism: the reference resolves equal-recency ties by
    * encounter order (`keep="first"`), which has no distributed meaning; we
    * order ties by every remaining column, which is total on any input with
    * no fully-duplicate rows per key (SURVEY §7.5 documents the divergence).
    */
  def run(
      uploads: Seq[DataFrame],
      dedupKeys: Seq[String] = Seq("endpoint_name", "endpoint_alias")): Map[String, DataFrame] = {
    val base = Ingest.unionAllByName(uploads.map(normalizeUpload))

    val keys    = dedupKeys.filter(base.columns.contains)
    val recency = Seq("last_seen", "last_upgrade_status_time").filter(base.columns.contains)
    val tieBreak: Seq[Column] =
      base.columns.toSeq.filterNot(c => keys.contains(c) || recency.contains(c)).map(col)
    val baseLimpa =
      if (keys.nonEmpty) Dedup.keepLatest(base, keys, recency, tieBreak)
      else Dedup.distinctRows(base) // reference fallback `app.py:242`

    val catalog = scala.collection.mutable.LinkedHashMap[String, DataFrame](
      "base_limpa" -> baseLimpa)
    if (base.columns.contains("endpoint_status"))
      catalog += "resumo_status" -> Summaries.groupCount(baseLimpa, "endpoint_status")
    if (base.columns.contains("operating_system"))
      catalog += "resumo_os" -> Summaries.groupCount(baseLimpa, "operating_system")
    val failCols = Seq("last_upgrade_status", "last_upgrade_failure_reason")
      .filter(base.columns.contains)
    if (failCols.nonEmpty)
      catalog += "falhas_upgrade" ->
        baseLimpa.filter(Clean.keywordAny(failCols.map(col), Clean.FailurePattern))
    // ListMap, not .toMap: the catalog's iteration order is part of the
    // contract (base_limpa must stay the first sheet the xlsx export writes;
    // a plain Map over 4 entries only PRESERVES insertion order by accident
    // and silently stops at the 5th entry)
    scala.collection.immutable.ListMap(catalog.toSeq: _*)
  }

  /** S6 — multi-table export of a named catalog (the engine-side contract of
    * the reference's multi-sheet workbook, `df_to_xlsx_bytes` `app.py:35-134`;
    * formatting is presentation-layer, deliberately out of engine scope).
    */
  def exportCatalog(catalog: Map[String, DataFrame], dir: String, format: String = "parquet"): Unit =
    catalog.foreach { case (name, df) =>
      df.write.mode("overwrite").format(format).save(s"$dir/$name")
    }

  /** S6 at scale — partitioned parquet export: one directory tree per table,
    * hive-partitioned by the given columns (per-table). Partition pruning on
    * read is what makes a 100 TB result set addressable; the flat form above
    * is for small catalogs.
    */
  def exportCatalogPartitioned(
      catalog: Map[String, DataFrame],
      dir: String,
      partitionCols: Map[String, Seq[String]]): Unit =
    catalog.foreach { case (name, df) =>
      val w = df.write.mode("overwrite")
      partitionCols.get(name).filter(_.nonEmpty).fold(w)(cs => w.partitionBy(cs: _*))
        .parquet(s"$dir/$name")
    }

  /** S1 — full Excel ingest path: workbook file → raw rows → header-detected,
    * pruned, normalized DataFrame.
    */
  def ingestExcel(spark: SparkSession, path: String): DataFrame =
    ingestRaw(spark, Excel.readRaw(path))

  /** S6 — the reference's ACTUAL sink: one multi-sheet .xlsx workbook
    * (`app.py:367`). Collects to the driver by design — a workbook is a
    * single machine's byte stream and this is a human-scale presentation
    * export; [[exportCatalog]] (parquet per table) is the 100 TB sink.
    * Header row first; cells keep their JVM types so [[Excel.writeRaw]] can
    * apply the reference's number formats and width sampling
    * (`app.py:72-99`); sheet names truncated like `app.py:55`.
    */
  def exportCatalogXlsx(catalog: Map[String, DataFrame], path: String): Unit = {
    val sheets = catalog.toSeq.map { case (name, df) =>
      val header: Seq[Any] = df.columns.toSeq
      val rows = df.collect().toSeq.map(r =>
        (0 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i)))
      name -> (header +: rows)
    }
    Excel.writeRaw(path, sheets)
  }
}
