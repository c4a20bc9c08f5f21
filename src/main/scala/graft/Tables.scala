package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access for the driver test data at
  * `/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet` (see TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong` (set in [[Sessions]]) it reads as
    * long nanos, converted here to a µs timestamp with integral division (no
    * double round-trip — 1.7e18 ns exceeds double's 53-bit mantissa). DuckDB
    * also truncates ns→µs on read, so oracle and engine agree (SURVEY §7.5).
    *
    * Scan layout note: the driver's files are ONE parquet row group each —
    * a row group is Spark's split floor, so every raw scan is a single
    * task. A transparent re-layout cache was measured (round 17) and
    * REJECTED: Spark 4's per-task parquet-reader setup costs ~40-80 ms of
    * CPU, so splitting every table into many small files added that
    * constant to every scan of every query (+43% suite wall, cpu 540→1386 s)
    * while only per-row-CPU-heavy scans profited. The targeted fix stays
    * [[spread]] at the call sites whose SCAN-STAGE work is the bottleneck;
    * a real corpus (many files, many row groups) splits by itself.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  // WeakHashMap: a stopped SparkSession must be collectable — a strong-keyed
  // memo would retain every session (and its sessionState) for the JVM's
  // life in a long-lived driver. All access is under registerAll's lock.
  private val registered = new java.util.WeakHashMap[SparkSession, String]()

  /** Register every table as a temp view so SQL-surface queries work.
    *
    * View names are global to the session, so the memo tracks the LAST
    * registered dir per session and re-registers whenever it differs —
    * a per-(session, dir) memo would leave the views pointing at dir B while
    * claiming dir A is registered when dirs alternate. Skipping the no-op
    * re-registration matters: `createOrReplaceTempView` invalidates every
    * cached plan referencing the views, which showed up as seconds of
    * repeated analysis in the bench sweep.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = synchronized {
    if (registered.get(spark) != dir) {
      names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
      registered.put(spark, dir)
    }
  }

  /** Round-robin the rows across the cluster before a CPU-heavy narrow pass.
    *
    * The driver test files are single-row-group parquet, which Spark cannot
    * split — without this, per-document hashing/scoring runs in ONE task no
    * matter how many cores exist. On a real corpus (many files, many row
    * groups) the scan parallelizes by itself and this exchange is unnecessary;
    * it costs one shuffle of the projected columns, which the expression work
    * it unlocks dwarfs.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
