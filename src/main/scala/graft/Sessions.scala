package graft

import org.apache.spark.sql.SparkSession

/** One place to build the engine's SparkSession so Verify, Bench, and the
  * test suites agree on semantics-critical config.
  *
  * - `legacy.parquet.nanosAsLong`: if a source writes `events.ts` as
  *   parquet TIMESTAMP(NANOS), Spark otherwise refuses to read it
  *   ([PARQUET_TYPE_ILLEGAL]); with this flag it arrives as a long that
  *   [[Tables.t]] converts to a µs timestamp — matching what the DuckDB
  *   oracle sees (DuckDB truncates ns→µs on read too).
  * - `inferTimestampNTZ.enabled=false`: parquet TIMESTAMP(isAdjustedToUTC
  *   =false) otherwise surfaces as TIMESTAMP_NTZ, a type half the
  *   timestamp function surface (`unix_micros`, `to_utc_timestamp`, …)
  *   rejects. With the session timezone pinned to UTC the TIMESTAMP
  *   reading denotes the identical instants, every chrono function
  *   applies, and plans/oracle hashes match the TIMESTAMP-writer data
  *   layouts byte for byte.
  * - UTC session timezone: oracle determinism (SURVEY §5.2).
  * - shuffle.partitions = cores: local[.] has no reason for 200 partitions;
  *   on a real cluster this would instead be sized to data volume — with AQE
  *   coalescing partitions at runtime either way.
  */
object Sessions {
  /** Master override for multi-JVM certification: `SPARK_GRAFT_MASTER=
    * local-cluster[4,8,4096]` runs the SAME session config against real
    * separate executor processes (standalone workers in-process, executors
    * forked), which is what actually exercises closure/Expression
    * serialization and cross-process shuffle — `local[n]` cannot, by
    * construction. Executor JVMs need the engine's classes on their own
    * classpath (they are not launched by sbt), so the compiled class dirs
    * are passed via extraClassPath; SPARK_HOME must point at the Spark
    * dist (/opt/spark) for the executor launcher. Everything else —
    * timestamps, timezone, AQE, codegen cache — is identical, so a green
    * cluster run certifies the exact plans the local gates run.
    */
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // The generated-class cache defaults to 100 entries; a sweep of many
      // distinct queries evicts everything between passes and re-pays janino
      // compilation per stage. Any many-query workload (BI server, test
      // suite, this engine's Verify/Bench) wants this sized to its plan
      // count — 160+ queries × several compiled stages each needs well
      // beyond the 1000 that sufficed at 70 queries.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // ObjectHashAggregate (TypedImperativeAggregate, e.g. the bounded
      // top-k ranker) falls back to SORT-based aggregation after 128
      // distinct keys by default — re-paying exactly the full-candidate
      // sort the bounded buffer exists to avoid. Per-task group counts in
      // the ranking paths are `probes`, far above 128 and far below memory.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // Recursive CTEs (q194) abort at 1M ACCUMULATED rows by default — a
      // safety valve sized for lookup tables, not data-scale recursion (an
      // n-row hierarchy walk emits n·depth rows: ~3.6M at the ×30 suite
      // point, where the default failed). 1e9 keeps the valve (a runaway
      // recursion still dies) while clearing honest linear growth; the
      // level limit (100) stays default — depth is the structural bound.
      .config("spark.sql.cteRecursionRowLimit", "1000000000")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      val cp = Seq("target/scala-2.13/classes", "target/scala-2.13/test-classes")
        .map(p => new java.io.File(p).getAbsolutePath)
        .filter(p => new java.io.File(p).isDirectory).mkString(":")
      builder
        .config("spark.executor.memory", sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3g"))
        .config("spark.executor.extraClassPath", cp)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registerFunctions(spark)
    spark
  }

  /** Engine-native codegen expressions, addressable from any Column context
    * via `call_function` (and from SQL) — the same registry the
    * `spark.sql.extensions=graft.GraftExtensions` path injects. Idempotent
    * per session.
    */
  def registerFunctions(spark: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder(_), "built-in")
    }
}
