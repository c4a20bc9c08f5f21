package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (Spark session startup dominates
  * test wall-clock otherwise). Built via [[Sessions.local]] so tests run
  * under the exact semantics-critical config of Verify/Bench.
  */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
}
