package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: SparkEntry's shape and smoke behavior, so a
  * broken registration fails here before the round's verify run does.
  */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every oracle key has a query; names follow the qNN_ convention") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle-only keys: ${os.diff(qs)}")
    assert(qs.forall(_.matches("q\\d+_[a-z0-9_]+")), qs.filterNot(_.matches("q\\d+_[a-z0-9_]+")))
  }

  test("rows-only queries are the two documented ones") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly == Set("q34_approx_distinct", "q56_decode_features"))
  }

  test("entry (driver smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query builds a plan against sf0.001 without throwing") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.nonEmpty, name)
    }
  }
}
