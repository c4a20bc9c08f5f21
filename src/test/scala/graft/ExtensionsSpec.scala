package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make the native functions SQL-addressable in a
  * session configured only via spark.sql.extensions (no Sessions.local).
  */
class ExtensionsSpec extends AnyFunSuite {
  test("spark.sql.extensions=graft.GraftExtensions injects graft_cosine/graft_jaccard") {
    val prev = Some(TestSpark.spark) // shared context stays up
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val r = s2
        .sql("SELECT graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) c, " +
          "graft_jaccard(array('a','b'), array('b','c')) j")
        .head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(prev.get)
      SparkSession.setActiveSession(prev.get)
    }
  }
}
