package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Constraints
import graft.ops.Constraints._

class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("each rule class counts exactly its violations") {
    val df = Seq(
      (1L, Some(0.02), "A"),
      (1L, Some(0.50), "A"),   // dup key + out-of-range
      (2L, None, "X"),         // null range value (NOT a range violation), bad domain
      (3L, Some(0.04), "R")).toDF("k", "disc", "flag")
    val ref = Seq(1L, 2L).toDF("rk") // 3 is an orphan
    val out = Constraints.check(df, Seq(
        NotNull("r1_not_null", "disc"),
        InRange("r2_range", "disc", 0.0, 0.05),
        Matches("r3_domain", "flag", "^[AR]$"),
        Unique("r4_unique", Seq("k")),
        RefIntegrity("r5_fk", "k", ref, "rk")))
      .as[(String, Long)].collect().toMap
    assert(out == Map(
      "r1_not_null" -> 1L, // the None row
      "r2_range" -> 1L,    // 0.50; NULL is not a range violation
      "r3_domain" -> 1L,   // "X"
      "r4_unique" -> 1L,   // one extra row under k=1
      "r5_fk" -> 1L))      // k=3
  }

  test("clean table reports zero violations for every rule, in name order") {
    val df = Seq((1L, "A"), (2L, "R")).toDF("k", "flag")
    val out = Constraints.check(df, Seq(
        Unique("b_unique", Seq("k")),
        NotNull("a_not_null", "flag")))
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a_not_null", 0L), ("b_unique", 0L)))
  }

  test("null foreign keys and null unique-key parts follow SQL semantics") {
    val df = Seq(
      (Option.empty[Long], "x"),
      (Option.empty[Long], "y"), // NULL unique keys group together → 1 extra
      (Some(9L), "z")).toDF("k", "v")
    val ref = Seq(1L).toDF("rk")
    val out = Constraints.check(df, Seq(
        Unique("u", Seq("k")),
        RefIntegrity("fk", "k", ref, "rk")))
      .as[(String, Long)].collect().toMap
    assert(out == Map("u" -> 1L, "fk" -> 1L)) // NULL k is never an orphan; 9 is
  }

  test("rule names containing dots survive the unpivot; backticks are rejected") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "v")
    val out = Constraints.check(df, Seq(NotNull("v.not_null", "v")))
      .as[(String, Long)].collect().toMap
    assert(out == Map("v.not_null" -> 1L))
    intercept[IllegalArgumentException] {
      Constraints.check(df, Seq(NotNull("bad`name", "v")))
    }
  }
}
