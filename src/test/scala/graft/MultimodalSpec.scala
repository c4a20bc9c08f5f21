package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("inferFormat sniffs container magic bytes") {
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2, 3, 4)
    val png  = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    val out = Seq((jpeg, png)).toDF("j", "p")
      .select(Multimodal.inferFormat($"j"), Multimodal.inferFormat($"p"))
      .head()
    assert(out.getString(0) == "jpeg" && out.getString(1) == "png")
  }

  test("mediaMeta struct: format + byte_len + sha") {
    val row = Seq(Tuple1("hello".getBytes("UTF-8"))).toDF("payload")
      .select(Multimodal.mediaMeta($"payload").as("m"))
      .select("m.format", "m.byte_len", "m.sha").head()
    assert(row.getString(0) == "unknown")
    assert(row.getInt(1) == 5)
    assert(row.getString(2).length == 64)
  }

  test("frameOffsets yields every-step 1-based positions") {
    val out = Seq(Tuple1("0123456789".getBytes("UTF-8"))).toDF("p")
      .select(Multimodal.frameOffsets($"p", 4)).as[Seq[Int]].head()
    assert(out == Seq(1, 5, 9))
  }

  test("decodeFeatures: fixed schema, fixed dim, deterministic, null-safe") {
    val df = Seq((1L, "abc".getBytes("UTF-8")), (2L, "abcd".getBytes("UTF-8")),
      (3L, null: Array[Byte])).toDF("id", "payload")
    val out = Multimodal.decodeFeatures(df, "id", "payload", dim = 4)
    assert(out.columns.toSeq == Seq("id", "byte_len", "features"))
    val rows = out.orderBy("id").as[(Long, Long, Seq[Float])].collect()
    assert(rows.forall(_._3.length == 4))
    assert(rows(0)._2 == 3 && rows(2)._2 == 0)
    // determinism: same payload → same features
    val again = Multimodal.decodeFeatures(df, "id", "payload", dim = 4)
      .orderBy("id").as[(Long, Long, Seq[Float])].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("decodeFeatures preserves partitioning (no shuffle in the plan)") {
    val df = Seq((1L, "x".getBytes("UTF-8"))).toDF("id", "payload").repartition(3)
    val out = Multimodal.decodeFeatures(df, "id", "payload", 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"))
  }
}
