package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.ops.Multimodal

/** Plumbing checks for the multimodal binary-column path: schema shape,
  * determinism of the decode stub, partition-level batching. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq((1L, "hello world", "en"), (2L, "more text", "en"))
    .toDF("doc_id", "text", "lang")

  test("payload column is BinaryType with 16-byte md5 payloads") {
    val p = Multimodal.withPayload(docs)
    assert(p.schema("payload").dataType == BinaryType)
    val lens = p.select("payload").as[Array[Byte]].collect().map(_.length).toSet
    assert(lens == Set(16))
  }

  test("decode stub is deterministic and emits typed metadata columns") {
    implicit val s = spark
    val once = Multimodal.decodeStub(Multimodal.withPayload(docs))
    assert(once.schema.fieldNames.toSeq ==
      Seq("doc_id", "width", "height", "fmt", "feat0"))
    assert(once.schema("width").dataType == IntegerType)
    assert(once.schema("fmt").dataType == StringType)
    val a = once.orderBy("doc_id").collect().toSeq
    val b = Multimodal.decodeStub(Multimodal.withPayload(docs))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    a.foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      assert(w >= 64 && w < 192 && h >= 64 && h < 192)
      assert(Set("jpeg", "png", "webp").contains(r.getString(3)))
    }
  }

  test("decode runs per-partition and preserves every row") {
    implicit val s = spark
    val many = (1L to 100L).map(i => (i, s"doc number $i", "en"))
      .toDF("doc_id", "text", "lang").repartition(7)
    val out = Multimodal.decodeStub(Multimodal.withPayload(many))
    assert(out.count() == 100)
    assert(out.select("doc_id").distinct().count() == 100)
  }

  test("frame sampling: stride-3 over 8 frames yields indices 0/3/6 per payload") {
    implicit val s = spark
    val docs = (1L to 50L).map(i => (i, s"video $i", "en"))
      .toDF("doc_id", "text", "lang").repartition(5)
    val frames = Multimodal.frameSampleStub(Multimodal.withPayload(docs))
    assert(frames.count() == 150) // 3 sampled frames per payload, no drops
    import org.apache.spark.sql.functions.{col, collect_set}
    val idxSets = frames.groupBy("doc_id")
      .agg(collect_set("frame_idx").as("idx"))
      .select("idx").collect()
    idxSets.foreach(r => assert(r.getSeq[Int](0).toSet == Set(0, 3, 6)))
    // intensity is the big-endian 16-bit value of the frame's two payload
    // bytes — recompute frame 0 of one doc directly from the payload
    val one = Multimodal.withPayload(docs.filter(col("doc_id") === 1L))
      .select("payload").collect()(0).getAs[Array[Byte]](0)
    val want = ((one(0) & 0xff) << 8) | (one(1) & 0xff)
    val got = frames.filter(col("doc_id") === 1L && col("frame_idx") === 0)
      .select("intensity").collect()(0).getInt(0)
    assert(got == want)
    // ts_ms is the 25fps timeline position of the SOURCE frame index
    assert(frames.filter(col("frame_idx") === 6)
      .select("ts_ms").distinct().collect()(0).getInt(0) == 240)
  }

  test("audio energy: signed PCM arithmetic exact; silence threshold is strict") {
    import spark.implicits._
    implicit val s = spark
    // two's-complement s16be: window 0 = samples (00 00) -> 0,
    // (80 00) -> -32768; window 1 = (00 64) -> 100, (ff 9c) -> -100
    val payload = Array[Byte](
      0x00, 0x00, 0x80.toByte, 0x00,                       // w0: 0, -32768
      0x00, 0x64, 0xff.toByte, 0x9c.toByte,                // w1: 100, -100
      0x00, 0x00, 0x00, 0x00,                              // w2: both 0
      0x7f, 0xff.toByte, 0x7f, 0xff.toByte)                // w3: 32767,32767
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val rows = graft.ops.Multimodal.audioEnergyStub(df, silenceBelow = 20000L)
      .as[(Long, Int, Long, Boolean)].collect().sortBy(_._2)
    assert(rows(0) == ((1L, 0, 32768L * 32768L, false)))
    assert(rows(1) == ((1L, 1, 20000L, false)), // exactly AT threshold -> loud
      s"strict < violated: ${rows(1)}")
    assert(rows(2) == ((1L, 2, 0L, true)))      // digital silence
    assert(rows(3) == ((1L, 3, 2L * 32767L * 32767L, false)))
  }

  test("scene cut: planted boundaries — threshold strict, diffs exact") {
    import spark.implicits._
    implicit val s = spark
    // frames: 0, 30000, 30000, 0, 65535, 65535, 65535, 30001
    val payload = Array[Byte](
      0x00, 0x00, 0x75, 0x30,                              // f0=0, f1=30000
      0x75, 0x30, 0x00, 0x00,                              // f2=30000, f3=0
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,  // f4=f5=65535
      0xff.toByte, 0xff.toByte, 0x75, 0x31)                // f6=65535, f7=30001
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val rows = graft.ops.Multimodal.sceneCutStub(df, cutAbove = 30000L)
      .as[(Long, Int, Long, Boolean)].collect().sortBy(_._2)
    // diff exactly AT the threshold is NOT a cut (strict >)
    assert(rows(0) == ((1L, 1, 30000L, false)), s"strict > violated: ${rows(0)}")
    assert(rows(1) == ((1L, 2, 0L, false)))
    assert(rows(2) == ((1L, 3, 30000L, false)))
    assert(rows(3) == ((1L, 4, 65535L, true)))   // hard cut
    assert(rows(4) == ((1L, 5, 0L, false)))
    assert(rows(5) == ((1L, 6, 0L, false)))
    assert(rows(6) == ((1L, 7, 35534L, true)))   // cut just past threshold
  }

  test("silence trim: span arithmetic on a silent-edged clip; all-silent clip keeps nothing") {
    import spark.implicits._
    implicit val s = spark
    // clip 1 windows: silent, voiced (0x7fff sample), voiced, silent →
    // trim keeps windows 1..2; clip 2: digital silence throughout
    val edged = Array[Byte](
      0x00, 0x00, 0x00, 0x00,              // w0: 0,0      → silent
      0x7f, 0xff.toByte, 0x00, 0x00,       // w1: 32767,0  → voiced
      0x7f, 0xff.toByte, 0x00, 0x00,       // w2: 32767,0  → voiced
      0x00, 0x00, 0x00, 0x00)              // w3: 0,0      → silent
    val allSilent = Array.fill[Byte](16)(0x00)
    val df = Seq((1L, edged), (2L, allSilent)).toDF("doc_id", "payload")
    val win = graft.ops.Multimodal.audioEnergyStub(df, silenceBelow = 600000000L)
    val got = graft.ops.Multimodal.trimReport(win)
      .as[(Long, Option[Int], Option[Int], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((Some(1), Some(2), 2L, 2L)), s"got ${got(1L)}")
    assert(got(2L) == ((None, None, 4L, 0L)), s"all-silent: ${got(2L)}")
  }
}
