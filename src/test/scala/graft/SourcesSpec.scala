package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.sources.Sources
import graft.swivel.SwivelPrep

/** Sources/sinks round-trips (SURVEY §2.1). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("textCorpus: one doc per line, unique ids; contiguous ids dense") {
    val dir = Files.createTempDirectory("graft_txt").toFile
    val f = new java.io.File(dir, "corpus.txt")
    Files.write(f.toPath, "a b a\nc d\ne".getBytes)
    val df = Sources.textCorpus(spark, f.getAbsolutePath)
    assert(df.count() == 3)
    assert(df.select("doc_id").distinct().count() == 3)
    assert(df.select("text").as[String].collect().toSet == Set("a b a", "c d", "e"))
    val dense = Sources.textCorpus(spark, f.getAbsolutePath, contiguousIds = true)
    assert(dense.select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("writeShards: partitioned layout round-trips the shard relation") {
    val docs = Seq((0L, "a a b b c c d d"), (1L, "a b c d a b c d"))
      .toDF("doc_id", "text")
    val vocab = SwivelPrep.buildVocab(docs, minCount = 1, shardSize = 2)
    val shards = SwivelPrep.shard(SwivelPrep.cooc(docs, vocab, 2), vocab, 2)
    val out = Files.createTempDirectory("graft_shards").toString
    Sources.writeShards(shards, out)
    val back = spark.read.parquet(out)
    assert(back.count() == shards.count())
    // partition columns survive as columns; per-shard dirs exist
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("row_shard=")))
    val a = shards.orderBy("global_row", "global_col")
      .select("row_shard", "col_shard", "global_row", "global_col", "weight")
      .collect().toSeq
    // partition-dir values re-infer as int — cast back to the written type
    import org.apache.spark.sql.functions.col
    val b = back.orderBy("global_row", "global_col")
      .select(col("row_shard").cast("long"), col("col_shard").cast("long"),
        col("global_row"), col("global_col"), col("weight"))
      .collect().toSeq
    assert(a == b)
  }

  test("vocab side output round-trips") {
    val docs = Seq((0L, "x x y y")).toDF("doc_id", "text")
    val vocab = SwivelPrep.buildVocab(docs, minCount = 1, shardSize = 2)
    val out = Files.createTempDirectory("graft_vocab").toString
    Sources.writeSideOutput(vocab, out)
    assert(spark.read.parquet(out).orderBy("id").collect().toSeq ==
      vocab.orderBy("id").collect().toSeq)
  }
}
