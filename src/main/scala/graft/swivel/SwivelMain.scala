package graft.swivel

import org.apache.spark.sql.SparkSession
import graft.sources.Sources

/** End-to-end Swivel-prep CLI — the spark-submit entry point mirroring the
  * reference driver's flag surface (SURVEY.md §3.1 E1: --input,
  * --output_dir, --shard_size, --min_count, --window_size).
  *
  * Reads a corpus (plain-text lines or a parquet documents table), runs
  * tokenize → vocab → cooc → marginals → shard, and writes:
  *   <output_dir>/shards/   parquet partitioned by (row_shard, col_shard)
  *   <output_dir>/vocab/    (id, token, cnt)
  *   <output_dir>/row_sums/ (id, marginal)   [= col sums; matrix symmetric]
  */
object SwivelMain {
  private val usage =
    """usage: graft.swivel.SwivelMain --input <path> --output_dir <dir>
      |        [--input_format text|parquet] [--shard_size 4096]
      |        [--min_count 5] [--window_size 10] [--output_format parquet|pb]""".stripMargin

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val input = opts.getOrElse("input", { System.err.println(usage); sys.exit(2) })
    val outDir = opts.getOrElse("output_dir", { System.err.println(usage); sys.exit(2) })
    val shardSize = opts.getOrElse("shard_size", "4096").toInt
    val minCount = opts.getOrElse("min_count", "5").toInt
    val windowSize = opts.getOrElse("window_size", "10").toInt
    val fmt = opts.getOrElse("input_format", "text")
    val outFmt = opts.getOrElse("output_format", "parquet")

    val builder = SparkSession.builder()
      .appName("swivel-prep")
      .config("spark.sql.session.timeZone", "UTC")
    // under spark-submit the master comes from the submit config; default
    // to local[*] for direct java invocation
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")).getOrCreate()
    try {
      val docs = fmt match {
        case "parquet" => spark.read.parquet(input).select("doc_id", "text")
        case _         => Sources.textCorpus(spark, input)
      }
      val vocab = SwivelPrep.buildVocab(docs, minCount, shardSize)
      // vocab is reused by cooc/marginals/shard — tiny (≤ truncated size),
      // cache instead of recomputing the corpus-wide count per stage
      vocab.cache()
      val cells = SwivelPrep.cooc(docs, vocab, windowSize)
      val sharded = SwivelPrep.shard(cells, vocab, shardSize)
      // materialized once: both output branches read marginals, and the
      // pb branch reads them twice (text sums + parquet side output) —
      // without this the most expensive stage (cooc pair derivation)
      // would re-run per consumer
      val marg = SwivelPrep.marginals(docs, vocab, windowSize).localCheckpoint()
      val vocabSize = vocab.count().toInt
      if (vocabSize == 0) {
        // corpus smaller than one shard: vocab truncates to zero — mirror
        // the parquet path's graceful empty output instead of crashing in
        // the .pb writer's require
        System.err.println(
          s"swivel-prep: vocabulary is empty after truncation to a multiple " +
            s"of shard_size=$shardSize — no shards to write")
      } else if (outFmt == "pb") {
        // the reference trainer's own input layout: one serialized
        // tensorflow.Example per shard (shard-RRR-CCC.pb) plus the
        // vocab/sums TEXT side files it loads alongside them. Vocab and
        // sums are driver-bounded (truncated vocabulary), so a driver-side
        // text write is the honest scale story; the matrix is symmetric,
        // so row and col files are identical.
        graft.sources.TfExample.writeSwivelPbShards(sharded,
          vocabSize / shardSize, vocabSize, s"$outDir/shards_pb")
        import org.apache.spark.sql.functions.{col, coalesce, lit}
        import spark.implicits._
        val tokens = vocab.orderBy("id").select("token").as[String].collect()
        // every vocab id gets a sum line; ids with no in-window pairs are 0
        val sums = vocab.select(col("id"))
          .join(marg, Seq("id"), "left")
          .select(col("id"), coalesce(col("marginal"), lit(0.0)).as("m"))
          .orderBy("id").select("m").as[Double].collect()
        def writeLines(name: String, lines: Iterable[String]): Unit =
          java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/$name"),
            (lines.mkString("\n") + "\n").getBytes("UTF-8"))
        writeLines("row_vocab.txt", tokens)
        writeLines("col_vocab.txt", tokens)
        // plain-decimal, never scientific: Double.toString renders small
        // 4dp-rounded marginals as "1.0E-4", which diverges from the
        // reference tooling's one-plain-value-per-line sums layout. The
        // marginals are 4dp-rounded upstream, so fixed %.4f is exact.
        writeLines("row_sums.txt", sums.map(v => f"$v%.4f"))
        writeLines("col_sums.txt", sums.map(v => f"$v%.4f"))
      } else Sources.writeShards(sharded, s"$outDir/shards")
      Sources.writeSideOutput(vocab, s"$outDir/vocab")
      Sources.writeSideOutput(marg, s"$outDir/row_sums")
      println(s"swivel-prep done: vocab=${vocab.count()} cells=${cells.count()} -> $outDir")
    } finally spark.stop()
  }
}
