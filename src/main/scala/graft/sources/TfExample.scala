package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** Dependency-free encoder for `tensorflow.Example` protos and TFRecord
  * framing — the reference pipeline's ACTUAL output format (one serialized
  * Example per co-occurrence shard, `shard-RRR-CCC.pb`), which SURVEY §2.1
  * had declared out of scope. The wire format is small enough to hand-roll
  * from the public protobuf spec (varints + length-delimited fields) and
  * the public `example.proto`/`feature.proto` schemas:
  *
  *   Example  { Features features = 1 }
  *   Features { map<string, Feature> feature = 1 }   // entry: key=1, value=2
  *   Feature  { oneof { BytesList=1, FloatList=2, Int64List=3 } }
  *   Int64List { repeated int64 value = 1 [packed] }
  *   FloatList { repeated float value = 1 [packed] }
  *
  * TfExampleSpec proves the layout two ways: golden bytes computed by hand
  * from the spec, and an independent mini-parser round-trip.
  */
object TfExample {

  private def varint(n: Long): Array[Byte] = {
    var v = n
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while ((v & ~0x7fL) != 0L) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    out += (v & 0x7f).toByte
    out.toArray
  }

  private def lenDelim(field: Int, payload: Array[Byte]): Array[Byte] =
    varint((field.toLong << 3) | 2L) ++ varint(payload.length.toLong) ++ payload

  /** Int64List message: packed varints (values here are non-negative ids
    * and counts, so no 10-byte two's-complement case arises). */
  def int64List(values: Seq[Long]): Array[Byte] =
    lenDelim(1, values.toArray.flatMap(varint))

  /** FloatList message: packed 4-byte little-endian IEEE754. */
  def floatList(values: Seq[Float]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * values.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(bb.putFloat)
    lenDelim(1, bb.array())
  }

  /** Feature carrying an Int64List (oneof field 3). */
  def int64Feature(values: Seq[Long]): Array[Byte] = lenDelim(3, int64List(values))

  /** Feature carrying a FloatList (oneof field 2). */
  def floatFeature(values: Seq[Float]): Array[Byte] = lenDelim(2, floatList(values))

  /** Serialized Example from (name, encoded Feature) pairs; map entries are
    * emitted in the given order (protobuf map order is unspecified — fixed
    * order here keeps output bytes deterministic). */
  def example(features: Seq[(String, Array[Byte])]): Array[Byte] = {
    val featuresMsg = features.toArray.flatMap { case (k, f) =>
      lenDelim(1, lenDelim(1, k.getBytes("UTF-8")) ++ lenDelim(2, f))
    }
    lenDelim(1, featuresMsg)
  }

  /** One TFRecord frame around a payload: length (8B LE) + masked CRC32C of
    * the length bytes + payload + masked CRC32C of the payload — for the
    * record-stream variant of the sink (the reference's per-shard files are
    * raw single-Example `.pb`, but TFRecord readers want this framing). */
  def tfRecordFrame(payload: Array[Byte]): Array[Byte] = {
    def crcMasked(b: Array[Byte]): Int = {
      val c = new java.util.zip.CRC32C
      c.update(b)
      val v = c.getValue.toInt
      ((v >>> 15) | (v << 17)) + 0xa282ead8
    }
    val lenB = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(payload.length.toLong).array()
    def le4(i: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    lenB ++ le4(crcMasked(lenB)) ++ payload ++ le4(crcMasked(payload))
  }

  /** Decode a serialized Example into name -> (int64 values, float values)
    * — the read half of the wire format, for consuming existing shard
    * files (the reference pipeline's own output) without any protobuf
    * dependency. Handles what canonical encoders legally emit: an empty
    * packed field may be OMITTED entirely (an Int64List/FloatList
    * submessage of zero length), and a repeated packed field may arrive
    * as MULTIPLE chunks — chunks are concatenated in order. Unknown or
    * bytes-typed features fail fast rather than being skipped: a swivel
    * shard file contains exactly int64/float lists.
    */
  def parseExample(bytes: Array[Byte]): Map[String, (Seq[Long], Seq[Float])] = {
    var pos = 0
    def varintAt(): Long = {
      var shift = 0; var v = 0L; var more = true
      while (more) {
        val x = bytes(pos); pos += 1
        v |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
      }
      v
    }
    def delim(): (Int, Int) = { val n = varintAt().toInt; val s = pos; pos += n; (s, s + n) }
    require(varintAt() == 0x0a, "not an Example: missing features tag")
    val (fs, fe) = delim()
    val out = scala.collection.mutable.LinkedHashMap.empty[String, (Seq[Long], Seq[Float])]
    pos = fs
    while (pos < fe) {
      require(varintAt() == 0x0a, "bad Features entry tag")
      val (entryStart, entryEnd) = delim()
      pos = entryStart // descend into the entry
      require(varintAt() == 0x0a, "bad map key tag")
      val (ks, ke) = delim()
      val key = new String(bytes.slice(ks, ke), "UTF-8")
      pos = ke
      require(varintAt() == 0x12, "bad map value tag")
      val (vs, ve) = delim()
      pos = vs
      // Feature message: iterate its fields (zero or one in practice; an
      // omitted empty list leaves the message EMPTY — vs == ve)
      val longs = scala.collection.mutable.ArrayBuffer.empty[Long]
      val floats = scala.collection.mutable.ArrayBuffer.empty[Float]
      while (pos < ve) {
        val kind = varintAt()
        val (ls, le) = delim()
        pos = ls // descend into the list message; may itself be empty
        while (pos < le) {
          require(varintAt() == 0x0a, "bad packed list tag")
          val (ps, pe) = delim() // one packed chunk; repeated chunks concat
          kind match {
            case 0x1a => // Int64List
              pos = ps
              while (pos < pe) longs += varintAt()
            case 0x12 => // FloatList
              val bb = java.nio.ByteBuffer.wrap(bytes, ps, pe - ps)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              (0 until (pe - ps) / 4).foreach(_ => floats += bb.getFloat)
            case k => throw new IllegalArgumentException(s"unexpected Feature kind $k")
          }
          pos = pe
        }
        pos = le
      }
      out(key) = (longs.toSeq, floats.toSeq)
      pos = entryEnd
    }
    out.toMap
  }

  /** BytesList feature (`Feature.bytes_list`, field 1): each value is its
    * own length-delimited entry (bytes are never packed). */
  def bytesFeature(values: Seq[Array[Byte]]): Array[Byte] =
    lenDelim(1, values.toArray.flatMap(v => lenDelim(1, v)))

  /** Decode a DOCUMENT Example — int64 + bytes features (the export
    * schema; float lists fail fast). Guarantees decoding of THIS
    * module's writer output only: unlike `parseExample`'s documented
    * tolerance, it rejects an omitted empty Features field and unpacked
    * int64 values (tag 0x08), both of which are legal in third-party
    * Examples. */
  def parseDocExample(bytes: Array[Byte]): Map[String, (Seq[Long], Seq[Array[Byte]])] = {
    var pos = 0
    def varintAt(): Long = {
      var shift = 0; var v = 0L; var more = true
      while (more) {
        val x = bytes(pos); pos += 1
        v |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
      }
      v
    }
    def delim(): (Int, Int) = { val n = varintAt().toInt; val s = pos; pos += n; (s, s + n) }
    require(varintAt() == 0x0a, "not an Example: missing features tag")
    val (fs, fe) = delim()
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, (Seq[Long], Seq[Array[Byte]])]
    pos = fs
    while (pos < fe) {
      require(varintAt() == 0x0a, "bad Features entry tag")
      val (entryStart, entryEnd) = delim()
      pos = entryStart
      require(varintAt() == 0x0a, "bad map key tag")
      val (ks, ke) = delim()
      val key = new String(bytes.slice(ks, ke), "UTF-8")
      pos = ke
      require(varintAt() == 0x12, "bad map value tag")
      val (vs, ve) = delim()
      pos = vs
      val longs = scala.collection.mutable.ArrayBuffer.empty[Long]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      while (pos < ve) {
        val kind = varintAt()
        val (ls, le) = delim()
        pos = ls
        kind match {
          case 0x1a => // Int64List: packed chunks under field-1 tags
            while (pos < le) {
              require(varintAt() == 0x0a, "bad packed list tag")
              val (ps, pe) = delim()
              pos = ps
              while (pos < pe) longs += varintAt()
              pos = pe
            }
          case 0x0a => // BytesList: one field-1 entry PER VALUE, never packed
            while (pos < le) {
              require(varintAt() == 0x0a, "bad bytes value tag")
              val (ps, pe) = delim()
              bs += bytes.slice(ps, pe)
              pos = pe
            }
          case k => throw new IllegalArgumentException(s"unexpected Feature kind $k")
        }
        pos = le
      }
      out(key) = (longs.toSeq, bs.toSeq)
      pos = entryEnd
    }
    out.toMap
  }

  /** Split a TFRecord stream into its framed payloads, verifying both
    * masked CRC32Cs per record (a corrupt length or payload fails fast —
    * silent truncation would undercount the corpus). */
  def tfRecordFrames(stream: Array[Byte]): Seq[Array[Byte]] = {
    def crcMasked(b: Array[Byte]): Int = {
      val c = new java.util.zip.CRC32C
      c.update(b)
      val v = c.getValue.toInt
      ((v >>> 15) | (v << 17)) + 0xa282ead8
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos < stream.length) {
      val lenB = stream.slice(pos, pos + 8)
      val len = java.nio.ByteBuffer.wrap(lenB)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
      val lenCrc = java.nio.ByteBuffer.wrap(stream, pos + 8, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      require(lenCrc == crcMasked(lenB), s"TFRecord length CRC mismatch at $pos")
      val payload = stream.slice(pos + 12, pos + 12 + len)
      val payCrc = java.nio.ByteBuffer.wrap(stream, pos + 12 + len, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      require(payCrc == crcMasked(payload), s"TFRecord payload CRC mismatch at $pos")
      out += payload
      pos += 12 + len + 4
    }
    out.toSeq
  }

  /** Shared executor-owned sharded-TFRecord sink (review finding: the
    * doc and emb writers were copy-pasted loops, so a staging fix would
    * have had to land in both). `rows` must carry the long `shard`
    * column at position 0 plus a per-shard sort key at position 1;
    * each shard is owned and written by the executor task that holds
    * it after the repartition (the writeSwivelPbShards discipline —
    * nothing corpus-sized on the driver), records stream through a
    * buffered sink one frame at a time (task heap holds one record,
    * not the shard), and shard bytes are deterministic because records
    * are (shard, key)-sorted. STALE `<prefix>-*.tfrecord` files are
    * deleted before writing: a rerun that lands fewer shards into the
    * same dir must not leave ghost files for the glob reader to gate
    * (review finding). */
  private def writeShardedTfRecords(rows: DataFrame, dir: String,
      prefix: String, mkExample: Row => Array[Byte]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith(prefix + "-") &&
        f.getName.endsWith(".tfrecord"))
      .foreach(f => java.nio.file.Files.delete(f.toPath))
    import rows.sparkSession.implicits._
    val sortKey = rows.columns(1)
    val written = rows
      .repartition(col("shard"))
      .sortWithinPartitions("shard", sortKey)
      .mapPartitions { it: Iterator[Row] =>
        val buf = it.buffered
        val shards = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (buf.hasNext) {
          val shard = buf.head.getLong(0)
          val out = new java.io.BufferedOutputStream(
            java.nio.file.Files.newOutputStream(
              java.nio.file.Paths.get(f"$dir/$prefix%s-$shard%03d.tfrecord")))
          try
            while (buf.hasNext && buf.head.getLong(0) == shard)
              out.write(tfRecordFrame(mkExample(buf.next())))
          finally out.close()
          shards += shard
        }
        shards.iterator
      }
      .collect() // shard-count-bounded
    val invisible = written.filterNot(s =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(f"$dir/$prefix%s-$s%03d.tfrecord")))
    require(invisible.isEmpty,
      s"executor-written TFRecord shards not visible to the driver: " +
        s"${invisible.mkString(",")} — shared filesystem required")
  }

  /** Document TFRecord export — the training-data handoff format (what a
    * TF/JAX input pipeline reads): one `docs-SSS.tfrecord` per shard,
    * each a stream of framed Examples {id: int64, text: bytes,
    * n_tokens: int64}. */
  def writeDocTfRecords(docs: DataFrame, dir: String): Unit =
    writeShardedTfRecords(
      docs.select(col("shard").cast("long"), col("doc_id").cast("long"),
        col("text"), col("n_tokens").cast("long")),
      dir, "docs",
      r => example(Seq(
        "id" -> int64Feature(Seq(r.getLong(1))),
        "n_tokens" -> int64Feature(Seq(r.getLong(3))),
        "text" -> bytesFeature(Seq(r.getString(2).getBytes("UTF-8"))))))

  /** Embedding TFRecord export — the FLOAT-wire sibling of
    * `writeDocTfRecords` (docs gate the int64+bytes families; this
    * gates packed float32 lists, the column a trainer's input pipeline
    * actually consumes): one `emb-SSS.tfrecord` per shard, each a
    * stream of framed Examples {id: int64, label: int64,
    * emb: float32[64]}. */
  def writeEmbTfRecords(emb: DataFrame, dir: String): Unit =
    writeShardedTfRecords(
      emb.select(col("shard").cast("long"), col("vec_id").cast("long"),
        col("label").cast("long"), col("embedding")),
      dir, "emb",
      r => example(Seq(
        "id" -> int64Feature(Seq(r.getLong(1))),
        "label" -> int64Feature(Seq(r.getLong(2))),
        "emb" -> floatFeature(r.getSeq[Float](3)))))

  /** Read embedding TFRecord shards back into (vec_id, label, embedding
    * float[]) — `parseExample` handles the int64 + packed-float wire. */
  def readEmbTfRecords(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "emb-*.tfrecord").load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { stream =>
        tfRecordFrames(stream).map { ex =>
          val f = parseExample(ex)
          (f("id")._1.head, f("label")._1.head, f("emb")._2)
        }
      }
      .toDF("vec_id", "label", "embedding")
  }

  /** Read document TFRecord shards back into (doc_id, text, n_tokens) —
    * one binaryFile scan, frames + Examples decoded by the reading task. */
  def readDocTfRecords(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "docs-*.tfrecord").load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { stream =>
        tfRecordFrames(stream).map { ex =>
          val f = parseDocExample(ex)
          (f("id")._1.head, new String(f("text")._2.head, "UTF-8"),
            f("n_tokens")._1.head)
        }
      }
      .toDF("doc_id", "text", "n_tokens")
  }

  /** Read `shard-RRR-CCC.pb` files back into the shard cell relation —
    * the migration path for corpora already prepared by the reference:
    * its output files become this engine's input. One Spark `binaryFile`
    * scan; each file is decoded by the task that reads it (files are
    * shard-sized by construction). `weight` comes back as FLOAT — the
    * format stores float32, so the reader is honest about the precision
    * the bytes carry.
    */
  def readSwivelPbShards(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val name = "shard-(\\d+)-(\\d+)\\.pb".r
    spark.read.format("binaryFile").option("pathGlobFilter", "shard-*.pb")
      .load(dir)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val base = path.substring(path.lastIndexOf('/') + 1)
        val m = name.findFirstMatchIn(base).getOrElse(
          throw new IllegalArgumentException(s"not a shard file: $base"))
        val (r, c) = (m.group(1).toLong, m.group(2).toLong)
        val f = parseExample(bytes)
        val gRows = f("global_row")._1
        val gCols = f("global_col")._1
        val lr = f("sparse_local_row")._1
        val lc = f("sparse_local_col")._1
        val w = f("sparse_value")._2
        lr.indices.map { i =>
          (r, c, lr(i), lc(i), gRows(lr(i).toInt), gCols(lc(i).toInt), w(i))
        }
      }
      .toDF("row_shard", "col_shard", "local_row", "local_col",
        "global_row", "global_col", "weight")
  }

  /** Write the sharded co-occurrence matrix in the reference's own output
    * format: one `shard-RRR-CCC.pb` file per (row_shard, col_shard), each a
    * serialized Example with the shard's row/col id lists and its nonzero
    * cells in (local_row, local_col) order —
    *   global_row / global_col : Int64List, ids k*numShards + shardIdx
    *   sparse_local_row/col    : Int64List, one entry per nonzero cell
    *   sparse_value            : FloatList, the cell weights
    * Each shard is encoded by the one executor task that owns it after the
    * repartition (the same co-location `writeShards` uses), so nothing
    * shard-sized ever sits on the driver. Paths are written through
    * java.nio for the local/shared-fs case; a cluster deployment routes the
    * same bytes through the Hadoop FileSystem API instead.
    */
  def writeSwivelPbShards(shards: DataFrame, numShards: Int, vocabSize: Int,
      dir: String): Unit = {
    require(numShards > 0 && vocabSize % numShards == 0,
      s"vocabSize $vocabSize must be a multiple of numShards $numShards")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    import shards.sparkSession.implicits._
    // Executor tasks write and REPORT the (row_shard, col_shard) pairs they
    // owned; the driver then requires every reported file to be visible
    // before backfilling holes. On a deployment without a filesystem shared
    // between executors and driver, the reported shards are missing from
    // the driver's view and this THROWS — previously the backfill would
    // silently replace every executor-written shard with an empty
    // stripes-only file, a complete-looking but cell-less output grid.
    val written = shards
      .select(col("row_shard").cast("long"), col("col_shard").cast("long"),
        col("local_row").cast("long"), col("local_col").cast("long"),
        col("weight").cast("double"))
      .repartition(col("row_shard"), col("col_shard"))
      .sortWithinPartitions("row_shard", "col_shard", "local_row", "local_col")
      .mapPartitions { it: Iterator[Row] =>
        val rowsPerShard = vocabSize / numShards
        // consecutive rows share a shard after the sort — group streaming
        val grouped = new Iterator[(Long, Long, Seq[Row])] {
          val buf = it.buffered
          def hasNext = buf.hasNext
          def next() = {
            val head = buf.head
            val (r, c) = (head.getLong(0), head.getLong(1))
            val cells = scala.collection.mutable.ArrayBuffer.empty[Row]
            while (buf.hasNext && buf.head.getLong(0) == r && buf.head.getLong(1) == c)
              cells += buf.next()
            (r, c, cells.toSeq)
          }
        }
        grouped.map { case (r, c, cells) =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"$dir/shard-$r%03d-$c%03d.pb"),
            shardExample(r, c, numShards, rowsPerShard, cells))
          (r, c)
        }
      }
      .collect() // numShards²-bounded
    val invisible = written.filterNot { case (r, c) =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(f"$dir/shard-$r%03d-$c%03d.pb"))
    }
    if (invisible.nonEmpty)
      throw new IllegalStateException(
        s"writeSwivelPbShards: ${invisible.length} executor-written shard file(s) are not " +
          f"visible to the driver (e.g. shard-${invisible.head._1}%03d-${invisible.head._2}%03d) — " +
          "dir is not on a filesystem shared between executors and driver; deploy with a " +
          "shared mount or route writes through the Hadoop FileSystem API")
    // the reference layout contains ALL numShards² files — a shard with
    // zero nonzero cells still carries its global id stripes. Such pairs
    // never appear in the shards DataFrame, so backfill them here (each
    // missing file is a few hundred bytes; the loop touches only the
    // holes, usually none on a dense co-occurrence matrix)
    val rowsPerShard = vocabSize / numShards
    for (r <- 0L until numShards; c <- 0L until numShards) {
      val p = java.nio.file.Paths.get(f"$dir/shard-$r%03d-$c%03d.pb")
      if (!java.nio.file.Files.exists(p))
        java.nio.file.Files.write(p, shardExample(r, c, numShards, rowsPerShard, Nil))
    }
  }

  /** One shard's Example: global id stripes + the (possibly empty)
    * sparse cell lists in (local_row, local_col) order. */
  private def shardExample(r: Long, c: Long, numShards: Int,
      rowsPerShard: Int, cells: Seq[Row]): Array[Byte] =
    example(Seq(
      "global_row" -> int64Feature((0 until rowsPerShard).map(k => k.toLong * numShards + r)),
      "global_col" -> int64Feature((0 until rowsPerShard).map(k => k.toLong * numShards + c)),
      "sparse_local_row" -> int64Feature(cells.map(_.getLong(2))),
      "sparse_local_col" -> int64Feature(cells.map(_.getLong(3))),
      "sparse_value" -> floatFeature(cells.map(_.getDouble(4).toFloat))))
}
