package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.{SparkSpec, Tables}

object StreamDedupSpec {
  // JVM-static so foreachBatch task closures can reach it after restart
  val pairs: scala.collection.mutable.ListBuffer[(Long, Long)] =
    scala.collection.mutable.ListBuffer()
}

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[(Long, String)]], cap: Int = StreamDedup.DefaultCap,
      name: String = s"sd_${System.nanoTime()}"): Set[(Long, Long)] = {
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamDedup.candidatePairs(input.toDS(), cap)
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).select(col("aId"), col("bId")).distinct()
        .as[(Long, Long)].collect().toSet
    } finally q.stop()
  }

  test("identical docs collide across micro-batches; unrelated docs don't") {
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different content with no shared shingles at all here"
    val pairs = runStream(Seq(
      Seq(1L -> dup, 2L -> other),
      Seq(3L -> dup), // arrives a batch later — state must remember doc 1
      Seq(4L -> "unrelated text that matches nothing else in this stream ok")))
    assert(pairs.contains((1L, 3L)), s"cross-batch near-dup must be found: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), s"doc 2 is unique: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"doc 4 is unique: $pairs")
  }

  test("bucket cap stops admission instead of going quadratic") {
    val dup = "same same text here repeated across every single streamed document yes"
    val docs = (1L to 6L).map(_ -> dup)
    val pairs = runStream(Seq(docs), cap = 3)
    // only the first 3 docs per bucket admit: pairs among {1,2,3} only
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
  }

  test("streaming band keys equal the batch SQL lanes on real documents") {
    // the batch signature pipeline (DedupOpsImpl.minhashSignatures) on
    // sf0.001 vs the pure-Scala mirror used by the stream
    val batch = graft.ops.DedupOpsImpl.minhashSignatures(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> (1 to 8).map(i => r.getString(i)).toSeq).toMap
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.foreach { case (id, text) =>
      val bands = StreamDedup.bandKeys(id, text)
      batch.get(id) match {
        case None => assert(bands.isEmpty, s"doc $id has no batch signature but stream bands")
        case Some(lanes) =>
          assert(bands.size == StreamDedup.Bands)
          bands.foreach { db =>
            assert(db.bh == md5hex(lanes(2 * db.band) + lanes(2 * db.band + 1)),
              s"band key mismatch for doc $id band ${db.band}")
          }
      }
    }
  }

  test("event-time TTL: in-window dups pair, buckets expire, no pairs across the window") {
    import java.sql.Timestamp
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val filler1 = "completely unrelated filler content that advances the watermark forward"
    val filler2 = "another block of unrelated text to trigger the pending bucket timeout"
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val name = s"sdw_${System.nanoTime()}"
    val q = StreamDedup.candidatePairsWindowed(input.toDS(), dedupWindowMs = 5000)
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName(name).start()
    try {
      def pairs(): Set[(Long, Long)] =
        spark.table(name).select(col("aId"), col("bId")).distinct()
          .as[(Long, Long)].collect().toSet
      // batch 1: doc 1 and an in-window dup doc 2 (1s apart, window 5s)
      input.addData((1L, dup, new Timestamp(1000L)), (2L, dup, new Timestamp(2000L)))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L)), s"in-window dup must pair: ${pairs()}")
      // batch 2 advances the watermark far past 2s + 5s; batch 3 gives the
      // engine a trigger with NO data for the dup bucket, so its timeout
      // fires and the bucket is removed
      input.addData((3L, filler1, new Timestamp(100000L)))
      q.processAllAvailable()
      input.addData((4L, filler2, new Timestamp(101000L)))
      q.processAllAvailable()
      // batch 4: a dup arriving after the window must NOT pair with 1 or 2
      input.addData((5L, dup, new Timestamp(102000L)))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L)),
        s"bucket must have expired — no pairs across the window boundary: ${pairs()}")
      // but the re-opened bucket pairs within the NEW window
      input.addData((6L, dup, new Timestamp(103000L)))
      q.processAllAvailable()
      assert(pairs() == Set((1L, 2L), (5L, 6L)),
        s"re-opened bucket must pair within the new window: ${pairs()}")
    } finally q.stop()
  }

  test("embedding sign-LSH stream: cross-batch near-dups pair, opposite vectors don't") {
    val base = Array.tabulate(64)(i => (math.sin(i + 1) * 0.5).toFloat)
    val near = base.clone(); near(0) = base(0) + 1e-6f // same signature
    val opposite = base.map(v => -v) // every signature bit flips => no band collides
    val input = MemoryStream[(Long, Array[Float])](spark)
    val name = s"sde_${System.nanoTime()}"
    val q = StreamDedup.candidatePairsEmbedding(input.toDS())
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName(name).start()
    try {
      input.addData(1L -> base, 2L -> opposite)
      q.processAllAvailable()
      input.addData(3L -> near) // a batch later: state must remember vec 1
      q.processAllAvailable()
      val pairs = spark.table(name).select(col("aId"), col("bId")).distinct()
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 3L)), s"cross-batch embedding near-dup must be found: $pairs")
      assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), s"opposite vector is unique: $pairs")
    } finally q.stop()
  }

  test("streaming embed band keys equal the batch sign-LSH banding on real vectors") {
    val dir = "/root/testdata/sf0.001"
    val batchSig = graft.ops.VectorOpsImpl.lshBuckets(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    vecs.foreach { case (id, emb) =>
      val bands = StreamDedup.embedBandKeys(id, emb)
      val sig = batchSig(id)
      bands.foreach { db =>
        val expected = (sig >> (db.band * graft.ops.VectorOpsImpl.NearDupBandBits)) &
          ((1L << graft.ops.VectorOpsImpl.NearDupBandBits) - 1)
        assert(db.bh == expected.toString, s"band mismatch vec $id band ${db.band}")
      }
    }
  }

  test("verifyExact on streamed candidates agrees with the batch Jaccard operator") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val streamed = runStream(Seq(
      docs.as[(Long, String)].collect().toSeq.sortBy(_._1)))
    val cand = streamed.toSeq.toDF("aId", "bId")
    val verified = StreamDedup.verifyExact(cand, docs)
      .select(col("aId"), col("bId")).as[(Long, Long)].collect().toSet
    // differential check: recompute full-shingle Jaccard in plain Scala
    val texts = docs.as[(Long, String)].collect().toMap
    def shingleSet(t: String): Set[String] =
      t.split(" ", -1).toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val expected = streamed.filter { case (a, b) =>
      val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
      val inter = (sa & sb).size
      inter.toDouble / (sa.size + sb.size - inter) >= 0.5
    }
    assert(verified.nonEmpty, "expected some verified near-dups at sf0.001")
    assert(verified == expected,
      s"SQL verify must equal the Scala recomputation: extra=${verified -- expected} missing=${expected -- verified}")
  }

  test("restart from checkpoint keeps bucket state (no duplicate-free re-pairing)") {
    val ckpt = java.nio.file.Files.createTempDirectory("sdckpt").toString
    val dup = "persistent state must survive a full stop and restart of the query"
    val input = MemoryStream[(Long, String)](spark)
    // the memory sink can't recover from a checkpoint — collect via
    // foreachBatch into a JVM-static buffer instead (LocalStore pattern)
    StreamDedupSpec.pairs.clear()
    def start() = StreamDedup.candidatePairs(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamDedup.CandidatePair], _: Long) =>
        val rows = batch.collect()
        StreamDedupSpec.pairs.synchronized {
          StreamDedupSpec.pairs ++= rows.map(p => (p.aId, p.bId))
        }
        ()
      }.start()
    val q1 = start()
    input.addData(10L -> dup)
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    try {
      input.addData(11L -> dup)
      q2.processAllAvailable()
      val got = StreamDedupSpec.pairs.synchronized(StreamDedupSpec.pairs.toSet)
      assert(got.contains((10L, 11L)),
        s"doc 10 was seen before the restart and must still pair: $got")
    } finally q2.stop()
  }
}
