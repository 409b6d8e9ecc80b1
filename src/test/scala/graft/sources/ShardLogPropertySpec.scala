package graft.sources

import java.nio.file.{Files, StandardOpenOption}

import scala.util.Random

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the one piece of hand-rolled distributed bookkeeping
  * in the repo: the shard-log source's per-shard offset arithmetic
  * (latestOffset budget allocation, planInputPartitions ranges, offset
  * JSON round-trip). Randomized schedules of appends, budget-limited
  * advances and restarts must deliver every appended record EXACTLY once
  * per shard, in sequence order — the generalization of the example-based
  * ShardLogSourceSpec cases. */
class ShardLogPropertySpec extends AnyFunSuite {

  private def appendRecords(dir: java.nio.file.Path, shard: String,
      seqs: Seq[Long]): Unit = {
    val lines = seqs.map(n =>
      s"""{"sequenceNumber":"${"%020d".format(n)}","arrivalTimestamp":$n,"origin":"USER","image":"{}","oldImage":null}""")
    Files.write(dir.resolve(s"$shard.jsonl"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  test("exactly-once per-shard delivery over random append/advance/restart schedules") {
    val rnd = new Random(42)
    (1 to 60).foreach { round =>
      val dir = Files.createTempDirectory("shardprop")
      val shards = (0 until 1 + rnd.nextInt(4)).map(i => s"s$i")
      val nextSeq = scala.collection.mutable.Map(shards.map(_ -> 0L): _*)
      val delivered = scala.collection.mutable.Map(shards.map(_ -> Vector.empty[String]): _*)
      var stream = new ShardLogMicroBatchStream(dir.toString, None)
      var current = stream.initialOffset().asInstanceOf[ShardLogOffset]

      def advance(limit: ReadLimit): Long = {
        val end = stream.latestOffset(current, limit).asInstanceOf[ShardLogOffset]
        val parts = stream.planInputPartitions(current, end)
        val factory = stream.createReaderFactory()
        var n = 0L
        parts.foreach { p =>
          val r = factory.createReader(p)
          try while (r.next()) {
            val row = r.get()
            val sh = row.getUTF8String(0).toString
            delivered(sh) = delivered(sh) :+ row.getUTF8String(1).toString
            n += 1
          } finally r.close()
        }
        current = end
        n
      }

      (1 to 14).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 | 1 => // append 1-7 records to a random shard
            val sh = shards(rnd.nextInt(shards.size))
            val seqs = (0 until 1 + rnd.nextInt(7)).map { _ =>
              val v = nextSeq(sh); nextSeq(sh) = v + 1; v
            }
            appendRecords(dir, sh, seqs)
          case 2 => // advance one micro-batch under a random admission budget
            val budget = 1 + rnd.nextInt(9)
            val got = advance(ReadLimit.maxRows(budget.toLong))
            assert(got <= budget, s"round $round: admission budget violated ($got > $budget)")
          case _ => // kill + restart: offset survives the JSON round-trip
            val json = current.json()
            stream = new ShardLogMicroBatchStream(dir.toString, None)
            current = stream.deserializeOffset(json).asInstanceOf[ShardLogOffset]
        }
      }
      advance(ReadLimit.allAvailable()) // final drain

      shards.foreach { sh =>
        val expected = (0L until nextSeq(sh)).map(n => "%020d".format(n))
        assert(delivered(sh) == expected,
          s"round $round shard $sh: delivered ${delivered(sh).size} of ${expected.size} " +
            s"(dups=${delivered(sh).size - delivered(sh).distinct.size})")
      }
    }
  }
}
