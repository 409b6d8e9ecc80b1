package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.cdc.CdcSynth

/** TWO-TABLE JOIN IVM: a materialized join view over two INDEPENDENTLY
  * changing versioned tables, maintained from their change feeds alone —
  * the missing piece between q186/q214 (index and aggregate views over ONE
  * feed) and a real pipeline's enrichment views, where both sides churn.
  *
  * For keyed (at-most-one-row-per-key) sides, the exact incremental form
  * is DELTA-SCOPED RECOMPUTE: the keys whose join row can change between
  * (A:v1, B:v1) and (A:v2, B:v2) are exactly `keys(ΔA) ∪ keys(ΔB)`, so
  *
  *   J2 = (J1 minus touched keys) ∪ (A2 ⋈ B2 restricted to touched keys)
  *
  * where the restricted join reads ONLY the touched keys' buckets from
  * each side ([[VersionedTableImpl.readBuckets]] — the bucket-pruned,
  * O(touched) read the commit path itself uses). No general delta-join
  * algebra (ΔA⋈B + A⋈ΔB − ΔA⋈ΔB) is needed because keyed sides make the
  * join 1:1; the general form's double-counting corrections exist to
  * handle multiplicity this schema rules out.
  *
  * Cost at 100 TB: feeds are churn-sized; the touched-key recompute reads
  * O(touched buckets) from each table; J1 carries forward minus an
  * anti-join on a broadcastable touched-key set. Nothing scans a full
  * table. The q219 gate proves the maintained view hash-equals DuckDB's
  * one-shot recompute of A2 ⋈ B2 from the raw log.
  *
  * The two tables here: the events CDC log split by event_id parity —
  * most users have events on both sides, so the join overlaps heavily and
  * both tables change between versions (each commits its own first-half /
  * second-half split).
  */
object JoinIvmImpl {

  import VersionedTableImpl.{commitMerge, readVersion, readBuckets, emitFeed, feedPath}

  private val NB = 8

  private val roots = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, String)]()
  private val j1Cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  def clearCaches(): Unit = { Memo.clear(j1Cache); roots.clear() }

  /** Two versioned tables (even / odd event_id), two commits each, change
    * data files EMITTED at commit time (the streaming sink's discipline —
    * in production the feed artifact exists before any view consumes it).
    * Bench-attributed as `index:lake_ivm_pair` so q219 times the
    * maintained join, not this shared setup. */
  private[graft] def ensureTables(s: SparkSession, dir: String): (String, String) =
    Memo.getOrCacheAny(roots, s, dir, { _ =>
      val env = CdcSynth.fromEvents(s, dir)
      val mid = Tables(s, dir, "events")
        .agg(expr("max(event_id) div 2").as("mid"))
      val withMid = env.crossJoin(broadcast(mid))
      def build(parity: Long): String = {
        val root = java.nio.file.Files.createTempDirectory(s"graft_jivm$parity").toString
        val side = withMid.filter(pmod(col("event_id"), lit(2L)) === parity)
        val v1 = commitMerge(s, root, side.filter(col("event_id") < col("mid")), NB)
        val v2 = commitMerge(s, root, side.filter(col("event_id") >= col("mid")), NB)
        require(v1 == 1 && v2 == 2, s"two commits expected: $v1, $v2")
        emitFeed(s, root, 2, 0L until NB.toLong) // churn-sized delta artifact
        root
      }
      (build(0L), build(1L))
    })

  /** J1 — the maintained view's PRIOR state. In production this is the
    * materialized view itself (it exists; maintenance updates it); here
    * it is built once and memoized so q219 measures the INCREMENT, not a
    * from-scratch join of both v1 states. */
  private[graft] def ensureJ1(s: SparkSession, dir: String): DataFrame = {
    val (rootA, rootB) = ensureTables(s, dir)
    Memo.getOrCache(j1Cache, s, dir, _ =>
      joinOf(readVersion(s, rootA, 1), readVersion(s, rootB, 1)).cache())
  }

  private def joinOf(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("user_id"), col("last_seq").as("a_seq"),
        col("event_type").as("a_event_type"), col("value").as("a_value"))
      .join(b.select(col("user_id"), col("last_seq").as("b_seq"),
        col("event_type").as("b_event_type"), col("value").as("b_value")),
        Seq("user_id"))

  /** q219: J2 maintained as J1 + delta-scoped recompute. The touched-key
    * set comes from the tables' EMITTED change data files (churn-sized
    * parquet — what a production consumer reads; never a re-diff of two
    * full states), the recompute reads only the touched keys' buckets,
    * and J1 is the existing materialized view. Nothing scans a full v2
    * state. */
  def maintainedJoin(s: SparkSession, dir: String): DataFrame = {
    val (rootA, rootB) = ensureTables(s, dir)
    val j1 = ensureJ1(s, dir)
    // churn-sized: the keys either side's v1→v2 feed artifact mentions
    val touchedKeys = s.read.parquet(feedPath(rootA, 2).toString)
      .select(col("user_id"))
      .unionByName(s.read.parquet(feedPath(rootB, 2).toString)
        .select(col("user_id")))
      .distinct()
    // bucket list stays metadata-sized (≤ NB rows collected); the keys
    // themselves never pass through the driver — the restriction below is
    // a broadcast semi-join, so a million-key churn still plans smallly
    val buckets = touchedKeys
      .select(pmod(col("user_id"), lit(NB.toLong)).as("b")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    def touchedState(root: String) =
      readBuckets(s, root, 2, buckets, LakehouseOpsImpl.tableSchema)
        .join(broadcast(touchedKeys), Seq("user_id"), "left_semi")
        .filter(!col("last_op").isin(LakehouseOpsImpl.DeleteOps: _*))
    val recomputed = joinOf(touchedState(rootA), touchedState(rootB))
    j1.join(broadcast(touchedKeys), Seq("user_id"), "left_anti")
      .unionByName(recomputed)
      .orderBy(col("user_id"))
  }

  private[ops] lazy val q219Sql: String =
    s"""WITH ${CdcSynth.synthSql},
       |a AS (
       |  SELECT COALESCE(new_user_id, old_user_id) AS user_id,
       |    max(seq) AS a_seq, max_by(has_new, seq) AS has_new,
       |    max_by(new_event_type, seq) AS a_event_type,
       |    max_by(new_value, seq) AS a_value
       |  FROM cdc WHERE event_id % 2 = 0 GROUP BY 1),
       |b AS (
       |  SELECT COALESCE(new_user_id, old_user_id) AS user_id,
       |    max(seq) AS b_seq, max_by(has_new, seq) AS has_new,
       |    max_by(new_event_type, seq) AS b_event_type,
       |    max_by(new_value, seq) AS b_value
       |  FROM cdc WHERE event_id % 2 = 1 GROUP BY 1)
       |SELECT a.user_id, a_seq, a_event_type, a_value,
       |       b_seq, b_event_type, b_value
       |FROM a JOIN b ON a.user_id = b.user_id
       |WHERE a.has_new AND b.has_new
       |ORDER BY a.user_id""".stripMargin
}

object JoinIvmOps {
  def queries: Seq[Q] = Seq(
    Q("q219_ivm_join", JoinIvmImpl.maintainedJoin, Some(JoinIvmImpl.q219Sql)))
}
