package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Q, Tables}

/** SOURCE-AFFINITY matrix (q177) — pairwise cosine between per-source
  * embedding centroids: the semantic-redundancy map a mixture designer
  * reads next to the q171 duplication matrix (which counts literal
  * near-dup pairs; this measures distributional overlap even when no
  * document is shared) and the q176 χ² vocabulary (the lexical view of
  * the same question). Two sources with affinity ≈ 1 are interchangeable
  * mass in a mixture; a source orthogonal to all others is irreplaceable.
  *
  * Determinism: centroids use the repo's quantized-mean accumulation
  * (floor-1e12 DECIMAL(38,0) sums — order-independent, overflow-safe,
  * correctly-rounded back to double), and the 64-term dot/norm sums are
  * generated as the SAME left-associated chain in both engines, so every
  * double op sequence is identical (the q43 discipline); sqrt is IEEE.
  *
  * Scale shape: one embeddings⋈documents join shuffles on vec_id (both
  * sides pre-keyed; at 100 TB this is the one corpus-sized move and is
  * co-partitionable by bucketing both tables on the id), then a
  * map-side-combined per-source reduce to sources × (64+1) cells; the
  * pairwise matrix is sources² rows of pure arithmetic on a BROADCAST
  * frame — no second corpus pass, no cartesian on data. */
object AffinityOpsImpl {

  import VectorOpsImpl.Dims

  private def centroids(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
    val aggs = count(lit(1)).as("n") +: (1 to Dims).map(i =>
      (expr(VectorOpsImpl.sparkCentComp(i)) / count(lit(1))).as(s"c$i"))
    e.join(d, e("vec_id") === d("doc_id"))
      .groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
  }

  def sourceAffinity(s: SparkSession, dir: String): DataFrame = {
    val cent = centroids(s, dir)
    def side(tag: String) = cent.select(
      col("source").as(s"${tag}_source") +: col("n").as(s"${tag}_n") +:
        (1 to Dims).map(i => col(s"c$i").as(s"${tag}_c$i")): _*)
    val dot = (1 to Dims).map(i => col(s"a_c$i") * col(s"b_c$i")).reduce(_ + _)
    val na = (1 to Dims).map(i => col(s"a_c$i") * col(s"a_c$i")).reduce(_ + _)
    val nb = (1 to Dims).map(i => col(s"b_c$i") * col(s"b_c$i")).reduce(_ + _)
    side("a").crossJoin(broadcast(side("b")))
      .filter(col("a_source") < col("b_source"))
      .select(col("a_source").as("source_a"), col("b_source").as("source_b"),
        col("a_n").cast(LongType).as("n_a"), col("b_n").cast(LongType).as("n_b"),
        (dot / (sqrt(na) * sqrt(nb))).as("affinity"))
      .orderBy(col("source_a"), col("source_b"))
  }

  private lazy val q177Sql: String = {
    val comps = (1 to Dims).map(i =>
      s"${VectorOpsImpl.duckCentComp(i)} / COUNT(*) AS c$i").mkString(",\n    ")
    def chain(f: Int => String) = (1 to Dims).map(f).mkString(" + ")
    val dot = chain(i => s"a.c$i * b.c$i")
    val na = chain(i => s"a.c$i * a.c$i")
    val nb = chain(i => s"b.c$i * b.c$i")
    s"""WITH cent AS MATERIALIZED (
       |  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n,
       |    $comps
       |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
       |  GROUP BY d.source)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  a.n AS n_a, b.n AS n_b,
       |  ($dot) / (sqrt($na) * sqrt($nb)) AS affinity
       |FROM cent a JOIN cent b ON a.source < b.source
       |ORDER BY source_a, source_b""".stripMargin
  }

  lazy val queries: Seq[Q] = Seq(
    Q("q177_source_affinity", sourceAffinity, Some(q177Sql), headline = true))
}

object AffinityOps {
  lazy val queries: Seq[Q] = AffinityOpsImpl.queries
}
