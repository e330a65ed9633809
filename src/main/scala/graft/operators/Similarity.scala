package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (embedding: array<float>, 64-dim).
  *
  * Scale design:
  *  - the query set is small and *broadcast*; the corpus side is never
  *    shuffled for the brute-force scan — each partition scores its
  *    vectors locally and only top-k survivors leave the executor
  *    (window + filter collapses to a partial top-k under AQE);
  *  - the LSH variant buckets the corpus by sign-bit hyperplane codes
  *    (deterministic planes), turning the scan into a bucket-equi-join:
  *    at 100 TB the corpus is read once, bucketed, and each query only
  *    touches its bucket — the IVF pattern without a trained codebook.
  *  - dot products run as codegen'd higher-order functions in double
  *    precision (bit-identical to the DuckDB oracle's sequential sum).
  */
object Similarity {

  private val Dim = 64
  private val NumQueries = 10 // vec_id < 10 are the query vectors
  private val TopK = 5
  private val NumPlanes = 8

  /** Deterministic pseudo-random hyperplanes (seed fixed so Spark and
    * any re-run agree); values in [-1, 1). */
  private lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Seq.fill(Dim)(rnd.nextDouble() * 2 - 1))
  }

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** embedding cast to double + precomputed L2 norm. */
  private def normed(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ve"))
      .withColumn("nrm",
        sqrt(expr("aggregate(ve, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)")))

  private val dotExpr =
    expr("aggregate(zip_with(qve, ve, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  private def topKPerQuery(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= TopK)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** Sign-bit LSH bucket code for a double-array embedding column. */
  private def bucketCode(ve: Column): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val dot = p.zipWithIndex
        .map { case (wgt, d) => ve.getItem(d) * lit(wgt) }
        .reduce(_ + _)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_knn_brute" -> ((s, dir) => {
      // exact top-k cosine: corpus scanned once, queries broadcast
      val n = normed(emb(s, dir))
      val q = broadcast(
        n.where(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("ve").as("qve"), col("nrm").as("qnrm")))
      val scored = n.join(q, col("vec_id") =!= col("query_id"))
        .withColumn("cosine", dotExpr / (col("qnrm") * col("nrm")))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      topKPerQuery(scored)
    }),

    "q37_knn_lsh" -> ((s, dir) => {
      // ANN: only same-bucket candidates are scored. Approximate —
      // recall < 1 by design. No oracle → rows-only check.
      val n = normed(emb(s, dir)).withColumn("bucket", bucketCode(col("ve")))
      val q = broadcast(
        n.where(col("vec_id") < NumQueries)
          .select(col("vec_id").as("query_id"), col("ve").as("qve"),
                  col("nrm").as("qnrm"), col("bucket")))
      val scored = n.join(q, Seq("bucket"))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("cosine", dotExpr / (col("qnrm") * col("nrm")))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      topKPerQuery(scored)
    }),

    "q38_embed_stats" -> ((s, dir) =>
      // per-label corpus stats: count + centroid norm proxy
      normed(emb(s, dir))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
             round(avg(col("nrm")), 4).as("avg_norm"),
             round(min(col("nrm")), 6).as("min_norm"),
             round(max(col("nrm")), 6).as("max_norm")))
  )

  val oracleSql: Map[String, String] = Map(
    "q36_knn_brute" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, ve,
        |    sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm FROM v),
        |scored AS (
        |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
        |    list_dot_product(q.ve, d.ve) / (q.nrm * d.nrm) AS cosine
        |  FROM n q, n d
        |  WHERE q.vec_id < 10 AND d.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cosine DESC, neighbor_id ASC) AS rn
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cosine, 4) AS cosine
        |FROM ranked WHERE rn <= 5""".stripMargin,

    "q38_embed_stats" ->
      """WITH n AS (
        |  SELECT label,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs,
        |  round(avg(nrm), 4) AS avg_norm,
        |  round(min(nrm), 6) AS min_norm,
        |  round(max(nrm), 6) AS max_norm
        |FROM n GROUP BY label""".stripMargin
  )
}
