package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Similarity
import graft.sources.Tables

/** E-family bindings. knn_bruteforce is oracle-checked; knn_lsh has
  * no SQL oracle (hyperplane construction) and is spec-checked for
  * bucket soundness and exact scoring instead.
  */
object SimilarityRegistry {

  val ProbeMod = 50
  val K = 10

  private val Dot =
    "list_reduce(list_transform(list_zip(p.pv, e.v), q -> q[1] * q[2]), (acc, x) -> acc + x)"
  private def nrm(expr: String) =
    s"sqrt(list_reduce(list_transform($expr, x -> x * x), (acc, x) -> acc + x))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_bruteforce" -> ((s, d) =>
      Similarity.knnBruteForce(Tables.embeddings(s, d), ProbeMod, K)),
    "knn_lsh" -> ((s, d) =>
      Similarity.knnLsh(Tables.embeddings(s, d), ProbeMod, K)),
    "knn_ivf" -> ((s, d) =>
      Similarity.knnIvf(Tables.embeddings(s, d), ProbeMod, K)),
    // k-means-refined codebook (3 Lloyd's iterations); like knn_ivf,
    // no SQL oracle — ApproxAndIvfSpec checks exact scores, bounds,
    // determinism and that training actually moved the centroids.
    "knn_ivf_trained" -> ((s, d) =>
      Similarity.knnIvfTrained(Tables.embeddings(s, d), ProbeMod, K)),
  )

  def oracleSql: Map[String, String] = Map(
    "knn_bruteforce" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), p AS (
         |  SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id % $ProbeMod = 0
         |), scored AS (
         |  SELECT p.probe_id, e.vec_id AS neighbor_id,
         |    $Dot / (${nrm("p.pv")} * ${nrm("e.v")}) AS cos_sim
         |  FROM p JOIN e ON e.vec_id <> p.probe_id
         |), ranked AS (
         |  SELECT probe_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
         |  FROM scored
         |)
         |SELECT probe_id, neighbor_id, cos_sim, rnk
         |FROM ranked WHERE rnk <= $K""".stripMargin,
  )
}
