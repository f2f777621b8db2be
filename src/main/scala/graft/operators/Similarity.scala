package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** E-family: nearest-neighbor search over an embedding column.
  *
  * Brute force is the correctness baseline: broadcast the (small)
  * probe set, one distributed pass over the vectors computing cosine,
  * per-probe top-k via a rank window — at 1000 executors that is a
  * full scan per batch of probes, which is exactly what exact k-NN
  * costs. The LSH variant is the scale path: random-hyperplane
  * buckets shrink each probe's comparison set to its bucket, making
  * the per-probe cost sub-linear at the price of recall.
  */
object Similarity {

  /** Exact top-k cosine neighbors for every probe vector (probe set =
    * `probePred` rows, broadcast). Deterministic rank: cosine desc,
    * then neighbor id. */
  def knnBruteForce(embeddings: DataFrame, probeMod: Int, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding").as("v"))
    val probes = e.filter(col("vec_id") % probeMod === 0)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    broadcast(probes).join(e, col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        Vec.cosine(col("pv"), col("v")).as("cos_sim"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
      .filter(col("rnk") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: a tiny splitmix-style
    * integer mix over (plane, dim) — no RNG state, same planes on
    * every executor, run, and engine. Components in [-1, 1). */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, j) =>
      var z = p.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      z.toDouble / 9.223372036854776e18
    }

  /** ANN via IVF (inverted-file) coarse quantization: a deterministic
    * codebook (every `centroidMod`-th vector), each vector assigned to
    * its nearest centroid cell, probes search their `nProbe` nearest
    * cells only. The index is one small broadcast table + a cell id
    * per vector; per-probe work is bounded by cell occupancy. Recall
    * trades against nProbe; scores of returned pairs are exact. */
  def knnIvf(embeddings: DataFrame, probeMod: Int, k: Int,
             centroidMod: Int = 37, nProbe: Int = 2): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding").as("v"))
    val cents = e.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    // nearest-cell assignment: argmax cosine over the broadcast codebook
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid").asc)
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cid"),
        Vec.cosine(col("v"), col("cv")).as("ccos"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("v"), col("cid").as("cell"))
    // probes search their nProbe nearest cells
    val wProbe = Window.partitionBy(col("probe_id"))
      .orderBy(col("ccos").desc, col("cid").asc)
    val probeCells = e.filter(col("vec_id") % probeMod === 0)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      .crossJoin(broadcast(cents))
      .select(col("probe_id"), col("pv"), col("cid"),
        Vec.cosine(col("pv"), col("cv")).as("ccos"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("probe_id"), col("pv"), col("cid").as("pcell"))
    broadcast(probeCells).join(assigned,
        col("cell") === col("pcell") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        Vec.cosine(col("pv"), col("v")).as("cos_sim"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
      .filter(col("rnk") <= k)
  }

  /** ANN via multi-table random-hyperplane LSH: `nTables` independent
    * hash tables of `planesPerTable` sign bits each; a probe's
    * candidate set is the union of its buckets across tables
    * (amplification: recall 1-(1-p^r)^T), then exact cosine + top-k on
    * candidates only. The shuffle key is (table, bucket), so work per
    * probe is bounded by bucket occupancy, not corpus size. */
  def knnLsh(embeddings: DataFrame, probeMod: Int, k: Int,
             nTables: Int = 4, planesPerTable: Int = 6,
             dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nTables * planesPerTable, dim)
    val e = embeddings.select(col("vec_id"), col("embedding").as("v"))
    val buckets = (0 until nTables).map { t =>
      val bits = (0 until planesPerTable).map { p =>
        val plane = array(planes(t * planesPerTable + p).toIndexedSeq.map(lit): _*)
        when(Vec.dot(col("v"), plane) >= 0, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(t).as("table"), bits.as("bucket"))
    }
    val bucketed = e.select(col("vec_id"), col("v"),
        explode(array(buckets: _*)).as("tb"))
      .select(col("vec_id"), col("v"),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val probes = bucketed.filter(col("vec_id") % probeMod === 0)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("table").as("ptable"), col("bucket").as("pbucket"))
    broadcast(probes).join(bucketed,
        col("table") === col("ptable") && col("bucket") === col("pbucket") &&
          col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        Vec.cosine(col("pv"), col("v")).as("cos_sim"))
      .distinct() // union of candidate sets across tables (cosine is deterministic)
      .withColumn("rnk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
      .filter(col("rnk") <= k)
  }
}
