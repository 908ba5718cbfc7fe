package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed clustering over embedding columns — the corpus-organization
  * step between near-dup removal and mixture design (topic balancing,
  * domain discovery, coverage audits over a 100 TB crawl).
  *
  * The flagship is Lloyd's k-means, shaped the way every production Spark
  * implementation shapes it:
  *   - assignment is a PER-ROW computation against a broadcast centroid
  *     matrix (k·dim values — literals here) → no shuffle, trivially
  *     parallel across 1000 executors;
  *   - the update step is one partial-aggregable hash aggregation per
  *     iteration (k·dim groups), whose k·dim-row result is collected to
  *     the driver — the same bounded-driver-state pattern as the IVF
  *     index build in [[Similarity.ivfTopK]];
  *   - iteration count is fixed and small, so the job is `iters` narrow
  *     passes over the data, each dominated by the scan.
  *
  * Everything is computed in FIXED-POINT INTEGER arithmetic so the DuckDB
  * oracle replays assignments bit-for-bit: vectors are quantized once with
  * `floor(x·scale + 0.5)` (the [[Similarity.quantizeInt8]] half-up idiom),
  * centroids are re-quantized to the same grid after every mean update,
  * and distances are exact BIGINT sums of squared integer differences.
  * Ties (equal distance to two centroids) break toward the smaller
  * cluster index in both engines. Float k-means would hash-diverge on the
  * first unordered mean; integer k-means cannot.
  */
object Clustering {

  /** Global fixed-point quantization of a float/double array column:
    * `q_i = floor(x_i·scale + 0.5)` as BIGINT — explicit half-up in both
    * engines (`round()` tie semantics differ between them). */
  def quantizeFixed(vec: Column, scale: Int): Column =
    transform(vec, v => floor(v.cast("double") * scale + lit(0.5)).cast("long"))

  /** Squared L2 distance between a quantized vector column and a literal
    * centroid, as an exact BIGINT ordered fold. */
  private def dist2(q: Column, centroid: Array[Long]): Column =
    aggregate(
      zip_with(q, array(centroid.map(lit(_)): _*), (x, m) => (x - m) * (x - m)),
      lit(0L), (a, d) => a + d)

  /** Assign each row to its nearest centroid: `array_min` over
    * `struct(dist, index)` structs compares distance first, then index —
    * the deterministic smallest-index tie-break, entirely per-row. */
  private def assign(q: DataFrame, centroids: Array[Array[Long]]): DataFrame = {
    val best = array_min(array(centroids.zipWithIndex.map { case (m, j) =>
      struct(dist2(col("__q__"), m).as("d"), lit(j).as("j"))
    }: _*))
    q.withColumn("__best__", best)
      .withColumn("__c__", col("__best__").getField("j"))
      .withColumn("__d2__", col("__best__").getField("d"))
      .drop("__best__")
  }

  /** Lloyd's k-means assignments after `iters` iterations.
    *
    * Init: the vectors of the `k` smallest ids (deterministic, seedless).
    * Update: per-cluster per-dimension exact BIGINT sums (one hash
    * aggregation over posexplode, k·dim groups), means re-quantized
    * half-up onto the fixed-point grid; a cluster that loses all members
    * keeps its previous centroid. Output: (id, cluster, dist2) where
    * dist2 is the exact squared fixed-point distance to the winning
    * centroid of the FINAL iteration.
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Int = 1000): DataFrame = {
    require(k > 0 && iters > 0, s"k and iters must be > 0, got k=$k iters=$iters")
    val q = df.select(col(idCol).as("__id__"),
      quantizeFixed(col(vecCol), scale).as("__q__"))
    var centroids: Array[Array[Long]] = q.orderBy(col("__id__").asc).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(centroids.length == k,
      s"need at least k=$k rows to seed centroids, got ${centroids.length}")
    for (_ <- 1 until iters) {
      // per-(cluster, dim) exact sums + counts; k·dim rows back to driver
      val sums = assign(q, centroids)
        .select(col("__c__"), posexplode(col("__q__")).as(Seq("__pos__", "__v__")))
        .groupBy(col("__c__"), col("__pos__"))
        .agg(sum(col("__v__")).as("__s__"), count(lit(1)).as("__n__"))
        .collect()
      val next = centroids.map(_.clone()) // empty cluster keeps its centroid
      sums.foreach { r =>
        val (c, pos) = (r.getInt(0), r.getInt(1))
        val (s, n) = (r.getLong(2), r.getLong(3))
        // half-up integer mean on the same grid: floor(s/n + 0.5); s, n are
        // exact and |s| < 2^53, so the double division is deterministic
        next(c)(pos) = math.floor(s.toDouble / n + 0.5).toLong
      }
      centroids = next
    }
    assign(q, centroids).select(col("__id__").as(idCol),
      col("__c__").as("cluster"), col("__d2__").as("dist2"))
  }
}
