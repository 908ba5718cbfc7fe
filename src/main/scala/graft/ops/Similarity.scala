package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — exact, one pass over the corpus per
  * query batch (broadcast the queries, never the corpus). Scale path:
  * sign-bit LSH bucketing (IVF-style routing would slot in the same shape:
  * assign → shuffle-on-bucket → local scan).
  *
  * Dot products are left-to-right folds over the vector — deterministic,
  * reproducible across engines (the DuckDB oracle replays the same
  * association order).
  */
object Similarity {

  /** Exact dot product: Σ a_i·b_i as a left fold (fixed association).
    * Codegen'd ([[graft.functions.NativeHashes.dot_product]]); the
    * SQL-lambda twin below is the executable spec. */
  def dot(a: Column, b: Column): Column =
    graft.functions.NativeHashes.dot_product(a, b)

  /** SQL-lambda formulation of [[dot]] — identical results (same fold
    * association), used for cross-validation. */
  def dotLambda(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit signature: bit i = (v_i > 0) over the first `bits` dims —
    * a deterministic random-hyperplane LSH (planes = axis planes). */
  def signBits(v: Column, bits: Int): Column =
    aggregate(
      zip_with(slice(v, 1, bits), sequence(lit(0), lit(bits - 1)),
        (x, i) => when(x > 0, pow(lit(2.0), i).cast("long")).otherwise(0L)),
      lit(0L), (acc, b) => acc + b)

  /** Brute-force cosine top-k: for each row of `queries`, the `k` highest
    * cosine rows of `corpus` (excluding self-matches by id).
    *
    * Plan shape: broadcast(queries) × corpus → score → per-query top-k via
    * rank window. The shuffle is on query id — |queries|·|corpus| scored
    * rows reduce map-side only after ranking, so keep query batches
    * bounded (hundreds), which is how batch ANN evaluation runs anyway. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int
  ): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** IVF-style approximate top-k: the corpus is partitioned into inverted
    * lists by nearest centroid; each query scans only its `nProbe` closest
    * lists. Centroids here are a deterministic sample (the first
    * `nCentroids` corpus vectors) — a k-means refinement would slot into
    * the same assign→route→scan shape without touching the query path.
    *
    * Scale: centroids broadcast (small); corpus assignment is one scan +
    * shuffle on list id; each query batch probes nProbe/nCentroids of the
    * corpus. The standard ANN index layout, expressed as joins. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4
  ): DataFrame = {
    val cents = broadcast(
      corpus.orderBy(col(idCol).asc).limit(nCentroids)
        .select(monotonically_increasing_id().as("cid"), col(vecCol).as("centroid")))

    def nearestLists(df: DataFrame, id: String, vec: String, n: Int): DataFrame = {
      val scored = df.join(cents)
        .withColumn("__cscore__", cosine(col(vec), col("centroid")))
      val w = Window.partitionBy(col(id)).orderBy(col("__cscore__").desc, col("cid").asc)
      scored.withColumn("__crank__", row_number().over(w))
        .filter(col("__crank__") <= n)
        .drop("centroid", "__cscore__", "__crank__")
    }

    val assigned = nearestLists(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      "neighbor_id", "cv", 1)
    val probes = broadcast(nearestLists(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", nProbe))

    val scored = probes.join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** LSH-bucketed approximate top-k: corpus is bucketed by sign-bit
    * signature; each query probes only its own bucket (plus optional
    * 1-bit-flip neighbor buckets for recall). Same output shape as
    * [[bruteForceTopK]]; recall traded for a |corpus|/2^bits scan. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bits: Int = 8, multiProbe: Boolean = true
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      signBits(col(vecCol), bits).as("bucket"))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      signBits(col(vecCol), bits).as("sig"))
    // probe set: own bucket + hamming-1 neighbors
    val probes =
      if (multiProbe)
        array(lit(0L) +: (0 until bits).map(i => shiftleft(lit(1L), i)): _*)
      else array(lit(0L))
    val q = broadcast(
      qBase.select(col("query_id"), col("qv"),
        explode(transform(probes, m => col("sig").bitwiseXOR(m))).as("bucket")))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}
