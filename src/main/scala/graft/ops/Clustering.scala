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
    * centroid, as an exact BIGINT sum — the codegen'd
    * [[graft.functions.NativeHashes.l2sq_long]] (r13: the zip_with +
    * aggregate lambda fold is CodegenFallback — interpreted and
    * allocating one array per row PER CENTROID; the JIT loop is
    * value-identical, and the lambda twin stays in OpsSpec as the
    * executable spec). */
  private def dist2(q: Column, centroid: Array[Long]): Column =
    graft.functions.NativeHashes.l2sq_long(q,
      array(centroid.map(lit(_)): _*))

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
    assign(q, trainCentroids(q, k, iters)).select(col("__id__").as(idCol),
      col("__c__").as("cluster"), col("__d2__").as("dist2"))
  }

  /** The Lloyd's training loop over a pre-quantized `(__id__, __q__)`
    * frame, returning the final centroid matrix (k·dim longs on the
    * driver — the bounded-state pattern). Shared by [[kmeansAssign]]
    * and the per-subspace codebooks of [[pqCodes]]. */
  private def trainCentroids(q: DataFrame, k: Int,
      iters: Int): Array[Array[Long]] = {
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
    centroids
  }

  /** Product-quantization codes (Jégou–Douze–Schmid PQ): the vector
    * splits into `m` contiguous subvectors, each subspace trains its own
    * k-codeword integer Lloyd's codebook ([[trainCentroids]] — same
    * seedless init, same fixed-point grid), and every vector compresses
    * to the m-tuple of nearest-codeword indices. dim·4 bytes become
    * m·⌈log₂k⌉ bits — the memory step that makes billion-vector ANN fit
    * a cluster's RAM; an ADC scan then reads codes + per-query lookup
    * tables instead of raw vectors.
    *
    * Shape: training is m independent bounded-driver-state loops (k·dim
    * literals each); the final encoding is ONE narrow pass — the m sub-
    * arrays materialize in one projection and each code is a per-row
    * `array_min(struct(dist, idx))` against its literal codebook. No
    * joins, no shuffle; output |rows| × (1 + 2m) columns.
    *
    * Returns (idCol, code_0, dist2_0, …, code_{m−1}, dist2_{m−1}):
    * per-subspace winning codeword index and its exact BIGINT squared
    * distance (Σ_j dist2_j is the vector's total quantization error —
    * the ADC identity). */
  def pqCodes(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      m: Int, k: Int, iters: Int, scale: Int = 1000): DataFrame =
    pqEncode(df, idCol, vecCol, dims, m, k, iters, scale)._2

  /** Shared PQ train+encode: returns the m codebooks (driver-side
    * literals) and the coded frame
    * (idCol, code_0, dist2_0, …, code_{m−1}, dist2_{m−1}). */
  private def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, k: Int, iters: Int, scale: Int)
      : (Seq[Array[Array[Long]]], DataFrame) = {
    require(m >= 1 && dims >= m && dims % m == 0,
      s"dims=$dims must split evenly into m=$m subspaces")
    require(k > 0 && iters > 0, s"k and iters must be > 0, got k=$k iters=$iters")
    val subLen = dims / m
    val q = df.select(col(idCol).as("__id__"),
      quantizeFixed(col(vecCol), scale).as("__q__"))
    // one projection materializes the m sub-arrays so every per-codeword
    // distance references an attribute (the winnowing discipline)
    val subs = q.select(col("__id__") +: (0 until m).map(j =>
      slice(col("__q__"), j * subLen + 1, subLen).as(s"__s$j")): _*)
    val books = (0 until m).map { j =>
      trainCentroids(
        subs.select(col("__id__"), col(s"__s$j").as("__q__")), k, iters)
    }
    // winner structs materialize once (field extraction would otherwise
    // duplicate each array_min), then the final projection unpacks
    val withBest = subs.select(col("__id__") +: (0 until m).map { j =>
      array_min(array(books(j).zipWithIndex.map { case (mu, c) =>
        struct(
          graft.functions.NativeHashes.l2sq_long(col(s"__s$j"),
            array(mu.map(lit(_)): _*)).as("d"),
          lit(c).as("j"))
      }: _*)).as(s"__b$j")
    }: _*)
    val coded = withBest.select(
      col("__id__").as(idCol) +: (0 until m).flatMap(j => Seq(
        col(s"__b$j").getField("j").as(s"code_$j"),
        col(s"__b$j").getField("d").as(s"dist2_$j"))): _*)
    (books, coded)
  }

  /** PQ asymmetric-distance (ADC) top-k search: the corpus lives as
    * PQ codes (built here via [[pqCodes]]' train+encode), each query
    * computes its m·k lookup table of exact sub-distances to every
    * codeword, and a query's distance to a corpus vector is the m-term
    * table sum selected by the vector's codes — the Jégou et al. scan
    * that reads 1 byte/subspace instead of 4 bytes/dimension.
    *
    * Scale shape: the query block (with its LUT columns — m·k BIGINTs
    * per query) BROADCASTS against the coded corpus; per-row work is m
    * array lookups + adds, and the per-query result collapses through
    * the bounded map-side [[graft.functions.TopKAgg]] — the shuffle is
    * O(|Q|·topK·partitions) structs, never |Q|×|corpus|. Exact integer
    * distances end-to-end (the fixed-point grid), so ranking is
    * engine-identical; ties break toward the smaller neighbor id.
    *
    * Returns (query_id, neighbor_id, adc_dist2, rank). */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dims: Int, m: Int, k: Int, iters: Int,
      topK: Int, scale: Int = 1000): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val subLen = dims / m
    val (books, coded) = pqEncode(corpus, idCol, vecCol, dims, m, k,
      iters, scale)
    val qq = queries.select(col(idCol).as("query_id"),
      quantizeFixed(col(vecCol), scale).as("__q__"))
    val qsubs = qq.select(col("query_id") +: (0 until m).map(j =>
      slice(col("__q__"), j * subLen + 1, subLen).as(s"__s$j")): _*)
    // per-query LUT: lut_j = [d²(querySub_j, book_j[0]), …, book_j[k−1]]
    val withLuts = qsubs.select(col("query_id") +: (0 until m).map { j =>
      array(books(j).map { mu =>
        graft.functions.NativeHashes.l2sq_long(col(s"__s$j"),
          array(mu.map(lit(_)): _*))
      }: _*).as(s"__lut$j")
    }: _*)
    val scored = coded
      .join(broadcast(withLuts), col("query_id") =!= col(idCol))
      .withColumn("__ad__", (0 until m).map(j =>
        element_at(col(s"__lut$j"), col(s"code_$j") + 1))
        .reduce(_ + _))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.top_k_by_score(
        (-col("__ad__")).cast("double"), col(idCol), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (-col("col.score")).cast("long").as("adc_dist2"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Simplified silhouette over a [[kmeansAssign]] clustering — the
    * standard "is k right / did the clusters separate" audit, in the
    * centroid-distance formulation (the classic all-pairs silhouette is
    * O(n²); the simplified form replaces mean-to-member distances with
    * distance-to-centroid and is the accepted large-n variant). Per
    * vector: `a` = distance to its OWN centroid, `b` = distance to the
    * nearest OTHER centroid, `s = (b − a) / max(a, b)` — near 1 means
    * well-placed, near 0 a boundary point, negative a likely
    * mis-assignment ([[graft.ops.Similarity.clusteredNearDups]] inherits
    * exactly those boundary blind spots, so this is also SemDeDup's
    * quality gauge). Distances are exact BIGINT squared fixed-point
    * sums; the final `s` takes one correctly-rounded sqrt per side, so
    * both engines agree to the bit. Degenerate all-zero case (a = b =
    * 0) reports 0.
    *
    * Shape: training is [[trainCentroids]]' bounded driver loop; the
    * audit itself is ONE per-row pass against the k·dim literal centroid
    * matrix — `array_sort` of k (dist², j) structs picks own and
    * runner-up in the same expression, no shuffle, no join. Returns
    * `(idCol, cluster, own_dist2, neighbor_dist2, silhouette)`. */
  def silhouette(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Int = 1000): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2 clusters, got $k")
    require(iters > 0, s"iters must be > 0, got $iters")
    val q = df.select(col(idCol).as("__id__"),
      quantizeFixed(col(vecCol), scale).as("__q__"))
    val centroids = trainCentroids(q, k, iters)
    val sorted = array_sort(array(centroids.zipWithIndex.map {
      case (m, j) =>
        struct(dist2(col("__q__"), m).as("d"), lit(j).as("j"))
    }: _*))
    val a = sqrt(col("__own__").cast("double"))
    val b = sqrt(col("__nb__").cast("double"))
    q.withColumn("__s__", sorted)
      .select(col("__id__"),
        col("__s__").getItem(0).getField("j").as("cluster"),
        col("__s__").getItem(0).getField("d").as("__own__"),
        col("__s__").getItem(1).getField("d").as("__nb__"))
      .select(col("__id__").as(idCol), col("cluster"),
        col("__own__").as("own_dist2"), col("__nb__").as("neighbor_dist2"),
        when(greatest(a, b) === 0.0, lit(0.0))
          .otherwise(round((b - a) / greatest(a, b), 6)).as("silhouette"))
  }

  /** k-center greedy (farthest-point) coreset selection — the standard
    * diverse-subset picker for data curation (active-learning coresets,
    * eval-set seeding, cluster-free coverage sampling): start from the
    * smallest id, then repeatedly take the point FARTHEST from every
    * center chosen so far. Greedy k-center is the classic 2-approximation
    * of the NP-hard k-center cover; unlike random or stratified
    * sampling it cannot collapse onto a dense mode.
    *
    * Fully deterministic: distances are exact BIGINT Σ(Δq)² on the
    * fixed-point grid, argmax ties break on id — no seeds, no floats.
    *
    * Shape: each of the k−1 rounds is ONE narrow scan scoring every row
    * against ≤ k literal centers (the [[kmeansAssign]] broadcast-
    * centroid pattern) followed by a LIMIT-1 argmax — per-round driver
    * state is a single row, total work O(k²·dim·n/p) per executor. For
    * k beyond a few hundred, pre-partition with [[kmeansAssign]] and
    * run the greedy pass per cluster. Returns (rank, idCol,
    * dist2) — dist2 = exact squared grid distance to the nearest
    * EARLIER center (null for the seed), a monotone non-increasing
    * coverage-radius curve. */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
      k: Int, scale: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    val q = Caches.registerDf(df
      .select(col(idCol).cast("long").as("__id__"),
        quantizeFixed(col(vecCol), scale).as("__q__"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val seed = q.orderBy(col("__id__").asc).limit(1).collect()
    require(seed.nonEmpty, "kCenterGreedy needs at least one row")
    var centers = Vector[(Long, Array[Long], Option[Long])](
      (seed(0).getLong(0), seed(0).getSeq[Long](1).toArray, None))
    var exhausted = false
    while (centers.size < k && !exhausted) {
      val minD = centers.map(c => dist2(col("__q__"), c._2))
        .reduce((a, b) => least(a, b))
      val next = q.filter(!col("__id__").isin(centers.map(_._1): _*))
        .select(col("__id__"), col("__q__"), minD.as("__d__"))
        .orderBy(col("__d__").desc, col("__id__").asc)
        .limit(1).collect()
      if (next.isEmpty) exhausted = true
      else centers :+= ((next(0).getLong(0),
        next(0).getSeq[Long](1).toArray, Some(next(0).getLong(2))))
    }
    import spark.implicits._
    centers.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1L, id, d) }
      .toDF("rank", idCol, "dist2")
  }
}
