package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators — the summaries a 100 TB pipeline keeps
  * PER SHARD and unions, instead of re-scanning the corpus: count-min
  * for frequency estimates, HLL for distinct counts. Both of Spark's
  * sketch aggregates compute partial sketches map-side and merge them —
  * the same associative shape as a sum, so a 1000-executor scan ships
  * kilobytes per partition. Correctness-gated like q30: the estimate is
  * compared against its exact twin with the sketch's error bound, and
  * the BOOLEAN is what the oracle checks.
  */
object Sketches {

  /** Heavy hitters with a count-min sketch: the exact top-k terms (by
    * count desc, term asc — deterministic) plus the CMS estimate of each,
    * gated by CMS's one-sided guarantee: `est >= exact` always, and
    * `est <= exact + eps·N` with the sketch's confidence. The sketch
    * aggregates distributed (partial sketches merge); the top-k query
    * against it is a bounded driver-side read of one kilobyte-sized
    * blob — the pattern that answers "how often does X occur" over a
    * corpus without a second scan. */
  def heavyHitters(df: DataFrame, textCol: String, topK: Int,
      eps: Double = 0.0001, confidence: Double = 0.99): DataFrame = {
    val spark = df.sparkSession
    val words = df.select(explode(filter(
      split(lower(col(textCol)), "\\s+"), w => w =!= "")).as("word"))
    val exact = words.groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc).limit(topK)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val blob = words
      .agg(expr(s"count_min_sketch(word, ${eps}d, ${confidence}d, 42)")
        .as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(blob))
    val n = cms.totalCount()
    val rows = exact.map { case (w, c) =>
      val est = cms.estimateCount(w)
      Row(w, c, est >= c && est <= c + math.ceil(eps * n).toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("word",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cms_ok",
          org.apache.spark.sql.types.BooleanType, nullable = false))))
      .orderBy(col("n").desc, col("word").asc)
  }

  /** Sharded distinct count with HLL sketch UNION: one HLL per shard
    * (the per-day / per-source summary a pipeline would persist), then
    * `hll_union_agg` merges them into the corpus-wide estimate — no
    * re-scan of the shards, which is the entire point of a mergeable
    * sketch. Gated against the exact distinct count at the sketch's
    * standard-error tolerance. Returns one row:
    * (n_shards, exact, hll_ok). */
  def shardedDistinct(df: DataFrame, valueCol: String, shardCol: String,
      relTol: Double = 0.05): DataFrame = {
    // a NULL shard key would form its own group (Spark groupBy keeps
    // nulls) while COUNT(DISTINCT shard) ignores them — exclude it so
    // n_shards means what it says
    val per = df.filter(col(shardCol).isNotNull)
      .groupBy(col(shardCol))
      .agg(expr(s"hll_sketch_agg($valueCol)").as("sk"))
    val merged = per.agg(
      count(lit(1)).as("n_shards"),
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = df.agg(countDistinct(col(valueCol)).as("exact"))
    merged.crossJoin(exact)
      .select(col("n_shards"), col("exact"),
        (abs(col("est") - col("exact")) <=
          greatest(col("exact") * relTol, lit(1.0))).as("hll_ok"))
  }

  /** Corpus-overlap estimate by HLL inclusion–exclusion —
    * `|A∩B| ≈ est(A) + est(B) − est(A∪B)` — next to its exact twin:
    * the audience-overlap / returning-population / cross-corpus
    * contamination scout that runs from per-corpus SKETCHES alone (the
    * two corpora need never be co-shuffled; at 100 TB the sketches are
    * KB-sized persisted summaries, the [[shardedDistinct]] posture).
    * Three compounding HLL errors make the inclusion–exclusion bound
    * looser than a single estimate's, so the gate tolerance is relative
    * to the UNION size (the quantity the absolute errors scale with),
    * not the intersection. The engine-specific estimate never leaves
    * the plan — the oracle replays exact values and expects the gate
    * TRUE (the q30 posture). */
  def overlapEstimate(a: DataFrame, b: DataFrame, valueCol: String,
      relTol: Double = 0.15): DataFrame = {
    val ea = a.agg(expr(s"hll_sketch_agg($valueCol)").as("ska"),
      countDistinct(col(valueCol)).as("n_a"))
    val eb = b.agg(expr(s"hll_sketch_agg($valueCol)").as("skb"),
      countDistinct(col(valueCol)).as("n_b"))
    val u = a.select(col(valueCol))
      .unionByName(b.select(col(valueCol)))
      .agg(countDistinct(col(valueCol)).as("n_union"))
    ea.crossJoin(eb).crossJoin(u)
      .withColumn("inter_exact",
        col("n_a") + col("n_b") - col("n_union"))
      .withColumn("__est__",
        expr("hll_sketch_estimate(ska)") +
          expr("hll_sketch_estimate(skb)") -
          expr("hll_sketch_estimate(hll_union(ska, skb))"))
      .select(col("n_a"), col("n_b"), col("n_union"),
        col("inter_exact"),
        (abs(col("__est__") - col("inter_exact")) <=
          greatest(col("n_union") * relTol, lit(1.0))).as("hll_ok"))
  }

  /** Quantile profile with a rank-error gate: per group, the exact
    * interpolated quantiles (the verification twin) alongside a check
    * that each `approx_percentile` estimate honors the sketch's
    * guarantee — the Greenwald–Khanna summary promises an element whose
    * RANK is within `n/accuracy` of the target rank. The gate counts the
    * estimate's actual rank straddle (`#values < est`, `#values ≤ est`)
    * against `⌈p·n⌉ ± ⌈n/accuracy⌉`; counting ranks sidesteps comparing
    * the engine-specific estimate value itself, the q30 posture.
    *
    * Shape: the sketch pass is one partial-aggregable aggregation
    * (mergeable GK summaries, kilobytes per partition — the operator a
    * 100 TB percentile query must use; the EXACT twin buffers each
    * group's values and exists only to certify the sketch at test
    * scale). The rank count is a second scan against the broadcast
    * |groups|·|qs| estimate table. Returns
    * (group, q, exact_q, rank_ok). */
  def quantileProfile(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75),
      accuracy: Int = 1000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      "quantiles must be in [0, 1]")
    val qArr = array(qs.map(lit): _*)
    val v = col(valueCol).cast("double")
    val agg = df.groupBy(col(groupCol)).agg(
      count(v).as("__n__"),
      percentile_approx(v, qArr, lit(accuracy)).as("__ests__"),
      expr(s"percentile(CAST($valueCol AS DOUBLE), " +
        qs.mkString("array(", ", ", ")") + ")").as("__exs__"))
    val per = agg.select(col(groupCol), col("__n__"),
      posexplode(arrays_zip(col("__ests__"), col("__exs__"))))
      .select(col(groupCol), col("__n__"),
        element_at(qArr, col("pos") + 1).as("q"),
        col("col.__ests__").as("__est__"), col("col.__exs__").as("exact_q"))
    val counted = df.select(col(groupCol).as("__g__"), v.as("__v__"))
      .join(broadcast(per), col("__g__") === col(groupCol))
      .groupBy(col(groupCol), col("q"), col("exact_q"), col("__est__"),
        col("__n__"))
      .agg(sum(when(col("__v__") < col("__est__"), 1L).otherwise(0L))
          .as("__lt__"),
        sum(when(col("__v__") <= col("__est__"), 1L).otherwise(0L))
          .as("__le__"))
    val err = ceil(col("__n__").cast("double") / accuracy)
    val target = ceil(col("q") * col("__n__"))
    counted.select(col(groupCol), col("q"), col("exact_q"),
      (col("__lt__") <= target + err &&
        col("__le__") >= target - err).as("rank_ok"))
  }
}
