package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Clustering

class ClusteringSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("kmeansAssign: hand-computed 1-D clusters, movement across iterations") {
    // scale=10 → quantized values 0, 1, 2, 100, 101, 120
    val df = Seq(
      (1L, Array(0.0f)), (2L, Array(0.1f)), (3L, Array(0.2f)),
      (4L, Array(10.0f)), (5L, Array(10.1f)), (6L, Array(12.0f)))
      .toDF("id", "v")
    // iters=1: centroids are ids 1,2 (q=0,1). Everything far lands on
    // centroid 1 except id 1 itself.
    val a1 = Clustering.kmeansAssign(df, "id", "v", k = 2, iters = 1, scale = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 1, 6L -> 1))
    // iters=2: cluster1's mean of {1,2,100,101,120} = 64.8 → 65; cluster0
    // stays at 0 → the small values regroup onto 0, the large onto 65
    val a2 = Clustering.kmeansAssign(df, "id", "v", k = 2, iters = 2, scale = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byId = a2.map(t => t._1 -> t._2).toMap
    assert(byId == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 1))
    // exact integer distances: id 6 (q=120) vs centroid 65 → 55² = 3025
    assert(a2.find(_._1 == 6L).get._3 == 3025L)
  }

  test("kmeansAssign: equidistant points break ties toward the smaller index") {
    // centroids init at q=0 and q=2; the point at q=1 is equidistant
    val df = Seq((1L, Array(0.0f)), (2L, Array(0.2f)), (3L, Array(0.1f)))
      .toDF("id", "v")
    val a = Clustering.kmeansAssign(df, "id", "v", k = 2, iters = 1, scale = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a(3L) == 0)
  }

  test("kmeansAssign: an emptied cluster keeps its previous centroid") {
    // k=2 seeded from ids 1,2 (q=0 and q=1); every point is closer to 0's
    // side or ties toward it, so cluster 1 can empty out in the update —
    // the op must not NPE or divide by zero, and cluster 1's centroid
    // stays at q=1
    val df = Seq((1L, Array(0.0f)), (2L, Array(0.1f)), (3L, Array(0.04f)))
      .toDF("id", "v")
    val a = Clustering.kmeansAssign(df, "id", "v", k = 2, iters = 3, scale = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.size == 3)
  }

  test("kmeansAssign rejects k or iters <= 0 and too-few rows") {
    val df = Seq((1L, Array(0.0f))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Clustering.kmeansAssign(df, "id", "v", k = 0, iters = 1)
    }
    intercept[IllegalArgumentException] {
      Clustering.kmeansAssign(df, "id", "v", k = 2, iters = 1)
    }
  }

  test("kmeansAssign is deterministic across input partitioning") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    val base = Clustering.kmeansAssign(emb, "vec_id", "embedding", 3, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val shuffled = Clustering.kmeansAssign(
      emb.repartition(7, col("vec_id")), "vec_id", "embedding", 3, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(base == shuffled)
  }

  test("kmeansAssign's assignment stage is shuffle-free per-row work") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    val plan = Clustering.kmeansAssign(emb, "vec_id", "embedding", 3, 1)
      .queryExecution.executedPlan.toString
    // centroids ride along as literals: no Exchange, no join, no window
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }
}
