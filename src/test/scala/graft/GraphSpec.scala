package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 3)
      : Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_micros"))
      .toMap

  test("pageRank: 2-cycle is a fixed point at the initial mass") {
    // every node forwards its whole rank and receives one whole rank:
    // 150000 + (85 · 1e6) div 100 = 1e6 exactly, at every iteration
    val got = ranks(Seq((1L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("pageRank: hand-computed triangle with a dangling node") {
    // a→b, a→c, b→a; c is dangling (its mass drains — documented).
    // i1: a=1000000, b=c=575000; i2: a=638750, b=c=575000;
    // i3: a=638750, b=c=150000+(85·(638750 div 2)) div 100=421468
    val got = ranks(Seq((1L, 2L), (1L, 3L), (2L, 1L)))
    assert(got == Map(1L -> 638750L, 2L -> 421468L, 3L -> 421468L), got)
  }

  test("pageRank: parallel edges carry weight, layout never changes ranks") {
    // two a→b edges double a's contribution to b relative to one: with
    // deg(a)=2 each edge carries a/2, so b receives a — same as a single
    // edge from a node of out-degree 1
    val multi = ranks(Seq((1L, 2L), (1L, 2L)), iters = 1)
    val single = ranks(Seq((1L, 2L)), iters = 1)
    assert(multi(2L) == single(2L))
    // rank vector is identical across input layouts/partitionings
    val edges = Seq.tabulate(40)(i => ((i % 7).toLong, ((i * 3) % 7).toLong))
    val a = Graph.pageRank(edges.toDF("src", "dst").repartition(7),
      "src", "dst", 3).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Graph.pageRank(edges.reverse.toDF("src", "dst").repartition(2),
      "src", "dst", 3).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("pageRank plan: equi-joins only, no nested loop / cartesian") {
    val df = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val plan = Graph.pageRank(df, "src", "dst", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("nestedloop"), plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }
}
