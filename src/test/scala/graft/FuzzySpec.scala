package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Fuzzy

class FuzzySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("deletionNeighborhood: the key plus each single-char deletion") {
    val got = Seq("abc").toDF("k")
      .select(Fuzzy.deletionNeighborhood(col("k")).as("n"))
      .collect().head.getSeq[String](0).toSet
    assert(got == Set("abc", "bc", "ac", "ab"))
    // duplicate deletions collapse ("aa" -> "a" twice)
    val dup = Seq("aa").toDF("k")
      .select(Fuzzy.deletionNeighborhood(col("k")).as("n"))
      .collect().head.getSeq[String](0)
    assert(dup.sorted == Seq("a", "aa"))
  }

  test("fuzzyPairs finds exactly the Levenshtein-≤1 pairs (brute-force check)") {
    val keys = Seq("abc", "abd", "ab", "xabc", "zzz", "abcd", "bbcd")
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
    val df = keys.toDF("id", "key")
    val got = Fuzzy.fuzzyPairs(df, "id", "key")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    // ground truth: the full cartesian filtered by exact edit distance
    val want = (for {
      (ia, ka) <- keys; (ib, kb) <- keys
      if ia < ib && levDist(ka, kb) <= 1
    } yield (ia, ib)).toSet
    assert(got == want, s"got $got want $want")
    assert(want.contains((0L, 1L)), "substitution abc~abd")
    assert(want.contains((0L, 2L)), "deletion abc~ab")
    assert(want.contains((0L, 3L)), "insertion abc~xabc")
    assert(!want.exists(p => p._1 == 4L || p._2 == 4L), "zzz matches nothing")
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("containmentPairs: excerpt containment binds where Jaccard misses") {
    val parent = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val excerpt = "alpha beta gamma delta epsilon zeta" // 6 of 20 words
    val other = "one two three four five six seven eight nine ten"
    val df = Seq((1L, parent), (2L, excerpt), (3L, other))
      .toDF("id", "text")
    val got = Fuzzy.containmentPairs(df, "id", "text", shingleK = 3,
        maxDf = 10L, pctMin = 80)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        (r.getAs[Long]("inter"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))))
      .toMap
    // all 4 of the excerpt's 3-shingles sit in the parent: containment 1
    assert(got.keySet == Set((1L, 2L)))
    val (inter, na, nb) = got((1L, 2L))
    assert(inter == 4L && nb == 4L && na == 18L)
  }

  test("containmentPairs df cutoff drops boilerplate shingles pre-join") {
    // the same 3 words open EVERY doc: with maxDf=2 those shingles are
    // dropped, so docs sharing ONLY the boilerplate never pair
    val docs = (1L to 5L).map(i =>
      (i, s"same old intro unique$i body$i tail$i words$i here$i"))
    val df = docs.toDF("id", "text")
    val got = Fuzzy.containmentPairs(df, "id", "text", shingleK = 3,
      maxDf = 2L, pctMin = 50)
    assert(got.count() == 0, "boilerplate-only overlap must not pair")
  }
}
