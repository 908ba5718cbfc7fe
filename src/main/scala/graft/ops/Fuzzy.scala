package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-match joins Spark has no operator for: edit-distance
  * blocking via deletion neighborhoods, and asymmetric shingle
  * containment. Both follow the candidate-then-verify shape of the
  * MinHash stack — a bounded equi-join proposes pairs, an exact check
  * keeps them — so nothing quadratic in the corpus ever materializes.
  */
object Fuzzy {

  /** `{key} ∪ {key with character i deleted}` — the deletion
    * neighborhood. Two keys are within edit distance 1 ONLY IF their
    * neighborhoods intersect (equality, insertion, deletion, and
    * substitution all leave a common member), so an equi-join on the
    * neighborhood is a COMPLETE candidate generator; it over-generates
    * (e.g. "ab"/"ba" share "a" at distance 2), which the exact verify
    * filters. */
  def deletionNeighborhood(key: Column): Column =
    array_distinct(concat(array(key),
      transform(sequence(lit(1), length(key)), i =>
        concat(substr(key, lit(1), i - 1),
          substr(key, i + 1, length(key))))))

  /** Edit-distance-≤1 pair join (same-column self-join flavor): all
    * `(id_a < id_b)` pairs whose keys are within Levenshtein distance 1
    * — the fuzzy-key dedup for titles, handles, product codes. The
    * O(n²)-free path: keys explode to their ≤ len+1 deletion variants,
    * candidates meet in an EQUI-join on the variant (completeness per
    * [[deletionNeighborhood]]), `levenshtein ≤ 1` verifies exactly.
    * Cost: neighborhood fan-out is the key length (bounded — titles,
    * not documents); a variant shared by v keys proposes O(v²) pairs of
    * ALREADY-similar keys, the irreducible output. Returns
    * (id_a, key_a, id_b, key_b, dist). */
  def fuzzyPairs(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val n = df.select(col(idCol).as("__id__"), col(keyCol).as("__key__"))
      .withColumn("__variant__",
        explode(deletionNeighborhood(col("__key__"))))
    val a = n.select(col("__id__").as("id_a"), col("__key__").as("key_a"),
      col("__variant__"))
    val b = n.select(col("__id__").as("id_b"), col("__key__").as("key_b"),
      col("__variant__"))
    a.join(b, Seq("__variant__"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("key_a"), col("id_b"), col("key_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= 1)
  }

  /** Asymmetric shingle containment: for each candidate pair, the share
    * of the SMALLER document's distinct word-`k`-shingles present in the
    * other — the quote-inclusion / wholesale-excerpt signal Jaccard
    * dilutes (a paragraph fully contained in a book has Jaccard ≈ 0 but
    * containment 1). Pairs with `max(c_a→b, c_b→a) ≥ pctMin/100` are
    * kept; the comparison is exact-integer (`inter·100 ≥ n·pct`), no
    * float ratio.
    *
    * Scale shape — the [[graft.ops.Corpus.invertedIndex]] discipline:
    * distinct (doc, shingle-hash) pairs pay one exchange; shingles in
    * more than `maxDf` docs (boilerplate frequency) are dropped BEFORE
    * the self-join, which is what bounds the equi-join's per-key fan-out
    * (a stopword shingle shared by 10⁸ docs would otherwise propose
    * 10¹⁶ pairs). Returns (id_a, id_b, inter, n_a, n_b, contained). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int, maxDf: Long, pctMin: Int): DataFrame = {
    require(pctMin >= 1 && pctMin <= 100, s"pctMin in [1,100], got $pctMin")
    // persisted: this lineage (scan → shingle → distinct → explode)
    // feeds the df-count, BOTH sides of the self-join, and the size
    // table — un-persisted it recomputes the shingling four times
    // (released by the consumer via Caches, the LSH-band discipline)
    val sh = Caches.registerDf(df.select(col(idCol).as("__id__"),
        explode(array_distinct(graft.functions.NativeHashes.shingle_hashes(
          col(textCol), shingleK))).as("__h__")).persist())
    val rare = sh.groupBy(col("__h__"))
      .agg(count(lit(1)).as("__df__"))
      .filter(col("__df__") <= maxDf)
      .select(col("__h__"))
    val pruned = sh.join(rare, Seq("__h__"))
    val sizes = pruned.groupBy(col("__id__")).agg(count(lit(1)).as("__n__"))
    val pairs = pruned.select(col("__h__"), col("__id__").as("id_a"))
      .join(pruned.select(col("__h__"), col("__id__").as("id_b")),
        Seq("__h__"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("__id__").as("id_a"), col("__n__").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("__id__").as("id_b"), col("__n__").as("n_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"),
        (col("inter") * 100 >= least(col("n_a"), col("n_b")) * pctMin)
          .as("contained"))
      .filter(col("contained"))
  }
}
