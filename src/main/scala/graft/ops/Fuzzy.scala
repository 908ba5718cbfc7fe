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

  /** Sorted-neighborhood blocking (the Hernández–Stolfo merge/purge
    * candidate generator): within each block, records sort by
    * `sortCols` (then id, for a total order) and every record pairs
    * with the next `w − 1` records in that order — the linkage
    * candidate set when similar records land near each other under a
    * well-chosen sort key (name prefix, normalized address, size).
    * Complements the equi-join generators ([[fuzzyPairs]],
    * [[prefixFilterJaccardPairs]]): O(n·w) candidates instead of
    * per-key quadratic, at the price of sort-key design.
    *
    * Shape: ONE hash shuffle on the block key + a per-block sort —
    * the window carries `w − 1` `lead` columns in a single pass, and
    * the pair explode is per-row. Blocks are the unit of parallelism;
    * an unbounded block (empty `blockCols` = one global sort) is the
    * caller's scale decision — sub-block with a coarser prefix when a
    * block outgrows one task. Nulls sort LAST (both engines' SQL
    * default), so null-keyed records still pair among themselves at
    * the tail rather than silently vanishing.
    *
    * Returns blockCols + (id_a, id_b, gap): gap ∈ [1, w−1] is the sort
    * distance — rank-adjacent pairs (gap 1) are the strongest
    * candidates. */
  def sortedNeighborhood(df: DataFrame, idCol: String,
      blockCols: Seq[String], sortCols: Seq[String], w: Int): DataFrame = {
    require(w >= 2, s"window must cover at least 2 records, got $w")
    import org.apache.spark.sql.expressions.Window
    val ord = sortCols.map(c => col(c).asc_nulls_last) :+
      col(idCol).asc_nulls_last
    val win = Window.partitionBy(blockCols.map(col): _*).orderBy(ord: _*)
    val leads = (1 until w).map(g =>
      struct(lead(col(idCol), g).over(win).as("id_b"),
        lit(g).as("gap")).as(s"__l$g"))
    df.select(blockCols.map(col) ++ Seq(col(idCol)) ++ leads: _*)
      .select(blockCols.map(col) ++ Seq(col(idCol).as("id_a"),
        explode(array((1 until w).map(g => col(s"__l$g")): _*)).as("__p__")): _*)
      .filter(col("__p__.id_b").isNotNull)
      .select(blockCols.map(col) ++ Seq(col("id_a"),
        col("__p__.id_b").as("id_b"), col("__p__.gap").as("gap")): _*)
  }

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

  /** Jaro-Winkler record-linkage pairs: all `(key_a < key_b)` pairs with
    * similarity ≥ `minSim`, candidates blocked on the lowercased
    * `blockLen`-char prefix. The blocking is the standard record-linkage
    * trade: Winkler's prefix boost already privileges strings agreeing on
    * their first characters, so a prefix block keeps exactly the
    * neighborhood the score rewards; pairs that disagree within the first
    * `blockLen` characters are never proposed (documented incompleteness,
    * like every blocking scheme). Scale shape: one equi-join on the block
    * key — per-block fan-out is `O(block²)` of ALREADY prefix-identical
    * keys, and the codegen'd [[graft.functions.JaroWinklerExpr]] verify
    * runs inside the join's whole-stage pipeline, so nothing quadratic in
    * the corpus forms. Returns (key_a, key_b, jw). */
  def jaroWinklerPairs(df: DataFrame, keyCol: String, blockLen: Int,
      minSim: Double): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    val keys = df.select(col(keyCol).as("__key__")).distinct()
      .withColumn("__block__", lower(substring(col("__key__"), 1, blockLen)))
    keys.select(col("__block__"), col("__key__").as("key_a"))
      .join(keys.select(col("__block__"), col("__key__").as("key_b")),
        Seq("__block__"))
      .filter(col("key_a") < col("key_b"))
      .withColumn("jw", graft.functions.NativeHashes.jaro_winkler(
        col("key_a"), col("key_b")))
      .filter(col("jw") >= minSim)
      .select(col("key_a"), col("key_b"), col("jw"))
  }

  /** Blocked Levenshtein self-join: all distinct key pairs within edit
    * distance `maxDist` that share a `blockLen`-character lowercase
    * prefix — the [[jaroWinklerPairs]] blocking contract with the
    * metric swapped for plain edit distance (the linkage workhorse when
    * typos are insert/delete/substitute rather than transposition).
    * Same trade, stated plainly: a typo INSIDE the first `blockLen`
    * characters escapes the block ([[deletionNeighborhood]] /
    * [[fuzzyPairs]] is the COMPLETE distance-1 generator; this scales
    * to larger distances by paying that blind spot). The
    * `|len(a) − len(b)| ≤ maxDist` prefilter is sound (each edit moves
    * length by at most 1) and discards most of the block before the
    * O(len²) DP runs; the verify is Spark's codegen'd `levenshtein`,
    * the textbook unit-cost DP every engine implements identically.
    *
    * Shape: one equi-join on the prefix block (distinct keys, so block
    * size is data-bounded; AQE splits a skewed prefix), the length
    * prefilter rides the join condition, and only surviving pairs pay
    * the DP. Returns `(key_a, key_b, dist)` with `key_a < key_b`. */
  def editDistancePairs(df: DataFrame, keyCol: String, blockLen: Int,
      maxDist: Int): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val keys = df.select(col(keyCol).as("__key__")).distinct()
      .withColumn("__block__",
        lower(substring(col("__key__"), 1, blockLen)))
      .withColumn("__len__", length(col("__key__")))
    keys.select(col("__block__"), col("__key__").as("key_a"),
        col("__len__").as("__la__"))
      .join(keys.select(col("__block__"), col("__key__").as("key_b"),
          col("__len__").as("__lb__")),
        Seq("__block__"))
      .filter(col("key_a") < col("key_b") &&
        abs(col("__la__") - col("__lb__")) <= maxDist)
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= maxDist)
      .select(col("key_a"), col("key_b"), col("dist"))
  }

  /** Exact set-similarity self-join with PREFIX FILTERING (the Bayardo
    * All-Pairs / PPJoin candidate rule): all `(id_a < id_b)` pairs whose
    * distinct word-`k`-shingle sets have Jaccard ≥ `thNum/thDen` —
    * COMPLETE, unlike MinHash LSH (no banding misses), yet never
    * quadratic. Each set is sorted by global rarity (document frequency
    * asc, hash asc — a total order, so no global rank assignment is
    * needed) and only its PREFIX of length `n - ceil(t·n) + 1` enters the
    * self-join: if `J(x,y) ≥ t` then `|x∩y| ≥ ceil(t·|x|)` (because
    * `J ≤ i/max(|x|,|y|)`), so the first common element in the total
    * order sits inside BOTH prefixes — the equi-join on prefix elements
    * proposes every qualifying pair. Rarity ordering makes prefixes meet
    * on the corpus's RAREST shingles, collapsing the hot-key fan-out a
    * frequency-blind order would hit.
    *
    * Verify is exact-integer: candidate pairs fetch both docs' sorted
    * hash arrays (bounded by doc length, joined by id — only candidates
    * pay) and keep iff `inter·thDen ≥ thNum·(n_a + n_b - inter)`.
    * Returns (id_a, id_b, inter, n_a, n_b). */
  def prefixFilterJaccardPairs(df: DataFrame, idCol: String,
      textCol: String, shingleK: Int, thNum: Int, thDen: Int): DataFrame = {
    require(thNum >= 1 && thDen >= thNum,
      s"threshold must be in (0, 1]: $thNum/$thDen")
    import org.apache.spark.sql.expressions.Window
    val sh = Caches.registerDf(df.select(col(idCol).as("__id__"),
        explode(array_distinct(graft.functions.NativeHashes.shingle_hashes(
          col(textCol), shingleK))).as("__h__")).persist())
    val freq = sh.groupBy(col("__h__")).agg(count(lit(1)).as("__df__"))
    // per-doc rarity position AND set size off ONE doc-id partitioning
    // (two Window specs, same exchange — the sequencePack discipline;
    // never a global single-partition window, never a sizes join)
    val wDoc = Window.partitionBy(col("__id__"))
    val positioned = sh.join(freq, Seq("__h__"))
      .withColumn("__pos__", row_number().over(
        wDoc.orderBy(col("__df__").asc, col("__h__").asc)))
      .withColumn("__n__", count(lit(1)).over(wDoc))
    // prefix length n - ceil(t*n) + 1, ceil via exact integer div (the
    // `/` Column operator is double division — never for index math)
    val prefix = positioned.filter(col("__pos__") <=
      col("__n__") - expr(s"(__n__ * $thNum + ${thDen - 1}) div $thDen") + 1)
      .select(col("__h__"), col("__id__"))
    val cands = prefix.select(col("__h__"), col("__id__").as("id_a"))
      .join(prefix.select(col("__h__"), col("__id__").as("id_b")),
        Seq("__h__"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val sets = sh.groupBy(col("__id__"))
      .agg(sort_array(collect_list(col("__h__"))).as("__set__"))
    val out = cands
      .join(sets.select(col("__id__").as("id_a"), col("__set__").as("__sa__")),
        Seq("id_a"))
      .join(sets.select(col("__id__").as("id_b"), col("__set__").as("__sb__")),
        Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("__sa__"), col("__sb__")))
        .cast("long"))
      .withColumn("n_a", size(col("__sa__")).cast("long"))
      .withColumn("n_b", size(col("__sb__")).cast("long"))
      .filter(col("inter") * thDen >= (col("n_a") + col("n_b") - col("inter"))
        * thNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"))
    out
  }

  /** Fellegi–Sunter record-linkage weights (JASA 1969 — the model behind
    * every probabilistic matcher, Splink included): from LABELED
    * candidate pairs with per-field boolean agreement columns, estimate
    * `m_i = P(field i agrees | match)` and `u_i = P(agrees | non-match)`
    * and emit each field's evidence weights
    * `w_agree = ln(m/u)`, `w_disagree = ln((1−m)/(1−u))` — a scored pair
    * sums the weights of its agreement vector. Probabilities are
    * add-half smoothed (`(a + ½)/(n + 1)` — Jeffreys prior; keeps every
    * weight finite when a field always or never agrees) and each is ONE
    * exact-ratio division, each weight ONE ln of their quotient —
    * engine-exact before the 6dp rounding.
    *
    * Returns per field: n_match, n_agree_match, n_nonmatch,
    * n_agree_nonmatch (the exact evidence), m, u, w_agree, w_disagree.
    *
    * Scale shape: ONE partial-aggregable pass over the pairs (2·|fields|
    * conditional sums + 2 counts in a single aggregate); output is
    * |fields| rows. Candidate generation stays in the blocking ops
    * ([[sortedNeighborhood]], [[jaroWinklerPairs]]); this prices the
    * evidence. */
  def fellegiSunter(pairs: DataFrame, labelCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one agreement field")
    val spark = pairs.sparkSession
    import spark.implicits._
    val isM = col(labelCol) === true
    val aggs =
      Seq(sum(when(isM, 1L).otherwise(0L)).as("__nm__"),
        sum(when(!isM, 1L).otherwise(0L)).as("__nu__")) ++
      fields.flatMap { f => Seq(
        sum(when(isM && col(f), 1L).otherwise(0L)).as(s"__am_$f"),
        sum(when(!isM && col(f), 1L).otherwise(0L)).as(s"__au_$f"))
      }
    val one = pairs.agg(aggs.head, aggs.tail: _*)
    val rows = fields.map { f =>
      val m = (col(s"__am_$f").cast("double") + 0.5) /
        (col("__nm__").cast("double") + 1.0)
      val u = (col(s"__au_$f").cast("double") + 0.5) /
        (col("__nu__").cast("double") + 1.0)
      one.select(lit(f).as("field"),
        col("__nm__").as("n_match"), col(s"__am_$f").as("n_agree_match"),
        col("__nu__").as("n_nonmatch"),
        col(s"__au_$f").as("n_agree_nonmatch"),
        round(m, 6).as("m"), round(u, 6).as("u"),
        round(log(m / u), 6).as("w_agree"),
        round(log((lit(1.0) - m) / (lit(1.0) - u)), 6).as("w_disagree"))
    }
    rows.reduce(_ unionAll _)
  }

  /** Golden-record survivorship — the step AFTER matching: linkage
    * ([[editDistancePairs]] / [[jaroWinklerPairs]] → connected
    * components) says which records are the same entity; this merges
    * each cluster into one canonical record. Per field, the surviving
    * value comes from the best row that actually HAS the field —
    * "best" = lexicographic max of `(field is not null, orderCol,
    * idCol)`, i.e. freshest-wins per field with the unique id as the
    * deterministic tie-break — so a stale row's phone number never
    * overwrites a fresh one, but a fresh row with a NULL phone doesn't
    * erase the only phone the cluster has (the standard "most recent
    * non-null" survivorship rule). A field null on every member stays
    * null. `rep_id` is the overall-best member (max `(orderCol,
    * idCol)`), the cluster's provenance anchor.
    *
    * Shape: ONE partial-aggregable groupBy on the cluster key — every
    * per-field survivor is a `max(struct(...))` that combines map-side,
    * so the shuffle carries |clusters| rows of current bests, never the
    * members; AQE splits a hot cluster. The unique id breaks every tie
    * BEFORE the value field, so the comparison never reaches a value
    * and engines can't diverge on value-type ordering. `orderCol` and
    * `idCol` must be non-null (a null order key would sort engine-
    * dependently); enforce upstream.
    *
    * Returns `(cluster, n_members, rep_id, fields…)`. */
  def goldenRecords(df: DataFrame, clusterCol: String, orderCol: String,
      idCol: String, fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one field to merge")
    val fieldAggs = fields.map { f =>
      max(struct(col(f).isNotNull.cast("int").as("p"),
        col(orderCol).as("o"), col(idCol).as("i"), col(f).as("v")))
        .getField("v").as(f)
    }
    val aggs = Seq(count(lit(1)).as("n_members"),
      max(struct(col(orderCol).as("o"), col(idCol).as("i")))
        .getField("i").as("rep_id")) ++ fieldAggs
    df.groupBy(col(clusterCol).as("cluster"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
