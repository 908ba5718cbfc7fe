package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (delta-based) maintenance of pre-aggregated sinks — the
  * materialized-view counterpart of [[graft.materialize.Materialize]]'s
  * one-shot pre-aggregation (reference: the aggregate-store "pre-aggregated
  * sink" surface, `cubes/sql/store.py` materialization; the incremental
  * half is the part a 100 TB deployment actually runs day to day).
  *
  * Model: an aggregate table is a keyed vector of COMMUTATIVE-MONOID
  * summaries (counts and sums — the reference's additive aggregate
  * functions). A CDC delta stream of signed rows (`+1` insert, `-1`
  * delete; an update is a delete+insert pair) folds into the same shape,
  * and merging is just a keyed monoid add. Only the DELTA is scanned and
  * shuffled — the base table never moves, which at 100 TB is the entire
  * point: refresh cost is O(|delta| + |keys|), not O(|fact table|).
  *
  * Determinism: counts and integer sums are associative-exact, so the
  * merged table is bit-identical to a from-scratch recompute (the q124
  * oracle checks exactly that equivalence).
  */
object Incremental {

  /** Fold rows carrying a ±1 `signCol` into the keyed monoid shape:
    * `n = Σ sign` plus `Σ sign · c` for each of `sumCols` (integer
    * columns — double sums would be partition-order-dependent).
    * Works for the base load (all signs +1) and for CDC deltas alike. */
  def aggregateSigned(df: DataFrame, keyCols: Seq[String], signCol: String,
      sumCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(col(signCol)).cast("long").as("n"),
        sumCols.map(c =>
          sum(col(c) * col(signCol)).cast("long").as(s"${c}_sum")): _*)

  /** Merge base and delta aggregates of the same shape (same keys, same
    * `n`/`*_sum` columns): keyed monoid add, dropping keys whose count
    * reaches zero (fully-retracted groups must VANISH, as they would in
    * a recompute — an all-zero row would hash-differ). Both inputs are
    * |keys|-sized, so this shuffles aggregate rows, never facts. */
  def merge(base: DataFrame, delta: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val valueCols = base.columns.filterNot(keyCols.contains)
    require(valueCols.sameElements(delta.columns.filterNot(keyCols.contains)),
      s"base/delta shapes differ: ${base.columns.toSeq} vs ${delta.columns.toSeq}")
    base.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(valueCols.head)).cast("long").as(valueCols.head),
        valueCols.tail.map(c => sum(col(c)).cast("long").as(c)): _*)
      .filter(col("n") > 0)
  }
}
