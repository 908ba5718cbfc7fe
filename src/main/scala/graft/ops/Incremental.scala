package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Snapshot diff: classify every key across two table versions as
    * `added` / `removed` / `changed` / `unchanged` — the audit step
    * between pipeline runs ("what did this rebuild actually touch?").
    * Rows are compared by `digestCol` (pre-computed content digest —
    * only key + digest enter the join, the dedup discipline: a 100 TB
    * snapshot ships 16 bytes per row, never payloads). One key-shuffled
    * full-outer join of two digest projections.
    *
    * Returns (key, status, old_digest, new_digest). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      digestCol: String): DataFrame = {
    val o = oldDf.select(col(keyCol).as("__k__"),
      col(digestCol).as("old_digest"))
    val n = newDf.select(col(keyCol).as("__k__"),
      col(digestCol).as("new_digest"))
    o.join(n, Seq("__k__"), "full_outer")
      .select(col("__k__").as(keyCol),
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") === col("new_digest"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_digest"), col("new_digest"))
  }

  /** SCD2 history build: collapse a per-key change-event stream into
    * slowly-changing-dimension validity intervals — one row per VERSION
    * with `[eff_from, eff_to)` bounds (`eff_to` null while current) and
    * a version ordinal. Consecutive events carrying the SAME tracked
    * value are no-op updates and collapse into their version; only
    * value CHANGES open a new interval. The warehouse-history twin of
    * [[snapshotDiff]]: diff audits two snapshots, SCD2 keeps the whole
    * timeline queryable (`AS OF` = `eff_from <= t < coalesce(eff_to, ∞)`).
    *
    * Shape: two key-partitioned windows (change detection via `lag`,
    * interval close via `lead`) on ONE hash partitioning + ordering; a
    * key costs its own history, nothing quadratic. Pass integer-micros
    * timestamps so both engines agree on every boundary. */
  def scd2(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    // idCol breaks (key, ts) ties — without it two same-ts updates make
    // the change detection partition-order-dependent
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val changes = events
      .withColumn("__prev__", lag(col(valueCol), 1).over(w))
      .filter(col("__prev__").isNull ||
        col("__prev__") =!= col(valueCol))
      .drop("__prev__")
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    changes
      .select(col(keyCol), col(valueCol),
        col(tsCol).as("eff_from"),
        lead(col(tsCol), 1).over(w2).as("eff_to"),
        row_number().over(w2).cast("long").as("version"))
  }

  /** Order-independent dataset fingerprint per shard — the
    * dataset-versioning primitive: "is this corpus byte-identical to the
    * one we trained on?" answered WITHOUT a sort or a diff. Each row
    * digests to `polyhash(id | digest)`; a shard's fingerprint is the
    * triple (row count, XOR of digests, SUM of digests mod 10⁹+7) —
    * every component commutative and associative, so the fingerprint is
    * layout/partitioning-independent AND MERGEABLE: the corpus total is
    * computed here FROM THE SHARD ROWS (never rescanning the data), the
    * same add-summaries path an incremental ingest uses. XOR alone is
    * blind to duplicated pairs; count+sum+xor together catch every
    * practical mutation (drop, dup, edit, swap-across-shards changes
    * shard rows but provably not the total).
    *
    * Shape: one partial-aggregable pass (sum in decimal(38,0) — 100 TB
    * row counts × 10⁹ digests pass Long), plus a |shards|-row
    * re-aggregation. Returns one row per shard + a `(total)` row. */
  /** CDC log compaction — the upsert/delete stream collapsed to current
    * state (the MERGE/compaction step every incrementally-maintained
    * 100 TB table runs): per key, the LATEST row in `(tsCol, idCol)`
    * order wins; if that row is a delete marker (`opCol == "delete"`)
    * the key vanishes from the compacted state rather than surfacing a
    * tombstone.
    *
    * Shape: one key-partitioned `row_number` window DESC + a `rn = 1`
    * filter — the filter-on-rank shape Spark prunes MAP-SIDE via
    * `WindowGroupLimit`, so a hot key ships one candidate per map task,
    * not its whole history (the [[graft.ops.Dedup.dedupParagraphs]]
    * discipline). The id tie-break makes same-timestamp races
    * deterministic. Returns the surviving rows minus the helper rank. */
  def compactCdc(cdc: DataFrame, keyCol: String, tsCol: String,
      idCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    cdc.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") === 1)
      .filter(col(opCol) =!= "delete")
      .drop("__rn__")
  }

  def datasetFingerprint(df: DataFrame, shardCol: String, idCol: String,
      digestCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val p = 1000000007L
    val rowh = graft.functions.NativeHashes.poly_hash(
      concat(col(idCol).cast("string"), lit("|"),
        col(digestCol).cast("string")))
    val shards = df
      .select(col(shardCol).as("shard"), rowh.as("__h__"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h__)").as("xor_digest"),
        (sum(col("__h__").cast(dec)) % p).cast("long").as("sum_digest"))
    val total = shards
      .agg(sum(col("n_rows")).as("n_rows"),
        expr("bit_xor(xor_digest)").as("xor_digest"),
        (sum(col("sum_digest").cast(dec)) % p).cast("long")
          .as("sum_digest"))
      .select(lit("(total)").as("shard"), col("n_rows"),
        col("xor_digest"), col("sum_digest"))
    shards.unionByName(total)
  }
}
