package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering for
  * min/max data skipping. A 100 TB table is read thousands of times per
  * write; laying files out so that point/range predicates on MULTIPLE
  * columns prune at the file-footer level (parquet min/max) is the
  * storage-side twin of predicate pushdown — the Delta/Iceberg Z-ORDER
  * technique, built here from public primitives: a Morton-interleave
  * expression + `repartitionByRange`.
  */
object Layout {

  /** Z-order (Morton) value of two non-negative coordinates: low 31 bits
    * of each, bit-interleaved (codegen'd
    * [[graft.functions.ZOrder2Expr]]). Rows close in BOTH dimensions get
    * close z values — range-partitioning by z therefore gives every file
    * a compact bounding box in (a, b) space, so parquet min/max footers
    * prune files for predicates on EITHER column. */
  def zorderValue(a: Column, b: Column): Column =
    graft.functions.NativeHashes.zorder2(a, b)

  /** SQL-lambda spec of [[zorderValue]] — bit-identical, mirrored by the
    * DuckDB oracle. */
  def zorderValueLambda(a: Column, b: Column): Column = {
    val x = a.cast("long").bitwiseAND(lit(0x7FFFFFFFL))
    val y = b.cast("long").bitwiseAND(lit(0x7FFFFFFFL))
    (0 until 31).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)): Column
    }.reduce(_ + _)
  }

  /** Write `df` z-ordered on (`colA`, `colB`) into `nFiles` range
    * partitions: one pass, one range exchange (sampled boundaries — no
    * global sort), parquet footers then carry tight min/max for BOTH
    * columns per file. The z column itself is persisted too, so later
    * readers can push `z BETWEEN lo AND hi` for rectangle queries. */
  def zorderWrite(df: DataFrame, colA: String, colB: String,
      path: String, nFiles: Int, zCol: String = "__z__"): Unit =
    df.withColumn(zCol, zorderValue(col(colA), col(colB)))
      .repartitionByRange(nFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
      .write.mode(SaveMode.Overwrite).parquet(path)
}
