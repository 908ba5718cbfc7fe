package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-table (pivot) formatter: rows × columns × aggregate matrix from a
  * browse (reference `cubes/formatters.py:211-392`). The reference pivots
  * the fetched result in Python; here it is `Dataset.pivot`, which Catalyst
  * rewrites to one aggregation pass with a conditional-aggregate column per
  * pivot value — no second shuffle, scale-safe when the pivot-value list is
  * bounded (pass `columnValues` explicitly to keep it so and to keep output
  * schema deterministic).
  */
object CrossTable {

  def crossTable(
      projected: DataFrame,
      rowRefs: Seq[String],
      columnRef: String,
      columnValues: Seq[Any],
      aggExpr: Column
  ): DataFrame = {
    def b(r: String): Column = col(s"`$r`")
    projected
      .groupBy(rowRefs.map(b): _*)
      .pivot(columnRef, columnValues)
      .agg(aggExpr)
      .orderBy(rowRefs.map(r => b(r).asc): _*)
  }
}
