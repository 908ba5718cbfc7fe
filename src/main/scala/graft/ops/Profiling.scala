package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-style summary a pipeline records per
  * snapshot: row/null/distinct counts and min/max per column, computed
  * in ONE scan (a single aggregation with every statistic as a column,
  * reshaped to per-column rows afterwards — not one job per column).
  */
object Profiling {

  /** One profile row per requested column:
    * (col_name, n_rows, n_null, n_distinct, min_value, max_value), with
    * the extrema cast to strings so heterogeneous column types share one
    * schema. Exact `count_distinct` — Catalyst plans the multi-distinct
    * aggregation with one Expand pass (rows × |cols|); swap
    * `approx_count_distinct` in at extreme widths where ±2% is fine. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__n__") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map(c => struct(
      lit(c).as("col_name"), col("__n__").as("n_rows"),
      col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value")))
    one.select(explode(array(perCol: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_null"),
        col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
  }
}
