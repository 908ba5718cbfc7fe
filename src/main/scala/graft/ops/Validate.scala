package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality expectations over a frame — the ingest-gate of a
  * training-data pipeline (declare what the snapshot must satisfy, get
  * exact violation counts back; a nonzero row blocks promotion). The
  * rule set covers the checks a warehouse contract needs: null-rate,
  * domain membership, numeric range, key uniqueness, referential
  * integrity.
  *
  * Scale shape: every ROW-LOCAL rule (null / range / set) compiles into
  * one conditional-sum column of a SINGLE aggregation pass — N rules
  * cost one scan, not N. [[Validate.Unique]] adds one partial-aggregable
  * groupBy on its key; [[Validate.ForeignKey]] adds one left-anti join
  * (broadcast when the reference side is small, AQE's call). Output is
  * |rules| rows.
  */
object Validate {

  sealed trait Rule { def name: String }
  /** Column must be non-null. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** Non-null values must fall in [lo, hi] (inclusive). */
  final case class InRange(col: String, lo: Long, hi: Long) extends Rule {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Non-null values must belong to the set. */
  final case class InSet(col: String, values: Seq[String]) extends Rule {
    def name = s"in_set($col)"
  }
  /** The key tuple must be unique; every row of a duplicated key counts
    * as a violation. */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Non-null key tuples must exist in `refDf`'s `refCols` (rows with
    * any null key component are skipped, SQL FK semantics). */
  final case class ForeignKey(cols: Seq[String], refDf: DataFrame,
      refCols: Seq[String], refName: String) extends Rule {
    require(cols.length == refCols.length, "FK arity mismatch")
    def name = s"foreign_key(${cols.mkString(",")}→$refName)"
  }

  /** Evaluate all rules; returns (rule, n_rows, n_violations) ordered
    * by rule name. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val spark = df.sparkSession
    import spark.implicits._
    val local = rules.collect {
      case r: NotNull => r.name ->
        sum(when(col(r.col).isNull, 1L).otherwise(0L))
      case r: InRange => r.name ->
        sum(when(col(r.col).isNotNull &&
          (col(r.col) < r.lo || col(r.col) > r.hi), 1L).otherwise(0L))
      case r: InSet => r.name ->
        sum(when(col(r.col).isNotNull &&
          !col(r.col).isin(r.values: _*), 1L).otherwise(0L))
    }
    // one scan for every row-local rule: a count + one conditional sum
    // per rule, all map-side partial
    val localDf: Option[DataFrame] =
      if (local.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n__") +:
          local.map { case (n, c) => c.as(s"__v__$n") }
        val row = df.agg(aggs.head, aggs.tail: _*)
        Some(row.select(explode(array(local.map { case (n, _) =>
          struct(lit(n).as("rule"), col("__n__").as("n_rows"),
            coalesce(col(s"__v__$n"), lit(0L)).as("n_violations"))
        }: _*)).as("__r__")).select(col("__r__.*")))
      }
    val nRows = df.count()
    val globals: Seq[DataFrame] = rules.collect {
      case r: Unique =>
        val dups = df.groupBy(r.cols.map(col): _*)
          .agg(count(lit(1)).as("__c__"))
          .filter(col("__c__") > 1)
          .agg(coalesce(sum(col("__c__")), lit(0L)).as("n_violations"))
        dups.select(lit(r.name).as("rule"), lit(nRows).as("n_rows"),
          col("n_violations"))
      case r: ForeignKey =>
        val keyed = df.filter(r.cols.map(col(_).isNotNull).reduce(_ && _))
        val orphans = keyed.join(
          r.refDf.select(r.refCols.zip(r.cols).map { case (rc, c) =>
            col(rc).as(c) }: _*),
          r.cols, "left_anti")
        orphans.agg(count(lit(1)).as("n_violations"))
          .select(lit(r.name).as("rule"), lit(nRows).as("n_rows"),
            col("n_violations"))
    }
    (localDf.toSeq ++ globals).reduce(_ unionAll _)
      .orderBy(col("rule"))
  }
}
