package graft.tpch

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cells._

/** The correctness-gate query catalog: one entry per operator from
  * SURVEY.md §2, each paired (where SQL-expressible) with DuckDB oracle SQL
  * over the same parquet tables.
  *
  * Numeric discipline (see [[graft.functions.AggFunctions]]): float sums go
  * through exact DECIMAL(27,6) accumulation on BOTH sides, so values are
  * bit-identical regardless of partitioning/order. Every query also carries
  * a total deterministic ORDER BY on both sides.
  */
object Queries {

  private def b(spark: SparkSession, dir: String) = TpchModel.browser(spark, dir)

  /** DuckDB-side exact float sum. */
  private def dsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(27,6))) AS DOUBLE)"
  private def davg(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(27,6))) AS DOUBLE) / COUNT($x)"

  private val starJoin =
    """FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/J1/J2/F1: drilldown aggregation through the pruned snowflake,
    // point cut on the geo hierarchy's top level
    "q01_agg_drilldown" -> ((s, dir) =>
      b(s, dir).aggregate(
        cell = Cell(PointCut("customer", Seq("ASIA"))),
        drilldown = Seq("date:month"),
        aggregates = Seq("quantity_sum", "price_sum", "fact_count")
      ).cells),

    // A2: summary aggregation (grand total, no drilldown)
    "q02_agg_summary" -> ((s, dir) =>
      b(s, dir).aggregate(
        cell = Cell(PointCut("customer", Seq("ASIA"))),
        aggregates = Seq("quantity_sum", "price_sum", "fact_count")
      ).cells)
  )

  val oracle: Map[String, String] = Map(
    "q01_agg_drilldown" ->
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS "date.year",
         |  CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS "date.quarter",
         |  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS "date.month",
         |  ${dsum("l_quantity")} AS quantity_sum,
         |  ${dsum("l_extendedprice")} AS price_sum,
         |  COUNT(1) AS fact_count
         |$starJoin
         |WHERE r_name = 'ASIA'
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    "q02_agg_summary" ->
      s"""SELECT ${dsum("l_quantity")} AS quantity_sum,
         |  ${dsum("l_extendedprice")} AS price_sum,
         |  COUNT(1) AS fact_count
         |$starJoin
         |WHERE r_name = 'ASIA'""".stripMargin
  )
}
