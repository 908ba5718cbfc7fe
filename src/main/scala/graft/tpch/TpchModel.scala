package graft.tpch

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model._
import graft.star.StarSchema
import graft.browser.Browser

/** Cube model over the driver-provided TPC-H-ish star
  * (`/root/testdata/sf*`): `lineitem` fact; snowflake dims
  * customer→nation→region and supplier→nation→region (aliased), part,
  * a calendar dimension extracted from `o_orderdate`, and flat degenerate
  * dimensions on fact/order columns. See FIXTURES.md §7.
  */
object TpchModel {

  private def lvl(dim: String, name: String, attrs: (String, Boolean)*): Level =
    Level(name, attrs.map { case (a, flat) => Attribute(a, Some(dim), flatRef = flat) })

  val dateDim: Dimension = Dimension(
    "date",
    role = Some("time"),
    levels = Seq(
      Level("year", Seq(Attribute("year", Some("date"))), role = Some("year")),
      Level("quarter", Seq(Attribute("quarter", Some("date"))), role = Some("quarter")),
      Level("month", Seq(Attribute("month", Some("date"))), role = Some("month")),
      Level("day", Seq(Attribute("day", Some("date"))), role = Some("day"))
    )
  )

  val customerDim: Dimension = Dimension(
    "customer",
    levels = Seq(
      lvl("customer", "region", "region_name" -> false),
      lvl("customer", "nation", "nation_name" -> false),
      Level("customer",
        Seq(Attribute("custkey", Some("customer")),
          Attribute("name", Some("customer")),
          Attribute("mktsegment", Some("customer"))),
        keyName = Some("custkey"), labelAttributeName = Some("name"))
    ),
    hierarchies = Seq(
      Hierarchy("geo", Seq("region", "nation", "customer")),
      Hierarchy("nation", Seq("nation", "customer"))
    )
  )

  val supplierDim: Dimension = Dimension(
    "supplier",
    levels = Seq(
      lvl("supplier", "region", "region_name" -> false),
      lvl("supplier", "nation", "nation_name" -> false),
      Level("supplier",
        Seq(Attribute("suppkey", Some("supplier")),
          Attribute("name", Some("supplier"))),
        keyName = Some("suppkey"), labelAttributeName = Some("name"))
    ),
    hierarchies = Seq(Hierarchy("geo", Seq("region", "nation", "supplier")))
  )

  val partDim: Dimension = Dimension(
    "part",
    levels = Seq(
      lvl("part", "brand", "brand" -> false),
      Level("part",
        Seq(Attribute("partkey", Some("part")),
          Attribute("name", Some("part")),
          Attribute("type", Some("part")),
          Attribute("size", Some("part"))),
        keyName = Some("partkey"), labelAttributeName = Some("name"))
    )
  )

  /** Calendar dimension on the fact's own ship date — slicing it needs no
    * join at all (join pruning drops everything but the fact scan). */
  val shipDateDim: Dimension = Dimension(
    "shipdate",
    role = Some("time"),
    levels = Seq(
      Level("year", Seq(Attribute("year", Some("shipdate"))), role = Some("year")),
      Level("quarter", Seq(Attribute("quarter", Some("shipdate"))), role = Some("quarter")),
      Level("month", Seq(Attribute("month", Some("shipdate"))), role = Some("month")),
      Level("day", Seq(Attribute("day", Some("shipdate"))), role = Some("day"))
    )
  )

  val cube: Cube = Cube(
    name = "sales",
    factTable = "lineitem",
    dimensions = Seq(
      dateDim, shipDateDim, customerDim, supplierDim, partDim,
      Dimension.flat("returnflag"),
      Dimension.flat("linestatus"),
      Dimension.flat("orderstatus"),
      Dimension.flat("orderpriority"),
      Dimension.flat("shipdow")
    ),
    measures = Seq(
      Measure("quantity"),
      Measure("extendedprice"),
      Measure("discount"),
      Measure("tax"),
      Measure("revenue", expression = Some("extendedprice * (1 - discount)")),
      // NULL for most rows — exercises null-aggregate semantics (F7)
      Measure("price_hi", expression = Some("if(extendedprice > 104900, extendedprice, null)"))
    ),
    aggregates = Seq(
      MeasureAggregate("fact_count", function = Some("count")),
      MeasureAggregate("quantity_sum", function = Some("sum"), measure = Some("quantity")),
      MeasureAggregate("price_sum", function = Some("sum"), measure = Some("extendedprice")),
      MeasureAggregate("revenue_sum", function = Some("sum"), measure = Some("revenue")),
      MeasureAggregate("price_avg", function = Some("avg"), measure = Some("extendedprice")),
      MeasureAggregate("price_min", function = Some("min"), measure = Some("extendedprice")),
      MeasureAggregate("price_max", function = Some("max"), measure = Some("extendedprice")),
      MeasureAggregate("price_stddev", function = Some("stddev"), measure = Some("extendedprice")),
      MeasureAggregate("price_variance", function = Some("variance"), measure = Some("extendedprice")),
      MeasureAggregate("discount_avg", function = Some("avg"), measure = Some("discount")),
      MeasureAggregate("parts", function = Some("count_distinct"), measure = Some("part.partkey")),
      MeasureAggregate("parts_approx", function = Some("approx_count_distinct"), measure = Some("part.partkey")),
      MeasureAggregate("quantity_median", function = Some("median"), measure = Some("quantity")),
      MeasureAggregate("quantity_approx_median", function = Some("approx_median"), measure = Some("quantity")),
      MeasureAggregate("price_hi_sum", function = Some("sum"), measure = Some("price_hi")),
      MeasureAggregate("price_range",
        expression = Some("max(extendedprice) - min(extendedprice)")),
      MeasureAggregate("quantity_sma", function = Some("sma"), measure = Some("quantity_sum"), windowSize = Some(3)),
      MeasureAggregate("quantity_sms", function = Some("sms"), measure = Some("quantity_sum"), windowSize = Some(3)),
      MeasureAggregate("quantity_wma", function = Some("wma"), measure = Some("quantity_sum"), windowSize = Some(3)),
      MeasureAggregate("quantity_smstd", function = Some("smstd"), measure = Some("quantity_sum"), windowSize = Some(3)),
      MeasureAggregate("quantity_smvar", function = Some("smvar"), measure = Some("quantity_sum"), windowSize = Some(3)),
      MeasureAggregate("quantity_smrsd", function = Some("smrsd"), measure = Some("quantity_sum"), windowSize = Some(3))
    ),
    joins = Seq(
      // integrity = "verified": TPC-H guarantees non-null FKs present in
      // the dimension, enabling key-only join elimination (StarSchema)
      JoinSpec("lineitem", Seq("l_orderkey"), "orders", Seq("o_orderkey"),
        integrity = Some("verified")),
      JoinSpec("orders", Seq("o_custkey"), "customer", Seq("c_custkey"),
        integrity = Some("verified")),
      JoinSpec("customer", Seq("c_nationkey"), "nation", Seq("n_nationkey"),
        broadcastHint = Some(true), integrity = Some("verified")),
      JoinSpec("nation", Seq("n_regionkey"), "region", Seq("r_regionkey"),
        broadcastHint = Some(true), integrity = Some("verified")),
      JoinSpec("lineitem", Seq("l_partkey"), "part", Seq("p_partkey"),
        integrity = Some("verified")),
      JoinSpec("lineitem", Seq("l_suppkey"), "supplier", Seq("s_suppkey"),
        integrity = Some("verified")),
      JoinSpec("supplier", Seq("s_nationkey"), "nation", Seq("n_nationkey"),
        alias = Some("supp_nation"), broadcastHint = Some(true),
        integrity = Some("verified")),
      JoinSpec("supp_nation", Seq("n_regionkey"), "region", Seq("r_regionkey"),
        alias = Some("supp_region"), broadcastHint = Some(true),
        integrity = Some("verified"))
    ),
    mappings = Map(
      // calendar from the order date (extract pushed into the projection)
      "date.year" -> PhysicalRef("orders", "o_orderdate", extract = Some("year")),
      "date.quarter" -> PhysicalRef("orders", "o_orderdate", extract = Some("quarter")),
      "date.month" -> PhysicalRef("orders", "o_orderdate", extract = Some("month")),
      "date.day" -> PhysicalRef("orders", "o_orderdate", extract = Some("day")),
      "shipdate.year" -> PhysicalRef("lineitem", "l_shipdate", extract = Some("year")),
      "shipdate.quarter" -> PhysicalRef("lineitem", "l_shipdate", extract = Some("quarter")),
      "shipdate.month" -> PhysicalRef("lineitem", "l_shipdate", extract = Some("month")),
      "shipdate.day" -> PhysicalRef("lineitem", "l_shipdate", extract = Some("day")),
      "shipdow" -> PhysicalRef("lineitem", "l_shipdate", extract = Some("dow")),
      // customer geo snowflake
      "customer.region_name" -> PhysicalRef("region", "r_name"),
      "customer.nation_name" -> PhysicalRef("nation", "n_name"),
      "customer.custkey" -> PhysicalRef("customer", "c_custkey"),
      "customer.name" -> PhysicalRef("customer", "c_name"),
      "customer.mktsegment" -> PhysicalRef("customer", "c_mktsegment"),
      // supplier geo snowflake (aliased nation/region)
      "supplier.region_name" -> PhysicalRef("supp_region", "r_name"),
      "supplier.nation_name" -> PhysicalRef("supp_nation", "n_name"),
      "supplier.suppkey" -> PhysicalRef("supplier", "s_suppkey"),
      "supplier.name" -> PhysicalRef("supplier", "s_name"),
      // part
      "part.brand" -> PhysicalRef("part", "p_brand"),
      "part.partkey" -> PhysicalRef("part", "p_partkey"),
      "part.name" -> PhysicalRef("part", "p_name"),
      "part.type" -> PhysicalRef("part", "p_type"),
      "part.size" -> PhysicalRef("part", "p_size"),
      // flat degenerate dims
      "returnflag" -> PhysicalRef("lineitem", "l_returnflag"),
      "linestatus" -> PhysicalRef("lineitem", "l_linestatus"),
      "orderstatus" -> PhysicalRef("orders", "o_orderstatus"),
      "orderpriority" -> PhysicalRef("orders", "o_orderpriority"),
      // measures
      "quantity" -> PhysicalRef("lineitem", "l_quantity"),
      "extendedprice" -> PhysicalRef("lineitem", "l_extendedprice"),
      "discount" -> PhysicalRef("lineitem", "l_discount"),
      "tax" -> PhysicalRef("lineitem", "l_tax")
    )
  )

  val tableNames: Seq[String] =
    Seq("lineitem", "orders", "customer", "nation", "region", "part", "supplier")

  // memoized per (session, dir): re-reading parquet footers/schema for
  // every catalog query is pure fixed overhead
  private val tableCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Map[String, DataFrame]]

  def tables(spark: SparkSession, sfDir: String): Map[String, DataFrame] = {
    // evict entries whose session has stopped — without this, a JVM that
    // cycles sessions (sbt interactive runs, server restarts) pins every
    // dead session's DataFrames forever
    tableCache.keys.filter(_._1.sparkContext.isStopped)
      .foreach(tableCache.remove)
    tableCache.getOrElseUpdate((spark, sfDir),
      tableNames.map(n => n -> spark.read.parquet(s"$sfDir/$n.parquet")).toMap)
  }

  def browser(spark: SparkSession, sfDir: String): Browser =
    browserFor(cube, spark, sfDir)

  def browserFor(
      c: Cube,
      spark: SparkSession,
      sfDir: String,
      excludeNullAggregates: Boolean = false
  ): Browser = {
    val t = tables(spark, sfDir)
    new Browser(c, new StarSchema(c, t(c.factTable), t), spark,
      excludeNullAggregates = excludeNullAggregates)
  }

  /** Variant cube with one table's join method swapped (J3 tests). */
  def cubeWithJoinMethod(table: String, method: String): Cube =
    cube.copy(joins = cube.joins.map(j =>
      if (j.detailTable == table && j.alias.isEmpty) j.copy(method = method) else j))

  // --------------------------------------------------- compound join key (J5)

  /** J5: a dimension keyed on a TWO-column key (partkey, suppkey) — the
    * TPC-H partsupp relationship, built as a table EXPRESSION (S2) since
    * the testdata ships no partsupp.parquet: distinct (l_partkey,
    * l_suppkey) pairs enriched with part brand + supplier name. Neither
    * column alone is unique (each part has ~4 suppliers and vice versa),
    * so a join that dropped one key column would fan out and the q75 hash
    * gate would catch it (reference compound keys:
    * `cubes/sql/query.py:266-274,749-776`). */
  val partsuppDim: Dimension = Dimension(
    "partsupp",
    levels = Seq(
      lvl("partsupp", "brand", "brand" -> false),
      Level("partsupp",
        Seq(Attribute("partkey", Some("partsupp")),
          Attribute("suppkey", Some("partsupp")),
          Attribute("suppname", Some("partsupp"))))
    )
  )

  val compoundCube: Cube = cube.copy(
    name = "sales_partsupp",
    dimensions = cube.dimensions :+ partsuppDim,
    aggregates = cube.aggregates :+ MeasureAggregate("ps_suppliers",
      function = Some("count_distinct"), measure = Some("partsupp.suppkey")),
    joins = cube.joins :+ JoinSpec(
      "lineitem", Seq("l_partkey", "l_suppkey"),
      "partsupp", Seq("ps_partkey", "ps_suppkey"),
      // verified: the pairs are EXACTLY lineitem's distinct pairs, so the
      // compound FK is non-null, present, and the detail key unique
      integrity = Some("verified")),
    mappings = cube.mappings ++ Map(
      "partsupp.brand" -> PhysicalRef("partsupp", "ps_brand"),
      "partsupp.partkey" -> PhysicalRef("partsupp", "ps_partkey"),
      "partsupp.suppkey" -> PhysicalRef("partsupp", "ps_suppkey"),
      "partsupp.suppname" -> PhysicalRef("partsupp", "ps_suppname"))
  )

  /** The partsupp table expression backing [[compoundCube]]. */
  def partsuppTable(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val t = tables(spark, sfDir)
    t("lineitem")
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .join(t("part"), col("ps_partkey") === col("p_partkey"))
      .join(t("supplier"), col("ps_suppkey") === col("s_suppkey"))
      .select(col("ps_partkey"), col("ps_suppkey"),
        col("p_brand").as("ps_brand"), col("s_name").as("ps_suppname"))
  }

  def compoundBrowser(spark: SparkSession, sfDir: String): Browser = {
    val t = tables(spark, sfDir) + ("partsupp" -> partsuppTable(spark, sfDir))
    new Browser(compoundCube,
      new StarSchema(compoundCube, t("lineitem"), t), spark)
  }
}
