package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cells.{Cell, PointCut}
import graft.workspace.Workspace

/** The reference's own hello_world tutorial, end-to-end through graft:
  * its shipped `model.json` (bare-column mappings, expression measure and
  * aggregate) over its shipped `data.csv`, running the exact queries of
  * `examples/hello_world/aggregate.py` — summary, drilldown by item,
  * point-cut slice + drilldown. Golden values are the tutorial's own
  * published output (total 1,116,860), independently recomputed from the
  * CSV. This is the "a reference user could switch" proof at the whole-
  * example grain, not the per-operator grain. */
class HelloWorldSpec extends AnyFunSuite {

  private val exampleDir = "/root/reference/examples/hello_world"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** data.csv loaded the way the reference's prepare_data.py does it:
    * columns are renamed POSITIONALLY onto the model's physical names. */
  private lazy val fact = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$exampleDir/data.csv")
    val names = Seq("category", "category_label", "subcategory",
      "subcategory_label", "line_item", "year", "amount")
    raw.toDF(names: _*)
  }

  private lazy val browser = {
    val modelJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$exampleDir/model.json")), "UTF-8")
    val ws = new Workspace(spark).importModel(modelJson)
      .registerTable("irbd_balance", fact)
    ws.browser("irbd_balance")
  }

  // exact-decimal sums surface as BigDecimal; counts as Long
  private def num(r: org.apache.spark.sql.Row, c: String): Long =
    r.getAs[Number](c).longValue()

  test("summary: record count, amount sum, expression-aggregate double sum") {
    val row = browser.aggregate().summary.get.collect().head
    assert(num(row, "record_count") == 62L)
    assert(num(row, "amount_sum") == 1116860L)
    assert(num(row, "double_amount_sum") == 2233720L)
  }

  test("drilldown by item: the tutorial's category table") {
    val cells = browser.aggregate(drilldown = Seq("item")).cells
      .orderBy(col("`item.category`")).collect()
    val got = cells.map(r => (
      r.getAs[String]("item.category"),
      r.getAs[String]("item.category_label"),
      num(r, "record_count"), num(r, "amount_sum"),
      num(r, "double_amount_sum")))
    assert(got.toSeq == Seq(
      ("a", "Assets", 32L, 558430L, 1116860L),
      ("e", "Equity", 8L, 77592L, 155184L),
      ("l", "Liabilities", 22L, 480838L, 961676L)))
  }

  test("slice Category = Equity, drill to subcategory") {
    val cell = Cell(PointCut("item", Seq("e")))
    val cells = browser.aggregate(cell, drilldown = Seq("item")).cells
      .orderBy(col("`item.subcategory`")).collect()
    val got = cells.map(r => (
      r.getAs[String]("item.subcategory"),
      r.getAs[String]("item.subcategory_label"),
      num(r, "record_count"), num(r, "amount_sum")))
    assert(got.toSeq == Seq(
      ("cs", "Capital Stock", 2L, 22983L),
      ("da", "Deferred Amounts", 2L, 672L),
      ("oe", "Other", 2L, -4726L),
      ("re", "Retained Earnings", 2L, 58663L)))
  }
}
