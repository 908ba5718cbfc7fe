package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._

class ModelJsonSpec extends AnyFunSuite {

  private val json =
    """{
      |  "dimensions": [
      |    {"name": "date", "role": "time",
      |     "levels": [
      |       {"name": "year", "role": "year"},
      |       {"name": "month", "attributes": ["month", "month_name"],
      |        "key": "month", "label_attribute": "month_name"},
      |       "day"],
      |     "hierarchies": [
      |       {"name": "ymd", "levels": ["year", "month", "day"]},
      |       {"name": "ym", "levels": ["year", "month"]}]},
      |    {"name": "flag"},
      |    {"name": "shipdate", "template": "date", "label": "Ship date"}
      |  ],
      |  "cubes": [{
      |    "name": "sales",
      |    "fact": "fact_sales",
      |    "key": "id",
      |    "dimensions": ["date", "flag", "adhoc"],
      |    "measures": ["amount", {"name": "price", "aggregates": ["sum", "avg"]}],
      |    "joins": [{"master": "fact_sales.date_id", "detail": "dim_date.id",
      |               "method": "master"}],
      |    "mappings": {
      |      "date.year": "dim_date.year",
      |      "date.day": {"table": "dim_date", "column": "d", "extract": "day"}}
      |  }]
      |}""".stripMargin

  lazy val cube: Cube = ModelJson.loadString(json).head

  test("cube basics + key + fact table") {
    assert(cube.name == "sales")
    assert(cube.factTable == "fact_sales")
    assert(cube.keyColumn.contains("id"))
  }

  test("linked, flat, and unknown-bare dimensions expand correctly") {
    val date = cube.dimension("date")
    assert(date.role.contains("time"))
    assert(date.levels.map(_.name) == Seq("year", "month", "day"))
    assert(date.level("month").key.name == "month")
    assert(date.level("month").labelAttribute.name == "month_name")
    assert(date.hierarchy(Some("ym")).levelNames == Seq("year", "month"))
    // bare string level
    assert(date.level("day").attributes.map(_.name) == Seq("day"))
    // flat dimension: bare ref
    assert(cube.dimension("flag").levels.head.key.ref == "flag")
    // name not in shared dims → flat adhoc dimension
    assert(cube.dimension("adhoc").isFlat)
  }

  test("dimension templates clone the base definition with overrides") {
    val cubes = ModelJson.loadString(json)
    val _ = cubes // templates resolved at load; check via a fresh parse
    val dims = ModelJson.loadString(json.replace("\"dimensions\": [\"date\", \"flag\", \"adhoc\"]",
      "\"dimensions\": [\"date\", \"shipdate\"]"))
    val ship = dims.head.dimension("shipdate")
    assert(ship.levels.map(_.name) == Seq("year", "month", "day"))
    assert(ship.label.contains("Ship date"))
    assert(ship.role.contains("time"))
  }

  test("default aggregates derive from measures + fact count") {
    val names = cube.aggregates.map(_.name)
    assert(names.contains("amount_sum"))
    assert(names.contains("price_sum") && names.contains("price_avg"))
    assert(names.contains("fact_count"))
  }

  test("joins and mappings parse with methods and extracts") {
    val j = cube.joins.head
    assert(j.masterTable == "fact_sales" && j.masterColumns == Seq("date_id"))
    assert(j.detailTable == "dim_date" && j.method == JoinMethod.Master)
    assert(cube.mappings("date.year") == PhysicalRef("dim_date", "year"))
    assert(cube.mappings("date.day") ==
      PhysicalRef("dim_date", "d", extract = Some("day")))
  }
}
