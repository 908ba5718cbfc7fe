package graft.tpch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.star.StarSchema
import graft.browser.Browser

/** Second cube over the testdata: the `events` table browsed through the
  * same OLAP vocabulary — time hierarchy from the event timestamp, flat
  * event-type/user dimensions, value measures. Demonstrates multi-cube
  * workspaces and time-role dimensions on a non-TPC-H fact. */
object EventsModel {

  val timeDim: Dimension = Dimension(
    "time",
    role = Some("time"),
    levels = Seq(
      Level("year", Seq(Attribute("year", Some("time"))), role = Some("year")),
      Level("month", Seq(Attribute("month", Some("time"))), role = Some("month")),
      Level("day", Seq(Attribute("day", Some("time"))), role = Some("day")),
      Level("hour", Seq(Attribute("hour", Some("time"))), role = Some("hour"))
    )
  )

  val cube: Cube = Cube(
    name = "events",
    factTable = "events",
    dimensions = Seq(timeDim,
      Dimension.flat("event_type"),
      Dimension.flat("user")),
    measures = Seq(Measure("value")),
    aggregates = Seq(
      MeasureAggregate("n_events", function = Some("count")),
      MeasureAggregate("value_sum", function = Some("sum"), measure = Some("value")),
      MeasureAggregate("value_avg", function = Some("avg"), measure = Some("value")),
      MeasureAggregate("users", function = Some("count_distinct"), measure = Some("user"))
    ),
    mappings = Map(
      "time.year" -> PhysicalRef("events", "ts", extract = Some("year")),
      "time.month" -> PhysicalRef("events", "ts", extract = Some("month")),
      "time.day" -> PhysicalRef("events", "ts", extract = Some("day")),
      "time.hour" -> PhysicalRef("events", "ts", extract = Some("hour")),
      "event_type" -> PhysicalRef("events", "event_type"),
      "user" -> PhysicalRef("events", "user_id"),
      "value" -> PhysicalRef("events", "value")
    ),
    keyColumn = Some("event_id")
  )

  /** Events fact with the nanos timestamp rebuilt as a µs timestamp. */
  def eventsTable(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
  }

  def browser(spark: SparkSession, sfDir: String): Browser = {
    val ev = eventsTable(spark, sfDir)
    new Browser(cube, new StarSchema(cube, ev, Map("events" -> ev)), spark)
  }
}
