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

  /** Events fact with `ts` normalized to a µs timestamp, whatever the
    * parquet encodes: TIMESTAMP(NANOS) reads as int64 under the legacy
    * conf and is rebuilt; a native TIMESTAMP(MICROS) passes through. */
  def eventsTable(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `ts div 1000`: INTEGRAL division — `col / 1000L` is a double
        // Divide whose 256ns ulp at epoch-nanos magnitude would shift a
        // fraction of rows by 1µs vs the oracle's exact epoch_us
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // naive micros: the UTC session timezone (pinned in every entry
        // point) makes the NTZ->LTZ cast epoch-preserving, matching the
        // oracle's treatment of the same naive parquet values
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Events fact with `ts` normalized to epoch nanoseconds (LongType),
    * for arithmetic-gap logic like sessionization. */
  def eventsNanos(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => eventsTable(spark, sfDir)
        .withColumn("ts", unix_micros(col("ts")) * 1000L)
    }
  }

  def browser(spark: SparkSession, sfDir: String): Browser = {
    val ev = eventsTable(spark, sfDir)
    new Browser(cube, new StarSchema(cube, ev, Map("events" -> ev)), spark)
  }
}
