package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured (JSON-string) column handling — every event pipeline
  * carries a `props` blob whose schema drifts faster than the table's:
  * new clients add fields, old clients send malformed payloads, and the
  * engine has to extract what it can WITHOUT failing the scan. Spark's
  * `get_json_object` returns null on malformed JSON and missing paths
  * (never throws), which is exactly the posture a 100 TB scan needs —
  * one bad row cannot kill a stage. Everything here is per-row
  * projection + partial-aggregable collapse; JSON text never rides a
  * shuffle.
  */
object SemiStructured {

  /** Extract a JSON path as a long (null on malformed JSON, missing
    * path, or a non-numeric value — the never-throw contract; under
    * ANSI mode a plain cast would FAIL THE STAGE on the first
    * non-numeric value, so this is `try_cast`). */
  def jsonLong(jsonCol: Column, path: String): Column =
    get_json_object(jsonCol, path).try_cast("long")

  /** Extract a JSON path as a string (null on malformed/missing). */
  def jsonString(jsonCol: Column, path: String): Column =
    get_json_object(jsonCol, path)

  /** Per-group health + stats of one numeric JSON field — the
    * "is this payload field usable?" audit run before anything trusts
    * it: row count, rows where the field did NOT extract (malformed
    * payload, missing path, or non-numeric — the consumer can't tell
    * the difference and shouldn't), and exact sum/min/max over the rows
    * that did. One partial-aggregable groupBy. */
  def fieldStats(df: DataFrame, groupCol: String, jsonCol: String,
      path: String): DataFrame = {
    val k = jsonLong(col(jsonCol), path)
    df.select(col(groupCol), k.as("__k__"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__k__").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(col("__k__")).as("k_sum"),
        min(col("__k__")).as("k_min"),
        max(col("__k__")).as("k_max"))
  }
}
