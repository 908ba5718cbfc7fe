package graft.formats

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Result output formats (reference `cubes/formatters.py:58-150`): CSV,
  * JSON-lines, JSON. XLSX is driver-side in the reference and out of scope
  * for a distributed engine (a driver-side collect-and-write would bolt on
  * trivially). Distributed writers — each format scales with the result. */
object Formats {

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString).csv(path)

  /** JSON-lines (reference `formatters.py:136-149`) — Spark's native JSON
    * sink is already line-delimited. */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Driver-side JSON array string for small results (server responses). */
  def toJsonArray(df: DataFrame, limit: Int = 10000): String =
    df.limit(limit).toJSON.collect().mkString("[", ",", "]")
}
