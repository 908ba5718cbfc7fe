package graft.workspace

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{Cube, ModelJson}
import graft.star.StarSchema
import graft.browser.Browser
import graft.cells.Cell

/** Workspace: model registry + browser factory (reference
  * `cubes/workspace.py:56-230,510+` — config loads models and stores,
  * `workspace.browser(cube)` instantiates the store's browser). Here a
  * store is a directory (or explicit map) of parquet tables; models come
  * from JSON ([[ModelJson]]) or are registered programmatically. */
final class Workspace(val spark: SparkSession) {

  private val cubes = scala.collection.mutable.LinkedHashMap.empty[String, Cube]
  private val tables = scala.collection.mutable.Map.empty[String, DataFrame]
  private val browsers = scala.collection.mutable.Map.empty[String, Browser]

  def registerCube(cube: Cube): this.type = { cubes(cube.name) = cube; this }

  def importModel(json: String): this.type = {
    ModelJson.loadString(json).foreach(registerCube)
    this
  }

  /** Register every `<name>.parquet` under the directory as a table. */
  def registerTableDir(dir: String): this.type = {
    // tolerate TIMESTAMP(NANOS) columns (read as long nanos)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    files.filter(_.getName.endsWith(".parquet")).foreach { f =>
      tables(f.getName.stripSuffix(".parquet")) =
        spark.read.parquet(f.getAbsolutePath)
    }
    this
  }

  def registerTable(name: String, df: DataFrame): this.type = {
    tables(name) = df; this
  }

  def cubeNames: Seq[String] = cubes.keys.toSeq
  def cube(name: String): Cube = cubes.getOrElse(name,
    throw new IllegalArgumentException(s"unknown cube '$name'"))

  /** Browser for a cube (cached; reference builds mapper+star once per
    * browser, `sql/browser.py:102-190`). */
  def browser(cubeName: String, restriction: Cell = Cell.empty,
      locale: Option[String] = None): Browser =
    browsers.getOrElseUpdate(s"$cubeName/${restriction.toCutString}/$locale", {
      val c = cube(cubeName)
      val fact = tables.getOrElse(c.factTable,
        throw new IllegalArgumentException(s"no table '${c.factTable}' registered"))
      new Browser(c, new StarSchema(c, fact, tables.toMap), spark,
        restrictionCell = restriction, locale = locale)
    })
}
