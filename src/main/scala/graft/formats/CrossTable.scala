package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-table (pivot) formatter: rows × columns × aggregate matrix from a
  * browse (reference `cubes/formatters.py:211-392`). The reference pivots
  * the fetched result in Python; here it is `Dataset.pivot`, which Catalyst
  * rewrites to one aggregation pass with a conditional-aggregate column per
  * pivot value — no second shuffle, scale-safe when the pivot-value list is
  * bounded (pass `columnValues` explicitly to keep it so and to keep output
  * schema deterministic).
  */
object CrossTable {

  def crossTable(
      projected: DataFrame,
      rowRefs: Seq[String],
      columnRef: String,
      columnValues: Seq[Any],
      aggExpr: Column
  ): DataFrame = {
    def b(r: String): Column = col(s"`$r`")
    projected
      .groupBy(rowRefs.map(b): _*)
      .pivot(columnRef, columnValues)
      .agg(aggExpr)
      .orderBy(rowRefs.map(r => b(r).asc): _*)
  }

  /** Collected cross-table: row-header tuples, column headers, and the
    * data matrix (reference `CrossTable` namedtuple, `formatters.py:236`).
    * Driver-side presentation of an already-pivoted (small) frame — the
    * heavy lifting happened in [[crossTable]]'s single aggregation pass. */
  final case class Collected(
      columns: Seq[String], rows: Seq[Seq[Any]], data: Seq[Seq[Any]],
      /** Whether the row limit cut the table short (fetches limit+1 to
        * detect) — callers surface it like the other formatters'
        * truncation signals instead of rendering a silently-capped table
        * as complete. */
      truncated: Boolean = false)

  def collect(pivoted: DataFrame, rowRefs: Seq[String],
      limit: Int = 10000): Collected = {
    val cols = pivoted.columns.toSeq
    val valueCols = cols.filterNot(rowRefs.contains)
    val fetched = pivoted.limit(limit + 1).collect()
    val rows = fetched.take(limit)
    Collected(
      columns = valueCols,
      rows = rows.map(r => rowRefs.map(f => r.getAs[Any](f))).toSeq,
      data = rows.map(r => valueCols.map(f => r.getAs[Any](f))).toSeq,
      truncated = fetched.length > limit)
  }

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    // strict JSON has no NaN/Infinity tokens — non-finite → null
    case d: java.lang.Double if d.isNaN || d.isInfinite  => "null"
    case f: java.lang.Float if f.isNaN || f.isInfinite   => "null"
    case n: java.lang.Number  => n.toString
    case b: java.lang.Boolean => b.toString
    case other => Formats.jsonString(String.valueOf(other))
  }

  /** Reference `CrossTableFormatter.format` (`formatters.py:311-360`):
    * `{"columns": …, "rows": …, "data": …}`. */
  def toJson(t: Collected): String = {
    val cols = t.columns.map(jsonVal).mkString("[", ",", "]")
    val rows = t.rows.map(_.map(jsonVal).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    val data = t.data.map(_.map(jsonVal).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    s"""{"columns": $cols, "rows": $rows, "data": $data}"""
  }

  // quote escaping matters: values also render inside double-quoted
  // attribute positions (the table's class)
  private def htmlEsc(v: Any): String = String.valueOf(v)
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  /** Reference `HTMLCrossTableFormatter` (`formatters.py:361-391` +
    * `templates/cross_table.html`): a plain table, row headers as `<th>`,
    * optional CSS class. */
  def toHtml(t: Collected, tableStyle: Option[String] = None): String = {
    val sb = new StringBuilder
    val cls = tableStyle.map(s => s""" class="${htmlEsc(s)}"""").getOrElse("")
    sb.append(s"<table$cls>\n<thead>\n<tr>")
    t.rows.headOption.foreach(_.foreach(_ => sb.append("<th></th>")))
    t.columns.foreach(c => sb.append(s"<th>${htmlEsc(c)}</th>"))
    sb.append("</tr>\n</thead>\n<tbody>\n")
    t.rows.zip(t.data).foreach { case (hdr, cells) =>
      sb.append("<tr>")
      hdr.foreach(h => sb.append(s"<th>${htmlEsc(h)}</th>"))
      cells.foreach(c => sb.append(s"<td>${htmlEsc(c)}</td>"))
      sb.append("</tr>\n")
    }
    sb.append("</tbody>\n</table>")
    sb.toString
  }

  /** Monospace text table (the `text` formatter of the reference CLI). */
  def toText(t: Collected): String = {
    val nHdr = t.rows.headOption.map(_.size).getOrElse(0)
    val header = Seq.fill(nHdr)("") ++ t.columns.map(String.valueOf(_: Any))
    val body = t.rows.zip(t.data).map { case (h, d) =>
      (h ++ d).map(v => String.valueOf(v))
    }
    val all = header +: body
    val widths = all.transpose.map(_.map(_.length).max)
    all.map(_.zip(widths).map { case (s, w) => s.padTo(w, ' ') }
      .mkString(" | ").stripTrailing()).mkString("\n")
  }
}
