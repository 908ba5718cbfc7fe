package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-row text-analysis operators
  * (language ID, stopword hits, repetition stats). The SQL-lambda
  * formulations in [[graft.ops.TextAnalysis]] are the executable spec and
  * stay DuckDB-replayable; these JIT-compiled twins produce IDENTICAL
  * values (cross-validated in OpsSpec and by the differential oracle) at a
  * fraction of the per-row cost — higher-order `filter`/`aggregate`
  * lambdas are interpreted per ELEMENT in Spark, which is the difference
  * between a toy and a 100 TB text-filter pass.
  */
object TextImpls {

  /** Canonical per-language stopword lists (the single definition;
    * [[graft.ops.TextAnalysis.stopwords]] re-exports it). Order matters:
    * argmax ties break by list position. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "una"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "que"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不")
  )

  private val langNames: Array[UTF8String] =
    stopwords.map(l => UTF8String.fromString(l._1)).toArray

  private val wordSets: Array[java.util.HashSet[String]] =
    stopwords.map { case (_, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray

  private val setsByLang: java.util.HashMap[String, java.util.HashSet[String]] = {
    val m = new java.util.HashMap[String, java.util.HashSet[String]]()
    stopwords.indices.foreach(i => m.put(stopwords(i)._1, wordSets(i)))
    m
  }

  private val und = UTF8String.fromString("und")

  // Java-regex \s (ASCII) — the exact class Spark's split("\\s+") uses;
  // Character.isWhitespace would disagree on NEL/unicode spaces
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Per-token callback over the \s+ tokenization of `s`, skipping the
    * empty tokens a regex split can produce only at position 0 (stopwords
    * are never empty, so skipping them is value-neutral). */
  @inline private def foreachToken(s: String)(f: (String) => Unit): Unit = {
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) f(s.substring(start, i))
    }
  }

  /** Language-ID over the ALREADY-LOWERCASED text: stopword-hit argmax,
    * ties by list order, "und" when zero hits — value-identical to
    * [[graft.ops.TextAnalysis.languageId]]'s lambda formulation (which
    * this caller must feed `lower(text)`, keeping Spark's own lowercasing
    * semantics). */
  def langId(lowered: String): UTF8String = {
    val counts = new Array[Int](wordSets.length)
    foreachToken(lowered) { t =>
      var l = 0
      while (l < wordSets.length) {
        if (wordSets(l).contains(t)) counts(l) += 1
        l += 1
      }
    }
    var best = 0
    var bestIdx = -1
    var l = 0
    while (l < counts.length) {
      if (counts(l) > best) { best = counts(l); bestIdx = l }
      l += 1
    }
    if (bestIdx < 0) und else langNames(bestIdx)
  }

  /** Stopword hits for one language over SINGLE-SPACE-split tokens of the
    * already-lowercased text — matches `size(filter(split(lowered, " "),
    * isin(words)))` (empty tokens from consecutive spaces are never
    * stopwords, so the manual scan skips them with no value change). */
  def spaceStopwordHits(lowered: String, lang: String): Long = {
    val set = setsByLang.get(lang)
    if (set == null) return 0L
    var hits = 0L
    var i = 0
    val n = lowered.length
    while (i < n) {
      while (i < n && lowered.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && lowered.charAt(i) != ' ') i += 1
      if (i > start && set.contains(lowered.substring(start, i))) hits += 1
    }
    hits
  }

  /** Repetition stats over the RAW text in one pass, as
    * [n_lines, distinct_lines, max_line_len, word_count, max_word_run]:
    * value-identical to the lambda formulation of
    * [[graft.ops.TextAnalysis.repetitionFeatures]] (lines split on \n and
    * kept when they contain a non-space char — Spark `trim` strips 0x20
    * only; the modal-word count equals the longest equal run of the
    * sorted word array). */
  def repetitionStats(raw: String): Array[Long] = {
    var nLines = 0L
    var maxLineLen = 0L
    val seen = new java.util.HashSet[String]()
    var ls = 0
    val n = raw.length
    var i = 0
    while (i <= n) {
      if (i == n || raw.charAt(i) == '\n') {
        val line = raw.substring(ls, i)
        // Spark trim(l) strips ' ' only; keep iff any non-space remains
        var j = 0
        var keep = false
        while (j < line.length && !keep) {
          if (line.charAt(j) != ' ') keep = true
          j += 1
        }
        if (keep) {
          nLines += 1
          seen.add(line)
          if (line.length > maxLineLen) maxLineLen = line.length
        }
        ls = i + 1
      }
      i += 1
    }
    var wc = 0L
    val counts = new java.util.HashMap[String, Int]()
    var maxRun = 0L
    foreachToken(raw) { w =>
      wc += 1
      val c = counts.merge(w, 1, (a, b) => a + b)
      if (c > maxRun) maxRun = c
    }
    Array(nLines, seen.size.toLong, maxLineLen, wc, maxRun)
  }
}

/** lang_id(lowered): stopword-argmax language ID in one call. */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextImpls.langId(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextImpls.langId($c.toString())")
  override protected def withNewChildInternal(c: Expression): LangIdExpr = copy(c)
}

/** stopword_hits(lowered): one language's hit count over space-split
  * tokens. */
case class StopwordHitsExpr(child: Expression, lang: String)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextImpls.spaceStopwordHits(v.asInstanceOf[UTF8String].toString, lang)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.TextImpls.spaceStopwordHits($c.toString(), "$lang")""")
  override protected def withNewChildInternal(c: Expression): StopwordHitsExpr =
    copy(child = c)
}

/** repetition_stats(text): [n_lines, distinct_lines, max_line_len,
  * word_count, max_word_run] in one pass. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextImpls.repetitionStats(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextImpls.repetitionStats($c.toString()))")
  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
}

object NativeText {
  import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}
  def lang_id(lowered: Column): Column = toCol(LangIdExpr(toExpr(lowered)))
  def stopword_hits(lowered: Column, lang: String): Column =
    toCol(StopwordHitsExpr(toExpr(lowered), lang))
  def repetition_stats(text: Column): Column =
    toCol(RepetitionStatsExpr(toExpr(text)))
}
