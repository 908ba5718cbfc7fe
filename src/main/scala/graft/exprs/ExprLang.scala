package graft.exprs

import scala.collection.mutable

/** The cube expression language: arithmetic/boolean expressions over other
  * attributes with a whitelisted function set (reference
  * `cubes/sql/expressions.py:25-60,157-225`). The grammar is
  * SQL-expression-compatible, so compilation targets a Spark SQL string fed
  * to `functions.expr` — Catalyst parses, type-checks, and codegens it.
  * We (1) tokenize to find identifiers (for dependency topo-sort and
  * substitution with compiled columns), (2) enforce the function whitelist,
  * (3) rewrite a few spellings that differ between the cubes grammar and
  * Spark SQL.
  */
object ExprLang {

  /** Whitelisted scalar functions (reference `sql/expressions.py:25-47`). */
  val scalarFunctions: Set[String] = Set(
    // string
    "lower", "upper", "left", "right", "substr", "lpad", "rpad", "replace",
    "concat", "repeat", "position",
    // math
    "round", "trunc", "floor", "ceil", "mod", "remainder", "sign", "min",
    "max", "pow", "exp", "log", "log10", "sqrt", "cos", "sin", "tan",
    // date
    "extract",
    // conditional
    "coalesce", "nullif", "case", "if", "when", "then", "else", "end"
  )

  /** Aggregate functions allowed inside expressions
    * (reference `sql/expressions.py:52-54`). */
  val aggregateFunctions: Set[String] =
    Set("sum", "min", "max", "avg", "stddev", "variance", "count")

  /** Variables (reference `sql/expressions.py:58-60`). */
  val variables: Set[String] =
    Set("current_date", "current_time", "local_date", "local_time")

  private val keywords: Set[String] =
    Set("and", "or", "not", "is", "null", "true", "false", "in", "like",
      "between", "from", "as", "distinct",
      // CASE expression words — never attribute refs
      "case", "when", "then", "else", "end")

  /** Date-part words are keywords ONLY inside `extract(part from x)` —
    * i.e. when the next token is `from`. Context-free keyword status
    * would shadow attributes legitimately named `month`/`day`/… (common
    * in OLAP models). */
  private val dateParts: Set[String] =
    Set("year", "month", "day", "hour", "minute", "second", "quarter", "week")

  private def isKeywordAt(toks: Seq[Token], idx: Int, lower: String): Boolean =
    keywords.contains(lower) ||
      (dateParts.contains(lower) &&
        idx + 1 < toks.size && (toks(idx + 1) match {
          // case-insensitive: `extract(year FROM x)` must behave like
          // `extract(year from x)`
          case Ident(s) => s.equalsIgnoreCase("from")
          case _ => false
        }))

  sealed trait Token
  final case class Ident(s: String) extends Token
  final case class Lit(s: String) extends Token
  final case class Op(s: String) extends Token

  /** Tokenize just enough to distinguish identifiers from string literals,
    * numbers, and operators. */
  def tokenize(expr: String): Seq[Token] = {
    val out = mutable.ArrayBuffer.empty[Token]
    var i = 0
    val n = expr.length
    while (i < n) {
      val c = expr.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') { // string literal, '' escape
        val sb = new StringBuilder("'")
        i += 1
        var done = false
        while (i < n && !done) {
          val ch = expr.charAt(i)
          if (ch == '\'') {
            if (i + 1 < n && expr.charAt(i + 1) == '\'') { sb.append("''"); i += 2 }
            else { sb.append('\''); i += 1; done = true }
          } else { sb.append(ch); i += 1 }
        }
        out += Lit(sb.toString)
      } else if (c.isDigit || (c == '.' && i + 1 < n && expr.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (expr.charAt(i).isDigit || expr.charAt(i) == '.' ||
          expr.charAt(i) == 'e' || expr.charAt(i) == 'E' ||
          ((expr.charAt(i) == '+' || expr.charAt(i) == '-') && i > start &&
            (expr.charAt(i - 1) == 'e' || expr.charAt(i - 1) == 'E')))) i += 1
        out += Lit(expr.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (expr.charAt(i).isLetterOrDigit || expr.charAt(i) == '_' ||
          expr.charAt(i) == '.')) i += 1
        out += Ident(expr.substring(start, i))
      } else {
        // multi-char operators
        val two = if (i + 1 < n) expr.substring(i, i + 2) else ""
        if (Set("<=", ">=", "!=", "<>", "||", "&&").contains(two)) { out += Op(two); i += 2 }
        else { out += Op(c.toString); i += 1 }
      }
    }
    out.toSeq
  }

  /** Identifiers referenced by an expression = its attribute dependencies
    * (function names, keywords, and variables excluded). An identifier
    * immediately followed by '(' is a function call. */
  def identifiers(expr: String): Set[String] = {
    val toks = tokenize(expr)
    toks.zipWithIndex.collect {
      case (Ident(s), idx)
        if !isKeywordAt(toks, idx, s.toLowerCase) &&
          !variables.contains(s.toLowerCase) &&
          !(idx + 1 < toks.size && toks(idx + 1) == Op("(")) =>
        s
    }.toSet
  }

  /** Validate that every function call is whitelisted. */
  def validateFunctions(expr: String): Unit = {
    val toks = tokenize(expr)
    toks.zipWithIndex.foreach {
      case (Ident(s), idx) if idx + 1 < toks.size && toks(idx + 1) == Op("(") =>
        val f = s.toLowerCase
        if (!scalarFunctions.contains(f) && !aggregateFunctions.contains(f) &&
          !keywords.contains(f))
          throw new IllegalArgumentException(
            s"function '$s' is not in the expression-language whitelist")
      case _ =>
    }
  }

  /** Spellings that differ between the cubes expression grammar and
    * Spark SQL. */
  private val fnRewrite: Map[String, String] = Map(
    "pow" -> "power",
    "substr" -> "substring",
    "remainder" -> "mod"
  )

  /** Functions that rewrite to a TEMPLATE over the (already-rewritten)
    * argument text — used where the cubes grammar has a scalar Spark
    * lacks but an expression composition expresses natively (no session
    * UDF, stays inside whole-stage codegen). Template functions are
    * single-argument only (enforced at capture close — a top-level comma
    * in the argument raises an arity error instead of splicing garbage
    * into the template); the argument may still appear more than once in
    * the template, which is safe because the grammar has no
    * non-deterministic functions. */
  private val fnTemplate: Map[String, String => String] = Map(
    // numeric truncation toward zero — Spark's `trunc` is date-only.
    // try_cast(x as bigint) truncates toward zero and is NULL for
    // NaN / ±Infinity / |x| ≥ 2^63 — exactly the values that pass
    // through unchanged (a double that large is already integral), so
    // the coalesce fallback re-emits the input; a NULL input stays NULL
    // through both branches.
    "trunc" -> (a =>
      s"coalesce ( double ( try_cast ( $a as bigint ) ) , double ( $a ) )")
  )

  /** Rewrite an expression to Spark SQL, substituting identifier refs via
    * `rename` (e.g. to backticked physical/compiled names). */
  def toSparkSql(expr: String, rename: String => String): String = {
    validateFunctions(expr)
    val toks = tokenize(expr)
    // output buffers: the base buffer plus one capture buffer per
    // in-flight fnTemplate call (entered at its '('); tokens emit into
    // the innermost buffer, and the template splices the captured text
    // when its matching ')' closes
    final case class Capture(openDepth: Int, name: String,
      template: String => String, buf: StringBuilder = new StringBuilder) {
      var sawTopComma: Boolean = false
    }
    val base = new StringBuilder
    val captures = mutable.Stack.empty[Capture]
    var depth = 0
    // a template name was just seen; its '(' opens a capture
    var pendingTemplate: Option[(String, String => String)] = None
    def emit(s: String): Unit = {
      val buf = if (captures.nonEmpty) captures.top.buf else base
      if (buf.nonEmpty) buf.append(' ')
      buf.append(s)
    }
    toks.zipWithIndex.foreach { case (t, idx) =>
      t match {
        case Ident(s) =>
          val isFn = idx + 1 < toks.size && toks(idx + 1) == Op("(")
          val lower = s.toLowerCase
          if (isFn && fnTemplate.contains(lower))
            pendingTemplate = Some((lower, fnTemplate(lower)))
          else if (isFn) emit(fnRewrite.getOrElse(lower, s))
          else if (isKeywordAt(toks, idx, lower) ||
            variables.contains(lower)) emit(s)
          else emit(rename(s))
        case Lit(s) => emit(s)
        case Op("(") =>
          pendingTemplate match {
            case Some((name, tpl)) =>
              captures.push(Capture(depth, name, tpl))
              pendingTemplate = None
            case None => emit("(")
          }
          depth += 1
        case Op(")") =>
          depth -= 1
          if (captures.nonEmpty && captures.top.openDepth == depth) {
            val c = captures.pop()
            if (c.sawTopComma)
              throw new IllegalArgumentException(
                s"${c.name} takes exactly one argument")
            emit(c.template(c.buf.toString))
          } else emit(")")
        case Op(",") =>
          // a comma at a capture's own paren level = a second argument to
          // a single-argument template function
          if (captures.nonEmpty && depth == captures.top.openDepth + 1)
            captures.top.sawTopComma = true
          emit(",")
        case Op(s) => emit(s)
      }
    }
    base.toString
  }

  /** Topologically sort attribute refs by their expression dependencies
    * (reference `attributes.py:551-608`). Cycle → IllegalArgumentException. */
  def depSort(refs: Seq[String], deps: String => Set[String]): Seq[String] = {
    val visited = mutable.LinkedHashSet.empty[String]
    val visiting = mutable.Set.empty[String]
    def visit(r: String): Unit = {
      if (visited.contains(r)) return
      if (visiting.contains(r))
        throw new IllegalArgumentException(s"circular attribute dependency at '$r'")
      visiting += r
      deps(r).toSeq.sorted.foreach(visit)
      visiting -= r
      visited += r
    }
    refs.foreach(visit)
    visited.toSeq
  }
}
