package graft.cells

import graft.model.{Cube, Dimension}

/** Cells and cuts: the slicing vocabulary of the browser. A cell is a
  * conjunction of cuts; a cut constrains one dimension by a point, range,
  * or set of hierarchy paths (reference `cubes/query/cells.py`).
  *
  * Path values are strings at this layer ("2010", "ASIA", `__null__`);
  * the star compiler casts them against physical column types.
  */
sealed trait Cut {
  def dim: String
  def hierarchy: Option[String]
  def invert: Boolean
  /** Number of hierarchy levels this cut constrains (deepest path). */
  def levelDepth: Int
}

/** Path down a hierarchy, e.g. `date:2010,6` (reference `cells.py:770-812`). */
final case class PointCut(
    dim: String,
    path: Seq[String],
    hierarchy: Option[String] = None,
    invert: Boolean = false
) extends Cut {
  def levelDepth: Int = path.size
}

/** Hierarchical path range `date:2010,1-2012,3`; open ends allowed
  * (reference `cells.py:815-879`). */
final case class RangeCut(
    dim: String,
    from: Option[Seq[String]],
    to: Option[Seq[String]],
    hierarchy: Option[String] = None,
    invert: Boolean = false
) extends Cut {
  def levelDepth: Int = math.max(from.map(_.size).getOrElse(0), to.map(_.size).getOrElse(0))
}

/** Set of paths `date:2010;2012` (reference `cells.py:882-930`). */
final case class SetCut(
    dim: String,
    paths: Seq[Seq[String]],
    hierarchy: Option[String] = None,
    invert: Boolean = false
) extends Cut {
  def levelDepth: Int = if (paths.isEmpty) 0 else paths.map(_.size).max
}

/** Immutable conjunction of cuts (reference `cells.py:36-464`). */
final case class Cell(cuts: Seq[Cut] = Nil) {
  def isEmpty: Boolean = cuts.isEmpty

  /** Replace any existing cut of the dimension with the new cut. */
  def slice(cut: Cut): Cell =
    Cell(cuts.filterNot(_.dim == cut.dim) :+ cut)

  def cut(dim: String): Option[Cut] = cuts.find(_.dim == dim)

  /** Point-cut path for a dimension, if any (used for implicit drilldown). */
  def pointPath(dim: String, hierarchy: Option[String] = None): Option[Seq[String]] =
    cuts.collectFirst {
      case PointCut(d, path, h, false) if d == dim &&
        (hierarchy.isEmpty || h == hierarchy || h.isEmpty) => path
    }

  /** Drill one level deeper along a dimension: extend the point cut.
    * The existing cut's hierarchy binding is preserved when the caller
    * does not name one (a `(year,week)` cut must not silently rebind its
    * extended path to the default `(year,month,day)` hierarchy). */
  def drilldown(dim: String, value: String, hierarchy: Option[String] = None): Cell =
    cuts.collectFirst {
      case PointCut(d, path, h, false) if d == dim &&
        (hierarchy.isEmpty || h == hierarchy || h.isEmpty) => (path, h)
    } match {
      case Some((path, h)) =>
        slice(PointCut(dim, path :+ value, hierarchy.orElse(h)))
      case None => slice(PointCut(dim, Seq(value), hierarchy))
    }

  /** Roll up: drop the deepest level of the dimension's point cut. */
  def rollup(dim: String): Cell = cut(dim) match {
    case Some(PointCut(d, path, h, inv)) =>
      if (path.size <= 1) Cell(cuts.filterNot(_.dim == dim))
      else slice(PointCut(d, path.dropRight(1), h, inv))
    case _ => this
  }

  /** Roll up TO a named level of the dimension's hierarchy (reference
    * `rollup_dim`, `query/cells.py:222-257`): the point-cut path is
    * truncated at the level (inclusive); an empty result drops the cut.
    * No cut on the dimension → the cell is unchanged. */
  def rollupDim(dim: graft.model.Dimension, level: Option[String] = None,
      hierarchy: Option[String] = None): Cell = cut(dim.name) match {
    case Some(PointCut(d, path, h, inv)) =>
      val hier = dim.hierarchy(hierarchy.orElse(h))
      val rolled = hier.rollup(path, level)
      if (rolled.isEmpty) Cell(cuts.filterNot(_.dim == d))
      else slice(PointCut(d, rolled, h, inv))
    case _ => this
  }

  /** Cut depth per dimension (reference `level_depths`,
    * `query/cells.py:334-347`): the deepest path length of any cut on the
    * dimension. */
  def levelDepths: Map[String, Int] =
    cuts.groupBy(_.dim).map { case (d, cs) => d -> cs.map(_.levelDepth).max }

  /** Conjunction of two cells. */
  def &(other: Cell): Cell = Cell(cuts ++ other.cuts)

  def toCutString: String = cuts.map(CutParser.print).mkString(CutParser.CutSep)
}

object Cell {
  val empty: Cell = Cell(Nil)
  def apply(cut: Cut): Cell = Cell(Seq(cut))
}

/** Cut-string grammar (reference `cells.py:466-678`):
  *
  * {{{
  * cuts      := cut ("|" cut)*
  * cut       := ["!"] dim ["@" hierarchy] ":" body
  * body      := range | set | point
  * range     := path "-" path | path "-" | "-" path
  * set       := path (";" path)+
  * point     := path
  * path      := value ("," value)*
  * }}}
  *
  * Backslash escapes the separators `| : , - ;` inside values; the literal
  * `__null__` denotes a NULL member.
  */
object CutParser {
  val CutSep = "|"
  val DimSep = ":"
  val PathSep = ","
  val RangeSep = "-"
  val SetSep = ";"
  val NullValue = "__null__"

  private val escapable = Set('|', ':', ',', '-', ';', '\\', '!', '@')

  /** Split on an unescaped single-char separator, preserving escapes in the
    * pieces for later unescaping. */
  private def splitUnescaped(s: String, sep: Char): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { cur.append(c).append(s.charAt(i + 1)); i += 2 }
      else if (c == sep) { parts += cur.toString; cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    parts += cur.toString
    parts.toSeq
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length &&
        (escapable.contains(s.charAt(i + 1)) || s.charAt(i + 1).isWhitespace)) {
        sb.append(s.charAt(i + 1)); i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Escapes the grammar's separators, plus a value's leading/trailing
    * WHITESPACE (any class — space, tab, newline, unicode) — [[parseCell]]
    * trims surrounding whitespace for query-param convenience (the
    * reference does not trim at all), so boundary whitespace must be
    * marked to make print ∘ parse = id. Mid-value whitespace stays plain,
    * matching the reference's printed form. */
  private def escape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val boundaryWs = c.isWhitespace && (i == 0 || i == s.length - 1)
      if (escapable.contains(c) || boundaryWs) sb.append('\\')
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Whether the char at `idx` is escaped (odd run of preceding '\'). */
  private def escapedAt(s: String, idx: Int): Boolean = {
    var n = 0
    var i = idx - 1
    while (i >= 0 && s.charAt(i) == '\\') { n += 1; i -= 1 }
    n % 2 == 1
  }

  /** Trim surrounding whitespace without eating an escaped trailing
    * space (an escaped LEADING space starts with '\' and is never
    * whitespace-trimmed). */
  private def trimUnescaped(s: String): String = {
    var start = 0
    while (start < s.length && s.charAt(start).isWhitespace) start += 1
    var end = s.length
    while (end > start && s.charAt(end - 1).isWhitespace &&
      !escapedAt(s, end - 1)) end -= 1
    s.substring(start, end)
  }

  def parsePath(s: String): Seq[String] =
    if (s.isEmpty) Nil else splitUnescaped(s, ',').map(unescape)

  /** Parse one cut, e.g. `!date@ym:2010,1-2012,3`. */
  def parseCut(s: String): Cut = {
    val (invert, rest0) = if (s.startsWith("!")) (true, s.drop(1)) else (false, s)
    val dimBody = splitUnescaped(rest0, ':')
    require(dimBody.size >= 2, s"malformed cut '$s' (missing ':')")
    val dimPart = dimBody.head
    val body = dimBody.tail.mkString(":") // ':' inside body only via escape; be lenient
    val (dim, hier) = splitUnescaped(dimPart, '@') match {
      case Seq(d)    => (unescape(d), None)
      case Seq(d, h) => (unescape(d), Some(unescape(h)))
      case other     => (unescape(other.head), Some(unescape(other(1))))
    }
    val setParts = splitUnescaped(body, ';')
    if (setParts.size > 1)
      SetCut(dim, setParts.map(parsePath), hier, invert)
    else {
      val rangeParts = splitUnescaped(body, '-')
      if (rangeParts.size == 2) {
        val from = if (rangeParts.head.isEmpty) None else Some(parsePath(rangeParts.head))
        val to = if (rangeParts(1).isEmpty) None else Some(parsePath(rangeParts(1)))
        RangeCut(dim, from, to, hier, invert)
      } else PointCut(dim, parsePath(body), hier, invert)
    }
  }

  /** Parse a full cut string `cut|cut|...` into a cell. */
  def parseCell(s: String): Cell =
    if (s == null || s.trim.isEmpty) Cell.empty
    else Cell(splitUnescaped(trimUnescaped(s), '|').filter(_.nonEmpty).map(parseCut))

  def printPath(path: Seq[String]): String = path.map(escape).mkString(PathSep)

  def print(cut: Cut): String = {
    val neg = if (cut.invert) "!" else ""
    val hier = cut.hierarchy.map("@" + escape(_)).getOrElse("")
    val head = s"$neg${escape(cut.dim)}$hier$DimSep"
    cut match {
      case PointCut(_, path, _, _) => head + printPath(path)
      case SetCut(_, paths, _, _)  => head + paths.map(printPath).mkString(SetSep)
      case RangeCut(_, from, to, _, _) =>
        head + from.map(printPath).getOrElse("") + RangeSep + to.map(printPath).getOrElse("")
    }
  }
}

/** One resolved drilldown item: dimension + hierarchy + the levels to
  * group by (reference `browser.py:865-1039`). */
final case class DrilldownItem(
    dim: Dimension,
    hierarchyName: Option[String],
    levelNames: Seq[String]
) {
  def levels: Seq[graft.model.Level] = levelNames.map(dim.level)
  /** Group-by key attributes, outermost level first. */
  def keyRefs: Seq[String] = levels.map(_.key.ref)
  def allRefs: Seq[String] = levels.flatMap(_.attributes.map(_.ref))
}

object Drilldown {
  /** Resolve drilldown spec strings against a cube + cell. Spec grammar:
    * `dim`, `dim:level`, `dim@hier`, `dim@hier:level`. A bare `dim` means:
    * if the cell has a point cut on the dimension, the next level below the
    * cut's depth; else the first level (reference `levels_from_drilldown`,
    * `browser.py:1043-1128`).
    */
  def resolve(cube: Cube, cell: Cell, specs: Seq[String]): Seq[DrilldownItem] =
    specs.map { spec =>
      val (dimHier, levelOpt) = spec.split(":", 2) match {
        case Array(dh)     => (dh, None)
        case Array(dh, lv) => (dh, Some(lv))
      }
      val (dimName, hierName) = dimHier.split("@", 2) match {
        case Array(d)    => (d, None)
        case Array(d, h) => (d, Some(h))
      }
      val dim = cube.dimension(dimName)
      val hier = dim.hierarchy(hierName)
      val levels: Seq[String] = levelOpt match {
        case Some(lv) =>
          hier.levelsForDepth(hier.levelIndex(lv) + 1)
        case None =>
          // implicit depth considers EVERY cut on the dimension (point,
          // range, set, inverted) like the reference's cell.level_depths()
          // (`query/cells.py:334-347`, used by `levels_from_drilldown`)
          val depth = cell.cuts.collect {
            case c if c.dim == dimName &&
              (hierName.isEmpty || c.hierarchy == hierName || c.hierarchy.isEmpty) =>
              c.levelDepth
          }.maxOption.getOrElse(0)
          if (depth >= hier.levelNames.size)
            throw new IllegalArgumentException(
              s"cannot drill deeper on '$dimName': cut already at depth $depth")
          hier.levelsForDepth(depth, drilldown = true)
      }
      DrilldownItem(dim, hierName, levels)
    }
}
