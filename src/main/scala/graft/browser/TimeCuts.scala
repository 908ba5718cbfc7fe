package graft.browser

import java.time.LocalDateTime
import graft.model.Cube
import graft.cells._
import graft.calendar.Calendar

/** Relative time-member conversion for cuts on `role="time"` dimensions
  * (reference `calendar.py:298-313`, wired at `query/browser.py:130-143`
  * and `server/decorators.py:27-29`): `cut=date:yesterday` becomes the
  * concrete hierarchy path, `cut=date:last4quarters` becomes a range cut.
  */
object TimeCuts {

  private def unitsFor(cube: Cube, dimName: String, hier: Option[String]): Option[Seq[String]] = {
    val dim = cube.dimensions.find(_.name == dimName).getOrElse(return None)
    if (!dim.role.contains("time")) return None
    val levels = dim.hierarchy(hier).levelNames.map(dim.level)
    Some(levels.map(l => l.role.getOrElse(l.name)))
  }

  def convert(cube: Cube, cell: Cell,
      now: LocalDateTime = LocalDateTime.now()): Cell =
    Cell(cell.cuts.map(convertCut(cube, _, now)))

  def convertCut(cube: Cube, cut: Cut, now: LocalDateTime): Cut = {
    val units = unitsFor(cube, cut.dim, cut.hierarchy).getOrElse(return cut)
    def conv(path: Seq[String]): Seq[String] = path match {
      case Seq(single) => Calendar.convertPath(single, units, now)
      case p => p
    }
    cut match {
      case PointCut(d, Seq(name), h, inv) if Calendar.isTruncatedRange(name) =>
        // truncated-range name → range cut over unit-truncated endpoints
        val (from, to) = Calendar.namedRange(name, now)
        RangeCut(d,
          Some(Calendar.path(from, units).map(_.toString)),
          Some(Calendar.path(to, units).map(_.toString)), h, inv)
      case PointCut(d, p, h, inv) => PointCut(d, conv(p), h, inv)
      case RangeCut(d, from, to, h, inv) =>
        RangeCut(d, from.map(conv), to.map(conv), h, inv)
      case SetCut(d, paths, h, inv) => SetCut(d, paths.map(conv), h, inv)
    }
  }

  /** Parse a cut string and resolve relative time members against `now`. */
  def parseCell(cube: Cube, s: String,
      now: LocalDateTime = LocalDateTime.now()): Cell =
    convert(cube, CutParser.parseCell(s), now)
}
