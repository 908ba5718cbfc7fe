package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cells._
import graft.model._

class CellsSpec extends AnyFunSuite {

  test("point cut round-trips through the string grammar") {
    val s = "date:2010,6"
    val cell = CutParser.parseCell(s)
    assert(cell.cuts == Seq(PointCut("date", Seq("2010", "6"))))
    assert(cell.toCutString == s)
  }

  test("invert, hierarchy, set and range cuts parse") {
    val cell = CutParser.parseCell("!date@ym:2010|geo:ASIA;EUROPE|d:2010,1-2012,3")
    assert(cell.cuts(0) == PointCut("date", Seq("2010"), Some("ym"), invert = true))
    assert(cell.cuts(1) == SetCut("geo", Seq(Seq("ASIA"), Seq("EUROPE"))))
    assert(cell.cuts(2) == RangeCut("d", Some(Seq("2010", "1")), Some(Seq("2012", "3"))))
  }

  test("open-ended ranges") {
    assert(CutParser.parseCut("d:2010-") == RangeCut("d", Some(Seq("2010")), None))
    assert(CutParser.parseCut("d:-2010") == RangeCut("d", None, Some(Seq("2010"))))
  }

  test("escaped separators survive a round trip") {
    val cut = PointCut("dim", Seq("a-b", "c;d", "e,f"))
    val printed = CutParser.print(cut)
    assert(CutParser.parseCut(printed) == cut)
  }

  test("__null__ sentinel is preserved") {
    assert(CutParser.parseCut("d:__null__") == PointCut("d", Seq("__null__")))
  }

  test("fuzz: print ∘ parse = id over escaped separators (reference test_cut_string_conversions)") {
    // property-style with a fixed seed: 300 random cells whose dims,
    // hierarchies and path values draw from an alphabet loaded with every
    // separator and escapable char of the grammar (`| : , - ; @ ! \`),
    // plus the __null__ sentinel, spaces and unicode
    val rnd = new scala.util.Random(20260812L)
    val alphabet = "ab9 _|:,-;@!\\√é\t\n".toCharArray
    def value(): String = {
      val s = String.valueOf(Array.fill(1 + rnd.nextInt(8))(
        alphabet(rnd.nextInt(alphabet.length))))
      if (rnd.nextInt(12) == 0) CutParser.NullValue else s
    }
    def path(): Seq[String] = Seq.fill(1 + rnd.nextInt(3))(value())
    def cut(): Cut = {
      val dim = value()
      val hier = if (rnd.nextBoolean()) Some(value()) else None
      val inv = rnd.nextBoolean()
      rnd.nextInt(3) match {
        case 0 => PointCut(dim, path(), hier, inv)
        case 1 => SetCut(dim, Seq.fill(2 + rnd.nextInt(2))(path()), hier, inv)
        case _ =>
          // at least one bound present ("dim:-" with both open is legal
          // but a degenerate spelling; generated separately below)
          val from = if (rnd.nextBoolean()) Some(path()) else None
          val to = if (from.isEmpty || rnd.nextBoolean()) Some(path()) else None
          RangeCut(dim, from, to, hier, inv)
      }
    }
    (1 to 300).foreach { i =>
      val cell = Cell(Seq.fill(1 + rnd.nextInt(3))(cut()))
      val printed = cell.toCutString
      val reparsed = CutParser.parseCell(printed)
      assert(reparsed == cell,
        s"case $i: '$printed' reparsed as ${reparsed.cuts} != ${cell.cuts}")
    }
    // degenerate but legal spellings round-trip too
    assert(CutParser.parseCut(CutParser.print(RangeCut("d", None, None)))
      == RangeCut("d", None, None))
    assert(CutParser.parseCut(CutParser.print(PointCut("d", Nil)))
      == PointCut("d", Nil))
  }

  test("cell algebra: slice replaces, rollup drops deepest, drilldown extends") {
    val c0 = Cell(PointCut("date", Seq("2010")))
    val c1 = c0.drilldown("date", "6")
    assert(c1.pointPath("date").contains(Seq("2010", "6")))
    assert(c1.rollup("date").pointPath("date").contains(Seq("2010")))
    val c2 = c1.slice(PointCut("date", Seq("2011")))
    assert(c2.pointPath("date").contains(Seq("2011")))
    assert((c0 & Cell(PointCut("geo", Seq("ASIA")))).cuts.size == 2)
  }

  private val dim = Dimension("date", levels = Seq(
    Level("year", Seq(Attribute("year", Some("date")))),
    Level("month", Seq(Attribute("month", Some("date")))),
    Level("day", Seq(Attribute("day", Some("date"))))))
  private val cube = Cube("c", "f", Seq(dim))

  test("drilldown: explicit level includes the prefix") {
    val items = Drilldown.resolve(cube, Cell.empty, Seq("date:month"))
    assert(items.head.levelNames == Seq("year", "month"))
  }

  test("drilldown: implicit next level from the cell's point cut") {
    val items = Drilldown.resolve(cube,
      Cell(PointCut("date", Seq("2010"))), Seq("date"))
    assert(items.head.levelNames == Seq("year", "month"))
    val top = Drilldown.resolve(cube, Cell.empty, Seq("date"))
    assert(top.head.levelNames == Seq("year"))
  }

  test("drilldown past the deepest level is refused") {
    val cell = Cell(PointCut("date", Seq("2010", "6", "15")))
    assertThrows[IllegalArgumentException] {
      Drilldown.resolve(cube, cell, Seq("date"))
    }
  }

  test("drilldown preserves the existing cut's hierarchy binding") {
    val c = Cell(PointCut("date", Seq("2010"), Some("yw")))
    assert(c.drilldown("date", "6").cut("date")
      .contains(PointCut("date", Seq("2010", "6"), Some("yw"))))
    // explicit hierarchy from the caller still wins
    assert(c.drilldown("date", "6", Some("yw")).cut("date")
      .contains(PointCut("date", Seq("2010", "6"), Some("yw"))))
  }

  test("implicit drilldown depth counts range/set/inverted cuts (reference level_depths)") {
    // range cut at depth 1 → implicit drilldown goes to [year, month]
    val r = Drilldown.resolve(cube,
      Cell(RangeCut("date", Some(Seq("2010")), Some(Seq("2012")))), Seq("date"))
    assert(r.head.levelNames == Seq("year", "month"))
    val s = Drilldown.resolve(cube,
      Cell(SetCut("date", Seq(Seq("2010"), Seq("2012")))), Seq("date"))
    assert(s.head.levelNames == Seq("year", "month"))
    val inv = Drilldown.resolve(cube,
      Cell(PointCut("date", Seq("2010"), invert = true)), Seq("date"))
    assert(inv.head.levelNames == Seq("year", "month"))
  }

  test("rollupDim truncates to a named level; top level drops the cut; level_depths") {
    val dateDim = cube.dimension("date")
    val cell = Cell(Seq(PointCut("date", Seq("2010", "6", "15")),
      RangeCut("geo", Some(Seq("A")), Some(Seq("E", "X")))))
    val toYear = cell.rollupDim(dateDim, Some("year"))
    assert(toYear.pointPath("date").contains(Seq("2010")))
    // default (no level): one step up
    assert(cell.rollupDim(dateDim).pointPath("date").contains(Seq("2010", "6")))
    // rolling a depth-1 cut off the top removes it
    val top = Cell(PointCut("date", Seq("2010"))).rollupDim(dateDim)
    assert(top.cut("date").isEmpty)
    assert(cell.levelDepths == Map("date" -> 3, "geo" -> 2))
  }
}
