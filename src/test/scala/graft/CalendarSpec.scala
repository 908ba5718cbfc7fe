package graft

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDateTime
import graft.calendar.Calendar
import graft.cells._
import graft.browser.TimeCuts
import graft.tpch.TpchModel

class CalendarSpec extends AnyFunSuite {
  private val now = LocalDateTime.of(2015, 8, 17, 13, 45, 30) // a Monday

  test("datetime decomposes into unit paths") {
    assert(Calendar.path(now, Seq("year", "quarter", "month", "day")) ==
      Seq(2015, 3, 8, 17))
    assert(Calendar.path(now, Seq("weekday")) == Seq(0)) // Monday, firstWeekday=0
  }

  test("truncation to unit boundaries") {
    assert(Calendar.truncate(now, "year") == LocalDateTime.of(2015, 1, 1, 0, 0))
    assert(Calendar.truncate(now, "quarter") == LocalDateTime.of(2015, 7, 1, 0, 0))
    assert(Calendar.truncate(now, "week") == LocalDateTime.of(2015, 8, 17, 0, 0))
    assert(Calendar.truncate(now.plusDays(3), "week") ==
      LocalDateTime.of(2015, 8, 17, 0, 0)) // Thursday rolls back to Monday
  }

  test("relative point names") {
    assert(Calendar.namedTime("yesterday", now) == now.minusDays(1))
    assert(Calendar.namedTime("90daysago", now) == now.minusDays(90))
    assert(Calendar.namedTime("3weeksforward", now) == now.plusWeeks(3))
  }

  test("truncated range names") {
    val (from, to) = Calendar.namedRange("last4quarters", now)
    assert(from == LocalDateTime.of(2014, 10, 1, 0, 0))
    assert(to == now)
    // upper endpoint = LAST second of the final period (inclusive paths
    // must cover the whole period, not stop at its first instant)
    val (f2, t2) = Calendar.namedRange("next2months", now)
    assert(f2 == now && t2 == LocalDateTime.of(2015, 9, 30, 23, 59, 59))
    // second-granularity offsets resolve too
    assert(Calendar.namedTime("30secondsago", now) == now.minusSeconds(30))
  }

  test("since period start") {
    assert(Calendar.sincePeriodStart("month", "day", now) == 16)
    assert(Calendar.sincePeriodStart("day", "hour", now) == 13)
  }

  test("cut-string time member conversion against the tpch cube") {
    val cell = TimeCuts.parseCell(TpchModel.cube, "shipdate:yesterday", now)
    assert(cell.cuts.head ==
      PointCut("shipdate", Seq("2015", "3", "8", "16")))
    val range = TimeCuts.parseCell(TpchModel.cube, "shipdate:last4quarters", now)
    val rc = range.cuts.head.asInstanceOf[RangeCut]
    assert(rc.from.contains(Seq("2014", "4", "10", "1")))
    assert(rc.to.contains(Seq("2015", "3", "8", "17")))
    // non-time dims pass through untouched
    val c2 = TimeCuts.parseCell(TpchModel.cube, "customer:ASIA", now)
    assert(c2.cuts.head == PointCut("customer", Seq("ASIA")))
  }
}
