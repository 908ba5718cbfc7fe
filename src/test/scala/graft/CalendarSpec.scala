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

  test("digitless relative names default to count 1 (reference test_named_relative)") {
    // reference golden values, tests/test_time.py:72-101
    val d1 = LocalDateTime.of(2012, 3, 1, 0, 0)
    val units = Seq("year", "month", "day")
    assert(Calendar.path(Calendar.namedTime("weekago", d1), units) == Seq(2012, 2, 23))
    assert(Calendar.path(Calendar.namedTime("3weeksago", d1), units) == Seq(2012, 2, 9))
    val d2 = LocalDateTime.of(2012, 3, 12, 0, 0)
    assert(Calendar.path(Calendar.namedTime("monthago", d2), units) == Seq(2012, 2, 12))
    assert(Calendar.path(Calendar.namedTime("monthforward", d2), units) == Seq(2012, 4, 12))
    assert(Calendar.path(Calendar.namedTime("12monthsforward", d2), units) == Seq(2013, 3, 12))
  }

  test("digitless truncated names: reference point semantics + whole-period ranges") {
    // reference golden values, tests/test_time.py:102-131 (truncate FIRST,
    // then shift; count defaults to 1)
    val units = Seq("year", "month", "day", "hour")
    val d1 = LocalDateTime.of(2012, 3, 1, 10, 30)
    assert(Calendar.path(Calendar.namedTruncatedTime("lastweek", d1), units) ==
      Seq(2012, 2, 20, 0))
    assert(Calendar.path(Calendar.namedTruncatedTime("last3weeks", d1), units) ==
      Seq(2012, 2, 6, 0))
    val d2 = LocalDateTime.of(2012, 3, 12, 0, 0)
    assert(Calendar.path(Calendar.namedTruncatedTime("lastmonth", d2), units) ==
      Seq(2012, 2, 1, 0))
    assert(Calendar.path(Calendar.namedTruncatedTime("last12months", d2), units) ==
      Seq(2011, 3, 1, 0))
    assert(Calendar.path(Calendar.namedTruncatedTime("nextmonth", d2), units) ==
      Seq(2012, 4, 1, 0))
    assert(Calendar.path(Calendar.namedTruncatedTime("next12months", d2), units) ==
      Seq(2013, 3, 1, 0))
    assert(Calendar.path(Calendar.namedTruncatedTime("lastquarter", d2), units) ==
      Seq(2011, 10, 1, 0))
    assert(Calendar.path(Calendar.namedTruncatedTime("lastyear", d2), units) ==
      Seq(2011, 1, 1, 0))
    // cut semantics: a digitless name is the ADJACENT period in full, and
    // `last1month` is the SAME name (the reference's count defaults to 1,
    // calendar.py:266-274) — identical rows for the two spellings
    val (f, t) = Calendar.namedRange("lastmonth", d2)
    assert(f == LocalDateTime.of(2012, 2, 1, 0, 0))
    assert(t == LocalDateTime.of(2012, 2, 29, 23, 59, 59)) // leap February
    val (f1, t1) = Calendar.namedRange("last1month", d2)
    assert((f1, t1) == ((f, t)))
    // counted k>1 stays the range extension: current month so far + k-1
    val (f2w, t2w) = Calendar.namedRange("last2months", d2)
    assert(f2w == LocalDateTime.of(2012, 2, 1, 0, 0) && t2w == d2)
    val (fn, tn) = Calendar.namedRange("nextweek", d2) // 2012-03-12 is a Monday
    assert(fn == LocalDateTime.of(2012, 3, 19, 0, 0))
    assert(tn == LocalDateTime.of(2012, 3, 25, 23, 59, 59))
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
