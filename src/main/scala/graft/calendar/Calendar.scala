package graft.calendar

import java.time.{LocalDateTime, DayOfWeek}
import java.time.temporal.{ChronoUnit, IsoFields}
import scala.util.matching.Regex

/** Calendar operators: hierarchy units, datetime→path decomposition,
  * truncation, and relative member names (reference `cubes/calendar.py`).
  * All driver-side pure Scala — these compute *members* (path values) that
  * the browser then compiles into Column predicates.
  */
object Calendar {

  /** Units recognized as level roles (reference `calendar.py:73-95`,
    * role defaults `dimension.py:27-31`). */
  val Units: Seq[String] =
    Seq("year", "quarter", "month", "day", "hour", "minute", "second",
      "week", "weekday", "dow", "isoyear")

  /** First day of week: 0 = Monday (reference default). */
  final case class Config(firstWeekday: Int = 0)

  def quarter(month: Int): Int = (month - 1) / 3 + 1

  /** Decompose a datetime into the given units' path values
    * (reference `calendar.py:152-175`). */
  def path(dt: LocalDateTime, units: Seq[String], cfg: Config = Config()): Seq[Int] =
    units.map {
      case "year"    => dt.getYear
      case "isoyear" => dt.get(IsoFields.WEEK_BASED_YEAR)
      case "quarter" => quarter(dt.getMonthValue)
      case "month"   => dt.getMonthValue
      case "week"    => dt.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR)
      case "day"     => dt.getDayOfMonth
      case "hour"    => dt.getHour
      case "minute"  => dt.getMinute
      case "second"  => dt.getSecond
      case "weekday" | "dow" =>
        // shifted by first_weekday (reference calendar.py:166-171)
        ((dt.getDayOfWeek.getValue - 1) - cfg.firstWeekday + 7) % 7
      case u => throw new IllegalArgumentException(s"unknown time unit '$u'")
    }

  /** Truncate a datetime to a unit boundary (reference `calendar.py:183-222`). */
  def truncate(dt: LocalDateTime, unit: String, cfg: Config = Config()): LocalDateTime =
    unit match {
      case "year"   => dt.withDayOfYear(1).truncatedTo(ChronoUnit.DAYS)
      case "quarter" =>
        dt.withMonth((quarter(dt.getMonthValue) - 1) * 3 + 1)
          .withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS)
      case "month"  => dt.withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS)
      case "week" =>
        val targetDow = DayOfWeek.of(cfg.firstWeekday + 1)
        var d = dt.truncatedTo(ChronoUnit.DAYS)
        while (d.getDayOfWeek != targetDow) d = d.minusDays(1)
        d
      case "day"    => dt.truncatedTo(ChronoUnit.DAYS)
      case "hour"   => dt.truncatedTo(ChronoUnit.HOURS)
      case "minute" => dt.truncatedTo(ChronoUnit.MINUTES)
      case u => throw new IllegalArgumentException(s"cannot truncate to '$u'")
    }

  /** Distance from the period start, in the sub-unit (reference
    * `calendar.py:224-244`). */
  def sincePeriodStart(unit: String, sub: String, dt: LocalDateTime,
      cfg: Config = Config()): Long = {
    val start = truncate(dt, unit, cfg)
    sub match {
      case "day"    => ChronoUnit.DAYS.between(start, dt)
      case "hour"   => ChronoUnit.HOURS.between(start, dt)
      case "minute" => ChronoUnit.MINUTES.between(start, dt)
      case "second" => ChronoUnit.SECONDS.between(start, dt)
      case u => throw new IllegalArgumentException(s"unknown sub-unit '$u'")
    }
  }

  // ---- relative member names (reference calendar.py:61-68,246-295) ----

  // the count is OPTIONAL in both reference grammars and defaults to 1 —
  // `weekago`, `monthforward`, `lastweek`, `nextmonth` are all legal
  // (RELATIVE_FINE_TIME_RX / RELATIVE_TRUNCATED_TIME_RX, calendar.py:61-68)
  private val OffsetRe: Regex = "(\\d*)(\\w+?)(ago|forward)".r
  private val TruncRe: Regex = "(last|next)(\\d*)(\\w+)".r

  private def countOf(n: String): Long = if (n.isEmpty) 1L else n.toLong

  private def singular(u: String): String = u.stripSuffix("s")

  private def shift(dt: LocalDateTime, unit: String, amount: Long): LocalDateTime =
    unit match {
      case "year"    => dt.plusYears(amount)
      case "quarter" => dt.plusMonths(3 * amount)
      case "month"   => dt.plusMonths(amount)
      case "week"    => dt.plusWeeks(amount)
      case "day"     => dt.plusDays(amount)
      case "hour"    => dt.plusHours(amount)
      case "minute"  => dt.plusMinutes(amount)
      case "second"  => dt.plusSeconds(amount)
      case u => throw new IllegalArgumentException(s"unknown offset unit '$u'")
    }

  /** Resolve a relative name to a concrete datetime (point names) —
    * `today`, `yesterday`, `tomorrow`, `90daysago`, `3weeksforward`. */
  def namedTime(name: String, now: LocalDateTime, cfg: Config = Config()): LocalDateTime =
    name.toLowerCase match {
      case "today" | "now" => now
      case "yesterday"     => now.minusDays(1)
      case "tomorrow"      => now.plusDays(1)
      case OffsetRe(n, unit, dir) =>
        val amt = countOf(n) * (if (dir == "ago") -1 else 1)
        shift(now, singular(unit), amt)
      case other =>
        throw new IllegalArgumentException(s"unknown named time '$other'")
    }

  /** Reference `named_relative_path` semantics for the TRUNCATED names
    * (calendar.py:285-289): truncate to the unit FIRST, then shift by the
    * (default-1) count — `lastmonth` at 2012-03-12 is 2012-02-01 00:00.
    * This is the reference's point-path resolution; [[namedRange]] keeps
    * this engine's whole-period RANGE semantics for cuts, which selects
    * the same rows at the name's own granularity. */
  def namedTruncatedTime(name: String, now: LocalDateTime,
      cfg: Config = Config()): LocalDateTime =
    name.toLowerCase match {
      case TruncRe(dir, n, units) =>
        val unit = singular(units)
        val amt = countOf(n) * (if (dir == "last") -1 else 1)
        shift(truncate(now, unit, cfg), unit, amt)
      case other =>
        throw new IllegalArgumentException(s"unknown truncated name '$other'")
    }

  /** Resolve a truncated-range name — `lastNunits` / `nextNunits`
    * (e.g. `last4quarters`) — to an inclusive (from, to) datetime range
    * covering the current period plus the k-1 before/after it (reference
    * `calendar.py:271-295` resolves only the truncated endpoint; the
    * range expansion is this engine's cut semantics). The `next` upper
    * endpoint is the LAST second of the final period, so the inclusive
    * lexicographic path bound covers the whole period — the start of the
    * following period would cut the range short at its first instant. */
  def namedRange(name: String, now: LocalDateTime,
      cfg: Config = Config()): (LocalDateTime, LocalDateTime) =
    name.toLowerCase match {
      case TruncRe(dir, n, units) =>
        val unit = singular(units)
        // digitless = the reference's singular form (`lastweek`,
        // `nextmonth`): the ADJACENT period in its entirety. The counted
        // form with k=1 is the SAME name in the reference (the count
        // defaults to 1, calendar.py:266-274), so `last1month` ==
        // `lastmonth` — users porting cuts must get identical rows for the
        // two spellings. Counted forms with k>1 are this engine's range
        // extension: current period to date plus the k-1 before it.
        if (n.isEmpty || n.toLong == 1L) {
          val shifted = truncate(shift(now, unit, if (dir == "last") -1 else 1), unit, cfg)
          (shifted, shift(shifted, unit, 1).minusSeconds(1))
        } else {
          val k = n.toLong
          if (dir == "last")
            (truncate(shift(now, unit, -(k - 1)), unit, cfg), now)
          else
            (now, truncate(shift(now, unit, k), unit, cfg).minusSeconds(1))
        }
      case other =>
        throw new IllegalArgumentException(s"unknown named range '$other'")
    }

  /** Is the name a relative member this module can resolve? */
  def isRelativeName(s: String): Boolean = {
    val l = s.toLowerCase
    l == "today" || l == "now" || l == "yesterday" || l == "tomorrow" ||
      OffsetRe.matches(l) || TruncRe.matches(l)
  }

  /** Is the name a truncated-range member (`lastNunits`/`nextNunits`)?
    * The single source of truth for the grammar — callers must not
    * re-implement the regex (a drifted copy would silently stop
    * converting such cuts). */
  def isTruncatedRange(s: String): Boolean = TruncRe.matches(s.toLowerCase)

  /** Cut-member conversion (reference `calendar.py:298-313`, wired into the
    * cut parser at `query/browser.py:130-143`): a single-element time path
    * whose value is a relative name becomes the concrete hierarchy path;
    * relative ranges become (from, to) paths. */
  def convertPath(value: String, units: Seq[String], now: LocalDateTime,
      cfg: Config = Config()): Seq[String] =
    if (isRelativeName(value) && !isTruncatedRange(value))
      path(namedTime(value, now, cfg), units, cfg).map(_.toString)
    else Seq(value)
}
