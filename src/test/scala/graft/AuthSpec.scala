package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.auth._

/** Pure auth-model tests mirroring the reference `tests/test_auth.py`
  * (no Spark session needed). */
class AuthSpec extends AnyFunSuite {

  test("is_allowed: deny_allow permits anything not denied; allow_deny requires allow") {
    val r = AccessRight(allowedCubes = Set("a"), deniedCubes = Set("d"))
    // deny_allow (allow_after_denied=true): allow OR NOT deny
    assert(r.isAllowed("a", allowAfterDenied = true))
    assert(r.isAllowed("b", allowAfterDenied = true)) // unlisted → allowed
    assert(!r.isAllowed("d", allowAfterDenied = true))
    // allow_deny: allow AND NOT deny
    assert(r.isAllowed("a", allowAfterDenied = false))
    assert(!r.isAllowed("b", allowAfterDenied = false))
    assert(!r.isAllowed("d", allowAfterDenied = false))
    // conflicting entries (same cube allowed AND denied): deny_allow
    // admits, allow_deny refuses — the reference's test_order table for
    // all four right shapes collapses to this case
    val conflict = AccessRight(allowedCubes = Set("x"), deniedCubes = Set("x"))
    assert(conflict.isAllowed("x", allowAfterDenied = true))
    assert(!conflict.isAllowed("x", allowAfterDenied = false))
  }

  test("cube patterns: * wildcard, prefix, suffix") {
    val r = AccessRight(deniedCubes = Set("secret_*", "*_raw"))
    assert(!r.isAllowed("secret_sales", allowAfterDenied = true))
    assert(!r.isAllowed("events_raw", allowAfterDenied = true))
    assert(r.isAllowed("sales", allowAfterDenied = true))
    val all = AccessRight(deniedCubes = Set("*"))
    assert(!all.isAllowed("anything", allowAfterDenied = true))
  }

  test("role expansion merges rights; guest fallback; unknown identity throws") {
    val auth = new SimpleAuthorizer(
      rights = Map("eve" -> AccessRight(roles = Set("analyst"))),
      roles = Map(
        "analyst" -> AccessRight(roles = Set("visitor"),
          cellRestrictions = Map("sales" -> Seq("customer:ASIA"))),
        "visitor" -> AccessRight(deniedCubes = Set("hr"))),
      guest = Some("visitor"))
    val eve = auth.right("eve")
    assert(eve.deniedCubes == Set("hr")) // inherited through two role hops
    assert(eve.cellRestrictions("sales") == Seq("customer:ASIA"))
    assert(auth.authorize("eve", Seq("sales", "hr")) == Seq("sales"))
    // unknown identity falls back to the guest role
    assert(auth.authorize("nobody", Seq("sales", "hr")) == Seq("sales"))
    val noGuest = new SimpleAuthorizer(rights = Map.empty)
    intercept[NotAuthorized](noGuest.right("nobody"))
  }

  test("hierarchy limit string grammar") {
    assert(HierarchyLimit.parse("customer@geo:nation") ==
      HierarchyLimit("customer", Some("geo"), Some("nation")))
    assert(HierarchyLimit.parse("date:year") ==
      HierarchyLimit("date", None, Some("year")))
    assert(HierarchyLimit.parse("date") == HierarchyLimit("date", None, None))
  }
}
