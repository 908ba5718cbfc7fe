package graft.auth

import graft.cells.{Cell, CutParser}
import graft.model.Cube

/** Authorization (reference `cubes/auth.py`): identity → access right with
  * cube allow/deny patterns, per-cube cell restrictions, and per-cube
  * hierarchy depth limits.
  *
  * A hierarchy limit `(dimension, hierarchy, level)` (reference
  * `auth.py:70-75,331-386`, string grammar `dim@hier:level` via
  * `string_to_dimension_level`, `metadata/__init__.py`) trims the visible
  * depth of that hierarchy for the identity: the served model shows only
  * levels down to `level` (`metadata/dimension.py:560-590`), and —
  * stronger than the reference, which trims only the model — this
  * engine's [[graft.browser.Browser]] also clamps drilldowns and member
  * listings at browse time, so a deep group-by cannot leak restricted
  * grain even when the query bypasses the served model.
  */
final case class HierarchyLimit(
    dim: String,
    hierarchy: Option[String],
    /** None = the whole hierarchy is hidden (reference `level: None` →
      * "we ignore the hierarchy", `dimension.py:584-586`). */
    level: Option[String]
)

object HierarchyLimit {
  /** Parse `dim`, `dim:level`, `dim@hier:level` (reference
    * `string_to_dimension_level`). */
  def parse(s: String): HierarchyLimit = {
    val (dimHier, level) = s.split(":", 2) match {
      case Array(dh)     => (dh, None)
      case Array(dh, lv) => (dh, Some(lv))
    }
    val (dim, hier) = dimHier.split("@", 2) match {
      case Array(d)    => (d, None)
      case Array(d, h) => (d, Some(h))
    }
    HierarchyLimit(dim, hier, level)
  }
}

/** One access right (reference `_SimpleAccessRight`, `auth.py:96-208`).
  * Cube name sets accept `*` as a leading/trailing wildcard. Restrictions
  * and limits are keyed by cube name; key `"*"` applies to every cube. */
final case class AccessRight(
    roles: Set[String] = Set.empty,
    allowedCubes: Set[String] = Set.empty,
    deniedCubes: Set[String] = Set.empty,
    cellRestrictions: Map[String, Seq[String]] = Map.empty,
    hierarchyLimits: Map[String, Seq[HierarchyLimit]] = Map.empty
) {
  private def matches(patterns: Set[String], name: String): Boolean =
    patterns.exists { p =>
      p == name || p == SimpleAuthorizer.AllCubes ||
        (p.startsWith("*") && name.endsWith(p.drop(1))) ||
        (p.endsWith("*") && name.startsWith(p.dropRight(1)))
    }

  /** Reference `is_allowed` (`auth.py:126-170`): deny_allow mode
    * (`allowAfterDenied`, the default) permits anything not explicitly
    * denied or explicitly allowed (`allow or not deny`); allow_deny mode
    * requires an explicit allow and no deny (`allow and not deny`). */
  def isAllowed(cubeName: String, allowAfterDenied: Boolean): Boolean = {
    val allow = allowedCubes.nonEmpty && matches(allowedCubes, cubeName)
    val deny = deniedCubes.nonEmpty && matches(deniedCubes, cubeName)
    if (allowAfterDenied) allow || !deny else allow && !deny
  }

  /** Role inheritance merge (reference `merge`, `auth.py:131-144`). */
  def merge(other: AccessRight): AccessRight = AccessRight(
    roles = roles ++ other.roles,
    allowedCubes = allowedCubes ++ other.allowedCubes,
    deniedCubes = deniedCubes ++ other.deniedCubes,
    cellRestrictions = (cellRestrictions.keySet ++ other.cellRestrictions.keySet)
      .map(k => k -> (cellRestrictions.getOrElse(k, Nil) ++
        other.cellRestrictions.getOrElse(k, Nil))).toMap,
    hierarchyLimits = (hierarchyLimits.keySet ++ other.hierarchyLimits.keySet)
      .map(k => k -> (hierarchyLimits.getOrElse(k, Nil) ++
        other.hierarchyLimits.getOrElse(k, Nil))).toMap
  )
}

final class NotAuthorized(msg: String) extends RuntimeException(msg)

/** Reference `SimpleAuthorizer` (`auth.py:210-386`) minus the JSON-file
  * loading (rights are constructed programmatically or from workspace
  * config): role expansion, guest fallback, cube-list authorization, cell
  * restriction, hierarchy limits. */
final class SimpleAuthorizer(
    rights: Map[String, AccessRight],
    roles: Map[String, AccessRight] = Map.empty,
    guest: Option[String] = None,
    allowAfterDenied: Boolean = true
) {
  import SimpleAuthorizer.AllCubes

  private def expand(r: AccessRight,
      visited: Set[String] = Set.empty): AccessRight =
    r.roles.foldLeft(r) { (acc, roleName) =>
      if (visited.contains(roleName)) acc // cyclic role definitions terminate
      else roles.get(roleName)
        .map(role => acc.merge(expand(role, visited + roleName)))
        .getOrElse(acc)
    }

  /** Right for an identity; guest fallback (reference `auth.py:302-313`). */
  def right(identity: String): AccessRight =
    rights.get(identity).map(expand(_))
      .orElse(guest.flatMap(roles.get).map(expand(_)))
      .getOrElse(throw new NotAuthorized(s"Unknown access right '$identity'"))

  /** Cubes the identity may see (reference `authorize`, `auth.py:315-329`). */
  def authorize(identity: String, cubeNames: Seq[String]): Seq[String] =
    try {
      val r = right(identity)
      cubeNames.filter(r.isAllowed(_, allowAfterDenied))
    } catch { case _: NotAuthorized => Nil }

  /** Restriction cell for the identity on the cube (reference
    * `restricted_cell`, `auth.py:331-378`): per-cube cuts plus any-cube
    * (`*`) cuts, ANDed. */
  def restrictedCell(identity: String, cube: Cube): Cell = {
    val r = right(identity)
    val cutStrings = r.cellRestrictions.getOrElse(cube.name, Nil) ++
      r.cellRestrictions.getOrElse(AllCubes, Nil)
    cutStrings.map(CutParser.parseCell).foldLeft(Cell.empty)(_ & _)
  }

  /** Hierarchy limits for the identity on the cube (reference
    * `hierarchy_limits`, `auth.py:380-386` + any-cube key). */
  def hierarchyLimits(identity: String, cubeName: String): Seq[HierarchyLimit] = {
    val r = right(identity)
    r.hierarchyLimits.getOrElse(cubeName, Nil) ++
      r.hierarchyLimits.getOrElse(AllCubes, Nil)
  }
}

object SimpleAuthorizer {
  /** Reference `ALL_CUBES_WILDCARD` (`auth.py:28`). */
  val AllCubes = "*"
}
