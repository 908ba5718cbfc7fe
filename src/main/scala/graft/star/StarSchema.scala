package graft.star

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model._

/** Maps logical attribute refs to physical (table, column) pairs.
  * Explicit `cube.mappings` win; otherwise naming conventions: `dim.attr` →
  * table `dim`, column `attr`; flat-dimension / measure / detail refs → a
  * fact-table column of the same name (reference `cubes/sql/mapper.py`,
  * `StarSchemaMapper` `mapper.py:279-323`).
  */
final class Mapper(cube: Cube) {
  private val dimNames = cube.dimensions.map(_.name).toSet

  def physical(ref: String): PhysicalRef =
    cube.mappings.getOrElse(ref, implicitMapping(ref))

  private def implicitMapping(ref: String): PhysicalRef = ref.split("\\.", 2) match {
    case Array(dim, attr) if dimNames.contains(dim) =>
      PhysicalRef(cube.dimensionPrefix + dim, attr)
    case _ => PhysicalRef(cube.factTable, ref)
  }
}

/** A star/snowflake over DataFrames.
  *
  * Design for scale: every input table is column-pruned *structurally*
  * before joining (only join keys + requested attribute columns survive, so
  * the Parquet scan's ReadSchema is minimal even before Catalyst pruning),
  * joins are emitted only for tables actually referenced by the query
  * (join pruning, reference `sql/query.py:606-676`), and dimension tables
  * can carry an explicit broadcast hint; otherwise AQE picks the strategy.
  *
  * Column-name discipline: every physical column is qualified as
  * `alias__column` while inside the star, which makes self-joined aliased
  * dimensions and same-named columns collision-free (the reference solves
  * this with SQL aliases, `sql/query.py:451-463`).
  */
final class StarSchema(
    val cube: Cube,
    val factDf: DataFrame,
    val tables: Map[String, DataFrame] // physical table name -> DataFrame
) {
  val mapper = new Mapper(cube)

  /** alias -> join providing it */
  private val joinByAlias: Map[String, JoinSpec] =
    cube.joins.map(j => j.detailAlias -> j).toMap

  def qual(alias: String, column: String): String = s"${alias}__$column"

  /** Physical refs for a set of logical attribute refs (base attrs only —
    * derived attributes must be resolved to their base deps by the caller). */
  def physicalOf(refs: Seq[String]): Map[String, PhysicalRef] =
    refs.map(r => r -> mapper.physical(r)).toMap

  /** Join-pruned alias closure: the aliases hosting the given physical refs
    * plus every master on the path back to the fact
    * (reference `required_tables`, `sql/query.py:606-676`). */
  def requiredAliases(phys: Iterable[PhysicalRef]): Set[String] = {
    val need = scala.collection.mutable.Set[String](cube.factTable)
    def addWithMasters(alias: String): Unit = {
      if (need.contains(alias)) return
      // an alias with no declared join has no path to the fact — fail HERE
      // with the intended diagnostic, not later as an unresolved-column
      // AnalysisException when star() silently omits its columns
      require(joinByAlias.contains(alias),
        s"table '$alias' is referenced by a mapping but has no join " +
          s"path to fact '${cube.factTable}'")
      need += alias
      addWithMasters(joinByAlias(alias).masterTable)
    }
    phys.foreach(p => if (p.table != cube.factTable) addWithMasters(p.table))
    need.toSet
  }

  /** Topologically ordered joins restricted to the required aliases: a join
    * is emitted once its master side is already part of the tree
    * (reference `get_star` fold, `sql/query.py:681-816`). */
  def orderedJoins(required: Set[String]): Seq[JoinSpec] = {
    val pending = scala.collection.mutable.ArrayBuffer(
      cube.joins.filter(j => required.contains(j.detailAlias)): _*)
    val available = scala.collection.mutable.Set[String](cube.factTable)
    val out = scala.collection.mutable.ArrayBuffer.empty[JoinSpec]
    var progress = true
    while (pending.nonEmpty && progress) {
      progress = false
      val i = pending.indexWhere(j => available.contains(j.masterTable))
      if (i >= 0) {
        val j = pending.remove(i)
        out += j
        available += j.detailAlias
        progress = true
      }
    }
    require(pending.isEmpty,
      s"unjoinable tables (no path to fact '${cube.factTable}'): " +
        pending.map(_.detailAlias).mkString(", "))
    out.toSeq
  }

  /** RI-based key-attribute join elimination: a detail alias that is
    * referenced ONLY for its join-key column(s), reached by a `match` join
    * whose [[JoinSpec.integrity]] is declared `verified`, and that is not
    * the master of another required alias, contributes nothing the master
    * side doesn't already have — key equality holds on every joined row,
    * and the declared integrity (non-null FK, present, detail key UNIQUE)
    * means the join neither drops nor multiplies master rows. The
    * join is elided and the key columns are served from the master,
    * aliased under the eliminated alias's qualified name so consumers are
    * oblivious. Iterates to fixpoint so snowflake chains referenced only
    * through their keys peel off leaf-first.
    *
    * Returns (substituted refs, map of eliminated (alias, column) →
    * providing (alias, column)). */
  private def eliminateKeyOnlyJoins(
      phys: Iterable[PhysicalRef]
  ): (Seq[PhysicalRef], Map[(String, String), (String, String)]) = {
    val elim = scala.collection.mutable.Map.empty[(String, String), (String, String)]
    var active = phys.toSeq.distinct
    var changed = true
    while (changed) {
      changed = false
      val required = requiredAliases(active)
      // aliases serving as the master of some OTHER required alias cannot
      // be eliminated — their join must be built anyway
      val masters = (required - cube.factTable)
        .flatMap(joinByAlias.get).map(_.masterTable)
      val byAlias = active.filter(_.table != cube.factTable).groupBy(_.table)
      byAlias.foreach { case (t, refs) =>
        joinByAlias.get(t).foreach { j =>
          val keyOf = j.detailColumns.zip(j.masterColumns).toMap
          if (j.integrityVerified && j.method == JoinMethod.Match &&
            !masters.contains(t) && refs.forall(r => keyOf.contains(r.column))) {
            refs.foreach(r => elim((t, r.column)) = (j.masterTable, keyOf(r.column)))
            active = active.filterNot(_.table == t) ++
              refs.map(r => PhysicalRef(j.masterTable, keyOf(r.column)))
            active = active.distinct
            changed = true
          }
        }
      }
    }
    (active, elim.toMap)
  }

  /** Build the pruned, qualified star for the given base physical refs.
    * Output columns are `alias__column` for exactly the needed columns. */
  def star(phys0: Iterable[PhysicalRef]): DataFrame = {
    val (phys, eliminated) = eliminateKeyOnlyJoins(phys0)
    val required = requiredAliases(phys)
    val joins = orderedJoins(required)

    // per-alias needed columns: requested attribute columns + join keys
    val needed = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[String]]
    def need(alias: String, col: String): Unit =
      needed.getOrElseUpdate(alias, scala.collection.mutable.Set.empty) += col
    phys.foreach(p => need(p.table, p.column))
    joins.foreach { j =>
      j.masterColumns.foreach(need(j.masterTable, _))
      j.detailColumns.foreach(need(j.detailAlias, _))
    }
    cube.keyColumn.foreach(k => need(cube.factTable, k))

    def prefixed(df: DataFrame, alias: String): DataFrame = {
      val cols = needed.getOrElse(alias, scala.collection.mutable.Set.empty).toSeq.sorted
      // backticked: a denormalized table's columns are named by attribute
      // REF ("cat.key"), and a bare col("cat.key") would parse as a
      // struct-field access
      df.select(cols.map(c => col(s"`$c`").as(qual(alias, c))): _*)
    }

    var starDf = prefixed(factDf, cube.factTable)
    joins.foreach { j =>
      val detailBase = tables.getOrElse(j.detailTable,
        throw new IllegalArgumentException(s"unknown table '${j.detailTable}'"))
      var detail = prefixed(detailBase, j.detailAlias)
      detail = j.broadcastHint match {
        case Some(true) => broadcast(detail)
        case _          => detail
      }
      val cond = j.masterColumns.zip(j.detailColumns).map { case (m, d) =>
        col(qual(j.masterTable, m)) === col(qual(j.detailAlias, d))
      }.reduce(_ && _)
      val how = j.method match {
        case JoinMethod.Match  => "inner"
        case JoinMethod.Master => "left_outer"
        case JoinMethod.Detail => "right_outer"
        case other => throw new IllegalArgumentException(s"unknown join method '$other'")
      }
      starDf = starDf.join(detail, cond, how)
    }
    // expose eliminated keys under their original qualified names (resolve
    // chains: an eliminated alias's provider may itself be eliminated)
    eliminated.foreach { case ((t, c), first) =>
      var (mt, mc) = first
      while (eliminated.contains((mt, mc))) {
        val next = eliminated((mt, mc)); mt = next._1; mc = next._2
      }
      starDf = starDf.withColumn(qual(t, c), col(qual(mt, mc)))
    }
    starDf
  }
}
