package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.functions.AggFunctionProvider

/** Test-scoped extension provider, discovered via
  * `META-INF/services/graft.functions.AggFunctionProvider` in test
  * resources — proves third-party jars can contribute aggregates with no
  * engine changes. Also claims the name "sum" to prove built-ins shadow
  * provider clashes. */
final class TestAggProvider extends AggFunctionProvider {
  override def aggregates: Map[String, (Column, DataType) => Column] = Map(
    // geometric mean through log-space (positive inputs)
    "geomean" -> ((c, _) => exp(avg(log(c.cast("double"))))),
    // must NOT take effect: built-in sum wins
    "sum" -> ((c, _) => lit(-1).cast("double"))
  )
}

/** Test-scoped window-calculator provider: a moving max. Also claims
  * "geomean" — already a provider AGGREGATE — to prove cross-registry
  * clashes resolve to the aggregate, not the calculator. */
final class TestWindowCalcProvider extends graft.functions.WindowCalcProvider {
  override def calculators: Map[String,
    (Column, org.apache.spark.sql.expressions.WindowSpec) => Column] = Map(
    "smmax" -> ((src, w) => max(src).over(w)),
    // must NOT take effect: the discovered aggregate "geomean" wins
    "geomean" -> ((src, w) => min(src).over(w)))
}
