package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DataType

/** Service-provider interface for contributing aggregate functions to the
  * engine without touching its source (reference `cubes/ext.py:24-75`
  * discovers plugins through pkg_resources entry points; the JVM-native
  * equivalent is `java.util.ServiceLoader`).
  *
  * To add functions: implement this trait with a no-arg class and list the
  * class name in
  * `META-INF/services/graft.functions.AggFunctionProvider`
  * on the classpath. [[AggFunctions.builders]] picks the providers up on
  * first use; built-in names always win over provider names, so a stray
  * provider cannot silently change `sum` semantics.
  *
  * Builders receive the measure column and its resolved type and must
  * return a Catalyst aggregate Column — provider functions run inside the
  * same (codegen'd, partial-aggregated) plan as the built-ins.
  */
trait AggFunctionProvider {
  /** name -> (measureColumn, measureType) => aggregate Column */
  def aggregates: Map[String, (Column, DataType) => Column]
}

/** SPI for contributing post-aggregation window CALCULATORS (the other
  * half of the reference's extension registry, `statutils.py` calculators
  * + `ext.py` discovery). The builder receives the source aggregate column
  * and the frame-complete WindowSpec (already `rowsBetween`-bounded to the
  * aggregate's `windowSize`). Registered like [[AggFunctionProvider]], via
  * `META-INF/services/graft.functions.WindowCalcProvider`. */
trait WindowCalcProvider {
  def calculators: Map[String,
    (Column, org.apache.spark.sql.expressions.WindowSpec) => Column]
}
