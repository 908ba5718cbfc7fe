package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Built-in aggregate function registry (reference `cubes/sql/functions.py`).
  *
  * Numerics policy — "canonical arithmetic": floating-point measures are
  * summed through an exact `DECIMAL(27,6)` accumulator and only then cast
  * back to double. A double sum depends on partition/merge order, so it is
  * not reproducible across engines (or even across two Spark runs with a
  * different partition count); the decimal sum is exact, hence
  * deterministic and bit-identical to any other engine that sums the same
  * decimal values — which is what the DuckDB differential oracle needs.
  * avg / stddev / variance are then derived from exact component sums with
  * a fixed double-arithmetic formula, keeping them deterministic too.
  * The extra decimal cost stays inside whole-stage codegen and partial
  * (map-side) aggregation still applies, so the 100 TB plan shape is
  * unchanged.
  */
object AggFunctions {

  /** Decimal accumulator type for exact floating sums. Scale 4 keeps the
    * unscaled sum below 2^53 up to ~1e14-magnitude totals, so BOTH engines'
    * decimal→double conversions are exact-integer-divide (correctly
    * rounded) and therefore bit-identical; scale 6 would push grand totals
    * past 2^53 already at sf0.1, where int128→double conversion rounding
    * starts to differ between engines. */
  val SumDecimal: DecimalType = DecimalType(22, 4)

  private def isFloating(dt: DataType): Boolean =
    dt == DoubleType || dt == FloatType

  /** Exact sum: decimal path for floats, native for integral/decimal. */
  def exactSum(c: Column, dt: DataType): Column =
    if (isFloating(dt)) sum(c.cast(SumDecimal)).cast(DoubleType)
    else sum(c)

  def exactAvg(c: Column, dt: DataType): Column =
    if (isFloating(dt))
      sum(c.cast(SumDecimal)).cast(DoubleType) / count(c)
    else avg(c)

  /** Quantized input for exact second moments: integer grid (scale 0), so
    * Σx² stays an unscaled integer < 2^53 up to ~sf1 — both engines convert
    * it to double exactly. Scale >0 squares the scale and pushes Σx²'s
    * unscaled value past 2^53, where int128→double rounding diverges
    * between engines. */
  private val MomentDecimal: DecimalType = DecimalType(18, 0)

  /** Sample variance from exact component sums of the input quantized to
    * integers: (Σx² − (Σx)²/n) / (n−1). Components are exact decimals,
    * the combination is fixed double arithmetic — deterministic across
    * engines and partitionings. (Quantization changes the value by O(σ of
    * the rounding noise) — the price of reproducibility; `variance_fast`
    * is the native double implementation.) */
  def exactVarSamp(c: Column, dt: DataType): Column = {
    // the integral path must also square in decimal: a native Int/Long
    // c*c overflows per-row (e.g. Int values ~1e5 → 1e10 wraps) before
    // the sum ever sees it
    val x = c.cast(MomentDecimal)
    val (s, q, n) =
      (sum(x).cast(DoubleType), sum(x * x).cast(DoubleType), count(c))
    when(n > 1, (q - s * s / n) / (n - lit(1))).otherwise(lit(null).cast(DoubleType))
  }

  def exactStddevSamp(c: Column, dt: DataType): Column =
    sqrt(exactVarSamp(c, dt))

  /** Aggregate builders contributed by [[AggFunctionProvider]]s on the
    * classpath (reference `ext.py` entry-point discovery; here JVM
    * ServiceLoader). Loaded once, lazily. */
  private lazy val discovered: Map[String, (Column, DataType) => Column] = {
    import scala.jdk.CollectionConverters._
    // pinned loader: the thread-context classloader of whatever thread
    // touches the registry first (pooled server threads, REPL) may not see
    // the application jars, and the lazy val would cache the empty result
    // for the JVM's lifetime.
    // Provider names may not claim WINDOW-calculator builtins either: a
    // window-named aggregate would flip dispatch for every cube using it
    java.util.ServiceLoader.load(classOf[AggFunctionProvider],
        classOf[AggFunctionProvider].getClassLoader)
      .iterator().asScala.flatMap(_.aggregates)
      .filterNot { case (k, _) => WindowCalcs.builtinNames.contains(k) }
      .toMap
  }

  /** name -> (measureColumn, measureType) => aggregate Column.
    * Functions beyond the reference's set (`approx_count_distinct`,
    * `median`, …) are deliberate scale extensions; ServiceLoader-discovered
    * providers extend the map further (built-ins win on name clash). */
  lazy val builders: Map[String, (Column, DataType) => Column] =
    discovered ++ builtinBuilders

  private[functions] lazy val builtinNames: Set[String] = builtinBuilders.keySet

  private val builtinBuilders: Map[String, (Column, DataType) => Column] = Map(
    "sum" -> ((c, dt) => exactSum(c, dt)),
    "count" -> ((_, _) => count(lit(1))),
    "count_nonempty" -> ((c, _) => count(c)),
    "count_distinct" -> ((c, _) => countDistinct(c)),
    "approx_count_distinct" -> ((c, _) => approx_count_distinct(c)),
    // exact interpolated median; deterministic when inputs are integral
    "median" -> ((c, _) => median(c)),
    // accuracy 1000 ⇒ ~0.1% rank error — far inside the 5% tolerance the
    // exact-twin check allows, at a fraction of the summary-merge cost
    "approx_median" -> ((c, _) => percentile_approx(c, lit(0.5), lit(1000))),
    "min" -> ((c, _) => min(c)),
    "max" -> ((c, _) => max(c)),
    "avg" -> ((c, dt) => exactAvg(c, dt)),
    "average" -> ((c, dt) => exactAvg(c, dt)), // reference spelling
    "stddev" -> ((c, dt) => exactStddevSamp(c, dt)),
    "variance" -> ((c, dt) => exactVarSamp(c, dt)),
    // native double implementations (faster, non-reproducible last bits)
    "sum_fast" -> ((c, _) => sum(c)),
    "avg_fast" -> ((c, _) => avg(c)),
    "stddev_fast" -> ((c, _) => stddev_samp(c)),
    "variance_fast" -> ((c, _) => var_samp(c))
  )

  /** Known to the aggregate registry — built-in OR provider-contributed
    * (the built-in-only check is `builtinNames`). */
  def isRegistered(function: String): Boolean = builders.contains(function)
}

/** Post-aggregation moving-window calculators (reference
  * `cubes/query/statutils.py`). The reference computes these in Python over
  * the fetched result stream; here they are Spark `Window` expressions
  * inside the same plan — one job, distributed, order made explicit.
  *
  * Window frame `rowsBetween(-(n-1), 0)` reproduces the reference's
  * partial prefix windows (windows shorter than `window_size` still emit,
  * `statutils.py:156-205`).
  */
object WindowCalcs {
  import org.apache.spark.sql.expressions.{Window, WindowSpec}

  private[functions] val builtinNames: Set[String] =
    Set("wma", "sma", "sms", "smstd", "smrsd", "smvar")

  /** Calculators contributed by [[WindowCalcProvider]]s on the classpath
    * (the calculators half of the reference's ext.py discovery; same
    * ServiceLoader scheme as [[AggFunctionProvider]]). Aggregate names win
    * on clash — builtin AND provider-contributed aggregates
    * ([[AggFunctions.builders]], which includes discovered providers):
    * dispatch consults `isWindowFunction` first, so a calculator sharing
    * an aggregate's name would silently reroute every plain use of that
    * aggregate through the window path. */
  private lazy val discovered: Map[String, (Column, WindowSpec) => Column] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[WindowCalcProvider],
        classOf[WindowCalcProvider].getClassLoader)
      .iterator().asScala.flatMap(_.calculators)
      .filterNot { case (k, _) =>
        builtinNames.contains(k) || AggFunctions.builders.contains(k) }
      .toMap
  }

  lazy val names: Set[String] = builtinNames ++ discovered.keySet

  def isWindowFunction(function: String): Boolean = names.contains(function)

  /** Build the calculator column.
    * @param src    the already-aggregated source column (another aggregate)
    * @param size   window size n (rows: current + n-1 preceding)
    */
  def build(function: String, src: Column, size: Int, w0: WindowSpec): Column = {
    val w = w0.rowsBetween(-(size - 1), 0)
    function match {
      case "sma" => round(avg(src).over(w), 2)
      case "sms" => sum(src).over(w)
      case "smstd" => round(stddev_samp(src).over(w), 2)
      case "smvar" => round(var_samp(src).over(w), 2)
      case "smrsd" => round(stddev_samp(src).over(w) / avg(src).over(w), 4)
      case "wma" =>
        // weighted moving average, weights 1..k for the k values in window
        // (oldest weight 1): Σ(w_i·x_i)/Σ(w_i), reference statutils.py:54-62
        val xs = collect_list(src).over(w)
        val k = org.apache.spark.sql.functions.size(xs)
        val dot = aggregate(
          zip_with(xs, sequence(lit(1), greatest(k, lit(1))), (x, i) => x * i),
          lit(0.0).cast("double"), (acc, v) => acc + v)
        val wsum = (k.cast("double") * (k.cast("double") + 1)) / 2.0
        round(dot / wsum, 4)
      case other => discovered.get(other) match {
        case Some(b) => b(src, w)
        case None =>
          throw new IllegalArgumentException(s"unknown window calculator '$other'")
      }
    }
  }
}
