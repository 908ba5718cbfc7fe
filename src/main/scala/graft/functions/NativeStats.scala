package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for per-group numeric fits that are
  * inherently sequential (stack/pool algorithms) — they run over
  * GRID-BOUNDED arrays collected per group, never over raw rows, so the
  * JIT loop is the right tool and the distributed shape stays a plain
  * partial-aggregable collapse.
  */
object StatImpls {

  /** Pool-Adjacent-Violators isotonic fit over a score-SORTED grid of
    * (score, successes k, trials n): the least-squares MONOTONE
    * non-decreasing rate curve. Returns one (score, num, den) per input
    * element — the fitted rate as the exact block-mean rational (every
    * engine renders the identical double because IEEE division is
    * correctly rounded and the rational value itself is what PAV
    * defines). Pooling compares block rates by BigInteger
    * cross-multiplication — exact at any corpus scale. */
  def pavFit(arr: ArrayData): GenericArrayData = {
    val m = arr.numElements()
    val ss = new Array[Long](m)
    val ks = new Array[Long](m)
    val ns = new Array[Long](m)
    var i = 0
    while (i < m) {
      val row = arr.getStruct(i, 3)
      ss(i) = row.getLong(0); ks(i) = row.getLong(1)
      ns(i) = row.getLong(2)
      i += 1
    }
    // blocks as (kSum, nSum, count) on a stack
    val bk = new Array[Long](m); val bn = new Array[Long](m)
    val bc = new Array[Int](m)
    var top = -1
    def rateGe(k1: Long, n1: Long, k2: Long, n2: Long): Boolean =
      java.math.BigInteger.valueOf(k1)
        .multiply(java.math.BigInteger.valueOf(n2))
        .compareTo(java.math.BigInteger.valueOf(k2)
          .multiply(java.math.BigInteger.valueOf(n1))) >= 0
    i = 0
    while (i < m) {
      top += 1
      bk(top) = ks(i); bn(top) = ns(i); bc(top) = 1
      while (top > 0 && rateGe(bk(top - 1), bn(top - 1),
          bk(top), bn(top))) {
        // violator: previous block rate >= current -> pool
        bk(top - 1) = Math.addExact(bk(top - 1), bk(top))
        bn(top - 1) = Math.addExact(bn(top - 1), bn(top))
        bc(top - 1) += bc(top)
        top -= 1
      }
      i += 1
    }
    val out = new Array[Any](m)
    var b = 0
    var pos = 0
    while (b <= top) {
      var j = 0
      while (j < bc(b)) {
        out(pos) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](ss(pos), bk(b), bn(b)))
        pos += 1; j += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** pav_fit(grid): isotonic (PAV) fit over a sorted (s, k, n) grid —
  * see [[StatImpls.pavFit]]. */
case class PavFitExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("num", LongType, nullable = false),
    StructField("den", LongType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    StatImpls.pavFit(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StatImpls.pavFit($c)")
  override protected def withNewChildInternal(c: Expression): PavFitExpr =
    copy(child = c)
}

object NativeStats {
  import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}
  def pav_fit(grid: Column): Column = toCol(PavFitExpr(toExpr(grid)))
}
