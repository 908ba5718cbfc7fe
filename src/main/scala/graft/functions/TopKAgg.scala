package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the `k` (score desc, id asc)-best
  * (score, id) pairs per group, with partial (map-side) aggregation — so a
  * `groupBy(query).agg(top_k_by_score(...))` over a scored cross-product
  * shuffles at most k rows per group per map partition instead of the whole
  * product. This is the shuffle bound for brute-force ANN at scale: a
  * 1000-query batch against a 100 TB corpus shuffles O(1000·k·partitions)
  * tiny structs, not |queries|×|corpus| scored rows.
  *
  * The buffer is compacted (sort + trim to k) whenever it reaches 4k
  * entries, so per-slot memory is O(k) and update cost amortizes to
  * O(log k) per row. The (score, id) total order makes the result set
  * deterministic regardless of partitioning or merge order.
  */
case class TopKByScoreAgg(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0, "top-k needs k > 0")

  // Declared input types: Catalyst inserts implicit casts (int id → long,
  // float score → double) and rejects incompatible columns at ANALYSIS time
  // instead of a ClassCastException inside update() at runtime.
  // (Seq[DataType] covariantly overrides Seq[AbstractDataType], whose
  // element type is private[sql].)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  // score desc, ties id asc
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def compact(buf: ArrayBuffer[(Double, Long)]): Unit =
    if (buf.length > k) {
      val kept = buf.sortWith(better).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(
      buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN scores (e.g. cosine of a zero-norm vector) are excluded: they
    // have no place in a top-k AND would break the (score, id) total
    // order the sort relies on
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double])) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    compact(buf)
    val sorted = buf.sortWith(better)
    new GenericArrayData(sorted.map(t => InternalRow(t._1, t._2)).toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var j = 0
    while (j < n) { buf += ((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  import org.apache.spark.sql.GraftSqlBridge.{column => toCol, expression => toExpr}

  /** `array<struct<score,id>>` of the k best (score desc, id asc) pairs. */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    toCol(TopKByScoreAgg(toExpr(score), toExpr(id), k).toAggregateExpression())
}
