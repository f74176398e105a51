package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (ord, id) pairs — `topk_pairs(ord, id, k)`
  * returns the k pairs with the LARGEST `ord` (ties → smallest id) as a
  * sorted `array<struct<ord:double, id:bigint>>`.
  *
  * Why an aggregate and not a window: a per-key top-k via
  * `row_number().over(Window.partitionBy(key))` shuffles EVERY input row to
  * the key's reducer before any row is discarded — for the exact
  * batch-top-k operators that is Q·N narrow rows through the exchange. An
  * aggregate with a bounded buffer is map-side combinable: each map task
  * ships at most k pairs per key it saw (ObjectHashAggregate partial →
  * shuffle → merge), so the exchange carries Q·maps·k rows no matter how
  * large the corpus is. That asymmetry — shuffle ∝ result size instead of
  * ∝ input size — is the whole 100 TB story for multi-query exact search.
  *
  * Determinism: the final array is fully sorted by (ord desc, id asc), a
  * total order, so results are engine-stable bit-for-bit given equal `ord`
  * values. Null `ord` or id inputs are skipped (a null score is "no
  * score", matching SQL aggregate semantics). NaN sorts above all reals
  * (java.lang.Double.compare), consistently on every path.
  *
  * The buffer holds at most 2k+64 pairs between compactions, so memory is
  * O(k) per group regardless of input size.
  */
case class TopKPairs(ordExpr: Expression, idExpr: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, s"topk_pairs requires k > 0, got $k")

  private val compactAt = 2 * k + 64

  override def checkInputDataTypes(): TypeCheckResult =
    (ordExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (o, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs requires (double, bigint), got ($o, $i)")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(ordExpr, idExpr)
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  // (ord desc, id asc) — the same total order the window twin uses
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(b._1, a._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val sorted = buf.sortWith(lt).take(k)
      buf.clear()
      buf ++= sorted
    }
    buf
  }

  override def update(buf: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    if (o != null && i != null) {
      // +0.0 canonicalizes -0.0 (IEEE: -0.0 + 0.0 = +0.0): SQL ordering
      // treats the two as EQUAL (tie broken by id), but Double.compare
      // ranks +0.0 above -0.0 — without this a -0.0/+0.0 pair straddling
      // the rank-k boundary would diverge from the window twin
      buf += ((o.asInstanceOf[Double] + 0.0, i.asInstanceOf[Long]))
      if (buf.length >= compactAt) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
                     other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    if (buf.length >= compactAt) compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sortWith(lt).take(k)
    new GenericArrayData(top.map(p => InternalRow(p._1, p._2)).toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf) // never ship more than k pairs
    val bos = new ByteArrayOutputStream(8 + 16 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { p => out.writeDouble(p._1); out.writeLong(p._2) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(ordExpr = newChildren(0), idExpr = newChildren(1))
}
