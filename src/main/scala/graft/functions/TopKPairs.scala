package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a Catalyst `TypedImperativeAggregate`: keep
  * the k largest (value, id) pairs under the total order (value DESC,
  * id ASC) — id is the deterministic tie-break, so the kept set is
  * partition- and merge-order-invariant.
  *
  * This is the GROUPED twin of `TakeOrderedAndProject`: the stock way to
  * write per-group top-k is a `row_number()` window, which SORTS every
  * partition's full group contents after a group-key exchange. This
  * aggregate instead rides the hash-aggregate path: O(k) state per group,
  * map-side partial aggregation (each input split contributes at most k
  * survivors per group to the exchange), merge = bounded heap union. At
  * 100 TB the exchange carries k rows per (group × split) instead of the
  * whole table — the difference between a shuffle measured in KB and one
  * measured in TB. Spark has `max_by` (k=1) but nothing for k>1; this
  * fills that gap next to [[MisraGriesAgg]] (bounded heavy-hitter state)
  * in the custom-aggregate matrix.
  *
  * Output: array<struct<v:bigint, id:bigint>> ordered (v DESC, id ASC) —
  * explode with `posexplode` for (rank, v, id) rows.
  */
case class TopKPairsAgg(valueExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
    with ExpectsInputTypes with BinaryLike[Expression] {
  require(k >= 1, "k must be >= 1")

  override def left: Expression = valueExpr
  override def right: Expression = idExpr
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pair"

  /** Max-heap whose head is the WORST kept pair (smallest value; ties:
    * largest id), so eviction is O(log k). */
  private val worstFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Long, Long)], p: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(p)
    else if (worstFirst.compare(p, buf.head) < 0) { buf.dequeue(); buf.enqueue(p) }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null) {
      offer(buf, (v.asInstanceOf[Long], id.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Long, Long)],
      b2: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val arr = buf.toArray
    // ascending by worstFirst = least-worse first = value DESC, id ASC
    java.util.Arrays.sort(arr, worstFirst)
    new GenericArrayData(arr.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v, id))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, id) => out.writeLong(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((in.readLong(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(valueExpr = newLeft, idExpr = newRight)
}

object TopKPairs {
  /** Register `topk_pair(value, id, k)` for expr()/SQL use. */
  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "topk_pair") {
      case Seq(v, id, kLit) =>
        // k is a plan-time constant (it sizes the aggregation buffer): a
        // column reference here would eval(null) to an opaque NPE or a
        // wrong constant, so reject anything non-foldable up front.
        require(kLit.foldable,
          s"topk_pair: k must be a foldable integer literal, got non-foldable ${kLit.sql}")
        val k = kLit.eval(null) match {
          case i: Int   => i
          case l: Long  => l.toInt
          case s: Short => s.toInt
          case b: Byte  => b.toInt
          case other    => throw new IllegalArgumentException(
            s"k must be an int literal, got $other")
        }
        require(k > 0, s"topk_pair: k must be positive, got $k")
        TopKPairsAgg(v, id, k).toAggregateExpression()
    }
}
