package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable streaming-quantile buffer: a uniform-capacity compactor
  * ladder (the MRL/KLL family — Manku-Rajagopalan-Lindsay '98, Karnin-
  * Lang-Liberty '16) with DETERMINISTIC alternating-parity compaction.
  *
  * `levels(l)` holds items of weight 2^l; raw values enter level 0.
  * When a level reaches capacity k it is sorted and its even-sized
  * prefix halved — every other element survives to level l+1 (weight
  * doubles, total weight is conserved exactly, so Σ weights == n always
  * holds and rank targets need no renormalization); an odd leftover
  * (the largest) stays at its level. The survivor parity ALTERNATES per
  * level per compaction instead of being a coin flip — same worst-case
  * rank-error envelope, but the sketch is a pure function of the
  * operation sequence (no RNG to seed per task).
  */
final class KllBuffer(
    var n: Long,
    val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]],
    val parities: mutable.ArrayBuffer[Boolean])

/** KLL/MRL quantile sketch as a Catalyst `TypedImperativeAggregate` —
  * the MERGEABLE quantile operator the sketch family lacked: HLL (q44)
  * answers distinct, CMS (q119) point frequency, Misra-Gries (q105)
  * heavy hitters, KMV (q182) set overlap — and `percentile_approx`
  * (q104) answers quantiles but is not a first-class composable state
  * of THIS engine. A KLL sketch per partition/day/source can be stored,
  * unioned across arbitrary splits (merge = levelwise concat + the same
  * compaction the build uses), and interrogated later — at 100 TB the
  * difference between re-sorting a corpus and merging kilobyte states.
  *
  * Rank-error contract (deterministic, any merge tree): one compaction
  * at level l perturbs any fixed rank by at most 2^(l-1); level l sees
  * ≤ n/(k·2^l) compactions, so the worst-case rank error is bounded by
  * n·L/(2k) with L = log₂(n/k) levels — ≤ 2.4 %·n for k = 256 up to
  * n ≈ 10⁶ and growing only logarithmically beyond (size k·L longs; at
  * extreme n pick k ≈ L/ε). Alternating parity makes consecutive
  * compactions cancel, so realized error is far inside that envelope —
  * the in-band witness (q216) asserts the 3 %·n ceiling the way q44
  * bands HLL at 3× rsd, and KllSketchSpec property-tests the bound
  * under adversarial partitionings and orderings.
  *
  * `eval` answers the requested quantile fractions (ppm) directly:
  * est(p) = the smallest sketch value whose cumulative weight reaches
  * ceil(n·p/10⁶) — the q81/q129 ceil-rank convention on the weighted
  * sample. Output: array<bigint> aligned with the requested ppms.
  *
  * State is O(k·log(n/k)) per group, map-side combinable; null inputs
  * are skipped like every Spark aggregate. */
case class KllQuantilesAgg(child: Expression, k: Int, ppms: Seq[Long],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer]
    with ExpectsInputTypes with UnaryLike[Expression] {
  require(k >= 8 && k % 2 == 0, "kll_quantiles: k must be even and >= 8")
  require(ppms.nonEmpty && ppms.forall(p => p >= 0L && p <= 1000000L),
    "kll_quantiles: quantile fractions must be ppm values in [0, 1e6]")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): KllBuffer =
    new KllBuffer(0L,
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long]),
      mutable.ArrayBuffer(false))

  /** Halve level l into l+1; cascades if that fills l+1. */
  private def compact(buf: KllBuffer, l: Int): Unit = {
    if (l + 1 >= buf.levels.size) {
      buf.levels += mutable.ArrayBuffer.empty[Long]
      buf.parities += false
    }
    val sorted = buf.levels(l).sorted
    val even = sorted.size & ~1
    val off = if (buf.parities(l)) 1 else 0
    buf.parities(l) = !buf.parities(l)
    val nxt = buf.levels(l + 1)
    var i = off
    while (i < even) { nxt += sorted(i); i += 2 }
    buf.levels(l).clear()
    // an odd leftover keeps its weight at this level (conservation)
    if (sorted.size % 2 == 1) buf.levels(l) += sorted.last
    if (nxt.size >= k) compact(buf, l + 1)
  }

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.levels(0) += v.asInstanceOf[Long]
      buf.n += 1L
      if (buf.levels(0).size >= k) compact(buf, 0)
    }
    buf
  }

  override def merge(b1: KllBuffer, b2: KllBuffer): KllBuffer = {
    var l = 0
    while (l < b2.levels.size) {
      if (l >= b1.levels.size) {
        b1.levels += mutable.ArrayBuffer.empty[Long]
        b1.parities += false
      }
      b1.levels(l) ++= b2.levels(l)
      b1.parities(l) = b1.parities(l) ^ b2.parities(l)
      l += 1
    }
    b1.n += b2.n
    l = 0
    while (l < b1.levels.size) {
      if (b1.levels(l).size >= k) compact(b1, l)
      l += 1
    }
    b1
  }

  override def eval(buf: KllBuffer): Any = {
    if (buf.n == 0L) return new GenericArrayData(Array.empty[Long])
    // weighted sample, sorted by value; Σ weights == n exactly
    val items = buf.levels.iterator.zipWithIndex.flatMap { case (lvl, l) =>
      lvl.iterator.map(v => (v, 1L << l))
    }.toArray.sortBy(_._1)
    val out = new Array[Long](ppms.size)
    var pi = 0
    while (pi < ppms.size) {
      val target = math.min(buf.n,
        math.max(1L, (buf.n * ppms(pi) + 999999L) / 1000000L))
      var cum = 0L
      var i = 0
      var est = items.last._1
      var found = false
      while (i < items.length && !found) {
        cum += items(i)._2
        if (cum >= target) { est = items(i)._1; found = true }
        i += 1
      }
      out(pi) = est
      pi += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.levels.size)
    buf.levels.iterator.zipWithIndex.foreach { case (lvl, l) =>
      out.writeBoolean(buf.parities(l))
      out.writeInt(lvl.size)
      lvl.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val nLevels = in.readInt()
    val levels = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Long]]
    val parities = mutable.ArrayBuffer.empty[Boolean]
    (0 until nLevels).foreach { _ =>
      parities += in.readBoolean()
      val sz = in.readInt()
      val lvl = mutable.ArrayBuffer.empty[Long]
      (0 until sz).foreach(_ => lvl += in.readLong())
      levels += lvl
    }
    new KllBuffer(n, levels, parities)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesAgg =
    copy(child = newChild)
}

object KllSketch {

  /** Extract the ppm list from a foldable array literal. */
  def ppmList(e: Expression): Seq[Long] = {
    require(e.foldable,
      s"kll_quantiles: quantile ppms must be a foldable array literal, got ${e.sql}")
    e.eval(null) match {
      case a: ArrayData => e.dataType match {
        case ArrayType(LongType, _)    => a.toLongArray().toSeq
        case ArrayType(IntegerType, _) => a.toIntArray().map(_.toLong).toSeq
        case other => throw new IllegalArgumentException(
          s"kll_quantiles: expected array<bigint|int>, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"kll_quantiles: expected an array literal, got $other")
    }
  }

  /** Register `kll_quantiles(col, k, array(ppm...))` for expr()/SQL use. */
  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "kll_quantiles") {
      case Seq(c, kLit, ppmsLit) =>
        require(kLit.foldable,
          s"kll_quantiles: k must be a foldable integer literal, got ${kLit.sql}")
        val k = kLit.eval(null) match {
          case i: Int  => i
          case l: Long => l.toInt
          case other   => throw new IllegalArgumentException(
            s"k must be an int literal, got $other")
        }
        KllQuantilesAgg(c, k, ppmList(ppmsLit)).toAggregateExpression()
    }
}
