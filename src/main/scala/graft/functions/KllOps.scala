package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

/** The KLL/MRL compactor-ladder operations, shared VERBATIM by the batch
  * aggregate ([[KllQuantilesAgg]]) and the streaming twin
  * ([[graft.streaming.StreamingKll]]) so the two sides cannot drift: one
  * compaction rule, one merge rule, one estimator, one wire format. See
  * [[KllQuantilesAgg]] for the algorithm and error contract. */
object KllOps {

  def empty(): KllBuffer =
    new KllBuffer(0L,
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long]),
      mutable.ArrayBuffer(false))

  /** Halve level l into l+1 (deterministic alternating parity, odd
    * leftover retained); cascades if that fills l+1. */
  def compact(buf: KllBuffer, k: Int, l: Int): Unit = {
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
    if (nxt.size >= k) compact(buf, k, l + 1)
  }

  def offer(buf: KllBuffer, k: Int, v: Long): Unit = {
    buf.levels(0) += v
    buf.n += 1L
    if (buf.levels(0).size >= k) compact(buf, k, 0)
  }

  def merge(b1: KllBuffer, b2: KllBuffer, k: Int): KllBuffer = {
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
      if (b1.levels(l).size >= k) compact(b1, k, l)
      l += 1
    }
    b1
  }

  /** est(p) = smallest sketch value whose cumulative weight reaches
    * ceil(n·p/10⁶) — the q81/q129 ceil-rank convention. Empty buffer →
    * empty array. */
  def quantiles(buf: KllBuffer, ppms: Seq[Long]): Array[Long] = {
    if (buf.n == 0L) return Array.empty[Long]
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
    out
  }

  def serialize(buf: KllBuffer): Array[Byte] = {
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

  def deserialize(bytes: Array[Byte]): KllBuffer = {
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
}
