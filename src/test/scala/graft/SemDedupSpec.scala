package graft

import graft.operators.{KMeansLloyd, SemDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDedup's keep rule against an independent in-memory reference.
  *
  * The k-means fit underneath is oracle-proven (q98 replays it in DuckDB),
  * so these tests pin the NEW logic only: a vector is dropped iff some
  * same-cluster vector that strictly dominates it by (d², id) is at least
  * minDotQ similar (exact long dot of the quantized vectors). The
  * reference recomputes that rule with plain Scala loops over the
  * collected fit output.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 8
  private def corpus(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rng.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / nrm).toFloat)
    }
    val base = (0 until n).map(i => i.toLong -> unit())
    // plant near-dups: slightly perturbed copies of a few base vectors
    // (cosine ≈ 1), appended with fresh dense ids
    val dups = (0 until 5).map { j =>
      val src = base(j * 7 % n)._2
      val v = src.map(x => x + (rng.nextGaussian() * 0.01).toFloat)
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (n + j).toLong -> v.map(x => (x / nrm).toFloat)
    }
    base ++ dups
  }

  private def referenceKept(
      fit: Seq[(Long, Array[Long], Int, Long)], minDotQ: Long): Set[Long] = {
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    fit.filter { case (id, qv, cid, d2) =>
      !fit.exists { case (id2, qv2, cid2, d22) =>
        cid2 == cid && id2 != id &&
          (d22 < d2 || (d22 == d2 && id2 < id)) &&
          dot(qv2, qv) >= minDotQ
      }
    }.map(_._1).toSet
  }

  private def run(n: Int, seed: Int, k: Int, minDotQ: Long): Unit = {
    import spark.implicits._
    val df = corpus(n, seed).toDF("vec_id", "emb")
    val fit = KMeansLloyd.fit(df, "vec_id", "emb", k, iters = 2)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getInt(2), r.getLong(3)))
      .toSeq
    val want = referenceKept(fit, minDotQ)
    val got = SemDedup.dedup(df, "vec_id", "emb", k, iters = 2, minDotQ)
      .filter(col("kept") === 1).collect().map(_.getLong(0)).toSet
    assert(got == want,
      s"n=$n seed=$seed k=$k t=$minDotQ: kept ${got.size}, reference ${want.size}")
    assert(want.nonEmpty)
  }

  test("keep rule == in-memory reference across seeds and thresholds") {
    // ~cos 0.5 and ~cos 0.95 for x1e4-quantized unit vectors
    for (seed <- 1 to 3; t <- Seq(50000000L, 95000000L))
      run(n = 40, seed = seed, k = 4, minDotQ = t)
  }

  test("planted near-dup pairs lose exactly one member") {
    import spark.implicits._
    val data = corpus(40, seed = 9)
    val df = data.toDF("vec_id", "emb")
    val out = SemDedup.dedup(df, "vec_id", "emb", k = 4, iters = 2,
      minDotQ = 95000000L).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // each planted dup (id >= 40) is ~cos 1 to its source; if fitted into
    // the same cluster, exactly one of the two survives
    val fit = KMeansLloyd.fit(df, "vec_id", "emb", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    var checked = 0
    for (j <- 0 until 5) {
      val (dupId, srcId) = ((40 + j).toLong, (j * 7 % 40).toLong)
      if (fit(dupId) == fit(srcId)) {
        assert(out(dupId) + out(srcId) == 1L,
          s"pair ($srcId, $dupId): kept flags ${out(srcId)}, ${out(dupId)}")
        checked += 1
      }
    }
    assert(checked > 0, "no planted pair landed in one cluster — broken fixture")
  }

  test("trivial thresholds: MaxValue keeps all; MinValue keeps one per cluster") {
    import spark.implicits._
    val df = corpus(30, seed = 4).toDF("vec_id", "emb")
    val all = SemDedup.dedup(df, "vec_id", "emb", k = 3, iters = 2, Long.MaxValue)
    assert(all.filter(col("kept") === 0).count() == 0)
    // dot >= MinValue always holds, so only each cluster's (d2, id)-dominant
    // member survives: kept count == cluster count
    val one = SemDedup.dedup(df, "vec_id", "emb", k = 3, iters = 2, Long.MinValue)
    val clusters = one.select(col("cid")).distinct().count()
    assert(one.filter(col("kept") === 1).count() == clusters)
  }
}
