package graft

import graft.operators.{CosineLshJoin, HyperplaneLsh}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CosineLshJoin invariants against an in-memory reference:
  *
  *  - soundness: every emitted pair is ordered (id_a < id_b) and its sim is
  *    the exact rounded dot, ≥ τ;
  *  - completeness wrt candidates: the emitted set EQUALS the brute-force
  *    τ-pairs restricted to pairs colliding in ≥1 table (LSH may miss
  *    pairs that never collide — that is the documented recall trade — but
  *    it must never lose a pair it bucketed, and never invent one);
  *  - planted near-dups (cosine ≈ 1) are found under the fixed seed.
  */
class CosineLshJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 16
  private val tables = 6
  private val planesPerTable = 2
  private val tau = 0.35

  private def corpus(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rng.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / nrm).toFloat)
    }
    val base = (0 until n).map(i => i.toLong -> unit())
    val dups = (0 until 4).map { j =>
      val src = base(j * 5 % n)._2
      val v = src.map(x => x + (rng.nextGaussian() * 0.005).toFloat)
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (n + j).toLong -> v.map(x => (x / nrm).toFloat)
    }
    base ++ dups
  }

  /** Reference: same plane family, same slicing, plain Scala loops. */
  private def referencePairs(
      vecs: Seq[(Long, Array[Float])]): Set[(Long, Long, Double)] = {
    val fam = HyperplaneLsh.planes(tables * planesPerTable, dim, 12345L)
    def dot(a: Array[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    def buckets(v: Array[Float]): Seq[Int] =
      (0 until tables).map { t =>
        fam.slice(t * planesPerTable, (t + 1) * planesPerTable).zipWithIndex
          .map { case (p, j) => if (dot(v, p) > 0) 1 << j else 0 }.sum
      }
    val bk = vecs.map { case (id, v) => id -> buckets(v) }.toMap
    (for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      if bk(ia).zip(bk(ib)).exists { case (x, y) => x == y }
      sim = BigDecimal(va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if sim >= tau
    } yield (ia, ib, sim)).toSet
  }

  test("emitted pairs == brute-force tau-pairs among colliding pairs (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(7, 21, 42)) {
      val vecs = corpus(30, seed)
      val df = vecs.toDF("id", "emb")
      val got = CosineLshJoin.nearDupPairs(df, "id", "emb",
          tables, planesPerTable, dim, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = referencePairs(vecs)
      assert(got == want, s"seed $seed: got ${got.size} pairs, want ${want.size}")
      assert(want.nonEmpty, s"seed $seed: vacuous (no reference pairs)")
      assert(got.forall { case (a, b, s2) => a < b && s2 >= tau })
    }
  }

  test("planted cosine~1 near-dups are all found under the fixed seed") {
    import spark.implicits._
    val n = 30
    val vecs = corpus(n, 3)
    val df = vecs.toDF("id", "emb")
    val found = CosineLshJoin.nearDupPairs(df, "id", "emb",
        tables, planesPerTable, dim, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // dup j (id n+j) was planted from base id j*5 % n with cosine ≈ 1:
    // a pair this similar collides in a table unless every plane of every
    // table splits it — vanishingly unlikely and, under this seed, absent.
    val expected = (0 until 4).map(j => ((j * 5 % n).toLong, (n + j).toLong))
    expected.foreach { p => assert(found.contains(p), s"planted pair $p missed") }
  }

  test("each candidate pair is emitted exactly once (no cross-table dupes)") {
    // candidatePairs dropped its distinct() for first-colliding-table
    // emission (FirstEqIdx); a regression there shows up as duplicate
    // rows, which the Set-based equality test above would mask.
    import spark.implicits._
    val df = corpus(40, 11).toDF("id", "emb")
    val cand = CosineLshJoin.candidatePairs(df, "id", "emb",
      tables, planesPerTable, dim).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.length == cand.toSet.size,
      s"${cand.length} rows but ${cand.toSet.size} distinct pairs")
    assert(cand.nonEmpty)
  }

  test("adaptivePlanes: integer-exact ceil(log2(n/250)) clamped to [3,14]") {
    val cases = Seq(1L -> 3, 500L -> 3, 501L -> 3, 2000L -> 3, 2001L -> 4,
      4000L -> 4, 4001L -> 5, 20000L -> 7, 64000L -> 8, 64001L -> 9,
      1000000L -> 12, 10000000L -> 14, 5000000000L -> 14)
    cases.foreach { case (n, want) =>
      assert(CosineLshJoin.adaptivePlanes(n) == want,
        s"n=$n: got ${CosineLshJoin.adaptivePlanes(n)}, want $want")
    }
  }

  test("degenerate parameters are rejected") {
    import spark.implicits._
    val df = corpus(5, 1).toDF("id", "emb")
    intercept[IllegalArgumentException] {
      CosineLshJoin.nearDupPairs(df, "id", "emb", 0, 3, dim, tau)
    }
    intercept[IllegalArgumentException] {
      CosineLshJoin.nearDupPairs(df, "id", "emb", 4, 0, dim, tau)
    }
  }
}
