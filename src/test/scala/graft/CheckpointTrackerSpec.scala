package graft

import graft.operators.CheckpointTracker
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-12 CheckpointTracker contract: every lazyCkpt call
  * registers EXACTLY one persistent RDD (the misattribution guard the
  * round-11 advisor asked for), `lastCkpt` exposes that call's ids for
  * the per-round release pattern, and releaseAll() unpersists everything
  * the tracker created — and nothing else. */
class CheckpointTrackerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("lazyCkpt tracks exactly one new RDD per call; releaseAll frees them all") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val df = (1L to 100L).toDF("v")
    val tr = new CheckpointTracker(df)
    val a = tr.lazyCkpt(df.select($"v" * 2 as "v"))
    val idsA = tr.lastCkpt
    assert(idsA.size === 1, s"expected one tracked id, got $idsA")
    val b = tr.lazyCkpt(a.select($"v" + 1 as "v"))
    val idsB = tr.lastCkpt
    assert(idsB.size === 1 && idsB != idsA,
      "lastCkpt must expose only the most recent call's id")
    assert(b.count() === 100L) // materialize both lazy checkpoints
    val during = sc.getPersistentRDDs.keySet
    assert((idsA ++ idsB).subsetOf(during), "tracked blocks should be live")
    tr.releaseAll()
    val after = sc.getPersistentRDDs.keySet
    assert((idsA ++ idsB).intersect(after).isEmpty,
      s"releaseAll left tracked blocks behind: ${(idsA ++ idsB).intersect(after)}")
    assert(before.subsetOf(after),
      "releaseAll must never unpersist RDDs the tracker did not create")
  }

  test("a foreign persist between lazyCkpt calls is never misattributed") {
    import spark.implicits._
    val df = (1L to 10L).toDF("v")
    val tr = new CheckpointTracker(df)
    val foreign = (1L to 5L).toDF("w").persist()
    foreign.count()
    val foreignId = spark.sparkContext.getPersistentRDDs.keySet
    val a = tr.lazyCkpt(df.select($"v" * 3 as "v"))
    assert(a.count() === 10L)
    tr.releaseAll()
    // the foreign cache must survive the tracker's release
    assert(foreign.storageLevel.useMemory,
      "releaseAll unpersisted a foreign cached frame")
    assert(foreign.count() === 5L)
    foreign.unpersist()
  }
}
