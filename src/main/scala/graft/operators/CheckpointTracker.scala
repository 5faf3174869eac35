package graft.operators

import org.apache.spark.sql.DataFrame

/** Tracked localCheckpoint for iterative query builders — the reusable
  * core of the PageRankInt block-release discipline.
  *
  * Lazy per-round checkpoints are mandatory for iterative DataFrames
  * (without them round r embeds round r−1 two-to-five times and the
  * chain re-executes per consumer — q179 measured 11.0 s → 0.9 s, q184
  * 14.1 s → 0.9 s isolated at sf1), but the blocks they pin are NOT
  * free: left in the block manager they evict neighbours' working sets —
  * the same in-suite measurement showed the UNRELEASED version of those
  * checkpoints inflating the queries that run right after (q191
  * 2.8 s → 11.9 s at sf1) by more than the truncation saved. The
  * contract here is PageRankInt's: track exactly the delta of
  * `getPersistentRDDs` around each checkpoint this builder creates, have
  * the query eagerly checkpoint its (tiny) FINAL frame untracked — one
  * action that runs the whole iteration while the lazy blocks are alive —
  * then `releaseAll()` before returning, so the only blocks that outlive
  * construction are the final frame's own.
  */
final class CheckpointTracker(df0: DataFrame) {
  private val sc = df0.sparkSession.sparkContext
  private val mine = scala.collection.mutable.LinkedHashSet[Int]()
  private var last: Set[Int] = Set.empty

  /** Ids registered by the most recent [[lazyCkpt]] call — lets an
    * iterative loop release round r−1's blocks right after round r's
    * action materializes (the PageRankInt per-round pattern), instead of
    * letting every round's blocks pile up until releaseAll(). */
  def lastCkpt: Set[Int] = last

  /** Lazily checkpoint an intermediate frame, tracking its blocks.
    *
    * The delta MUST be exactly the one RDD this `localCheckpoint` call
    * registered: the keySet diff is process-global, so a concurrent
    * persist on the shared SparkContext would be misattributed to this
    * tracker and `releaseAll()` would unpersist a foreign builder's
    * blocks — for a localCheckpoint those are UNRECOMPUTABLE (lineage
    * truncated), failing that consumer's job instead of recomputing.
    * Fail loudly here rather than corrupt a neighbour later. */
  def lazyCkpt(df: DataFrame): DataFrame = {
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint(false)
    val added = sc.getPersistentRDDs.keySet.diff(before)
    require(added.size == 1,
      s"CheckpointTracker.lazyCkpt expected exactly one new persistent RDD, " +
        s"saw ${added.size} (ids=${added.toSeq.sorted.mkString(",")}) — a concurrent " +
        "persist on this SparkContext would make releaseAll() unpersist foreign, " +
        "unrecomputable checkpoint blocks; serialize query construction")
    mine ++= added
    last = added.toSet
    out
  }

  /** Unpersist every block this tracker created. Call AFTER an untracked
    * eager checkpoint of the final frame has materialized the result. */
  def releaseAll(): Unit = {
    val live = sc.getPersistentRDDs
    mine.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
    mine.clear()
  }
}
