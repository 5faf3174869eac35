package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One round of Luby's maximal-independent-set algorithm with
  * DETERMINISTIC hash priorities — the distributed symmetry-breaking
  * primitive (q202): a node joins the MIS when its priority is STRICTLY
  * below every active neighbor's (isolated actives always join); winners
  * and their neighbors leave the active set. Strict < makes hash ties
  * SAFE for independence — equal-priority neighbors block each other and
  * retry next round — so a 60-bit collision costs a round, never
  * correctness. Run to an empty active set the selected nodes are a
  * maximal independent set: independent because a winner's neighbors can
  * never win in the same round (strictly larger priority) nor later
  * (removed), maximal because a node only leaves the active set by
  * winning or by gaining a selected neighbor.
  *
  * Contract: `act` is (node, prio) with `prio = md5Bucket60(node)` (see
  * [[init]]), `arcs` is the SYMMETRIC arc list (u, v) restricted to
  * active endpoints — [[round]] returns the shrunken invariant-preserving
  * frames for the next call. Every per-round frame rides the caller's
  * [[CheckpointTracker]] so iterating never rebuilds lineage (the
  * q179/q184/q187 5^r blowup).
  *
  * Scale shape per round: one arc-keyed min-aggregate (map-side
  * combined), one anti-join, two LEFT SEMI joins — all keyed on the node
  * id, all |E|-linear; nothing driver-side.
  */
object LubyMis {

  final case class Round(win: DataFrame, removed: DataFrame,
                         active: DataFrame, arcs: DataFrame)

  /** Initial active frame from a symmetric arc list: the edge-covered
    * nodes with their deterministic 60-bit md5 priority. */
  def init(arcs: DataFrame): DataFrame =
    arcs.select(col("u").as("node")).distinct()
      .select(col("node"),
        graft.functions.PortableHash.md5Bucket60(col("node").cast("string"))
          .as("prio"))

  /** One Luby round over (act, arcs); all four result frames are lazily
    * checkpointed on `tracker` (materialized by the caller's final
    * action, released by the caller's releaseAll). */
  def round(act: DataFrame, arcs: DataFrame, tracker: CheckpointTracker): Round = {
    val nbrMin = arcs
      .join(act.select(col("node").as("v"), col("prio").as("pv")), Seq("v"))
      .groupBy(col("u").as("node")).agg(min(col("pv")).as("mp"))
    val win = tracker.lazyCkpt(act.join(nbrMin, Seq("node"), "left")
      .filter(col("mp").isNull || col("prio") < col("mp"))
      .select(col("node")))
    val removed = tracker.lazyCkpt(win.unionByName(
        arcs.join(win.select(col("node").as("u")), Seq("u"))
          .select(col("v").as("node")))
      .distinct())
    val active = tracker.lazyCkpt(act.join(removed, Seq("node"), "left_anti"))
    val nextArcs = tracker.lazyCkpt(arcs
      .join(active.select(col("node").as("u")), Seq("u"), "left_semi")
      .join(active.select(col("node").as("v")), Seq("v"), "left_semi"))
    Round(win, removed, active, nextArcs)
  }
}
