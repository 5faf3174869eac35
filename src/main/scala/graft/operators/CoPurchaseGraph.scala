package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The part co-purchase edge derivation shared by the eight graph queries
  * (q162/q179/q184/q187/q191/q196/q199/q202): nodes are parts, an
  * undirected edge connects two parts appearing in the same order, derived
  * from the first three lineitems per order (l_linenumber ≤ 3 ⇒ ≤ C(3,2) =
  * 3 pairs per order, edge volume LINEAR in orders).
  *
  * Round-16 optimization (guide §2.4 "remove shuffles outright"): before
  * this operator each query inlined the derivation verbatim and every
  * multi-consumer plan RE-EXECUTED it per consumer — the static
  * ReuseExchange rule does not unify the four structurally-identical
  * distinct exchanges in q162's census (plans/r16/q162_*_before.txt: four
  * separate lineitem self-join + partial-distinct subtrees, AQE's runtime
  * stage reuse recovered only some arms), and the per-round frames of
  * q179/q184/q187 re-derive the edge list once per round. [[edges]] routes
  * the derivation through the caller's [[CheckpointTracker]], so each query
  * pays it exactly ONCE per execution and every consumer reads the
  * checkpointed blocks. This is WITHIN-query materialization only — there
  * is deliberately no cross-query/session cache (every bench pass and every
  * oracle run recomputes from the parquet inputs; see OPTIMIZATION_r16.md
  * "Cross-query caching: deliberately NOT done").
  *
  * The DISTINCT itself runs on the pair packed into ONE BIGINT
  * (x·2²¹ + y — the q196/q199/q201 packed-key lever, guide §2.3 "narrower
  * types"): the exchange moves one long instead of two and the hash
  * aggregate stays on the single-long fast path. Packing is lossless for
  * part keys in [0, 2²¹) — the same in-band Guard the packed-key queries
  * already carry; past 2M parts the documented fallback is the two-field
  * (x, y) distinct (same plan shape, wider rows).
  *
  * Every query's ORACLE SQL still re-derives the edge set from lineitem
  * verbatim — the green hash row is the witness that the shared derivation
  * is the identical edge set.
  */
object CoPurchaseGraph {
  private val P = 2097152L // 2^21

  /** The raw canonical edge list (x < y, distinct), un-checkpointed.
    * Callers with a single consumer may use this directly; multi-consumer
    * queries must go through [[edges]]. */
  def derive(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.lineitem(s, d)
      .filter(col("l_linenumber") <= 3)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val pairs = e0.as("a").join(e0.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("x"), col("b.p").as("y"))
    graft.functions.Guard.require(pairs,
        expr("x >= 0L AND y < 2097152L"),
        "CoPurchaseGraph: l_partkey outside [0, 2^21) - the packed edge " +
          "BIGINT key would wrap; fall back to the two-field (x, y) " +
          "distinct past 2M parts")
      .select((col("x") * lit(P) + col("y")).as("xy"))
      .distinct()
      .select(expr("shiftright(xy, 21)").as("x"), expr("xy % 2097152L").as("y"))
  }

  /** The canonical edge list, lazily checkpointed through the caller's
    * tracker: derived once per query execution, read as blocks by every
    * consumer. The caller owns the CheckpointTracker contract (one eager
    * action on the final frame, then releaseAll). */
  def edges(s: SparkSession, d: String, ck: CheckpointTracker): DataFrame =
    ck.lazyCkpt(derive(s, d))
}
