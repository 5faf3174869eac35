package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the cluster-partitioned
  * scale path for embedding-cosine near-dup (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540): exact pairwise similarity is quadratic in the corpus,
  * so first partition the space with k-means, then compare pairs only WITHIN
  * a cluster, and from every ε-similar pair keep the member closer to its
  * centroid.
  *
  * Semantics (deterministic, declarative — no sequential greedy scan):
  * a vector X is DROPPED iff some same-cluster vector Y has
  * dot(X, Y) ≥ minDotQ and Y strictly dominates X by (d², id)
  * lexicographic order (closer to the centroid, ties to the smaller id).
  * Domination is a total order within a cluster, so every nonempty
  * ε-similar group keeps at least its dominant member, and the rule needs
  * exactly one pass over within-cluster pairs. X is compared against ALL
  * cluster members, not just survivors — a chain A~B~C with A≁C keeps A
  * and can drop both B and C; that is the paper's "keep one representative
  * per ε-ball" intent, which deliberately over-prunes relative to the
  * sequential greedy variant.
  *
  * Every arithmetic step is exact and engine-replayable, like the
  * [[KMeansLloyd]] fit it builds on: similarity is the integer dot
  * (`dot_l`) of the ×10⁴-quantized vectors, thresholded as a long — for
  * unit-norm embeddings minDotQ ≈ cos_threshold × 10⁸ — so no float
  * compare can straddle an engine rounding boundary.
  *
  * Scale shape: the fit is Lloyd's loop (broadcast centroids + hash agg);
  * the pair stage self-joins on `cid` only, so its volume is
  * Σ per-cluster n_c², bounded by choosing k ∝ corpus size (the paper runs
  * k ≈ n/1000 at web scale — constant expected cluster size ⇒ linear total
  * pair work). A runaway hot cluster is the skew risk; mitigations are the
  * usual salting of the pair join or capping cluster size, neither needed
  * at the test scale. No all-pairs stage exists anywhere.
  */
object SemDedup {

  /** Per-vector verdicts: (idCol, cid, d2, kept) with kept ∈ {0, 1} —
    * kept = 1 iff no dominating same-cluster vector is ≥ minDotQ similar.
    * `vectors(idCol, vecCol: array<float>)`; ids must be dense 0-based
    * (the [[KMeansLloyd]] seeding contract, enforced there). */
  def dedup(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, minDotQ: Long): DataFrame = {
    // The fit feeds THREE plan branches (verdict row + both pair-join
    // sides); without materialization Spark re-runs the whole Lloyd loop
    // per branch (observed in the formatted plan — 3× the dominant cost).
    // localCheckpoint is the honest cut: eagerly computed once per CALL,
    // never reused across calls (unlike persist, whose CacheManager
    // plan-matching silently serves later identical runs — the bench
    // artifact class the round-5 review caught twice), and released by the
    // ContextCleaner when the frame goes out of scope. Trade-off: local
    // checkpoints are not fault-tolerant; a production run on a real
    // cluster would use reliable checkpointing or rely on stage retry.
    val fitted = KMeansLloyd.fit(vectors, idCol, vecCol, k, iters)
      .localCheckpoint(true)
    val a = fitted.select(col("cid"), col(idCol).as("id_a"),
      col("qvec").as("qa"), col("d2").as("d2_a"))
    val b = fitted.select(col("cid"), col(idCol).as("id_b"),
      col("qvec").as("qb"), col("d2").as("d2_b"))
    val dropped = a.join(b, Seq("cid"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("d2_b") < col("d2_a") ||
        (col("d2_b") === col("d2_a") && col("id_b") < col("id_a")))
      .filter(expr("dot_l(qa, qb)") >= minDotQ)
      .select(col("id_a")).distinct()
    fitted
      .join(dropped.select(col("id_a").as(idCol), lit(1L).as("__dropped")),
        Seq(idCol), "left")
      .select(col(idCol), col("cid"), col("d2"),
        col("__dropped").isNull.cast("long").as("kept"))
  }
}
