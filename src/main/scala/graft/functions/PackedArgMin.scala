package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{lit, shiftright}

/** Argmin-with-tiebreak as `min(BIGINT)` instead of `min(struct(...))`.
  *
  * Spark's `HashAggregateExec` only accepts aggregation BUFFERS of
  * mutable primitive types; a struct-typed `min` falls back to
  * `SortAggregate`, which pays two extra sorts of the pre-aggregation
  * rows per exchange side (the round-10 verdict measured this as the
  * dominant cost of q184's LPA rounds, PLANS.md's
  * HashAggregate→Sort→SortAggregate shape). Packing the lexicographic
  * pair `(key, payload)` into one BIGINT — `key * 2^bits + payload`
  * with `payload ∈ [0, 2^bits)` — restores the hash-aggregable path
  * while preserving the exact struct-min order: within one key the
  * payload offset is non-negative and smaller than the stride, so
  * `min(packed)` selects the smallest key, then the smallest payload.
  * Negative keys work unchanged (two's-complement order of
  * `key * 2^bits + payload` equals the pair order for in-bound values).
  *
  * Decoding uses arithmetic shifts: `shiftright(w, bits)` is floor
  * division by `2^bits` (correct for negative keys), and
  * `w & (2^bits - 1)` is the floor-mod remainder — both single codegen
  * instructions, both engine-portable (DuckDB `>>`/`&` agree on
  * BIGINT), though the oracle side usually keeps its ROW_NUMBER
  * formulation: packing changes the physical plan, not the winner.
  *
  * Bounds are a hard contract: `payload ∈ [0, 2^bits)` and
  * `|key| ≤ 2^(62-bits)` keep `key·2^bits + payload` inside Long with a
  * full bit of headroom. [[guard]] turns those documented cliffs into
  * loud executor-side failures ([[Guard.require]] discipline) instead
  * of a silently-wrong argmin.
  */
object PackedArgMin {

  /** `key * 2^bits + payload` — lexicographic (key, payload) as one
    * BIGINT; feed to `min(...)` for argmin-with-smallest-payload
    * tiebreak on the hash-aggregate path. */
  def pack(key: Column, payload: Column, bits: Int): Column = {
    require(bits > 0 && bits < 62, s"bits must be in (0, 62): $bits")
    key * lit(1L << bits) + payload
  }

  /** The winning key: arithmetic shift = floor division by 2^bits. */
  def key(packed: Column, bits: Int): Column = shiftright(packed, bits)

  /** The winning payload: low `bits` bits (floor-mod remainder). */
  def payload(packed: Column, bits: Int): Column =
    packed.bitwiseAND(lit((1L << bits) - 1))

  /** Assert the packing bounds on every row ([[Guard.require]]): the
    * query keeps its plan shape and fails loudly — with `what`'s own
    * message — the moment an input outgrows the documented range. */
  def guard(df: DataFrame, keyCol: Column, payloadCol: Column, bits: Int,
      what: String): DataFrame = {
    val maxKey = 1L << (62 - bits)
    Guard.require(df,
      payloadCol >= 0L && payloadCol < lit(1L << bits) &&
        keyCol >= lit(-maxKey) && keyCol <= lit(maxKey),
      s"$what: packed argmin out of range (payload must be in [0, 2^$bits), " +
        s"|key| <= 2^${62 - bits}); promote to min(struct) or raise bits")
  }
}
