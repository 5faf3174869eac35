package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.bridge

/** The repo's one portable hash trick, in one place: the first 60 bits of
  * md5 as a non-negative BIGINT. md5 is bit-identical in Spark and DuckDB,
  * and 15 hex chars always fit a signed 64-bit integer, so the value
  * replays in the oracle as `CAST(('0x' || substr(md5(x), 1, 15)) AS
  * BIGINT)` — the foundation of every deterministic sampling / splitting /
  * LSH query here. Centralized so the Spark and SQL twins cannot drift
  * independently (six inline copies had accumulated by round 5).
  *
  * Round 16: the Spark-side implementation is [[Md5Kernels]]' digest-bytes
  * codegen expression instead of the old `conv(substring(md5(x), 1, 15),
  * 16, 10) CAST long` chain — bit-identical (Md5KernelsSpec pins it against
  * the old formula), but skipping the hex string, the substring copy,
  * conv's base-10 STRING output, and the final cast reparse per evaluated
  * row. The oracle SQL twin is unchanged.
  */
object PortableHash {

  /** First 60 bits of md5(expr) as a long. `expr` must already be a
    * string column (hash inputs are byte-exact; no implicit casts). */
  def md5Bucket60(c: Column): Column =
    bridge.column(Bits60(Md5Digest128(bridge.expression(c)), hi = false))

  /** Hex chars 16–30 of md5(expr) as a long — a second 60-bit value
    * independent of [[md5Bucket60]]'s, from the SAME digest. Exists for
    * Kirsch–Mitzenmacher double hashing (h_j = (h1 + j·h2) mod 2⁶⁰): a
    * k-hash MinHash signature then costs ONE md5 per input instead of k —
    * measured 4× on the q66 LSH family — while staying byte-replayable in
    * the oracle as `CAST(('0x' || substr(md5(x), 16, 15)) AS BIGINT)`.
    * No overflow in either engine: h1 + 7·h2 < 8·2⁶⁰ = 2⁶³. The shared
    * [[Md5Digest128]] subtree is eliminated by whole-stage codegen's
    * subexpression elimination when a projection evaluates both halves on
    * the same input. */
  def md5Bucket60Hi(c: Column): Column =
    bridge.column(Bits60(Md5Digest128(bridge.expression(c)), hi = true))
}
