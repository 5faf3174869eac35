package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{conv, md5, substring}

/** The repo's one portable hash trick, in one place: the first 60 bits of
  * md5 as a non-negative BIGINT. md5 is bit-identical in Spark and DuckDB,
  * and 15 hex chars always fit a signed 64-bit integer, so the value
  * replays in the oracle as `CAST(('0x' || substr(md5(x), 1, 15)) AS
  * BIGINT)` — the foundation of every deterministic sampling / splitting /
  * LSH query here. Centralized so the Spark and SQL twins cannot drift
  * independently (six inline copies had accumulated by round 5).
  */
object PortableHash {

  /** First 60 bits of md5(expr) as a long. `expr` must already be a
    * string column (hash inputs are byte-exact; no implicit casts). */
  def md5Bucket60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Hex chars 16–30 of md5(expr) as a long — a second 60-bit value
    * independent of [[md5Bucket60]]'s, from the SAME digest. Exists for
    * Kirsch–Mitzenmacher double hashing (h_j = (h1 + j·h2) mod 2⁶⁰): a
    * k-hash MinHash signature then costs ONE md5 per input instead of k —
    * measured 4× on the q66 LSH family — while staying byte-replayable in
    * the oracle as `CAST(('0x' || substr(md5(x), 16, 15)) AS BIGINT)`.
    * No overflow in either engine: h1 + 7·h2 < 8·2⁶⁰ = 2⁶³. */
  def md5Bucket60Hi(c: Column): Column =
    conv(substring(md5(c), 16, 15), 16, 10).cast("long")
}
