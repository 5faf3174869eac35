package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2b): exact, n-gram Jaccard,
  * MinHash+LSH banding, and SimHash — the standard large-corpus near-dup
  * stack for training-data pipelines.
  *
  * Scale design: exact dedup is one hash aggregate on the dedup key (the
  * generalization of the reference's `_id = random_id` idempotency key,
  * lambda_function.py:81). MinHash/SimHash signatures are per-row expressions
  * (no shuffle); candidate generation shuffles on (band, band_hash) — tiny
  * keys — instead of any all-pairs comparison, which is the only formulation
  * that survives 100 TB. Verification (exact Jaccard) runs only on candidate
  * pairs.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Distinct 3-word shingles of a text column, as an array column `sh`. */
  private def withShingles(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("w", split(col(textCol), " "))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", array_distinct(
        expr("transform(sequence(0, size(w) - 3), i -> concat(w[i], ' ', w[i + 1], ' ', w[i + 2]))")))

  // ---------------------------------------------------------------- q35
  private val q35: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), substring(col("text"), 1, 40).as("snippet"))
      .orderBy(col("keep_id"))

  private val q35Sql =
    """SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies, substr(text, 1, 40) AS snippet
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------- q36
  private val q36: Q = (s, d) => {
    val sh = withShingles(Tables.documents(s, d), "text").select(col("doc_id"), col("sh"))
    val a = sh.as("a")
    val b = sh.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("sh", "sh_b").as("b")
    a.join(b, col("doc_id_b") === col("doc_id") + 1)
      .select(
        col("doc_id"),
        size(array_intersect(col("sh"), col("sh_b"))).cast("long").as("n_inter"),
        size(array_union(col("sh"), col("sh_b"))).cast("long").as("n_union"),
        round(size(array_intersect(col("sh"), col("sh_b"))).cast("double") /
          size(array_union(col("sh"), col("sh_b"))), 6).as("jaccard"))
      .orderBy(col("doc_id"))
  }

  private val q36Sql =
    """WITH s AS (
      | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
      |   i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) WHERE len(w) >= 3)
      |SELECT a.doc_id AS doc_id,
      | CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_inter,
      | CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS n_union,
      | round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |       len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q37 (no oracle: MinHash banding)
  /** Per-document MinHash LSH bands: 32 hash slots, 8 bands × 4 rows, all in
    * the one-pass codegen'd `minhash_bands` expression
    * (graft.functions.MinHashBands — fused so the signature is computed once,
    * not once per band). Rows = doc × band; joining this table to itself on
    * (band_id, band_hash) yields candidate pairs. */
  private val q37: Q = (s, d) => {
    graft.functions.MinHashBands.register(s)
    withShingles(Tables.documents(s, d), "text")
      .select(col("doc_id"), posexplode(expr("minhash_bands(sh)")))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
      .orderBy(col("doc_id"), col("band_id"))
  }

  /** LSH candidate pairs (band-bucket join) verified by exact Jaccard.
    * Used by tests and by callers with planted near-duplicates. */
  def minhashCandidates(docs: DataFrame, threshold: Double): DataFrame = {
    graft.functions.MinHashBands.register(docs.sparkSession)
    val sh = withShingles(docs, "text")
    val bands = sh.select(col("doc_id"), col("sh"), posexplode(expr("minhash_bands(sh)")))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_hash")
    val l = bands.select(col("band_id"), col("band_hash"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val r = bands.select(col("band_id"), col("band_hash"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  // ---------------------------------------------------------------- q38 (no oracle: SimHash)
  /** 64-bit SimHash over distinct words + Hamming distance to doc_id+1.
    * Near-dups have small Hamming distance; the per-doc signature is a pure
    * expression (no shuffle), and the neighbor pair is an equi-join on
    * doc_id+1 — shuffles on the key like any join, never a global window. */
  private val q38: Q = (s, d) => {
    val sig = Tables.documents(s, d)
      .withColumn("wh", expr("transform(array_distinct(split(text, ' ')), x -> xxhash64(x))"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L, (acc, b) -> acc + shiftleft(
          |  CASE WHEN aggregate(wh, 0L, (a2, h) -> a2 + (shiftright(h, b) & 1) * 2 - 1) > 0
          |  THEN 1L ELSE 0L END, b))""".stripMargin))
      .select(col("doc_id"), col("simhash"))
    val nxt = sig.select((col("doc_id") - 1).as("doc_id"), col("simhash").as("next_simhash"))
    sig.join(nxt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("simhash"),
        when(col("next_simhash").isNotNull,
          expr("bit_count(simhash ^ next_simhash)").cast("long")).as("hamming_next"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q35_dedup_exact_text" -> q35,
    "q36_jaccard_consecutive" -> q36,
    "q37_minhash_bands" -> q37,
    "q38_simhash_hamming" -> q38)

  val oracle: Map[String, String] = Map(
    "q35_dedup_exact_text" -> q35Sql,
    "q36_jaccard_consecutive" -> q36Sql)
}
