package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic work-volume counters for the scaling-sensitive dedup
  * operators — the contention-immune complement to `graft.Bench`.
  *
  * Wall-clock on this box swings 3-10× run-to-run under host-level
  * interference (BENCH_r02/r05 adjudications; round-6 re-measures saw
  * q103 at sf1 read 5.9 s and 18.7 s minutes apart on an idle guest), so
  * a scaling RATIO derived from two wall-clock numbers can be pure noise.
  * Candidate-pair and result counts have no such failure mode: they are
  * exact functions of the data and the pruning logic, so the sf0.1 → sf1
  * growth of `q86_cand` / `q103_cand` IS the work-growth of those joins,
  * measurable to the row on a loaded box.
  *
  * Usage: `runMain graft.ScalingProbe <sfDir>`; prints one JSON line.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.TextKernels.register(spark)

    // Same corpus prep as q66/q86/q103 (DedupQueries.withShingles + the
    // array_distinct normalization the join operators apply internally).
    val docs = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        array_distinct(expr("word_shingles(text, 3)")).as("sh"))
    val nDocs = docs.count()
    val totShingles = docs.agg(sum(size(col("sh")))).head().getLong(0)

    val q86Cand = operators.SetSimilarityJoin
      .candidatePairs(docs, "doc_id", "sh", 0.5).count()
    val q86Pairs = operators.SetSimilarityJoin
      .jaccardJoin(docs, "doc_id", "sh", 0.5).count()
    val q103Cand = operators.SetSimilarityJoin
      .containmentCandidates(docs, "doc_id", "sh", 0.8).count()
    val q103Pairs = operators.SetSimilarityJoin
      .containmentJoin(docs, "doc_id", "sh", 0.8).count()
    val q66Pairs = SparkEntry.queries("q66_minhash_lsh_verified")(spark, sfDir).count()

    println(s"""{"sf":"$sfDir","docs":$nDocs,"shingles":$totShingles,""" +
      s""""q86_cand":$q86Cand,"q86_pairs":$q86Pairs,""" +
      s""""q103_cand":$q103Cand,"q103_pairs":$q103Pairs,""" +
      s""""q66_pairs":$q66Pairs}""")
    spark.stop()
  }
}
