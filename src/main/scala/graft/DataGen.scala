package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator: replicate the driver's sf0.1 tables K× with shifted
  * keys to produce larger scale factors for LOCAL scaling runs (the driver's
  * own testdata is read-only and capped at sf0.1).
  *
  * Design choices, so the scaled data measures what we want:
  *  - **Foreign keys stay consistent**: each copy shifts every key column by
  *    `copy × (max(key over the REFERENCED table) + 1)` — lineitem rows of
  *    copy i join orders/part/supplier of copy i, so join fan-outs scale
  *    linearly, exactly like adding new days of data.
  *  - **Document text is salted per copy** (`word → word_cN`): otherwise
  *    every doc would have K near-identical twins and the near-dup joins
  *    would measure a pathological planted-duplicate corpus (result
  *    cardinality K², not K) instead of K× the original near-dup density.
  *  - **Embeddings are copied verbatim** (ids shifted): ANN bucket sizes
  *    then grow exactly K× — the intended "corpus grew, same distribution"
  *    scaling shape; ties broken by vec_id stay deterministic.
  *  - **events.ts stays raw nanosecond longs** (read with nanosAsLong, no
  *    normalization) so `Tables.events` treats generated directories
  *    identically to driver directories; event ids and user ids shift, so
  *    user cardinality scales while per-user density stays constant.
  *
  * Usage: `runMain graft.DataGen <srcDir> <outDir> <copies>`.
  */
object DataGen {

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copiesStr) = args
    val copies = copiesStr.toInt
    require(copies >= 1, "copies must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    def keyBase(t: String, c: String): Long =
      rd(t).agg(max(col(c))).head().getLong(0) + 1L

    // dimensions: verbatim (a bigger fact side joins the same dims —
    // the broadcast-join shape under test)
    Seq("region", "nation").foreach(t => wr(rd(t), t))

    val custB = keyBase("customer", "c_custkey")
    val suppB = keyBase("supplier", "s_suppkey")
    val partB = keyBase("part", "p_partkey")
    val ordB = keyBase("orders", "o_orderkey")
    val evB = keyBase("events", "event_id")
    val userB = keyBase("events", "user_id")
    val docB = keyBase("documents", "doc_id")
    val vecB = keyBase("embeddings", "vec_id")

    def replicate(t: String, shifts: Map[String, Long],
        tweak: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
      val source = rd(t)
      val scaled = (0 until copies).map { i =>
        val shifted = shifts.foldLeft(source) { case (df, (c, b)) =>
          df.withColumn(c, col(c) + lit(b * i))
        }
        tweak(shifted, i)
      }.reduce(_ unionByName _)
      wr(scaled, t)
    }

    replicate("customer", Map("c_custkey" -> custB))
    replicate("supplier", Map("s_suppkey" -> suppB))
    replicate("part", Map("p_partkey" -> partB))
    replicate("orders", Map("o_orderkey" -> ordB, "o_custkey" -> custB))
    replicate("lineitem", Map(
      "l_orderkey" -> ordB, "l_partkey" -> partB, "l_suppkey" -> suppB))
    replicate("events", Map("event_id" -> evB, "user_id" -> userB))
    replicate("embeddings", Map("vec_id" -> vecB))
    replicate("documents", Map("doc_id" -> docB), (df, i) =>
      if (i == 0) df
      else df
        .withColumn("text",
          array_join(transform(split(col("text"), " "), w => concat(w, lit(s"_c$i"))), " "))
        .withColumn("n_chars", length(col("text")).cast("long")))

    println(s"""{"generated":"$outDir","copies":$copies}""")
    spark.stop()
  }
}
