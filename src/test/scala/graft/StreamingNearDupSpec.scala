package graft

import graft.streaming.StreamingNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Cross-batch near-duplicate suppression: documents arriving in LATER
  * micro-batches are flagged against residents from earlier batches via
  * per-bucket LSH state — no join against history, state = one resident
  * per touched bucket. */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire tonight"
  private val unrelated =
    "completely different words about spark catalyst optimizer plans and shuffle partitions everywhere"
  // one word changed -> high but < 1.0 jaccard on 3-shingles
  private val nearDup = base.replace("lazy", "sleepy")

  test("near-dups are detected across micro-batches; unrelated docs pass") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = StreamingNearDup.detect(
      stream.toDF().toDF("doc_id", "text"), threshold = 0.5)

    val q = out.writeStream
      .format("memory").queryName("neardup_out").outputMode("append").start()
    try {
      // batch 1: two unrelated residents
      stream.addData((1L, base), (2L, unrelated))
      q.processAllAvailable()
      assert(spark.table("neardup_out").count() == 0, "residents are not dups")

      // batch 2: a near-dup of doc 1, an exact dup of doc 2, a fresh doc
      stream.addData((10L, nearDup), (20L, unrelated),
        (30L, "some entirely novel content that matches nothing else in the stream at all today"))
      q.processAllAvailable()

      val got = spark.table("neardup_out")
        .select("doc_id", "dup_of", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val pairs = got.map(t => (t._1, t._2))
      assert(pairs == Set((10L, 1L), (20L, 2L)), s"got $got")
      val exact = got.find(_._1 == 20L).get
      assert(exact._3 == 1.0, "exact duplicate must verify at jaccard 1.0")
      val near = got.find(_._1 == 10L).get
      assert(near._3 >= 0.5 && near._3 < 1.0, s"near-dup jaccard ${near._3}")

      // batch 3: a near-dup arriving two batches after its resident
      stream.addData((40L, base.replace("fire", "stove")))
      q.processAllAvailable()
      val later = spark.table("neardup_out").filter("doc_id = 40").collect()
      assert(later.nonEmpty && later.head.getLong(1) == 1L,
        "state must persist across multiple batches")
    } finally q.stop()
  }

  test("TTL: an expired bucket stops suppressing and its state is evicted") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // keep event times strictly above the epoch: Spark's late-row filter
    // drops rows with event time <= the current watermark, and the INITIAL
    // watermark is 0 — a t=0 resident would silently never seat
    def t(sec: Long) = new java.sql.Timestamp((1000 + sec) * 1000L)
    val filler1 = "totally separate subject matter concerning database engines and columnar storage formats in general"
    val filler2 = "yet more distinct prose on watermarks state stores and timeout semantics for stream processing"

    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingNearDup.detectWithTtl(
      stream.toDF().toDF("doc_id", "text", "ts"),
      threshold = 0.5, tsCol = "ts", watermarkDelay = "0 seconds", ttlMs = 10_000L)

    val q = out.writeStream
      .format("memory").queryName("neardup_ttl_out").outputMode("append").start()
    try {
      // batch 1 (t=0s): resident seated, lease runs to t=10s
      stream.addData((1L, base, t(0)))
      q.processAllAvailable()
      // batch 2 (t=5s): inside the lease -> suppressed as usual
      stream.addData((10L, nearDup, t(5)))
      q.processAllAvailable()
      val flagged = spark.table("neardup_ttl_out")
        .select("doc_id", "dup_of").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(flagged == Set((10L, 1L)), s"in-lease near-dup must be suppressed: $flagged")

      // batch 3 (t=100s): advances the watermark far past the lease…
      stream.addData((3L, filler1, t(100)))
      q.processAllAvailable()
      // …batch 4 fires the expirations (timeouts are processed for keys
      // without new data once the watermark passes their lease)
      stream.addData((4L, filler2, t(101)))
      q.processAllAvailable()

      // batch 5 (t=102s): a fresh near-dup of doc 1 — its buckets expired,
      // so it is NOT suppressed; it becomes the new resident instead
      stream.addData((50L, base.replace("cat", "bird"), t(102)))
      q.processAllAvailable()
      assert(spark.table("neardup_ttl_out").filter("doc_id = 50").isEmpty,
        "post-expiry arrival must seat a new resident, not match evicted state")

      // and the new resident DOES suppress its own later near-dups
      stream.addData((60L, base.replace("cat", "bird").replace("dog", "wolf"), t(103)))
      q.processAllAvailable()
      val again = spark.table("neardup_ttl_out").filter("doc_id = 60").collect()
      assert(again.nonEmpty && again.head.getLong(1) == 50L,
        "the re-seated bucket must suppress against the NEW resident")
    } finally q.stop()
  }
}
