package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature: `minhash_sig(array<string>) -> array<bigint>`.
  *
  * The naive formulation (`transform(sequence(0, k-1), j ->
  * array_min(transform(sh, x -> xxhash64(x, j))))`) walks the shingle array
  * k times through interpreted higher-order lambdas and re-hashes every
  * shingle's bytes k times — the q37 hotspot at bench scale. This expression
  * hashes each shingle's bytes ONCE (XXH64), derives the k hash family
  * members with a multiply-XOR universal family (Broder's standard
  * one-hash-then-affine construction), and keeps the k minima in a local
  * long[] — one traversal, no allocation per element, whole-stage codegen.
  *
  * Per-row cost drops from O(k·|sh|·|bytes|) to O(|sh|·|bytes| + k·|sh|)
  * with tiny constants; at 100 TB this is the difference between the
  * signature stage being free vs dominating the dedup pipeline.
  */
case class MinHashSig(child: Expression, numHashes: Int = 32)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0 && numHashes <= 1024, "numHashes out of range")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // Deterministic affine family: h_j = (h ^ B(j)) * A(j) with A odd.
  // Exposed for tests and the eval/codegen paths; cheap pure functions.
  @inline private def mixA(j: Int): Long = 0x9E3779B97F4A7C15L * (2L * j + 1L)
  @inline private def mixB(j: Int): Long = 0xC2B2AE3D27D4EB4FL * (j + 1L)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var j = 0
        while (j < numHashes) {
          val hj = (h ^ mixB(j)) * mixA(j)
          if (hj < mins(j)) mins(j) = hj
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val hj = ctx.freshName("hj")
      val mins = ctx.freshName("mins")
      val xxh = classOf[XXH64].getName
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $arr.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $utf8 $s = $arr.getUTF8String($i);
         |    long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $hj = ($h ^ (0xC2B2AE3D27D4EB4FL * ($j + 1L))) * (0x9E3779B97F4A7C15L * (2L * $j + 1L));
         |      if ($hj < $mins[$j]) $mins[$j] = $hj;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Register `minhash_sig` for use from expr()/SQL (1-arg form, k=32). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", es => MinHashSig(es.head), "built-in")
}
