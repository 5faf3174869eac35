package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel shared by the eval and codegen paths of
  * [[NfcNormalize]].
  *
  * Training corpora mix precomposed (U+00E1) and decomposed (a + U+0301)
  * forms of the same glyph; every downstream exact/near-dup hash treats them
  * as different documents unless canonicalized first, so NFC belongs at the
  * head of a cleaning pipeline. Spark has no built-in for it; this is a
  * per-row, shuffle-free codegen expression — the cheapest extension shape.
  *
  * The fast path matters at scale: `Normalizer.isNormalized` is a single
  * scan with no allocation, and real-world corpora are overwhelmingly
  * already-NFC, so the common case returns the input `UTF8String` untouched
  * (no String round-trip, no copy).
  */
object UnicodeKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(text) -> string`: Unicode canonical composition (NFC),
  * matching DuckDB's `nfc_normalize` — which is what makes it
  * oracle-verifiable byte-for-byte. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.UnicodeKernel.nfc($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeKernels {
  /** Register `nfc_normalize` for expr()/SQL use. */
  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "nfc_normalize") { case Seq(t) => NfcNormalize(t) }
}
