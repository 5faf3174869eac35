package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Direct digest-bytes implementation of [[PortableHash]]'s 60-bit md5
  * buckets — same bits, none of the string machinery.
  *
  * The declarative form `conv(substring(md5(x), 1, 15), 16, 10) CAST long`
  * materializes, per evaluated row: the 32-char hex string (Md5), a 15-char
  * substring copy, conv's base-16 → base-10 reparse INTO ANOTHER STRING, and
  * a final string → long cast parse — four string round-trips wrapping one
  * 16-byte digest. This kernel computes the digest once and assembles the
  * long from the raw bytes:
  *
  *   hex chars 1..15  == digest nibbles 0..14  == bigEndian(bytes 0..7) >>> 4
  *   hex chars 16..30 == digest nibbles 15..29 == bigEndian(bytes 7..14) & (2^60−1)
  *
  * Bit-identity with the old formula (and so with the DuckDB oracle's
  * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`) is pinned by
  * Md5KernelsSpec on random inputs; every oracle-paired query that rides
  * these buckets re-proves it end-to-end on every hash compare.
  *
  * Shape: [[Md5Digest128]] is the digest; [[Bits60]] extracts either 60-bit
  * half. Layering (instead of one fused digest+mask expression) lets
  * whole-stage codegen's subexpression elimination share ONE digest when a
  * projection needs both halves — the Kirsch–Mitzenmacher double-hashing
  * call sites (q66/q122 signature pipelines) evaluate lo and hi on the same
  * input string.
  */
object Md5Kernels {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Raw 16-byte MD5 of the string's UTF-8 bytes. */
  def digest(s: UTF8String): Array[Byte] = {
    val m = md.get()
    m.reset()
    m.update(s.getBytes)
    m.digest()
  }

  private def beLong(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xffL) << 56) | ((d(off + 1) & 0xffL) << 48) |
      ((d(off + 2) & 0xffL) << 40) | ((d(off + 3) & 0xffL) << 32) |
      ((d(off + 4) & 0xffL) << 24) | ((d(off + 5) & 0xffL) << 16) |
      ((d(off + 6) & 0xffL) << 8) | (d(off + 7) & 0xffL)

  /** Digest nibbles 0..14 (hex chars 1..15) as a non-negative long. */
  def lo60(d: Array[Byte]): Long = beLong(d, 0) >>> 4

  /** Digest nibbles 15..29 (hex chars 16..30) as a non-negative long. */
  def hi60(d: Array[Byte]): Long = beLong(d, 7) & ((1L << 60) - 1)
}

/** `md5_digest128(string) -> binary(16)`: the raw digest, codegen. */
case class Md5Digest128(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "md5_digest128"

  override def nullSafeEval(input: Any): Any =
    Md5Kernels.digest(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.Md5Kernels.digest($x);")

  override protected def withNewChildInternal(newChild: Expression): Md5Digest128 =
    copy(child = newChild)
}

/** `bits60(binary(16), hi) -> long`: one 60-bit half of an MD5 digest. */
case class Bits60(child: Expression, hi: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = if (hi) "bits60_hi" else "bits60_lo"

  override def nullSafeEval(input: Any): Any = {
    val d = input.asInstanceOf[Array[Byte]]
    if (hi) Md5Kernels.hi60(d) else Md5Kernels.lo60(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (hi) "hi60" else "lo60"
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.Md5Kernels.$fn($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Bits60 =
    copy(child = newChild)
}
