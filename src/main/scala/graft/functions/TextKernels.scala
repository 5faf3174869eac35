package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for word n-gram construction, shared by the eval and codegen
  * paths of [[WordShingles]] / [[WordNgrams]].
  *
  * The declarative formulation — `array_distinct(transform(sequence(0,
  * size(w)-n), i -> concat(w[i], ' ', ...)))` — has two hot-path problems
  * measured at bench scale: higher-order lambdas run interpreted (never
  * whole-stage codegen), and `array_distinct` over StringType falls off the
  * specialized-hash-set fast path, degrading to quadratic comparisons on
  * long documents. This kernel is one linear pass with a hash set.
  *
  * No companion class ⇒ Scala emits static forwarders, so generated Java
  * can call `graft.functions.ShingleKernel.shingles(...)` directly.
  */
object ShingleKernel {
  private val Space = UTF8String.fromString(" ")

  /** All consecutive `n`-word shingles of `text` (split on single spaces,
    * trailing empties kept — same as Spark `split(text, ' ')` / DuckDB
    * `string_split`). Order-preserving; empty array when < n words. */
  def ngrams(text: UTF8String, n: Int): ArrayData = {
    val words = text.split(Space, -1)
    val m = words.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      var j = 1
      var g = words(i)
      while (j < n) {
        g = UTF8String.concat(g, Space, words(i + j))
        j += 1
      }
      out(i) = g
      i += 1
    }
    new GenericArrayData(out)
  }

  /** NON-overlapping `n`-word segments (last one possibly shorter), joined
    * by single spaces — the q112 span unit. Exactly equivalent to the
    * declarative `transform(sequence(0, ceil(size(t)/n) - 1), i ->
    * array_join(slice(t, i*n + 1, n), ' '))` over `t = split(text, ' ')`
    * (empty text ⇒ one empty segment, same as split's [""]), but one
    * linear codegen pass instead of an interpreted higher-order lambda
    * chain re-slicing the word array per segment. */
  def segments(text: UTF8String, n: Int): ArrayData = {
    val words = text.split(Space, -1)
    val m = words.length
    val nseg = (m + n - 1) / n
    val out = new Array[Any](math.max(nseg, 0))
    var i = 0
    while (i < nseg) {
      val from = i * n
      val to = math.min(from + n, m)
      var g = words(from)
      var j = from + 1
      while (j < to) {
        g = UTF8String.concat(g, Space, words(j))
        j += 1
      }
      out(i) = g
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct consecutive `n`-word shingles, first-occurrence order
    * (matches `array_distinct` semantics). */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val words = text.split(Space, -1)
    val m = words.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    var i = 0
    while (i < m) {
      var j = 1
      var g = words(i)
      while (j < n) {
        g = UTF8String.concat(g, Space, words(i + j))
        j += 1
      }
      seen.add(g)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }
}

/** `word_shingles(text[, n]) -> array<string>`: distinct consecutive n-word
  * shingles (default n=3) — the MinHash/Jaccard unit of the dedup family. */
case class WordShingles(child: Expression, n: Int = 3)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && n <= 16, "shingle width out of range")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleKernel.shingles($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_segments(text[, n]) -> array<string>`: NON-overlapping n-word
  * segments (default n=3, last segment possibly shorter) — the q112 exact
  * span-dedup unit. */
case class WordSegments(child: Expression, n: Int = 3)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && n <= 64, "segment width out of range")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_segments"

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.segments(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleKernel.segments($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_ngrams(text[, n]) -> array<string>`: ALL consecutive n-word grams
  * (default n=2), duplicates kept — the bigram/frequency-count unit. */
case class WordNgrams(child: Expression, n: Int = 2)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && n <= 16, "ngram width out of range")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleKernel.ngrams($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernels {
  private def lit(e: Expression): Int =
    e.eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(s"expected int literal, got $other")
    }

  /** Register `word_shingles` / `word_ngrams` for expr()/SQL use. */
  def register(spark: SparkSession): Unit = {
    RegisterOnce(spark, "word_shingles") {
      case Seq(t)    => WordShingles(t)
      case Seq(t, n) => WordShingles(t, lit(n))
    }
    RegisterOnce(spark, "word_ngrams") {
      case Seq(t)    => WordNgrams(t)
      case Seq(t, n) => WordNgrams(t, lit(n))
    }
    RegisterOnce(spark, "word_segments") {
      case Seq(t)    => WordSegments(t)
      case Seq(t, n) => WordSegments(t, lit(n))
    }
  }
}
