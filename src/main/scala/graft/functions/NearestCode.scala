package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `pq_nearest_code(s, xu) -> int`: index of the nearest codebook entry
  * (exact integer squared L2, ties → lower code) for subspace `s` of a
  * product quantizer. The codebook rides along as a REFERENCE OBJECT — a
  * `long[s][code][dim]` captured at plan-build time — so corpus encoding is
  * a map-only projection: no join, no shuffle, no argmin aggregate over
  * n·m·k exploded rows. Encoding 100 TB is then strictly
  * embarrassingly parallel, which is the operational point of PQ.
  *
  * The codebook is small by construction (m·k short integer vectors — the
  * same "deliberately tiny side" argument as [[graft.operators.IvfAnn]]'s
  * coarse quantizer), so holding it in the closure costs less than one
  * parquet row group.
  */
case class NearestCode(left: Expression, right: Expression,
    codebook: Array[Array[Array[Long]]])
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(IntegerType, ArrayType(LongType, containsNull = false))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_nearest_code"

  override def nullSafeEval(sIn: Any, xIn: Any): Any = {
    val cs = codebook(sIn.asInstanceOf[Int])
    val x = xIn.asInstanceOf[ArrayData]
    var best = Long.MaxValue
    var bi = 0
    var c = 0
    while (c < cs.length) {
      val cu = cs(c)
      // null slot = code never seeded (sparse/non-contiguous id space) —
      // skip it rather than NPE; such codes also have no codebook row
      if (cu != null) {
        var d = 0L
        var j = 0
        while (j < cu.length) {
          val diff = x.getLong(j) - cu(j)
          d += diff * diff
          j += 1
        }
        if (d < best) { best = d; bi = c }
      }
      c += 1
    }
    bi
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "long[][][]")
    val cs = ctx.freshName("cs")
    val best = ctx.freshName("best")
    val bi = ctx.freshName("bi")
    val c = ctx.freshName("c")
    val cu = ctx.freshName("cu")
    val d = ctx.freshName("d")
    val j = ctx.freshName("j")
    val diff = ctx.freshName("diff")
    nullSafeCodeGen(ctx, ev, (s, x) =>
      s"""
         |long[][] $cs = $cbRef[$s];
         |long $best = Long.MAX_VALUE; int $bi = 0;
         |for (int $c = 0; $c < $cs.length; $c++) {
         |  long[] $cu = $cs[$c];
         |  if ($cu != null) {
         |    long $d = 0L;
         |    for (int $j = 0; $j < $cu.length; $j++) {
         |      long $diff = $x.getLong($j) - $cu[$j];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $best) { $best = $d; $bi = $c; }
         |  }
         |}
         |${ev.value} = $bi;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
