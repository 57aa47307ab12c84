package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math.
  *
  * The composable alternative (`aggregate(zip_with(a, b, *), 0, +)`) is
  * evaluated as interpreted higher-order functions — one closure call per
  * element per row — and sits outside whole-stage codegen. These
  * expressions generate a tight primitive `for` loop instead (`doGenCode`),
  * which matters when a near-dup join scores millions of candidate pairs:
  * the scoring loop is the entire inner cost of
  * [[graft.pipeline.Similarity]] / [[graft.pipeline.Dedup]] at scale.
  *
  * Both are deterministic sequential folds in index order, so results are
  * bit-identical to the interpreted versions and to the DuckDB oracle's
  * list arithmetic.
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ in double precision over two float arrays. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    // inputs must be ArrayType(FloatType) — enforced by the Column API call sites
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          }
          ${ev.value} = $acc;"""
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecDot =
      copy(left = newLeft, right = newRight)
  }

  /** Fused cosine similarity: dot / (‖a‖·‖b‖) in one pass over both arrays
    * — the same formula (and therefore the same IEEE rounding) as computing
    * the three folds separately. */
  case class VecCosine(left: Expression, right: Expression)
      extends BinaryExpression {
    // inputs must be ArrayType(FloatType) — enforced by the Column API call sites
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_cosine"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getFloat(i).toDouble
        val yv = y.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xv = (double) $a.getFloat($i);
            double $yv = (double) $b.getFloat($i);
            $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));"""
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecCosine =
      copy(left = newLeft, right = newRight)
  }

  /** Exact Long integer division by a positive constant. Spark's `/` on
    * Long columns is double division, which rounds above 2^53 — fatal for
    * ns-epoch arithmetic (1.7e18). Java long division, codegen'd. */
  case class LongDiv(child: Expression, d: Long)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(d > 0, "divisor must be positive")
    override def dataType: DataType = LongType
    override def prettyName: String = "long_div"

    override protected def nullSafeEval(input: Any): Any =
      input.asInstanceOf[Long] / d

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $c / ${d}L;")

    override protected def withNewChildInternal(newChild: Expression): LongDiv =
      copy(child = newChild)
  }

  // ---- Column API --------------------------------------------------------

  def longDiv(c: Column, d: Long): Column =
    Bridge.column(LongDiv(Bridge.expression(c), d))

  def vecDot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))

  def vecCosine(a: Column, b: Column): Column =
    Bridge.column(VecCosine(Bridge.expression(a), Bridge.expression(b)))
}
