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

  /** Element accessors for float or double arrays — both expressions
    * accept either, accumulating in double precision regardless. */
  private def isFloatArr(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def elem(x: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
  private def elemCode(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  /** Σ aᵢ·bᵢ in double precision over two float (or double) arrays. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"
    private lazy val lf = isFloatArr(left)
    private lazy val rf = isFloatArr(right)

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += elem(x, i, lf) * elem(y, i, rf)
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
            $acc += ${elemCode(a, i, lf)} * ${elemCode(b, i, rf)};
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
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_cosine"
    private lazy val lf = isFloatArr(left)
    private lazy val rf = isFloatArr(right)

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = elem(x, i, lf)
        val yv = elem(y, i, rf)
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
            double $xv = ${elemCode(a, i, lf)};
            double $yv = ${elemCode(b, i, rf)};
            $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));"""
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecCosine =
      copy(left = newLeft, right = newRight)
  }

  /** Sign-random-projection bucket: bit i = [arr[i] > 0] for the first
    * `bits` dims, folded into a Long. Replaces the interpreted
    * `aggregate(sequence(...))` higher-order composition — this sits on
    * the candidate-generation hot path of bucketed ANN, where every row
    * of the corpus is bucketed once per (re)index. */
  case class VecSrpBucket(child: Expression, bits: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(bits > 0 && bits <= 62, "bits must be in [1, 62]")
    override def dataType: DataType = LongType
    override def prettyName: String = "vec_srp_bucket"
    private lazy val cf = isFloatArr(child)

    override protected def nullSafeEval(input: Any): Any = {
      val x = input.asInstanceOf[ArrayData]
      val n = math.min(bits, x.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        if (elem(x, i, cf) > 0.0) acc |= (1L << i)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        s"""
          int $n = java.lang.Math.min($bits, $c.numElements());
          long $acc = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if (${elemCode(c, i, cf)} > 0.0) $acc |= (1L << $i);
          }
          ${ev.value} = $acc;"""
      })

    override protected def withNewChildInternal(newChild: Expression): VecSrpBucket =
      copy(child = newChild)
  }

  /** The `n` nearest centroids of a vector, as array<struct<__d, cell>>
    * sorted by (distance asc, cell asc) — the IVF assignment/probe
    * kernel ([[graft.pipeline.Similarity]]'s `cellsFor`), evaluated as
    * ONE tight loop per row over the codebook held in a plan reference
    * object.
    *
    * Why an expression: the composable in-row forms pay per-row
    * allocation and interpreted evaluation exactly on the corpus-scan
    * hot path — `sort_array`/`array_min` over an array of
    * (distance, cell) structs is CodegenFallback, and the older
    * crossJoin + per-key `row_number` window multiplied the corpus by
    * nlist through an exchange. This kernel keeps whole-stage codegen
    * intact (the generated code calls [[VecNearestCells.pick]], a
    * JIT-compiled selection loop) and nothing shuffles.
    *
    * Bit-exactness contract: the distance is the same IEEE op sequence
    * as `sqDist` (x·x + c·c − 2·(x·c), each term a sequential
    * index-order fold; c·c precomputed once per center — same fold,
    * same result), and the (distance, cell) order uses
    * Double.compare with NaN greatest — exactly the window sort's
    * nanSafeCompareDoubles. The standing oracles pin this. */
  case class VecNearestCells(child: Expression, cells: Seq[Int],
      centers: Seq[Seq[Double]], n: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(cells.nonEmpty && cells.size == centers.size,
      "need one cell id per center")
    require(n > 0, "n must be positive")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("__d", DoubleType, nullable = false),
      StructField("cell", IntegerType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "vec_nearest_cells"
    private lazy val cf = isFloatArr(child)
    @transient private lazy val cellArr: Array[Int] = cells.toArray
    @transient private lazy val centerArr: Array[Array[Double]] =
      centers.map(_.toArray).toArray
    // per-center c·c, the same sequential fold dot(c, c) runs
    @transient private lazy val ccs: Array[Double] = centerArr.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    }

    /** The selection loop — public so generated code can call it. */
    def pick(x: ArrayData): ArrayData = {
      val xn = x.numElements()
      var xx = 0.0
      var i = 0
      while (i < xn) { val v = elem(x, i, cf); xx += v * v; i += 1 }
      val m = math.min(n, centerArr.length)
      val bd = new Array[Double](m)
      val bc = new Array[Int](m)
      var filled = 0
      var j = 0
      while (j < centerArr.length) {
        val c = centerArr(j)
        val ln = math.min(xn, c.length)
        var xc = 0.0
        i = 0
        while (i < ln) { xc += elem(x, i, cf) * c(i); i += 1 }
        val d = xx + ccs(j) - 2.0 * xc
        val cell = cellArr(j)
        // insertion position under (d, cell) asc, NaN greatest
        var pos = filled
        while (pos > 0 && {
          val cmp = java.lang.Double.compare(bd(pos - 1), d)
          cmp > 0 || (cmp == 0 && bc(pos - 1) > cell)
        }) pos -= 1
        if (pos < m) {
          var q = math.min(filled, m - 1)
          while (q > pos) { bd(q) = bd(q - 1); bc(q) = bc(q - 1); q -= 1 }
          bd(pos) = d
          bc(pos) = cell
          if (filled < m) filled += 1
        }
        j += 1
      }
      val out = new Array[Any](filled)
      i = 0
      while (i < filled) {
        out(i) = org.apache.spark.sql.catalyst.InternalRow(bd(i), bc(i))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def nullSafeEval(input: Any): Any =
      pick(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("nearestCells", this,
        classOf[VecNearestCells].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.pick($c);")
    }

    override protected def withNewChildInternal(
        newChild: Expression): VecNearestCells = copy(child = newChild)
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

  /** Exact Long FLOOR division by a positive constant (rounds toward
    * negative infinity, like Math.floorDiv). Partition-key derivations
    * (ts_day) must use this, not [[LongDiv]]: truncating division numbers
    * pre-epoch timestamps into the wrong day, desynchronizing the stored
    * directory from the engine's floorDiv-computed pruning bounds. */
  case class LongFloorDiv(child: Expression, d: Long)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    require(d > 0, "divisor must be positive")
    override def dataType: DataType = LongType
    override def prettyName: String = "long_floor_div"

    override protected def nullSafeEval(input: Any): Any =
      Math.floorDiv(input.asInstanceOf[Long], d)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = java.lang.Math.floorDiv($c, ${d}L);")

    override protected def withNewChildInternal(newChild: Expression): LongFloorDiv =
      copy(child = newChild)
  }

  // ---- Column API --------------------------------------------------------

  def longDiv(c: Column, d: Long): Column =
    Bridge.column(LongDiv(Bridge.expression(c), d))

  def longFloorDiv(c: Column, d: Long): Column =
    Bridge.column(LongFloorDiv(Bridge.expression(c), d))

  def vecDot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))

  def vecCosine(a: Column, b: Column): Column =
    Bridge.column(VecCosine(Bridge.expression(a), Bridge.expression(b)))

  def vecSrpBucket(a: Column, bits: Int): Column =
    Bridge.column(VecSrpBucket(Bridge.expression(a), bits))

  def vecNearestCells(a: Column, centers: Seq[(Int, Seq[Double])],
      n: Int): Column =
    Bridge.column(VecNearestCells(Bridge.expression(a),
      centers.map(_._1), centers.map(_._2), n))
}
