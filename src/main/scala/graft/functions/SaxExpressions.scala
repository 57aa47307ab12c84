package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SAX — Symbolic Aggregate approXimation (Lin/Keogh et al. 2003).
  *
  * The reference reserves a SAX_WORD payload kind
  * (/root/reference/stdb/common/basic.h:77,
  * queryprocessor_framework.cc:135-146) but ships no encoder; this is the
  * standard algorithm: z-normalize a window, Piecewise Aggregate
  * Approximation to `paa` segments, map each segment mean to a letter via
  * N(0,1) equiprobable breakpoints.
  */
object SaxKernels {

  /** Standard normal quantile breakpoints for alphabet sizes 2..10. */
  private val Breakpoints: Map[Int, Array[Double]] = Map(
    2 -> Array(0.0),
    3 -> Array(-0.4307272992954576, 0.4307272992954576),
    4 -> Array(-0.6744897501960817, 0.0, 0.6744897501960817),
    5 -> Array(-0.8416212335729142, -0.2533471031357997,
      0.2533471031357997, 0.8416212335729142),
    6 -> Array(-0.9674215661017014, -0.4307272992954576, 0.0,
      0.4307272992954576, 0.9674215661017014),
    7 -> Array(-1.0675705238469225, -0.5659488219378084, -0.1800123369680735,
      0.1800123369680735, 0.5659488219378084, 1.0675705238469225),
    8 -> Array(-1.1503493803760079, -0.6744897501960817, -0.3186393639643751,
      0.0, 0.3186393639643751, 0.6744897501960817, 1.1503493803760079),
    9 -> Array(-1.2206403488229249, -0.7647096737863868, -0.4307272992954576,
      -0.1397102989301164, 0.1397102989301164, 0.4307272992954576,
      0.7647096737863868, 1.2206403488229249),
    10 -> Array(-1.2815515655446004, -0.8416212335729142, -0.5244005127080407,
      -0.2533471031357997, 0.0, 0.2533471031357997, 0.5244005127080407,
      0.8416212335729142, 1.2815515655446004))

  def breakpoints(alphabet: Int): Array[Double] =
    Breakpoints.getOrElse(alphabet, throw new IllegalArgumentException(
      s"SAX alphabet size must be in 2..10, got $alphabet"))

  /** Encode one full window (sequential sums; `null` handled by caller). */
  def saxWord(xs: ArrayData, paa: Int, alphabet: Int): UTF8String = {
    val n = xs.numElements()
    val bps = breakpoints(alphabet)
    var sum = 0.0
    var i = 0
    while (i < n) { sum += xs.getDouble(i); i += 1 }
    val mu = sum / n
    var ss = 0.0
    i = 0
    while (i < n) { val d = xs.getDouble(i) - mu; ss += d * d; i += 1 }
    val sd = math.sqrt(ss / n)
    val segLen = n / paa
    val out = new Array[Char](paa)
    var s = 0
    while (s < paa) {
      var segSum = 0.0
      var j = s * segLen
      while (j < (s + 1) * segLen) { segSum += xs.getDouble(j); j += 1 }
      val seg = segSum / segLen
      val z = if (sd < 1e-12) 0.0 else (seg - mu) / sd
      var letter = 0
      var b = 0
      while (b < bps.length) { if (z > bps(b)) letter += 1; b += 1 }
      out(s) = ('a' + letter).toChar
      s += 1
    }
    UTF8String.fromString(new String(out))
  }
}

object SaxExpressions {

  /** SAX word of a full window array; null input or short window → null
    * (handled by the Column wrapper). Window length must divide into
    * `paa` segments. */
  case class SaxWord(child: Expression, paa: Int, alphabet: Int)
      extends UnaryExpression {
    require(paa >= 1, "paa must be >= 1")
    SaxKernels.breakpoints(alphabet) // validate eagerly
    override def dataType: DataType = StringType
    override def prettyName: String = "sax_word"

    override protected def nullSafeEval(input: Any): Any =
      SaxKernels.saxWord(input.asInstanceOf[ArrayData], paa, alphabet)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SaxKernels.saxWord($c, $paa, $alphabet);")

    override protected def withNewChildInternal(newChild: Expression): SaxWord =
      copy(child = newChild)
  }

  def saxWord(window: Column, paa: Int, alphabet: Int): Column =
    Bridge.column(SaxWord(Bridge.expression(window), paa, alphabet))
}
