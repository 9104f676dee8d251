package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over
  * `array<float>` / `array<double>` columns.
  *
  * These are the hot path of the similarity-search operators
  * (SURVEY.md §2.3 "Similarity search"): a single codegen'd loop per row
  * pair, no boxing, no Scala closure dispatch — versus a chain of
  * `zip_with` + `aggregate` higher-order functions (~3 array traversals
  * with per-element lambda invocation) or a Scala UDF (per-row
  * serialization). At 100 TB / billions of vectors the scan is
  * embarrassingly parallel and stays inside whole-stage codegen.
  *
  * Both expressions assume equal-length arrays with non-null elements
  * (the `embeddings` fixture shape); mismatched lengths use the shorter.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Java snippet reading element i of an ArrayData as double. */
  protected def getter(arr: String, dt: DataType, i: String): String = dt match {
    case FloatType  => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case _ => throw new IllegalArgumentException(s"unsupported element type $dt")
  }

  protected def getElem(arr: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType  => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case _ => throw new IllegalArgumentException(s"unsupported element type $dt")
  }
}

/** cosine_sim(a, b) = a·b / (‖a‖‖b‖); 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = getElem(x, lt, i); val yv = getElem(y, rt, i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val den = ctx.freshName("den")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = ${getter(a, elemType(left), i)};
          double $yv = ${getter(b, elemType(right), i)};
          $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        }
        double $den = Math.sqrt($nx) * Math.sqrt($ny);
        ${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** squared_l2(a, b) = Σ (a_i − b_i)² — the KMeans SSE kernel
  * (reference computes it per-row in a Python lambda,
  * MovieLensRecommender.py:33-37; here it is a codegen'd expression). */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = getElem(x, lt, i) - getElem(y, rt, i); s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = ${getter(a, elemType(left), i)} - ${getter(b, elemType(right), i)};
          $s += $d * $d;
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Column-API front door for the vector expressions, plus pure
  * higher-order-function equivalents (zero custom code, used where
  * bitwise parity with an external SQL engine matters more than speed).
  */
object VectorFunctions {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** Codegen'd cosine similarity. */
  def cosineSim(a: Column, b: Column): Column =
    col(CosineSimilarity(expr(a), expr(b)))

  /** Codegen'd squared Euclidean distance. */
  def squaredL2(a: Column, b: Column): Column =
    col(SquaredL2Distance(expr(a), expr(b)))

  /** Dot product via built-in higher-order functions: sequential
    * left-to-right double accumulation (same fp order as a scalar SQL
    * engine evaluating the identical expression). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ via higher-order functions. */
  def normHof(a: Column): Column = sqrt(dotHof(a, a))

  /** Cosine via higher-order functions. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (normHof(a) * normHof(b))
}
