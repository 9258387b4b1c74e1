package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for float-vector cosine similarity — the
  * (b) tier of the extension ladder (compose built-ins < native
  * `Expression` with `doGenCode` < UDF): unlike a Scala UDF, the
  * generated code reads the two `ArrayData` buffers IN PLACE inside
  * whole-stage codegen — no boxing, no Array[Float] materialization,
  * no codegen fence around the call — and unlike a
  * `zip_with`/`aggregate` composition it makes one pass computing all
  * three accumulators.
  *
  * Numeric contract: bit-identical to `Ann.cosine` — the same
  * per-iteration accumulation order (dot, na, nb), the same
  * `dot/(√na·√nb)` with the zero-norm guard — so the native plan's
  * scores equal the typed path's EXACTLY (asserted in
  * VectorExprSpec), and `ann_topk`'s DuckDB oracle transfers to the
  * native query unchanged. Mismatched lengths score the common
  * prefix (min length), nulls propagate null (`BinaryExpression`
  * null-safety). */
case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is off-limits outside the spark namespace
  // (AbstractDataType is private[sql]) — validate explicitly instead
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
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
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 :
         |  $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineF32 =
    copy(left = newLeft, right = newRight)
}

/** Registration surfaces for the native expressions: a
  * `SparkSessionExtensions` hook (`spark.sql.extensions=
  * graft.functions.GraftExtensions` — the spark-submit path) and a
  * runtime registrar for an already-built session (the test/driver
  * path). Both resolve `graft_cosine(a, b)` through the SQL function
  * registry, so `functions.call_function` and plain SQL reach it. */
object GraftFunctions {
  private def info = new ExpressionInfo(classOf[CosineF32].getName, "graft_cosine")
  private[functions] def builder(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"graft_cosine takes 2 arguments, got ${children.size}")
    CosineF32(children.head, children(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_cosine"), info, builder _)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  // same arity-checked builder as the runtime registrar, so a
  // malformed `graft_cosine(x)` on the spark-submit path fails with a
  // clean analysis error instead of an IndexOutOfBoundsException
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineF32].getName, "graft_cosine"),
      GraftFunctions.builder _))
}
