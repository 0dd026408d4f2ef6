package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** `cosine_score(q_emb, c_emb, q_nrm, c_nrm)` — native codegen'd rounded
  * cosine between two `array<float>` embeddings with precomputed norms.
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.3 ladder, step (b)):
  * the declarative alternative is either an interpreted HOF fold
  * ([[graft.operators.Similarity.dot]]) or a dim-unrolled ~500-node sum
  * tree — the former is ~2000x slower per pair, the latter overflows
  * whole-stage codegen when Catalyst folds it into a join condition
  * (ADVICE r03). This node generates ONE static call whose body is a
  * tight primitive loop, so pair scoring stays inside WholeStageCodegen
  * with no InternalRow->Row conversion (which the mapPartitions kernel
  * fallback pays per pair).
  *
  * Determinism contract (oracle parity): floats promote to double
  * BEFORE multiplication, the sum folds left-to-right, and rounding is
  * Spark's round(_, 6) semantics — BigDecimal.valueOf (canonical
  * Double.toString) + HALF_UP — identical to the DuckDB oracle's
  * list_sum fold + round and to the kernel twin
  * [[graft.operators.Similarity]] uses for brute-force paths.
  */
case class CosineScore(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def prettyName: String = "cosine_score"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(first, second).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && Seq(third, fourth).forall(_.dataType == DoubleType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float>, array<float>, double, double), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(q: Any, c: Any, n1: Any, n2: Any): Any =
    CosineScore.score(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      n1.asInstanceOf[Double], n2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, c, n1, n2) =>
      s"graft.functions.CosineScore.score($q, $c, $n1, $n2)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object CosineScore {

  /** The generated-code kernel: left-to-right double fold + HALF_UP
    * round to 6 places (see determinism contract above). Public + static
    * so Janino references it from generated classes.
    */
  def score(q: ArrayData, c: ArrayData, n1: Double, n2: Double): Double = {
    var s = 0d
    var i = 0
    val n = q.numElements()
    while (i < n) {
      s += q.getFloat(i).toDouble * c.getFloat(i).toDouble
      i += 1
    }
    java.math.BigDecimal.valueOf(s / (n1 * n2))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  private val ident = FunctionIdentifier("cosine_score")

  /** (identifier, info, builder) descriptor — consumed by both the
    * runtime [[register]] path and [[graft.GraftExtensions]]'
    * build-time `injectFunction`.
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (ident,
      new ExpressionInfo(classOf[CosineScore].getName, "cosine_score"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"cosine_score expects 4 arguments, got ${children.length}")
        CosineScore(children(0), children(1), children(2), children(3))
      })

  /** Idempotently register `cosine_score` on a session so `expr(...)`
    * resolves it. Runtime registry registration exists alongside
    * [[graft.GraftExtensions]] because the engine must also work on
    * caller-provided sessions built WITHOUT `spark.sql.extensions`
    * (the driver's, the tests', bench's).
    */
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    if (!fr.functionExists(ident)) {
      fr.registerFunction(ident, descriptor._2, descriptor._3)
    }
  }
}
