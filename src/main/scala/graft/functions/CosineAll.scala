package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd brute-force pair-scoring kernel: one static call
  * per CORPUS row computing its exact rounded cosine against EVERY
  * broadcast candidate — the all-pairs relation without any join. The
  * corpus STREAMS (scoring runs on its partitions, inside
  * WholeStageCodegen); only the bounded query/pair side is collected
  * and broadcast (the brute-force contract: [[graft.operators
  * .Similarity.MaxBroadcastVecs]] hard error at collect time).
  *
  * The r12 relational form (all-pairs as a pmod-keyed broadcast hash
  * join + per-pair `cosine_score`) was correct and join-planned, but
  * paid join-row assembly per pair (both embeddings copied into every
  * output row) plus two guard/probe actions — a measured 2-3× on the
  * brute-force gauges vs the r11 JVM lane. This kernel keeps the
  * relational form's scale posture (corpus never collected) at the JVM
  * lane's speed: the broadcast rides INSIDE the expression as a
  * non-child field (placed via the GraftColumns shim — Broadcast state
  * cannot travel through `call_function`'s child-only builders).
  *
  * Determinism contract (Similarity scaladoc): elements promote to
  * double BEFORE multiplication, dots and norms fold left-to-right
  * from 0.0, score = Spark round(_,6) with non-finite inputs passed
  * through, candidates emit in ascending-id order (the broadcast array
  * is id-sorted) — bit-identical to the join+`cosine_score` form and
  * to the DuckDB oracle.
  */
object CosineAll {

  /** (id, vector-as-doubles, norm) — built driver-side by the bounded
    * collect ([[graft.operators.Similarity]]'s collectVecs).
    */
  type Cand = (Long, Array[Double], Double)

  private def r6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Score one corpus row against all broadcast candidates; emits
    * (left_id = candidate id, score) structs for candidates passing
    * the orientation filter (pairOriented: cand.id < row id — the
    * emitted pair is (cand, row); else cand.id != row id). Public +
    * static so Janino references it from generated classes.
    */
  def scoreAll(rowId: Long, emb: ArrayData, isFloat: Boolean,
               pairOriented: Boolean, cands: Array[Cand]): ArrayData = {
    val n = emb.numElements()
    var n2 = 0d
    var i = 0
    while (i < n) {
      val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      n2 += x * x
      i += 1
    }
    val nrm = math.sqrt(n2)
    val out = new Array[Any](cands.length)
    var m = 0
    var c = 0
    while (c < cands.length) {
      val (cid, cv, cnrm) = cands(c)
      if (if (pairOriented) cid < rowId else cid != rowId) {
        require(cv.length >= n,
          s"cosine_all: corpus row $rowId has $n elements but candidate " +
            s"$cid has ${cv.length}")
        var acc = 0d
        var j = 0
        while (j < n) {
          val x = if (isFloat) emb.getFloat(j).toDouble else emb.getDouble(j)
          acc += x * cv(j)
          j += 1
        }
        out(m) = InternalRow(cid, r6(acc / (cnrm * nrm)))
        m += 1
      }
      c += 1
    }
    new GenericArrayData(if (m == cands.length) out else out.take(m))
  }
}

/** `CosineAllExpr(id, emb, pairOriented, bcId)(bc)` →
  * array<struct<left_id: bigint, score: double>> — see [[CosineAll]].
  * The broadcast is NON-child constructor state in the second
  * parameter list (keeps the children list clean); `bcId` mirrors
  * `bc.id` in the FIRST list on purpose — case-class equality (and so
  * Catalyst canonicalization / common-subexpression elimination)
  * ignores second-list params, and without the discriminator two
  * kernels over the same children but DIFFERENT candidate sets would
  * compare equal and could be merged.
  */
case class CosineAllExpr(id: Expression, emb: Expression,
                         pairOriented: Boolean, bcId: Long)(
    val bc: Broadcast[Array[CosineAll.Cand]])
    extends Expression {

  override def prettyName: String = "cosine_all"
  override def children: Seq[Expression] = Seq(id, emb)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("left_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = id.nullable || emb.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = emb.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName id must be bigint, got ${id.dataType.simpleString}")
    else if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got " +
          emb.dataType.simpleString)
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val isFloat = emb.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val i = id.eval(input)
    val e = emb.eval(input)
    if (i == null || e == null) null
    else CosineAll.scoreAll(i.asInstanceOf[Long], e.asInstanceOf[ArrayData],
      isFloat, pairOriented, bc.value)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("cosAllBc", bc,
      classOf[Broadcast[Array[CosineAll.Cand]]].getName)
    val i = id.genCode(ctx)
    val e = emb.genCode(ctx)
    ev.copy(code =
      code"""
        ${i.code}
        ${e.code}
        boolean ${ev.isNull} = ${i.isNull} || ${e.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.CosineAll.scoreAll(
            ${i.value}, ${e.value}, $isFloat, $pairOriented,
            (scala.Tuple3[]) $bcRef.value());
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0), emb = newChildren(1))(bc)
}
