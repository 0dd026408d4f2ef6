package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd product-quantization ENCODE kernels — the corpus
  * hot path of the PQ/ADC/IVFADC family (SURVEY.md §7.3 ladder, step
  * (b), same rationale as [[CosineScore]]): the declarative form
  * iterates the codebook DATA column with higher-order functions, which
  * are CodegenFallback — every row pays interpreted lambda dispatch and
  * per-centroid slice allocations. At 100 TB the encode touches every
  * vector, so it gets the same treatment as `cosine_score`: ONE static
  * call per row whose body is a tight primitive loop over reference-
  * object codebook arrays, inside WholeStageCodegen.
  *
  * Determinism contract (oracle parity, shared with the HOF form it
  * replaces): elements promote to double BEFORE multiplication, each
  * per-centroid dot folds left-to-right from a 0.0 seed, the score is
  * Spark's round(_, 6) (BigDecimal.valueOf + HALF_UP), argmax compares
  * with java.lang.Double.compare (NaN greatest, -0.0 < 0.0 — exactly
  * Spark's struct-max ordering) and breaks ties by LOWER centroid id.
  *
  * The codebook travels as FOLDABLE nested-array literals (typedLit) in
  * the call — unpacked once per plan into primitive arrays, never per
  * row — so the expression composes through `call_function` with no
  * side-channel state.
  */
object PqKernels {

  /** round6 — Spark round(double, 6) semantics. Spark's RoundBase
    * returns non-finite inputs unchanged (BigDecimal.valueOf would
    * throw NumberFormatException on NaN/Infinity — e.g. a zero-norm
    * embedding dividing to NaN must score NaN, not crash the job).
    */
  private def r6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** UnsafeArrayData primitive getters do not bounds-check; a ragged
    * embedding row would yield silent garbage codes. Fail loudly with
    * the row's shape instead.
    */
  private def checkDims(emb: ArrayData, needed: Int, who: String): Unit =
    if (emb.numElements() < needed)
      throw new IllegalArgumentException(
        s"$who: embedding has ${emb.numElements()} elements but the " +
          s"codebook expects at least $needed (m subspaces x subLen)")

  /** All-subspace encode: for subspace s, code = argmax over centroids
    * of round6(dot(emb[s*L .. s*L+L-1], cv) / div) with (sd DESC, cid
    * ASC) total order; div = NaN means "no division". Public + static
    * so Janino references it from generated classes.
    */
  def encode(emb: ArrayData, isFloat: Boolean, div: Double,
             book: Array[Array[Array[Double]]],
             ids: Array[Array[Long]]): ArrayData = {
    val m = book.length
    checkDims(emb, m * book(0)(0).length, "pq_encode")
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val cents = book(s)
      val cids = ids(s)
      val subLen = cents(0).length
      val off = s * subLen
      var bestSd = Double.NegativeInfinity
      var bestCid = Long.MaxValue
      var first = true
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        var acc = 0d
        var i = 0
        while (i < subLen) {
          val x = if (isFloat) emb.getFloat(off + i).toDouble
                  else emb.getDouble(off + i)
          acc += x * cv(i)
          i += 1
        }
        val sd = r6(if (java.lang.Double.isNaN(div)) acc else acc / div)
        val cmp = java.lang.Double.compare(sd, bestSd)
        if (first || cmp > 0 || (cmp == 0 && cids(c) < bestCid)) {
          bestSd = sd
          bestCid = cids(c)
          first = false
        }
        c += 1
      }
      out(s) = bestCid
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Residual encode: same argmax, but each element term is
    * (emb[i]/nrm − cvec[i]) · cv[i] where `cvec` is the row's coarse
    * centroid, resolved from `ccid` against the coarse id/vector arrays
    * (nCoarse entries — linear scan).
    */
  def encodeResidual(emb: ArrayData, isFloat: Boolean, nrm: Double,
                     ccid: Long, coarseIds: Array[Long],
                     coarseVs: Array[Array[Double]],
                     book: Array[Array[Array[Double]]],
                     ids: Array[Array[Long]]): ArrayData = {
    var k = 0
    var cvec: Array[Double] = null
    while (k < coarseIds.length && cvec == null) {
      if (coarseIds(k) == ccid) cvec = coarseVs(k)
      k += 1
    }
    require(cvec != null, s"unknown coarse centroid id $ccid")
    val m = book.length
    checkDims(emb, m * book(0)(0).length, "pq_encode_res")
    require(cvec.length >= m * book(0)(0).length,
      s"pq_encode_res: coarse centroid has ${cvec.length} elements, " +
        s"codebook expects ${m * book(0)(0).length}")
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val cents = book(s)
      val cids = ids(s)
      val subLen = cents(0).length
      val off = s * subLen
      var bestSd = Double.NegativeInfinity
      var bestCid = Long.MaxValue
      var first = true
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        var acc = 0d
        var i = 0
        while (i < subLen) {
          val x = if (isFloat) emb.getFloat(off + i).toDouble
                  else emb.getDouble(off + i)
          acc += (x / nrm - cvec(off + i)) * cv(i)
          i += 1
        }
        val sd = r6(acc)
        val cmp = java.lang.Double.compare(sd, bestSd)
        if (first || cmp > 0 || (cmp == 0 && cids(c) < bestCid)) {
          bestSd = sd
          bestCid = cids(c)
          first = false
        }
        c += 1
      }
      out(s) = bestCid
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Unpack a foldable array<array<array<double>>> literal. */
  private[functions] def toBook(e: Expression): Array[Array[Array[Double]]] =
    e.eval(InternalRow.empty).asInstanceOf[ArrayData].array.map(sub =>
      sub.asInstanceOf[ArrayData].array.map(cv =>
        cv.asInstanceOf[ArrayData].toDoubleArray()))

  /** Unpack a foldable array<array<bigint>> literal. */
  private[functions] def toIds(e: Expression): Array[Array[Long]] =
    e.eval(InternalRow.empty).asInstanceOf[ArrayData].array.map(sub =>
      sub.asInstanceOf[ArrayData].toLongArray())

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloatVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Idempotently register both kernels on a session (same rationale
    * as [[CosineScore.register]] — callers' sessions may lack the
    * build-time extensions).
    */
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    descriptors.foreach { case (id, info, builder) =>
      if (!fr.functionExists(id)) fr.registerFunction(id, info, builder)
    }
  }

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncodeExpr].getName, "pq_encode"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"pq_encode expects 4 arguments, got ${children.length}")
        PqEncodeExpr(children(0), children(1), children(2), children(3))
      }),
    (FunctionIdentifier("pq_encode_res"),
      new ExpressionInfo(classOf[PqEncodeResExpr].getName, "pq_encode_res"),
      (children: Seq[Expression]) => {
        require(children.length == 7,
          s"pq_encode_res expects 7 arguments, got ${children.length}")
        PqEncodeResExpr(children(0), children(1), children(2), children(3),
          children(4), children(5), children(6))
      }))

  private[functions] def checkVecAndBook(name: String, emb: Expression,
                                         cvs: Expression,
                                         cids: Expression): TypeCheckResult = {
    if (!isVec(emb.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$name expects array<float|double> embedding, got " +
          emb.dataType.simpleString)
    else if (!cvs.foldable || !cids.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$name codebook arguments must be foldable literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  private[functions] def floatFlag(emb: Expression): Boolean =
    isFloatVec(emb.dataType)
}

/** `pq_encode(emb, div, cvs, cids)` → array<bigint> of per-subspace
  * codes; `div` divides each dot (pass double NaN for none). See
  * [[PqKernels]] for semantics and parity contract.
  */
case class PqEncodeExpr(emb: Expression, div: Expression,
                        cvs: Expression, cids: Expression)
    extends Expression {

  override def prettyName: String = "pq_encode"
  override def children: Seq[Expression] = Seq(emb, div, cvs, cids)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = emb.nullable || div.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = PqKernels.checkVecAndBook(prettyName, emb, cvs, cids)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else if (div.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName div must be double, got ${div.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val book = PqKernels.toBook(cvs)
  @transient private lazy val ids = PqKernels.toIds(cids)
  @transient private lazy val isFloat = PqKernels.floatFlag(emb)

  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    val d = div.eval(input)
    if (e == null || d == null) null
    else PqKernels.encode(e.asInstanceOf[ArrayData], isFloat,
      d.asInstanceOf[Double], book, ids)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book, "double[][][]")
    val idsRef = ctx.addReferenceObj("pqIds", ids, "long[][]")
    val e = emb.genCode(ctx)
    val d = div.genCode(ctx)
    ev.copy(code =
      code"""
        ${e.code}
        ${d.code}
        boolean ${ev.isNull} = ${e.isNull} || ${d.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.PqKernels.encode(
            ${e.value}, $isFloat, ${d.value}, $bookRef, $idsRef);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(emb = newChildren(0), div = newChildren(1),
      cvs = newChildren(2), cids = newChildren(3))
}

/** `pq_encode_res(emb, nrm, ccid, coarse_cids, coarse_cvs, cvs, cids)`
  * → array<bigint> of per-subspace RESIDUAL codes (element terms
  * (emb[i]/nrm − coarse[i]) · cv[i]). See [[PqKernels]].
  */
case class PqEncodeResExpr(emb: Expression, nrm: Expression,
                           ccid: Expression, coarseCids: Expression,
                           coarseCvs: Expression, cvs: Expression,
                           cids: Expression)
    extends Expression {

  override def prettyName: String = "pq_encode_res"
  override def children: Seq[Expression] =
    Seq(emb, nrm, ccid, coarseCids, coarseCvs, cvs, cids)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean =
    emb.nullable || nrm.nullable || ccid.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = PqKernels.checkVecAndBook(prettyName, emb, cvs, cids)
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else if (nrm.dataType != DoubleType || ccid.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (vec, double, bigint, ...), got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else if (!coarseCids.foldable || !coarseCvs.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName coarse-centroid arguments must be foldable literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val book = PqKernels.toBook(cvs)
  @transient private lazy val ids = PqKernels.toIds(cids)
  @transient private lazy val cIds =
    coarseCids.eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val cVs =
    coarseCvs.eval(InternalRow.empty).asInstanceOf[ArrayData].array
      .map(_.asInstanceOf[ArrayData].toDoubleArray())
  @transient private lazy val isFloat = PqKernels.floatFlag(emb)

  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    val n = nrm.eval(input)
    val c = ccid.eval(input)
    if (e == null || n == null || c == null) null
    else PqKernels.encodeResidual(e.asInstanceOf[ArrayData], isFloat,
      n.asInstanceOf[Double], c.asInstanceOf[Long], cIds, cVs, book, ids)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book, "double[][][]")
    val idsRef = ctx.addReferenceObj("pqIds", ids, "long[][]")
    val cIdsRef = ctx.addReferenceObj("pqCoarseIds", cIds, "long[]")
    val cVsRef = ctx.addReferenceObj("pqCoarseVs", cVs, "double[][]")
    val e = emb.genCode(ctx)
    val n = nrm.genCode(ctx)
    val c = ccid.genCode(ctx)
    ev.copy(code =
      code"""
        ${e.code}
        ${n.code}
        ${c.code}
        boolean ${ev.isNull} = ${e.isNull} || ${n.isNull} || ${c.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.PqKernels.encodeResidual(
            ${e.value}, $isFloat, ${n.value}, ${c.value},
            $cIdsRef, $cVsRef, $bookRef, $idsRef);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(emb = newChildren(0), nrm = newChildren(1), ccid = newChildren(2),
      coarseCids = newChildren(3), coarseCvs = newChildren(4),
      cvs = newChildren(5), cids = newChildren(6))
}
