package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd Johnson–Lindenstrauss projection kernels — the
  * per-row hot path of [[graft.operators.Pca.jlDistortion]] /
  * [[graft.operators.Pca.jlProjectCol]] (SURVEY.md §7.3 ladder step
  * (b), same upgrade as [[PqKernels]]): the declarative form runs a
  * kMax×d `aggregate` inside `transform` — ~2k interpreted lambda
  * dispatches per row — and, worse, its wall-time proved hostage to
  * JIT profile pollution from the REST of the suite (r13/r14 bench:
  * ~0.6 s standalone, a consistent ~2.4 s inside the 225-query run
  * with identical plans — megamorphic interpreter call sites, not this
  * operator). One static call per row with a primitive loop is both
  * ~4× faster cold and immune to what the other 224 queries do to the
  * lambda interpreter's profiles.
  *
  * Determinism contract (oracle parity with the HOF form replaced):
  * x_i = (long) round(double(emb_i) · 1e6) with Spark's round
  * semantics (BigDecimal.valueOf + HALF_UP via [[sparkRound0]];
  * non-finite would throw loudly here — ANSI cast would too);
  * sign_(i,k) = +1 iff bitCount((i·64+k) · 2654435761 mod 2^32) is
  * even (the Knuth-hash parity both engines replay via bit_count);
  * z_k = Σ_i sign·x_i in exact longs. The row guard |x_i| ≤ xMax
  * throws with the established "exact-long bound" message instead of
  * wrapping — the one-CASE-per-row guard of VERDICT r13 #2, now free.
  */
object JlKernels {

  /** Spark round(double, 0) semantics (RoundBase): HALF_UP on the
    * decimal representation; non-finite inputs pass through in Spark —
    * here they throw, because the next step is an exact-long cast that
    * ANSI mode would reject anyway and silence is the one wrong answer.
    */
  private def sparkRound0(x: Double, who: String): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new IllegalArgumentException(
        s"$who: non-finite embedding cell (x*1e6 = $x)")
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  private def checkDims(emb: ArrayData, d: Int, who: String): Unit =
    if (emb.numElements() < d)
      throw new IllegalArgumentException(
        s"$who: embedding has ${emb.numElements()} elements, expected >= $d")

  /** Quantize + guard + project: returns (x: long[d], z: long[kMax]). */
  private def xz(emb: ArrayData, isFloat: Boolean, d: Int, kMax: Int,
                 xMax: Long, who: String): (Array[Long], Array[Long]) = {
    checkDims(emb, d, who)
    val x = new Array[Long](d)
    var i = 0
    while (i < d) {
      // a null CELL must not silently read as 0.0 (primitive getters
      // return the zeroed slot) — the HOF form propagated null; here
      // the contract is LOUD, like the xMax guard
      if (emb.isNullAt(i))
        throw new IllegalArgumentException(
          s"$who: null embedding element at index $i")
      val v = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      val xi = sparkRound0(v * 1000000.0, who).toLong
      if (math.abs(xi) > xMax)
        throw new IllegalArgumentException(
          s"$who: |x|*1e6 exceeds exact-long bound $xMax — rescale embeddings")
      x(i) = xi
      i += 1
    }
    val z = new Array[Long](kMax)
    var k = 0
    while (k < kMax) {
      var acc = 0L
      var j = 0
      while (j < d) {
        val h = ((j * 64L + k) * 2654435761L) % 4294967296L
        if ((java.lang.Long.bitCount(h) & 1) == 0) acc += x(j)
        else acc -= x(j)
        j += 1
      }
      z(k) = acc
      k += 1
    }
    (x, z)
  }

  /** jl_parts(emb, d, kMax, xMax): struct(x array<bigint>, z
    * array<bigint>) — the distortion gauge's per-row state.
    */
  def parts(emb: ArrayData, isFloat: Boolean, d: Int, kMax: Int,
            xMax: Long): InternalRow = {
    val (x, z) = xz(emb, isFloat, d, kMax, xMax, "jlDistortion")
    new GenericInternalRow(
      Array[Any](new GenericArrayData(x), new GenericArrayData(z)))
  }

  /** jl_project(emb, d, k, xMax): array<float> — the reduced vector,
    * f_k = (float)(z_k / 1e6), the exact expression shape of the HOF
    * form (double divide, then one float round).
    */
  def project(emb: ArrayData, isFloat: Boolean, d: Int, k: Int,
              xMax: Long): ArrayData = {
    val (_, z) = xz(emb, isFloat, d, k, xMax, "jlProject")
    val out = new Array[Float](k)
    var i = 0
    while (i < k) { out(i) = (z(i) / 1000000.0).toFloat; i += 1 }
    new GenericArrayData(out)
  }

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloatVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def litInt(e: Expression, what: String): Int = {
    // foldable gate BEFORE eval (ADVICE r15, shared fix with
    // LshKernels): eval() on a non-foldable arg throws an opaque
    // UnsupportedOperationException instead of this message
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be an integer literal, got non-foldable ${e.sql}")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  private def litLong(e: Expression, what: String): Long = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a long literal, got non-foldable ${e.sql}")
    e.eval() match {
      case l: Long => l
      case i: Int => i.toLong
      case other => throw new IllegalArgumentException(
        s"$what must be a long literal, got $other")
    }
  }

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("jl_parts"),
      new ExpressionInfo(classOf[JlPartsExpr].getName, "jl_parts"),
      (cs: Seq[Expression]) => {
        require(cs.length == 4,
          s"jl_parts(emb, d, kmax, xmax) expects 4 args, got ${cs.length}")
        JlPartsExpr(cs.head, litInt(cs(1), "d"), litInt(cs(2), "kmax"),
          litLong(cs(3), "xmax"))
      }),
    (FunctionIdentifier("jl_project"),
      new ExpressionInfo(classOf[JlProjectExpr].getName, "jl_project"),
      (cs: Seq[Expression]) => {
        require(cs.length == 4,
          s"jl_project(emb, d, k, xmax) expects 4 args, got ${cs.length}")
        JlProjectExpr(cs.head, litInt(cs(1), "d"), litInt(cs(2), "k"),
          litLong(cs(3), "xmax"))
      }))

  /** Idempotent runtime registration ([[PqKernels.register]] rationale). */
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    descriptors.foreach { case (id, info, builder) =>
      if (!fr.functionExists(id)) fr.registerFunction(id, info, builder)
    }
  }

  private[functions] def checkVec(name: String,
                                  emb: Expression): TypeCheckResult =
    if (!isVec(emb.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$name expects array<float|double> embedding, got " +
          emb.dataType.simpleString)
    else TypeCheckResult.TypeCheckSuccess

  private[functions] def floatFlag(emb: Expression): Boolean =
    isFloatVec(emb.dataType)
}

/** `jl_parts(emb, d, kMax, xMax)` → struct(x array<bigint>, z
  * array<bigint>). See [[JlKernels]].
  */
case class JlPartsExpr(emb: Expression, d: Int, kMax: Int, xMax: Long)
    extends Expression {
  override def prettyName: String = "jl_parts"
  override def children: Seq[Expression] = Seq(emb)
  override def dataType: DataType = StructType(Seq(
    StructField("x", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("z", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = emb.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    JlKernels.checkVec(prettyName, emb)
  @transient private lazy val isFloat = JlKernels.floatFlag(emb)
  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    if (e == null) null
    else JlKernels.parts(e.asInstanceOf[ArrayData], isFloat, d, kMax, xMax)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val e = emb.genCode(ctx)
    ev.copy(code =
      code"""
        ${e.code}
        boolean ${ev.isNull} = ${e.isNull};
        InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.JlKernels.parts(
            ${e.value}, $isFloat, $d, $kMax, ${xMax}L);
        }""")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(emb = newChildren(0))
}

/** `jl_project(emb, d, k, xMax)` → array<float> reduced vector. See
  * [[JlKernels]].
  */
case class JlProjectExpr(emb: Expression, d: Int, k: Int, xMax: Long)
    extends Expression {
  override def prettyName: String = "jl_project"
  override def children: Seq[Expression] = Seq(emb)
  override def dataType: DataType =
    ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = emb.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    JlKernels.checkVec(prettyName, emb)
  @transient private lazy val isFloat = JlKernels.floatFlag(emb)
  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    if (e == null) null
    else JlKernels.project(e.asInstanceOf[ArrayData], isFloat, d, k, xMax)
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val e = emb.genCode(ctx)
    ev.copy(code =
      code"""
        ${e.code}
        boolean ${ev.isNull} = ${e.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.JlKernels.project(
            ${e.value}, $isFloat, $d, $k, ${xMax}L);
        }""")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(emb = newChildren(0))
}
