package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd per-row text-digest expressions — the declarative
  * replacement for the engine's earlier `mapPartitions` digest kernels
  * (SURVEY.md §7.3 ladder step (b), same upgrade as
  * [[CosineScore]]): one expression node per row generating a static
  * call with a tight digest loop, so the signature stages stay NARROW
  * projections inside whole-stage codegen with no RDD boundary and no
  * InternalRow->Row conversion.
  *
  * All hashes are md5-derived, first-6-bytes-as-long (the same value as
  * `Canonical.hex48(md5(x))`), so every result is reproducible by the
  * DuckDB oracle. MessageDigest instances are thread-local (generated
  * code runs one task per thread).
  */
object TextKernels {

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 48 bits of md5(utf8 bytes) as a big-endian long. */
  def h48(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  private val spacePat = java.util.regex.Pattern.compile(" ")

  /** shingle_hashes(text, w): distinct word w-gram shingles +
    * their 48-bit base hashes — (sh array<string>, hb array<long>).
    * Semantics identical to the declarative `Dedup.shingles` form:
    * split-on-space with limit -1, underscore join, first-occurrence
    * distinct.
    */
  def shingleHashes(text: UTF8String, w: Int): InternalRow = {
    val toks = spacePat.split(text.toString, -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length >= w) {
      var i = 0
      while (i <= toks.length - w) {
        val sb = new java.lang.StringBuilder(toks(i))
        var k = 1
        while (k < w) { sb.append('_').append(toks(i + k)); k += 1 }
        seen.add(sb.toString)
        i += 1
      }
    }
    val sh = seen.toArray(new Array[String](0))
    val hb = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { hb(i) = h48(sh(i).getBytes("UTF-8")); i += 1 }
    new GenericInternalRow(Array[Any](
      ArrayData.toArrayData(sh.map(UTF8String.fromString)),
      ArrayData.toArrayData(hb)))
  }

  /** simhash48(text): majority-vote 48-bit SimHash over the token
    * multiset (bit b set iff more than half the token h48 hashes have
    * bit b set).
    */
  def simhash48(text: UTF8String): Long = {
    val toks = spacePat.split(text.toString, -1)
    val counts = new Array[Int](48)
    toks.foreach { t =>
      val h = h48(t.getBytes("UTF-8"))
      var b = 0
      while (b < 48) { if (((h >> b) & 1L) == 1L) counts(b) += 1; b += 1 }
    }
    var sig = 0L
    var b = 0
    while (b < 48) { if (2 * counts(b) > toks.length) sig |= 1L << b; b += 1 }
    sig
  }

  /** UTF-16 offset of every code-point boundary: offs(k) = char index
    * of the k-th code point, offs(last) = s.length. Character-gram
    * kernels iterate CODE POINTS — the unit Spark SQL `length`/
    * `substring` (UTF8String.numChars/substringSQL) and DuckDB both
    * count — so positions a kernel emits can feed back into SQL
    * substring without mis-slicing surrogate-pair text (emoji etc.).
    * For BMP-only text this is the identity mapping, so ASCII fixtures
    * and oracles are unchanged.
    */
  private def cpOffsets(s: String): Array[Int] = {
    val offs = new Array[Int](s.codePointCount(0, s.length) + 1)
    var ci = 0
    var k = 0
    while (ci < s.length) {
      offs(k) = ci
      ci = s.offsetByCodePoints(ci, 1)
      k += 1
    }
    offs(k) = s.length
    offs
  }

  /** winnow_fp(text): minimum h48 over all code-point 8-grams (windows
    * capped at the string end), floor 1 window — the winnowing content
    * fingerprint.
    */
  def winnowFp(text: UTF8String): Long = {
    val s = text.toString
    val offs = cpOffsets(s)
    val cp = offs.length - 1
    val n = math.max(cp - 7, 1)
    var minFp = Long.MaxValue
    var i = 0
    while (i < n) {
      val fp = h48(s.substring(offs(i), offs(math.min(i + 8, cp)))
        .getBytes("UTF-8"))
      if (fp < minFp) minFp = fp
      i += 1
    }
    minFp
  }

  /** winnow_set(text, w): the full Schleimer–Wilkerson–Aiken winnowing
    * fingerprint SET — for every window of `w` consecutive character
    * 8-gram hashes, keep the window minimum; return the distinct minima
    * sorted ascending. [[winnowFp]] is the degenerate whole-document
    * window (one global min); the set form guarantees any shared
    * substring of length >= 7 + w shares at least one fingerprint
    * (the winnowing coverage theorem), which is what pairwise
    * substring-overlap mining needs.
    */
  def winnowSet(text: UTF8String, w: Int): ArrayData = {
    val s = text.toString
    val offs = cpOffsets(s)
    val cp = offs.length - 1
    val n = math.max(cp - 7, 1)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = h48(s.substring(offs(i), offs(math.min(i + 8, cp)))
        .getBytes("UTF-8"))
      i += 1
    }
    val nWin = math.max(n - w + 1, 1)
    val set = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j < nWin) {
      var m = hs(j)
      var k = j + 1
      val end = math.min(j + w, n)
      while (k < end) { if (hs(k) < m) m = hs(k); k += 1 }
      set.add(m)
      j += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    ArrayData.toArrayData(out)
  }

  /** rep_signals(text): one-pass repetition counters — (n_tokens,
    * top_cnt, n_bigrams, dup_bigrams). Replaces the interpreted-HOF
    * distinct x count-filter form (O(tokens²) per row through Catalyst's
    * lambda interpreter) with a hash-map pass; values are identical:
    * top_cnt = max token multiplicity, dup_bigrams = bigrams minus
    * distinct bigrams (non-first occurrences).
    */
  def repSignals(text: UTF8String): InternalRow = {
    val toks = spacePat.split(text.toString, -1)
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    var nBigrams = 0L
    var dup = 0L
    if (toks.length > 1) {
      val seen = new java.util.HashSet[String]()
      var j = 0
      while (j < toks.length - 1) {
        if (!seen.add(toks(j) + " " + toks(j + 1))) dup += 1
        nBigrams += 1
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](
      toks.length.toLong, top.toLong, nBigrams, dup))
  }

  /** dhash63(payload): 63-bit difference hash over a binary payload —
    * the 1-D byte-signal form of the classic dHash perceptual image
    * fingerprint (downsample, then hash the SIGN of adjacent-cell
    * gradients; the public-domain scheme popularized by Krawetz's
    * "Kind of Like That" write-up, 2013, and the pHash family). The payload is treated as a piecewise-constant
    * function on [0,1) and box-filtered into 64 equal blocks EXACTLY:
    * in units of 1/(64·L), byte i spans [64i, 64(i+1)) and block b
    * spans [bL, (b+1)L), so block b's integral is the exact long
    * s_b = Σ_i bv_i · overlap(i, b). Every block has identical width L,
    * so bit b (0..62) is simply s_b > s_{b+1} — 63 bits, sign-bit-free,
    * so the value is a non-negative BIGINT both engines carry exactly.
    *
    * Why area-weighted instead of nearest-byte blocks: the box filter
    * makes an exact k× upsample (each byte repeated k times — the same
    * function on [0,1) at a finer grid) hash-IDENTICAL, which is the
    * resize invariance real dHash gets from averaging many pixels;
    * nearest-byte blocks alias at block boundaries and a 2× stretch
    * drifted to Hamming ~8 on the fixture corpus where this form gives
    * 0. Recompression-style per-byte jitter moves block means only
    * fractionally, so gradient signs survive small edits (measured:
    * planted translate/stretch variants land ≤2 bits from their
    * original; random fixture pairs center at ~31 with min 10).
    *
    * For a real image column the decode seam ([[graft.operators.Multimodal.decodeStub]])
    * would yield rows of gray pixels and this same kernel would hash
    * the row-major stream; on the fixture the payload IS the document's
    * UTF-8 bytes, which the ASCII-only fixture lets the DuckDB oracle
    * replay via ascii(substring(text, i+1, 1)) — the frame_sample
    * convention.
    */
  def dhash63(payload: Array[Byte]): Long = {
    val n = payload.length
    if (n == 0) return 0L
    val L = n.toLong
    val s = new Array[Long](64)
    var i = 0
    while (i < n) {
      val bv = (payload(i) & 0xff).toLong
      val lo = 64L * i
      val hi = lo + 64L
      var b = (lo / L).toInt
      val bLast = ((hi - 1L) / L).toInt
      while (b <= bLast) {
        val ov = math.min(hi, (b + 1L) * L) - math.max(lo, b.toLong * L)
        s(b) += bv * ov
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 63) { if (s(b) > s(b + 1)) sig |= 1L << b; b += 1 }
    sig
  }

  /** cdc_bounds(text, d): content-defined chunk CUT POINTS — every
    * 1-based position whose character-8-gram h48 hash divides `d`
    * (expected chunk length ≈ d chars). Content-defined boundaries are
    * what make sub-document dedup insertion-robust: a byte inserted
    * into a document shifts every FIXED window after it (all their
    * hashes change — the [[graft.operators.TextAnalysis]] 200-char
    * `doc_chunks` face), but re-synchronizes content-defined cuts
    * within one chunk, so every chunk after the edit hashes identically
    * again — the LBFS/rsync/backup-dedup boundary scheme applied to
    * corpus curation. Same gram convention as [[winnowFp]]/[[winnowSet]]
    * (8-gram capped at the string end, floor one gram); production CDC
    * adds min/max chunk-size clamps — a relational `filter` over these
    * cuts — which this kernel deliberately leaves to the caller so the
    * boundary rule itself stays oracle-mirrorable in one expression.
    */
  def cdcBounds(text: UTF8String, d: Int): ArrayData = {
    val s = text.toString
    // Code-point iteration (see cpOffsets): the emitted 1-based cut
    // positions feed Spark SQL substring()/length() in cdcChunks and the
    // DuckDB oracle, both of which count code points — UTF-16-unit
    // positions would mis-slice any document containing non-BMP
    // characters (ADVICE r09).
    val offs = cpOffsets(s)
    val cp = offs.length - 1
    val n = math.max(cp - 7, 1)
    val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < n) {
      if (h48(s.substring(offs(i), offs(math.min(i + 8, cp)))
        .getBytes("UTF-8")) % d == 0) buf += i + 1
      i += 1
    }
    ArrayData.toArrayData(buf.toArray)
  }

  // ------------------------------------------------- expression nodes

  abstract class TextKernelExpr extends UnaryExpression {
    override def nullIntolerant: Boolean = true
  }

  case class ShingleHashesExpr(child: Expression, w: Int) extends TextKernelExpr {
    override def prettyName: String = "shingle_hashes"
    override def dataType: DataType = StructType(Seq(
      StructField("sh", ArrayType(StringType, containsNull = false), nullable = false),
      StructField("hb", ArrayType(LongType, containsNull = false), nullable = false)))
    override protected def nullSafeEval(t: Any): Any =
      shingleHashes(t.asInstanceOf[UTF8String], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextKernels.shingleHashes($c, $w)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class Simhash48Expr(child: Expression) extends TextKernelExpr {
    override def prettyName: String = "simhash48"
    override def dataType: DataType = LongType
    override protected def nullSafeEval(t: Any): Any =
      simhash48(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash48($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class RepSignalsExpr(child: Expression) extends TextKernelExpr {
    override def prettyName: String = "rep_signals"
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("top_cnt", LongType, nullable = false),
      StructField("n_bigrams", LongType, nullable = false),
      StructField("dup_bigrams", LongType, nullable = false)))
    override protected def nullSafeEval(t: Any): Any =
      repSignals(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.repSignals($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class WinnowSetExpr(child: Expression, w: Int) extends TextKernelExpr {
    override def prettyName: String = "winnow_set"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(t: Any): Any =
      winnowSet(t.asInstanceOf[UTF8String], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.winnowSet($c, $w)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class Dhash63Expr(child: Expression) extends TextKernelExpr {
    override def prettyName: String = "dhash63"
    override def dataType: DataType = LongType
    // the one BINARY-input kernel in this file: without the check,
    // dhash63(text) passes analysis and dies mid-job (ClassCast /
    // Janino) instead of failing at planning time
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst
        .analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dhash63 expects a binary payload, got " +
            child.dataType.simpleString +
            " (encode(text, 'UTF-8') for a string column)")
    override protected def nullSafeEval(t: Any): Any =
      dhash63(t.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.dhash63($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class CdcBoundsExpr(child: Expression, d: Int) extends TextKernelExpr {
    override def prettyName: String = "cdc_bounds"
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override protected def nullSafeEval(t: Any): Any =
      cdcBounds(t.asInstanceOf[UTF8String], d)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.cdcBounds($c, $d)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class WinnowFpExpr(child: Expression) extends TextKernelExpr {
    override def prettyName: String = "winnow_fp"
    override def dataType: DataType = LongType
    override protected def nullSafeEval(t: Any): Any =
      winnowFp(t.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.winnowFp($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ------------------------------------------------------ registration

  private def literalInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (identifier, builder) pairs — see [[descriptors]]. */
  private val registrations: Seq[(FunctionIdentifier, Seq[Expression] => Expression)] = Seq(
    FunctionIdentifier("shingle_hashes") -> { (cs: Seq[Expression]) =>
      require(cs.length == 2, s"shingle_hashes(text, w) expects 2 args, got ${cs.length}")
      ShingleHashesExpr(cs.head, literalInt(cs(1), "w"))
    },
    FunctionIdentifier("simhash48") -> { (cs: Seq[Expression]) =>
      require(cs.length == 1, s"simhash48(text) expects 1 arg, got ${cs.length}")
      Simhash48Expr(cs.head)
    },
    FunctionIdentifier("winnow_fp") -> { (cs: Seq[Expression]) =>
      require(cs.length == 1, s"winnow_fp(text) expects 1 arg, got ${cs.length}")
      WinnowFpExpr(cs.head)
    },
    FunctionIdentifier("winnow_set") -> { (cs: Seq[Expression]) =>
      require(cs.length == 2, s"winnow_set(text, w) expects 2 args, got ${cs.length}")
      val w = literalInt(cs(1), "w")
      require(w >= 1, s"winnow_set window must be >= 1, got $w")
      WinnowSetExpr(cs.head, w)
    },
    FunctionIdentifier("rep_signals") -> { (cs: Seq[Expression]) =>
      require(cs.length == 1, s"rep_signals(text) expects 1 arg, got ${cs.length}")
      RepSignalsExpr(cs.head)
    },
    FunctionIdentifier("dhash63") -> { (cs: Seq[Expression]) =>
      require(cs.length == 1, s"dhash63(payload) expects 1 arg, got ${cs.length}")
      Dhash63Expr(cs.head)
    },
    FunctionIdentifier("cdc_bounds") -> { (cs: Seq[Expression]) =>
      require(cs.length == 2, s"cdc_bounds(text, d) expects 2 args, got ${cs.length}")
      val d = literalInt(cs(1), "d")
      require(d >= 2, s"cdc_bounds divisor must be >= 2, got $d")
      CdcBoundsExpr(cs.head, d)
    })

  /** Full descriptors for [[graft.GraftExtensions]]' `injectFunction`. */
  def descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    registrations.map { case (ident, builder) =>
      (ident,
        new ExpressionInfo(TextKernels.getClass.getName, ident.funcName),
        builder)
    }

  /** Idempotently register all text-kernel functions on a session (same
    * runtime-registry rationale as [[CosineScore.register]]).
    */
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    descriptors.foreach { case (ident, info, builder) =>
      if (!fr.functionExists(ident)) fr.registerFunction(ident, info, builder)
    }
  }
}
