package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._

/** Real pixel codec for the multimodal pillar (VERDICT r17 #5): every
  * other perceptual face fingerprints payload BYTES as pseudo-pixels,
  * which leaves the actual decode seam — the thing a production image
  * pipeline runs before any perceptual hash — untested. These kernels
  * close it on JDK-public `javax.imageio` (PNG ships in every JRE; no
  * new dependency):
  *
  *  - `png_gray_encode(pixels, w)` packs a row-major 8-bit grayscale
  *    byte payload into a real PNG (h derived as len/w);
  *  - `png_gray_decode(payload)` decodes a grayscale image back to its
  *    row-major 8-bit samples.
  *
  * PNG grayscale is LOSSLESS, so decode(encode(px)) == px exactly —
  * which is what lets the DuckDB oracle score the decoded lane: the
  * oracle re-derives the planted pixel bytes arithmetically (the
  * `image_phash_binary` hex-lane trick) while the engine goes the long
  * way through a real compressed container. The divergence the decode
  * leg exists to expose — two different PAYLOADS (a recompressed PNG:
  * same pixels, different bytes) hashing identically through decode
  * and differently through raw payload bytes — is spec-pinned.
  *
  * Expressions are codegen'd static calls like every other kernel
  * family here; the per-row cost is the real decoder's, which is the
  * honest price of the seam (and why the faces keep the decoded lane
  * separate from the byte-lane fingerprints).
  */
object ImageKernels {

  // heap-backed streams instead of javax.imageio's temp-FILE cache: a
  // per-row codec must not do disk I/O per call
  javax.imageio.ImageIO.setUseCache(false)

  def pngGrayEncode(pixels: Array[Byte], w: Int): Array[Byte] = {
    require(w > 0, s"png_gray_encode: width must be > 0, got $w")
    require(pixels.length > 0 && pixels.length % w == 0,
      s"png_gray_encode: ${pixels.length} pixel bytes do not tile a " +
        s"width-$w image")
    val h = pixels.length / w
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", bos))
      throw new IllegalStateException(
        "png_gray_encode: no PNG writer in this JRE")
    bos.toByteArray
  }

  def pngGrayDecode(png: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    require(img != null,
      "png_gray_decode: payload is not a decodable image")
    val raster = img.getRaster
    require(raster.getNumBands == 1 &&
      img.getColorModel.getPixelSize == 8,
      s"png_gray_decode: expected 8-bit single-band grayscale, got " +
        s"${raster.getNumBands} band(s) x " +
        s"${img.getColorModel.getPixelSize} bit")
    val w = img.getWidth
    val h = img.getHeight
    val samples = raster.getSamples(0, 0, w, h, 0, new Array[Int](w * h))
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < out.length) { out(i) = samples(i).toByte; i += 1 }
    out
  }

  abstract class ImageKernelExpr extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst
        .analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName expects a binary column, " +
            s"got ${child.dataType.simpleString}")
  }

  case class PngGrayEncodeExpr(child: Expression, w: Int)
      extends ImageKernelExpr {
    override def prettyName: String = "png_gray_encode"
    override protected def nullSafeEval(t: Any): Any =
      pngGrayEncode(t.asInstanceOf[Array[Byte]], w)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.ImageKernels.pngGrayEncode($c, $w)")
    override protected def withNewChildInternal(newChild: Expression)
        : Expression = copy(child = newChild)
  }

  case class PngGrayDecodeExpr(child: Expression)
      extends ImageKernelExpr {
    override def prettyName: String = "png_gray_decode"
    override protected def nullSafeEval(t: Any): Any =
      pngGrayDecode(t.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.ImageKernels.pngGrayDecode($c)")
    override protected def withNewChildInternal(newChild: Expression)
        : Expression = copy(child = newChild)
  }

  private def literalInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val registrations
      : Seq[(FunctionIdentifier, Seq[Expression] => Expression)] = Seq(
    FunctionIdentifier("png_gray_encode") -> { (cs: Seq[Expression]) =>
      require(cs.length == 2,
        s"png_gray_encode(pixels, w) expects 2 args, got ${cs.length}")
      PngGrayEncodeExpr(cs.head, literalInt(cs(1), "w"))
    },
    FunctionIdentifier("png_gray_decode") -> { (cs: Seq[Expression]) =>
      require(cs.length == 1,
        s"png_gray_decode(payload) expects 1 arg, got ${cs.length}")
      PngGrayDecodeExpr(cs.head)
    })

  /** Full descriptors for [[graft.GraftExtensions]]' `injectFunction`. */
  def descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    registrations.map { case (ident, builder) =>
      (ident,
        new ExpressionInfo(ImageKernels.getClass.getName, ident.funcName),
        builder)
    }

  /** Idempotent per-session registration (the [[TextKernels.register]]
    * convention).
    */
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    descriptors.foreach { case (ident, info, builder) =>
      if (!fr.functionExists(ident)) fr.registerFunction(ident, info, builder)
    }
  }
}
