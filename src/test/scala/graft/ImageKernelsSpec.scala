package graft

import graft.functions.ImageKernels

/** Codec-contract coverage for the r18 decode seam, beyond the
  * oracle-tier face: the roundtrip must be exact for EVERY geometry
  * and byte value (lossless grayscale PNG is the whole basis of the
  * `image_phash_decoded` oracle), and the refusals must be loud —
  * a codec that silently reinterprets is the image-pipeline twin of
  * the scheme-mismatched probe.
  */
class ImageKernelsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def pattern(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + seed * 17 + (i * i) % 251) % 256).toByte)

  test("encode/decode roundtrip is exact across geometries and the full byte range") {
    val cases = Seq((1, 1), (1, 7), (7, 1), (8, 6), (8, 8), (64, 1),
      (1, 64), (16, 16), (5, 13))
    for (((w, h), k) <- cases.zipWithIndex) {
      val px = pattern(w * h, k)
      val png = ImageKernels.pngGrayEncode(px, w)
      assert(ImageKernels.pngGrayDecode(png).sameElements(px),
        s"roundtrip failed at ${w}x$h")
    }
    // every byte value 0..255 survives (no gamma / color management)
    val all = Array.tabulate(256)(_.toByte)
    assert(ImageKernels.pngGrayDecode(
      ImageKernels.pngGrayEncode(all, 16)).sameElements(all))
  }

  test("encode refuses impossible geometries; decode refuses non-images and non-gray images") {
    intercept[IllegalArgumentException] {
      ImageKernels.pngGrayEncode(pattern(8, 0), 0)
    }
    intercept[IllegalArgumentException] {
      ImageKernels.pngGrayEncode(pattern(9, 0), 4) // 9 % 4 != 0
    }
    intercept[IllegalArgumentException] {
      ImageKernels.pngGrayEncode(Array.emptyByteArray, 8)
    }
    intercept[IllegalArgumentException] {
      ImageKernels.pngGrayDecode("not a png".getBytes("UTF-8"))
    }
    // an RGB container decodes as an image but is NOT the 8-bit
    // single-band contract — must refuse, never take band 0 silently
    val rgb = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(rgb, "png", bos))
    intercept[IllegalArgumentException] {
      ImageKernels.pngGrayDecode(bos.toByteArray)
    }
  }
}
