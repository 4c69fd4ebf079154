package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ops.{MediaBlob, Multimodal}

/** Misuse-fails-loudly guards on the perceptual-hash path (r07, ADVICE r06
  * #2): Scala's `1L << i` masks the shift count mod 64, so an image with
  * more than 64 pixels would silently WRAP bit positions into a corrupt
  * (but plausible-looking) hash; and ImageIO.read returns null — not an
  * exception — on undecodable bytes, which previously surfaced as an
  * opaque NPE with no document id. */
class MultimodalGuardSpec extends AnyFunSuite {

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 7) % 256 << 16)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ahashImages hashes a 64-pixel image (the capacity boundary)") {
    val got = Multimodal.ahashImages(
      Iterator(MediaBlob(7L, png(8, 8), "en"))).toSeq
    assert(got.size == 1 && got.head.doc_id == 7L)
    assert(got.head.width == 8 && got.head.height == 8)
  }

  test("ahashImages rejects an image larger than the 64-pixel packed capacity") {
    val ex = intercept[IllegalArgumentException] {
      Multimodal.ahashImages(Iterator(MediaBlob(9L, png(9, 9), "en"))).toSeq
    }
    assert(ex.getMessage.contains("9x9") && ex.getMessage.contains("doc_id=9"))
  }

  test("ahashImages rejects undecodable payloads with the doc id, not an NPE") {
    val ex = intercept[IllegalArgumentException] {
      Multimodal.ahashImages(
        Iterator(MediaBlob(11L, Array[Byte](1, 2, 3, 4), "en"))).toSeq
    }
    assert(ex.getMessage.contains("undecodable") && ex.getMessage.contains("doc_id=11"))
  }
}
