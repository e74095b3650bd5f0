package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM image HEADER decoding — SURVEY.md §2.3 #40. The multimodal
  * pipeline treats payloads as opaque binary; dimensions/channels live
  * in the first few dozen bytes of the container and need no codec:
  *
  *  - PNG: 8-byte signature then the IHDR chunk — width/height as
  *    big-endian int32 at offsets 16/20, color type at 25
  *    (PNG spec, RFC 2083 §4.1.1).
  *  - BMP: "BM" then BITMAPINFOHEADER — width/height as little-endian
  *    int32 at offsets 18/22 (height signed: top-down bitmaps are
  *    negative), bits-per-pixel at 28.
  *
  * This replaces the round-1..5 deterministic stub for the METADATA
  * half of decode; pixel decoding (frames/features) remains a
  * declared fake behind [[graft.operators.Multimodal.decodeFrames]]
  * (no codec libraries in this container). A header parse is a
  * per-row byte peek — codegen'd, narrow, no shuffle, so at 100 TB it
  * runs inside the corpus scan like any other projection.
  */
object ImageOps {

  private val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** (format, width, height, channels) from container magic + header
    * bytes; format "unknown" with null dims when no known magic
    * matches (never a null row — defineCodeGen-compatible).
    */
  def parseHeader(bytes: Array[Byte]): InternalRow = {
    if (bytes.length >= 26 && pngMagic.indices.forall(i => bytes(i) == pngMagic(i)) &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
      val channels = bytes(25) match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette
        case 4 => 2 // grey+alpha
        case 6 => 4 // truecolor+alpha
        case _ => -1
      }
      new GenericInternalRow(Array[Any](UTF8String.fromString("png"),
        be32(bytes, 16), be32(bytes, 20),
        if (channels > 0) channels else null))
    } else if (bytes.length >= 30 && bytes(0) == 'B' && bytes(1) == 'M') {
      val bpp = le16(bytes, 28)
      new GenericInternalRow(Array[Any](UTF8String.fromString("bmp"),
        le32(bytes, 18), math.abs(le32(bytes, 22)),
        if (bpp >= 8) bpp / 8 else 1))
    } else {
      new GenericInternalRow(Array[Any](UTF8String.fromString("unknown"), null, null, null))
    }
  }

  /** 64-bit perceptual AVERAGE HASH (aHash) over a payload. The hash
    * rule is the real algorithm — 64 thumbnail intensities, bit i set
    * iff intensity i is above the mean (compared as s_i·64 > Σs so no
    * integer-division rounding) — but the "thumbnail" here is 64
    * evenly-spaced payload bytes, standing in for the decode→grayscale
    * →8×8-resize step a codec library would provide (declared stub
    * policy, Multimodal.decodeFrames). Positional sampling preserves
    * locality: near-identical payloads produce near-equal hashes,
    * which is what makes hamming-distance near-dup search meaningful.
    * Empty payloads hash to 0.
    */
  def aHash64(bytes: Array[Byte]): Long = {
    if (bytes.length == 0) return 0L
    val s = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      s(i) = bytes(((i.toLong * bytes.length) / 64).toInt) & 0xff
      sum += s(i)
      i += 1
    }
    var h = 0L
    i = 0
    while (i < 64) {
      if (s(i).toLong * 64 > sum) h |= (1L << i)
      i += 1
    }
    h
  }
}

/** Codegen'd BinaryType → struct(format, width, height, channels)
  * header decode ([[ImageOps.parseHeader]]).
  */
case class ImageHeader(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageHeader.schema
  override def nullSafeEval(b: Any): Any =
    ImageOps.parseHeader(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ImageOps.parseHeader($b)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_image_header"
}

object ImageHeader {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true)))
}

/** Codegen'd BinaryType → 64-bit perceptual average hash
  * ([[ImageOps.aHash64]]) — feeds the native hamming self-join for
  * image near-dup search.
  */
case class AHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(b: Any): Any =
    ImageOps.aHash64(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ImageOps.aHash64($b)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_ahash64"
}

/** Column-level API for the image functions. */
object ImageFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
  def imageHeader(payload: Column): Column =
    toCol(ImageHeader(toExpr(payload)))
  def aHash64(payload: Column): Column =
    toCol(AHash64(toExpr(payload)))
}
