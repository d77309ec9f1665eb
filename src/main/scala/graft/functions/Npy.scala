package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** K28: NumPy `.npy` v1.0 (de)serialization for float32/float16 2D/3D arrays
  * (reference v2/lmdb_npy.py:10-22, 59-67 — `np.save` to BytesIO with
  * `allow_pickle=False`). Format per the public NumPy NEP-1 spec: magic
  * `\\x93NUMPY`, version 1.0, little-endian uint16 header length, dict
  * header padded with spaces to a 64-byte multiple, then the raw buffer.
  */
object Npy {

  /** Serialize a float array as `.npy` bytes; dtype "float32" or "float16". */
  def encode(data: Array[Float], shape: Seq[Int], dtype: String = "float32"): Array[Byte] = {
    require(shape.product == data.length, s"shape ${shape.mkString("x")} != ${data.length}")
    val descr = dtype match {
      case "float32" => "<f4"
      case "float16" => "<f2"
      case other => throw new IllegalArgumentException(s"dtype must be float32|float16, got $other")
    }
    val shapeStr = shape.mkString(", ") + (if (shape.length == 1) "," else "")
    val headerBody = s"{'descr': '$descr', 'fortran_order': False, 'shape': ($shapeStr), }"
    val unpadded = 10 + headerBody.length + 1 // magic(6)+ver(2)+len(2) + body + '\n'
    val pad = (64 - unpadded % 64) % 64
    val header = headerBody + (" " * pad) + "\n"

    val itemSize = if (descr == "<f4") 4 else 2
    val buf = ByteBuffer.allocate(10 + header.length + data.length * itemSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x93.toByte).put("NUMPY".getBytes(StandardCharsets.US_ASCII))
    buf.put(1.toByte).put(0.toByte)
    buf.putShort(header.length.toShort)
    buf.put(header.getBytes(StandardCharsets.US_ASCII))
    var i = 0
    if (descr == "<f4") {
      while (i < data.length) { buf.putFloat(data(i)); i += 1 }
    } else {
      while (i < data.length) { buf.putShort(floatToHalf(data(i))); i += 1 }
    }
    buf.array()
  }

  /** Parse `.npy` bytes → (data as float32, shape). */
  def decode(bytes: Array[Byte]): (Array[Float], Seq[Int]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](6)
    buf.get(magic)
    require(magic(0) == 0x93.toByte &&
      new String(magic, 1, 5, StandardCharsets.US_ASCII) == "NUMPY", "not a .npy buffer")
    val major = buf.get(); buf.get()
    require(major == 1, s"unsupported .npy version $major")
    val headerLen = buf.getShort() & 0xffff
    val headerBytes = new Array[Byte](headerLen)
    buf.get(headerBytes)
    val header = new String(headerBytes, StandardCharsets.US_ASCII)

    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(throw new IllegalArgumentException("missing descr"))
    require(!header.contains("'fortran_order': True"), "fortran order unsupported")
    val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(throw new IllegalArgumentException("missing shape"))
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val n = if (shape.isEmpty) 1 else shape.product

    val out = new Array[Float](n)
    descr match {
      case "<f4" =>
        var i = 0
        while (i < n) { out(i) = buf.getFloat(); i += 1 }
      case "<f2" =>
        var i = 0
        while (i < n) { out(i) = halfToFloat(buf.getShort()); i += 1 }
      case other => throw new IllegalArgumentException(s"unsupported descr $other")
    }
    (out, shape)
  }

  /** IEEE 754 binary32 → binary16 with round-to-nearest-even. */
  def floatToHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val value = bits & 0x7fffffff
    if (value >= 0x47800000) { // overflow → inf (or NaN)
      if (value > 0x7f800000) (sign | 0x7e00).toShort // NaN
      else (sign | 0x7c00).toShort
    } else if (value < 0x38800000) { // subnormal or zero
      if (value < 0x33000000) sign.toShort
      else {
        val shift = 126 - (value >>> 23)
        val mant = (value & 0x7fffff) | 0x800000
        val rounded = (mant + (1 << (shift - 1)) - 1 + ((mant >>> shift) & 1)) >>> shift
        (sign | rounded).toShort
      }
    } else {
      val rounded = value + 0xfff + ((value >>> 13) & 1)
      (sign | ((rounded - 0x38000000) >>> 13)).toShort
    }
  }

  def halfToFloat(h: Short): Float = {
    val hi = h & 0xffff
    val sign = (hi & 0x8000) << 16
    val exp = (hi >>> 10) & 0x1f
    val mant = hi & 0x3ff
    val bits =
      if (exp == 0) {
        if (mant == 0) sign
        else { // subnormal
          var e = -1; var m = mant
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          sign | ((127 - 15 - e) << 23) | ((m & 0x3ff) << 13)
        }
      } else if (exp == 31) sign | 0x7f800000 | (mant << 13)
      else sign | ((exp - 15 + 127) << 23) | (mant << 13)
    java.lang.Float.intBitsToFloat(bits)
  }
}
