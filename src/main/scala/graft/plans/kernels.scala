package graft.plans

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row kernels invoked from generated code (static forwarders make
  * them callable as plain Java statics from Janino-compiled stages).
  * Semantics are pinned to the column-function compositions they
  * replace — the DuckDB oracles don't change.
  */
object TextKernels {

  /** Letter-run tokens, lowercased after the split — identical to
    * `filter(transform(split(c, "[^\p{L}]+"), lower), _ != "")`
    * (reference main.go:141-151 order) but one virtual call per row
    * instead of an interpreted lambda per token. Pure-ASCII rows (the
    * overwhelming case in web corpora) take a byte-level path with no
    * String round-trip; any byte ≥ 0x80 falls back to the code-point
    * path with identical semantics. */
  def tokens(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    var i = 0
    while (i < n && (s.getByte(i) & 0x80) == 0) i += 1
    if (i == n) tokensAscii(s) else tokensUnicode(s)
  }

  private def tokensAscii(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    var buf = new Array[Byte](16)
    while (i < n) {
      var b = s.getByte(i)
      while (i < n && !(((b | 0x20) >= 'a') && ((b | 0x20) <= 'z'))) {
        i += 1; if (i < n) b = s.getByte(i)
      }
      var len = 0
      while (i < n && ((b | 0x20) >= 'a') && ((b | 0x20) <= 'z')) {
        if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
        buf(len) = (b | 0x20).toByte // ASCII lowercase
        len += 1; i += 1; if (i < n) b = s.getByte(i)
      }
      if (len > 0) out += UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))
    }
    new GenericArrayData(out.toArray)
  }

  private def tokensUnicode(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val n = str.length
    var i = 0
    while (i < n) {
      // skip separator run
      while (i < n && !Character.isLetter(str.codePointAt(i))) i += Character.charCount(str.codePointAt(i))
      val start = i
      while (i < n && Character.isLetter(str.codePointAt(i))) i += Character.charCount(str.codePointAt(i))
      if (i > start)
        out += UTF8String.fromString(str.substring(start, i)).toLowerCase
    }
    new GenericArrayData(out.toArray)
  }
}

/** Dense-vector kernels: strict left-to-right double accumulation,
  * bit-identical to `aggregate(zip_with(a, b, _*_), 0.0, _+_)` over
  * double-cast inputs (and to DuckDB's `list_reduce`). One tight loop
  * per row; elements promoted exactly as SQL CAST would. */
object VecKernels {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    acc
  }
  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}
