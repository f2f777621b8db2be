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
    * instead of an interpreted lambda per token. */
  def tokens(s: UTF8String): ArrayData = {
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
