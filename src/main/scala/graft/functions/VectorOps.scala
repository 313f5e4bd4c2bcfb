package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Primitive-loop vector kernels called from generated code
 *  ([[NativeExprs.LongDotExpr]]). Semantics match the higher-order-function
 *  forms they replace: zip to the SHORTER length (`zip_with` pads the
 *  shorter side with null → null products are dropped by the fold's `+`
 *  only when the longer tail is ignored — the engine only ever compares
 *  equal-dimension vectors, where the two spellings agree exactly). */
object VectorOps {
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }
}
