package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Primitive-loop vector kernels called from generated code
 *  ([[NativeExprs.LongDotExpr]]). Semantics match the higher-order-function
 *  forms they replace: zip to the SHORTER length (`zip_with` pads the
 *  shorter side with null → null products are dropped by the fold's `+`
 *  only when the longer tail is ignored — the engine only ever compares
 *  equal-dimension vectors, where the two spellings agree exactly). */
object VectorOps {
  /** Merge-intersection count of two DISTINCT-SORTED long arrays — the
   *  ArrayData form of [[Shingles.intersectionSize]] (identical algorithm,
   *  no per-element boxing / array materialization). */
  def intersectLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }
}
