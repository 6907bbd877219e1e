package graft.expr

import org.apache.spark.sql.catalyst.util.ArrayData

/** Dense-vector kernels over Catalyst ArrayData, called from codegen.
  * Accumulation is sequential in index order, in double precision — this is
  * deterministic (no parallel reduction inside a row) so results are stable
  * across partitionings and match a straightforward oracle computation. */
object VectorMath {

  /** Dim guard shared by the public kernels: the expression layer surfaces
    * mismatches as SQL NULL before calling in, but these are public
    * (advertised as ANN/IVF building blocks) — a direct caller passing a
    * longer `a` would otherwise read past `b`'s end on UnsafeArrayData. */
  @inline private def requireSameDim(a: ArrayData, b: ArrayData): Unit =
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"vector dim mismatch: ${a.numElements()} vs ${b.numElements()}")

  /** Cosine similarity between two float arrays; 0.0 if either has zero
    * norm. Dim mismatch throws here; CosineSimilarity pre-checks and yields
    * SQL NULL instead, so the throw only guards direct kernel callers. */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    requireSameDim(a, b)
    val n = a.numElements()
    if (n == 0) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineDouble(a: ArrayData, b: ArrayData): Double = {
    requireSameDim(a, b)
    val n = a.numElements()
    if (n == 0) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Dot products: equal dims enforced (expression layer yields NULL on
    * mismatch before calling in; direct callers get a thrown error, never a
    * truncated/overread score). */
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    requireSameDim(a, b)
    val n = a.numElements()
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    requireSameDim(a, b)
    val n = a.numElements()
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  /** Row-wise modal vote over an int array (SURVEY §2 F6/G2): value with the
    * strictly-highest occurrence count; ties and empty input -> -1. Null
    * elements are ignored (reference columns are never null there). */
  def modalLabel(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return -1
    val counts = new java.util.HashMap[Int, Int]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) counts.merge(arr.getInt(i), 1, (x, y) => x + y)
      i += 1
    }
    if (counts.isEmpty) return -1
    var bestVal = -1; var bestCount = 0; var tied = false
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > bestCount) { bestCount = e.getValue; bestVal = e.getKey; tied = false }
      else if (e.getValue == bestCount) tied = true
    }
    if (tied) -1 else bestVal
  }
}
