package graft.expr

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature kernel (q17). Computes, in ONE pass over a shingle
  * array, the K affine-permutation minima that DedupQueries previously
  * assembled from 13 interpreted higher-order functions per row
  * (`transform(sh, md5->conv)` + 12x `array_min(transform(hs, affine))`),
  * each of which allocated an intermediate array and evaluated its lambda
  * per element outside whole-stage codegen.
  *
  * Bit-for-bit equivalence with the old column expression (and the DuckDB
  * oracle, which still replays the hex/conv formulation):
  *  - `conv(substring(md5(s), 1, 15), 16, 10)::long` == the first 8 digest
  *    bytes as a big-endian long, logically shifted right 4 (15 hex nibbles
  *    = 60 bits), which is non-negative, so `% P` agrees in both engines;
  *  - `A(i) * h + B(i)` with h < P < 2^31 and A(i) < 2^14 stays < 2^45 —
  *    no 64-bit overflow anywhere;
  *  - null shingle elements are skipped (array_min semantics); an empty
  *    input yields a NULL signature array, matching array_min(empty) = NULL
  *    per slot (concat_ws then skips the nulls identically).
  */
object MinHash {

  /** Mersenne prime 2^31 - 1: the modulus of the affine permutations. */
  val P = 2147483647L

  /** Affine permutation constants h_i(x) = (A_i * x + B_i) mod P. */
  val A: Array[Long] = Array(7L, 13L, 31L, 61L, 127L, 251L, 509L, 1021L, 2039L, 4093L, 8191L, 16381L)
  val B: Array[Long] = Array(3L, 17L, 29L, 47L, 89L, 151L, 211L, 283L, 359L, 433L, 541L, 631L)

  val K: Int = A.length

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // Reusable per-thread buffers: the r21 kernel allocated a fresh byte[]
  // per shingle twice over (UTF8String.getBytes copy + digest() output),
  // ~100 allocations/row across 32 threads — pure GC pressure in the hot
  // loop (guide §1.2 per-task work). Input buffer grows geometrically and
  // sticks at the high-water mark; digest output is a fixed 16 bytes.
  private val inBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }
  private val outBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** 60-bit md5 prefix of the UTF-8 bytes, reduced mod P — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)::long % P`. */
  def hash60(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val n = s.numBytes()
    var in = inBuf.get()
    if (in.length < n) {
      in = new Array[Byte](java.lang.Math.max(n, in.length * 2))
      inBuf.set(in)
    }
    s.writeToMemory(in, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    d.update(in, 0, n)
    val digest = outBuf.get()
    d.digest(digest, 0, 16)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v >>> 4) % P
  }

  /** K minhash signature slots over a shingle array; null when the array is
    * empty (array_min-of-empty semantics per slot). */
  def signatures(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val sigs = Array.fill(K)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val h = hash60(arr.getUTF8String(i))
        var k = 0
        while (k < K) {
          val v = (A(k) * h + B(k)) % P
          if (v < sigs(k)) sigs(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(sigs)
  }
}
