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

  // Token-start offsets for signaturesFromText (grown geometrically,
  // sticks at the high-water mark like inBuf).
  private val tokBuf = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](64)
  }

  /** K minhash slots computed straight from the raw text, equal slot-for-slot
    * to `signatures(shingles(text))` (DedupQueriesSpec pins the parity):
    *
    *  - `split(text, " ")` (limit -1) tokenizes on single 0x20 bytes and
    *    KEEPS empty tokens, and `concat_ws(" ", slice(toks, i, 3))` re-joins
    *    3 consecutive tokens with single spaces — which reproduces the
    *    original byte span exactly (the only bytes between consecutive
    *    tokens are the single 0x20s that split consumed). So each word
    *    3-shingle IS the byte range [start(tok_i), end(tok_{i+2})) of the
    *    input, and its md5 can be taken over that range with ZERO
    *    per-shingle string allocation. 0x20 never occurs inside a UTF-8
    *    multi-byte sequence, so byte-level splitting equals char-level.
    *  - the `array_distinct` in the column formulation is irrelevant to a
    *    min (min over a multiset == min over its set).
    *  - fewer than 3 tokens hashes the whole text once, matching
    *    `otherwise(array(text))`.
    *
    * Replaces, per row: a regex split (token array), sequence+transform
    * (shingle array), one string allocation per shingle, and a distinct
    * hash set — with one byte copy of the text and an int array of token
    * starts. Never null for non-null input (there is always >= 1 shingle).
    */
  def signaturesFromText(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    var in = inBuf.get()
    if (in.length < n) {
      in = new Array[Byte](java.lang.Math.max(n, in.length * 2))
      inBuf.set(in)
    }
    s.writeToMemory(in, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    val d = md5.get()
    val digest = outBuf.get()
    val sigs = Array.fill(K)(Long.MaxValue)
    @inline def hashRange(off: Int, len: Int): Unit = {
      d.reset()
      d.update(in, off, len)
      d.digest(digest, 0, 16)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
      val h = (v >>> 4) % P
      var k = 0
      while (k < K) {
        val x = (A(k) * h + B(k)) % P
        if (x < sigs(k)) sigs(k) = x
        k += 1
      }
    }
    // token j spans [starts(j), starts(j+1) - 1) for j < m-1, else [starts(j), n)
    var starts = tokBuf.get()
    var m = 0
    @inline def push(p: Int): Unit = {
      if (m == starts.length) {
        starts = java.util.Arrays.copyOf(starts, starts.length * 2)
        tokBuf.set(starts)
      }
      starts(m) = p
      m += 1
    }
    push(0)
    var i = 0
    while (i < n) {
      if (in(i) == 0x20) push(i + 1)
      i += 1
    }
    if (m >= 3) {
      var w = 0
      while (w + 2 < m) {
        val off = starts(w)
        val end = if (w + 3 < m) starts(w + 3) - 1 else n
        hashRange(off, end - off)
        w += 1
      }
    } else hashRange(0, n)
    new GenericArrayData(sigs)
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
