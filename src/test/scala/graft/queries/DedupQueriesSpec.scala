package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Unit coverage for the dedup operators (r18 verdict: dedup shipped with no
  * scalatest; ADVICE: degenerate shingle branches and null text untested).
  * Exercises q16/q17 end-to-end on a tiny fixture written to a temp dir,
  * including texts shorter than 3 tokens, an empty string, and a null. */
class DedupQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** Fixture: 0/1 exact dups, 2 near-dup of them (9 of 10 tokens shared),
    * 3 unrelated, 4/5 identical 2-token texts (degenerate shingle branch),
    * 6 empty string, 7 null text. */
  private def writeFixture(): String = {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val near = "alpha bravo charlie delta echo foxtrot golf hotel india kilo"
    val rows = Seq(
      Row(0L, base, "en", "s", 10L),
      Row(1L, base, "en", "s", 10L),
      Row(2L, near, "en", "s", 10L),
      Row(3L, "totally different words here made up unrelated text stream", "en", "s", 9L),
      Row(4L, "two tokens", "en", "s", 2L),
      Row(5L, "two tokens", "en", "s", 2L),
      Row(6L, "", "en", "s", 0L),
      Row(7L, null, "en", "s", 0L))
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_test").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), docsSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q16 exact dedup groups identical texts, keeps min id, fingerprints nulls") {
    val dir = writeFixture()
    val out = DedupQueries.queries("q16_exact_dedup")(spark, dir).collect()
    val byKeep = out.map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(byKeep(0L) == 2)  // docs 0 and 1 are exact copies
    assert(byKeep(4L) == 2)  // docs 4 and 5
    assert(byKeep(2L) == 1 && byKeep(3L) == 1 && byKeep(6L) == 1)
    // null text: md5(null) is null — one null-fingerprint group, counted
    val nullGroup = out.find(r => r.isNullAt(0)).get
    assert(nullGroup.getLong(1) == 7L && nullGroup.getLong(2) == 1L)
    assert(out.length == 6) // base, near, unrelated, "two tokens", "", null
  }

  test("q17 near-dup finds exact and near pairs, skips null text, handles short texts") {
    val dir = writeFixture()
    val out = DedupQueries.queries("q17_minhash_neardup")(spark, dir).collect()
    val pairs = out.map(r => ((r.getLong(0), r.getLong(1)),
      (r.getDouble(2), r.getInt(3)))).toMap
    // exact dups: jaccard 1.0 via all 4 band collisions
    assert(pairs((0L, 1L)) == ((1.0, 1)))
    assert(pairs((4L, 5L)) == ((1.0, 1)))
    // near-dup of the 10-token pair: 8 shingles, 7 shared -> 7/9
    assert(pairs((0L, 2L))._1 == math.rint(7.0 / 9 * 1e6) / 1e6)
    assert(pairs((0L, 2L))._2 == 1)
    assert(pairs.contains((1L, 2L)))
    // null text produced no candidate pairs at all
    assert(!pairs.keys.exists { case (a, b) => a == 7L || b == 7L })
    // unrelated and empty-string docs don't pair with anything
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L || a == 6L || b == 6L })
  }

  test("minhash_sigs kernel is bit-identical to the hex/conv HOF formulation") {
    import org.apache.spark.sql.functions._
    val dir = writeFixture()
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("text").isNotNull)
      .select(col("doc_id"), DedupQueries.shingles(col("text")).as("sh"))
    val P = graft.expr.MinHash.P
    val A = graft.expr.MinHash.A
    val B = graft.expr.MinHash.B
    // the original column pipeline: md5 -> 15 hex chars -> base16 -> mod P,
    // then 12 affine minima via transform + array_min
    val hashed = sh.withColumn("hs", transform(col("sh"), x =>
      conv(substring(md5(x), 1, 15), 16, 10).cast("long") % P))
    val viaHofs = A.indices.foldLeft(hashed) { (df, i) =>
      df.withColumn(s"sig_$i",
        array_min(transform(col("hs"), h => (lit(A(i)) * h + lit(B(i))) % P)))
    }.select(col("doc_id") +: A.indices.map(i => col(s"sig_$i")): _*)
      .collect()
      .map(r => r.getLong(0) -> A.indices.map(i => r.getLong(i + 1)).toSeq)
      .toMap
    val viaKernel = sh.select(col("doc_id"),
      graft.expr.GraftFunctions.minhash_sigs(col("sh")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaKernel.keySet == viaHofs.keySet)
    viaKernel.foreach { case (id, sigs) =>
      assert(sigs == viaHofs(id), s"doc $id signature mismatch")
    }
  }

  test("minhash_text kernel equals minhash_sigs(shingles(text)) slot-for-slot") {
    import org.apache.spark.sql.functions._
    // adversarial tokenization cases: consecutive/leading/trailing spaces
    // (split keeps empty tokens at limit -1), exactly 2 and 3 tokens, empty
    // string, single char, multi-byte UTF-8 (byte-level 0x20 splitting must
    // equal char-level), repeated shingles (array_distinct vs multiset min),
    // and a long realistic sentence.
    val texts = Seq(
      "alpha bravo charlie delta echo",
      "a  b c",            // double space -> empty token inside
      " lead space",       // leading space -> empty first token
      "trail space ",      // trailing space -> empty last token kept
      "  ",                // only spaces -> 3 empty tokens
      "two tokens",
      "exactly three tokens",
      "",
      "x",
      "héllo wörld ünïcode ça va bien",  // multi-byte UTF-8
      "dup dup dup dup dup",             // identical shingles repeated
      "the quick brown fox jumps over the lazy dog again and again")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("t", StringType, nullable = false))))
    val viaArray = df.select(col("id"),
      graft.expr.GraftFunctions.minhash_sigs(DedupQueries.shingles(col("t"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaText = df.select(col("id"),
      graft.expr.GraftFunctions.minhash_text(col("t")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaText.keySet == viaArray.keySet)
    for ((id, sigs) <- viaArray)
      assert(viaText(id) == sigs, s"text '${texts(id.toInt)}' signature mismatch")
  }

  test("shingles: degenerate branches — short, empty") {
    import org.apache.spark.sql.functions.col
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a b c d"), Row("a b"), Row("solo"), Row(""))),
      StructType(Seq(StructField("t", StringType, nullable = false))))
    val got = df.select(DedupQueries.shingles(col("t")).as("sh"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got.contains(List("a b c", "b c d")))
    assert(got.contains(List("a b")))   // <3 tokens: whole text
    assert(got.contains(List("solo")))
    assert(got.contains(List("")))      // empty string: single empty shingle
  }
}
