package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft.table

/** Deduplication operators over the `documents` table — the dedup pillar of
  * a training-data pipeline (builder brief; SURVEY §7 scale ops).
  *
  *  - q16 exact dedup: fingerprint = md5(text), one shuffle on the
  *    fingerprint, keep the minimum doc_id per group. At 100 TB this is THE
  *    way to dedup: the shuffle carries (16-byte hash, id) pairs, never the
  *    document bodies, and the aggregation is a partial/map-side combine.
  *  - q17 MinHash-LSH near-dup: word 3-shingles -> K=12 minhash signature
  *    (one codegen'd kernel pass, graft.expr.MinHash) -> 4 bands x 3 rows
  *    -> bucket on (band, key) and emit in-bucket pairs -> exact Jaccard
  *    verify on candidates only. The LSH banding replaces the O(N^2)
  *    all-pairs comparison with ONE shuffle keyed on band signatures; the
  *    expensive shingle-set Jaccard runs only on colliding pairs. All
  *    hashing is plain integer arithmetic on md5 prefixes so the DuckDB
  *    oracle reproduces it bit-for-bit (no engine-private hash).
  *
  * MinHash scheme: h_i(x) = (A_i * (x mod P) + B_i) mod P over the Mersenne
  * prime P = 2^31 - 1, x = first 15 hex chars (60 bits) of md5(shingle).
  * A_i * x < 2^62 so the arithmetic never overflows a signed 64-bit int in
  * either engine.
  *
  * Null texts are excluded from q17 (a null document has no shingles; its
  * band key would degenerate to the empty string and false-cluster all null
  * rows). q16 still fingerprints nulls (null group counts the copies).
  *
  * Skew note (100 TB): exact-duplicate clusters share all 4 band keys, so a
  * cluster of n exact copies yields O(n^2) candidate pairs. The pair
  * generation is a two-level explode, so no single row ever holds more than
  * the bucket's O(n) id list (the O(n^2) blowup streams through the
  * generator instead of materializing per row). At production scale run q16
  * upstream and near-dup only the exact-dedup keepers — band buckets are
  * then bounded by the NEAR-dup cluster size. The queries are kept
  * independent here so each is separately oracle-checked.
  */
object DedupQueries {

  // MinHash constants live with the codegen'd kernel (graft.expr.MinHash);
  // referenced here only to build the DuckDB oracle SQL, which replays the
  // same arithmetic through the hex/conv formulation.
  private val P = graft.expr.MinHash.P
  private val A = graft.expr.MinHash.A.toSeq
  private val B = graft.expr.MinHash.B.toSeq
  private val bands = 4
  private val rowsPerBand = 3
  private val nearDupThreshold = 0.5

  /** Distinct word 3-shingles of a space-tokenized text (whole text when
    * shorter than 3 tokens, mirroring the degenerate-input convention).
    * private[graft] for direct unit coverage of the degenerate branches. */
  private[graft] def shingles(text: Column): Column = {
    val toks = split(text, " ")
    array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2), i => concat_ws(" ", slice(toks, i, lit(3)))))
        .otherwise(array(text)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: group on content hash, keep min id. One partial-agg
    // shuffle of (hash, id); document bodies never move.
    "q16_exact_dedup" -> ((s, dir) => {
      table(s, dir, "documents")
        .groupBy(md5(col("text")).as("fingerprint"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    }),

    // MinHash-LSH near-dup candidate generation + exact Jaccard verify.
    "q17_minhash_neardup" -> ((s, dir) => q17(s, dir, materialize = true))
  )

  /** `materialize = true` is the real query (the two provably-tiny
    * intermediates — candidate pairs and candidate docs — are eagerly
    * localCheckpointed so the expensive MinHash pipeline and the corpus
    * scan each run exactly ONCE; still fully computed from parquet on every
    * invocation). `materialize = false` returns the identical logical plan
    * without checkpoints so graft.Explain can print the full physical plan
    * (a checkpoint otherwise hides its subtree behind a Scan ExistingRDD). */
  private[graft] def q17(s: SparkSession, dir: String, materialize: Boolean): DataFrame = {
      val docsText = table(s, dir, "documents")
        .where(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      // widen: the fixture is a single-row-group file, so without this the
      // whole shingle+md5+minhash kernel runs in ONE task (no-op at scale,
      // where the scan is already parallel — see Graft.widen). The corpus is
      // scanned exactly twice per invocation: once by the signature pipeline
      // and once by the candidate semi-join below (was three passes in r21).
      val docsWide = graft.Graft.widen(docsText)
      // One codegen'd pass fuses tokenization, word-3-shingling and all K
      // signature slots (MinHashFromText kernel): each shingle is a byte
      // range of the raw text, so the pass allocates nothing per shingle.
      // r21 had replaced 13 interpreted HOFs per row with a kernel over the
      // shingle ARRAY; this removes the interpreted shingle construction
      // (regex split + sequence/transform + per-shingle concat_ws +
      // array_distinct) too. Identical arithmetic slot-for-slot (unit
      // parity test), so the DuckDB oracle (hex/conv CTEs over the shingle
      // formulation) still matches bit-for-bit.
      val sig = docsWide.select(col("doc_id"),
        graft.expr.GraftFunctions.minhash_text(col("text")).as("sig"))
      // band keys: r consecutive signature slots joined into one string key
      val bandStructs = (0 until bands).map { j =>
        val key = concat_ws("_",
          (0 until rowsPerBand).map(r =>
            element_at(col("sig"), j * rowsPerBand + r + 1)): _*)
        struct(lit(j).as("band"), key.as("key"))
      }
      val banded = sig
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
        .select(col("doc_id"), col("b.band"), col("b.key"))
      // candidates: bucket once on (band, key) and emit each bucket's
      // id-ordered pairs. Replaces the banded-vs-banded self-join, which
      // computed the whole signature subtree TWICE (r21 plan audit:
      // operators 1-6 duplicated as 7-12) and broadcast the full banded
      // relation; now the minhash pipeline runs once and the only shuffle
      // is the (band, key) partial aggregation. Same candidate set: within
      // one bucket each doc_id appears once, so the sorted-array
      // combinations are exactly the pairs the self-join emitted. Pair
      // generation is a TWO-LEVEL explode (posexplode the bucket, then
      // explode each element's ordered partners): the r21 single explode
      // of flatten(transform(...)) materialized a bucket's whole O(n^2)
      // pair array in ONE row — an aggregation-buffer OOM on a hot
      // (band, key) bucket (guide §2.5/§5); this form never holds more
      // than the O(n) id list per row, with an identical pair set.
      val candPlan = banded
        .groupBy(col("band"), col("key"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .where(size(col("ids")) > 1)
        .select(col("ids"), posexplode(col("ids")))
        .select(col("col").as("doc_a"),
          explode(slice(col("ids"), col("pos") + lit(2), size(col("ids")))).as("doc_b"))
        .distinct()
      // cand is referenced three times below (pair attach + both ends of
      // the id list); eagerly materializing it guarantees the MinHash
      // pipeline runs exactly once per invocation instead of gambling on
      // runtime exchange reuse across duplicated subtrees (guide §3.3:
      // materialize an intermediate to truncate the plan). It is tiny by
      // LSH construction (colliding pairs only).
      val cand = if (materialize) candPlan.localCheckpoint() else candPlan
      // exact verify on the (small) candidate set only, in the shape that
      // survives 100 TB (guide §3.1/§8): the corpus is streamed ONCE past a
      // broadcast of the candidate doc_ids (a left-semi join — ids only,
      // never document bodies), and every later join touches only the
      // surviving O(|cand|) rows — so no join below ever broadcasts or
      // shuffles full documents of more than ~2|cand| rows. The r21 shape
      // broadcast candidate rows WITH full text bodies (|cand| x doc size,
      // the r21 ADVICE hazard) and streamed the corpus twice; this one
      // moves document bodies exactly once (§8: decide with small rows,
      // move big rows once). Shingles are re-derived on candidate rows
      // only: O(|cand|), not O(corpus).
      val candIds = cand
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val candDocsPlan = docsWide
        .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      // candDocs feeds both the text_a and text_b side; checkpointing it
      // keeps the verify at exactly one corpus pass.
      val candDocs = if (materialize) candDocsPlan.localCheckpoint() else candDocsPlan
      val sa = shingles(col("text_a"))
      val sb = shingles(col("text_b"))
      val withA = candDocs
        .join(broadcast(cand), col("doc_id") === col("doc_a"))
        .select(col("doc_a"), col("doc_b"), col("text").as("text_a"))
      candDocs.select(col("doc_id"), col("text").as("text_b"))
        .join(withA, col("doc_id") === col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(size(array_intersect(sa, sb)).cast("double") /
            size(array_union(sa, sb)), 6).as("jaccard"))
        .withColumn("near_dup", (col("jaccard") >= nearDupThreshold).cast("int"))
  }

  // DuckDB replica of the identical scheme (same constants, same md5-prefix
  // hashing), so the compare checks signature math, banding and the verify.
  private def sigExprs: String =
    A.indices.map { i =>
      s"list_min([(${A(i)} * h + ${B(i)}) % $P for h in hs]) AS sig_$i"
    }.mkString(",\n             ")

  private def bandSelects: String =
    (0 until bands).map { j =>
      val key = (0 until rowsPerBand).map(r => s"sig_${j * rowsPerBand + r}").mkString(", ")
      s"SELECT doc_id, $j AS band, concat_ws('_', $key) AS key FROM sigs"
    }.mkString("\n           UNION ALL ")

  val oracleSql: Map[String, String] = Map(
    "q16_exact_dedup" ->
      """SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id,
           count(*) AS n_copies
         FROM documents GROUP BY md5(text)""",
    "q17_minhash_neardup" ->
      s"""WITH docs AS (
           SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
               ELSE [text] END) AS sh
           FROM (SELECT doc_id, text, string_split(text, ' ') AS t
                 FROM documents WHERE text IS NOT NULL)),
         hashed AS (
           SELECT doc_id, sh,
             [('0x' || substr(md5(x), 1, 15))::BIGINT % $P for x in sh] AS hs
           FROM docs),
         sigs AS (
           SELECT doc_id,
             $sigExprs
           FROM hashed),
         bands AS (
           $bandSelects),
         cand AS (
           SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
           FROM bands l JOIN bands r
             ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
         SELECT doc_a, doc_b,
           round(len(list_intersect(a.sh, b.sh)) * 1.0 /
             len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard,
           CASE WHEN round(len(list_intersect(a.sh, b.sh)) * 1.0 /
             len(list_distinct(list_concat(a.sh, b.sh))), 6) >= $nearDupThreshold
             THEN 1 ELSE 0 END AS near_dup
         FROM cand
         JOIN docs a ON cand.doc_a = a.doc_id
         JOIN docs b ON cand.doc_b = b.doc_id"""
  )
}
