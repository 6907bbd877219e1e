package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions.dot_product

/** Label spreading over a k-NN similarity graph — the reference's namesake
  * algorithm (G1), re-expressed as declarative DataFrame joins.
  *
  * Reference semantics: /root/reference/src/labelling_pipeline.py:432-475 —
  * sklearn `LabelSpreading(kernel='knn', n_neighbors=6, alpha=0.01)` fit on
  * (embeddings, labels in {1, 0, -1}), then the binary posterior thresholded
  * at 0.7: `P(pos) >= 0.7 -> 1`, `P(neg) >= 0.7 -> 0`, else -1.
  *
  * The spread iterates `F <- alpha * S * F + (1 - alpha) * Y` where
  * `S = D^{-1/2} W D^{-1/2}` is the normalized affinity, W the symmetrized
  * k-NN connectivity `0.5 * (A + A^T)` (so mutual edges weigh 1.0, one-way
  * edges 0.5), and Y the clamped seed distribution. We run a FIXED number of
  * iterations instead of sklearn's tol-based stop: with alpha = 0.01 the
  * update is 99% clamped and converges to <1e-10 movement within ~4
  * iterations, and a fixed count makes the operator deterministic and
  * oracle-checkable (the DuckDB oracle unrolls the same iterations as CTEs).
  *
  * Deviation from sklearn's `kernel='knn'`: sklearn builds
  * `kneighbors_graph` over the fit set itself, so each point's k neighbors
  * INCLUDE the point (a self-loop contributing weight 1 to W and to the
  * degrees, leaving k-1 distinct others); this implementation excludes self
  * and takes k DISTINCT nearest others, so posteriors do not numerically
  * match sklearn on identical data — the thresholded labels agree in
  * practice (self-loop mass is redistributed proportionally), and both the
  * Spark side and the DuckDB oracle implement the same (self-excluded)
  * spec.
  *
  * Determinism across engines: the only non-associative step is the
  * per-neighbor sum inside an iteration (<= 12 terms of O(1) doubles), whose
  * cross-engine error is ~1e-16 relative and is damped (row sums of S are
  * <= 1, and alpha = 0.01 scales messages down 100x), so outputs agree far
  * below the 1e-6 rounding applied to the reported scores. k-NN selection
  * ranks by cosine ROUNDED to 6 dp with an id tie-break so both engines pick
  * identical neighbor sets.
  *
  * Scale path (100 TB): the exact k-NN build is the O(N^2) correctness
  * oracle; swap `knnEdges` for an LSH-bucketed candidate join (same output
  * schema) to scale — the spread itself is linear in edges per iteration
  * (one shuffle on dst, one on src). The normalized edge table is eagerly
  * localCheckpointed so the iterated plan reuses one materialization
  * instead of recomputing the N^2 scan per iteration, and so the logical
  * plan the optimizer sees stays iteration-sized.
  */
object LabelSpreading {

  /** Directed k-NN edge list (src, dst, sim) by cosine similarity: for each
    * vector the k most similar others, ranked on round(sim, 6) desc with
    * ascending-id tie-break. Input: (id, vec) columns.
    *
    * The per-vector norm is hoisted out of the O(N^2) pair loop:
    * cosine(a,b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))), guarded
    * exactly like VectorMath.cosineFloat/Double (dim mismatch -> NULL, zero
    * norm -> 0.0). dot_product shares cosine's accumulation loop and the
    * combining expression is the kernel's own (sqrt * sqrt, not
    * sqrt(na*nb)), so round(sim, 6) is bit-identical to cosine_sim while
    * each pair costs d multiply-adds instead of 3d plus two sqrts. The
    * streamed side is widened (Graft.widen) so the N^2 stage parallelizes
    * even off a single-row-group scan; the build side is explicitly
    * broadcast so the planner can never flip the sides and serialize the
    * stage again. */
  def knnEdges(vectors: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val withN2 = vectors.select(col(idCol), col(vecCol),
      dot_product(col(vecCol), col(vecCol)).as("n2"))
    val l = graft.Graft.widen(
      withN2.select(col(idCol).as("src"), col(vecCol).as("vec_src"), col("n2").as("n2_src")))
    val r = withN2.select(col(idCol).as("dst"), col(vecCol).as("vec_dst"), col("n2").as("n2_dst"))
    // Each unordered pair is scored ONCE (src < dst) and mirrored by an
    // explode — cosine is symmetric bit-for-bit (multiplication commutes
    // per index; the norm product commutes), so this halves the O(N^2)
    // kernel evaluations without changing any ranked value.
    val half = l.crossJoin(broadcast(r))
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"),
        round(
          when(size(col("vec_src")) =!= size(col("vec_dst")), lit(null).cast("double"))
            .when(col("n2_src") === 0.0 || col("n2_dst") === 0.0, 0.0)
            .otherwise(
              dot_product(col("vec_src"), col("vec_dst")) /
                (sqrt(col("n2_src")) * sqrt(col("n2_dst")))), 6).as("sim"))
    // Mirror each scored half-pair into both directions by exploding a
    // constant 2-element array and swapping via conditional projection.
    // The r21 mirror exploded array(struct, struct), which materialized two
    // fresh structs per pair inside the generator — an r22 probe measured
    // that allocation at ~0.5 s of the 0.98 s knnEdges stage; the constant
    // array is folded once and the swap is two codegen'd conditionals.
    val pairs = half
      .select(col("src"), col("dst"), col("sim"),
        explode(array(lit(0), lit(1))).as("m"))
      .select(
        when(col("m") === 0, col("src")).otherwise(col("dst")).as("src"),
        when(col("m") === 0, col("dst")).otherwise(col("src")).as("dst"),
        col("sim"))
    // row_number + filter <= k: InferWindowGroupLimit inserts a partial
    // group-limit before the shuffle, so each map partition ships at most k
    // candidates per src instead of N-1.
    val w = Window.partitionBy(col("src")).orderBy(desc("sim"), asc("dst"))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("src"), col("dst"), col("sim"))
  }

  /** Symmetrize + degree-normalize a directed edge list into
    * S = D^{-1/2} W D^{-1/2} with W = 0.5 * (A + A^T): (src, dst, s).
    *
    * Single-pass shape: the A + A^T union is an explode (each directed edge
    * emits itself and its mirror), and the two degree lookups are window
    * sums instead of self-joins — the original union referenced the k-NN
    * subtree twice and the deg join three more times, leaving AQE exchange
    * reuse to deduplicate five copies of the O(N^2) build; now every
    * subtree appears exactly once, and no broadcast/driver round-trips are
    * needed. Degrees are sums of exact binary fractions (multiples of 0.5),
    * so groupBy-vs-window accumulation order cannot change any value. */
  def normalizedEdges(directed: DataFrame): DataFrame = {
    val wEdges = directed
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), lit(0.5).as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    wEdges
      .withColumn("deg_src", sum(col("w")).over(Window.partitionBy(col("src"))))
      .withColumn("deg_dst", sum(col("w")).over(Window.partitionBy(col("dst"))))
      .select(col("src"), col("dst"),
        (col("w") / sqrt(col("deg_src") * col("deg_dst"))).as("s"))
  }

  /** Iterate F <- alpha * S * F + (1 - alpha) * Y for `iters` rounds.
    *
    * @param sEdges normalized edges (src, dst, s) — every id must appear as
    *               a src (guaranteed by k-NN construction, k >= 1)
    * @param y      clamped seeds (id, y1, y0): 1.0/0.0 one-hot for labelled
    *               rows, 0.0/0.0 for unlabelled
    * @return (id, f1, f0) raw (unrounded) label distributions
    */
  def spread(sEdges: DataFrame, y: DataFrame, idCol: String,
             alpha: Double, iters: Int): DataFrame = {
    // Eagerly localCheckpoint the loop invariants (guide §3: materialising
    // an intermediate truncates the plan). Checkpointing (vs persist)
    // truncates the LOGICAL plan too: the 5-iteration tree otherwise embeds
    // the O(N^2) k-NN subtree 5x and y 11x, costing ~1 s of
    // analyzer/optimizer time per run (r21 event-log audit) before cache
    // substitution even happens. The iteration joins are left to the
    // planner: an r21 A/B showed pre-partitioning the invariants +
    // merge-hinting the joins LOSES (3.97 s vs 2.78 s) because AQE's
    // partition coalescing re-keys the tiny exchanges and breaks the
    // intended co-partitioning, while the planner's broadcast choice needs
    // no exchange at all on the join side — the only shuffle per iteration
    // is the groupBy(src). Everything is still computed from parquet on
    // every invocation — the checkpoints are built inside this call.
    val e = sEdges.localCheckpoint()
    val y0 = y.localCheckpoint()
    // the final checkpoint materializes the iterated plan NOW; the loop
    // invariants' blocks are released by the ContextCleaner when their
    // RDDs go out of scope.
    spreadIterPlan(e, y0, idCol, alpha, iters).localCheckpoint()
  }

  /** The pure (un-materialized) plan of the iteration — spread's body
    * without persist/checkpoint. Exposed so plan audits (graft.Explain) can
    * print the full physical plan, which spread's eager localCheckpoint
    * otherwise hides behind a Scan ExistingRDD. */
  def spreadIterPlan(sEdges: DataFrame, y: DataFrame, idCol: String,
                     alpha: Double, iters: Int): DataFrame = {
    // Join strategy is deliberately left to the planner (broadcast): an r21
    // A/B showed pre-partitioning the invariants + merge-hinting LOSES
    // (3.97 s vs 2.78 s) — see spread()'s comment. An r22 A/B additionally
    // tried folding the seed left-join into the message groupBy via a
    // flagged union (one shuffle per iteration): it LOSES too (2.47 s vs
    // 2.04 s median) — the union ships seed rows + a flag column and a
    // 4-function conditional aggregate through the exchange, costing more
    // than the broadcast left-join it removes at this edge count.
    var f = y.select(col(idCol), col("y1").as("f1"), col("y0").as("f0"))
    for (_ <- 1 to iters) {
      val msgs = sEdges.join(f, sEdges("dst") === f(idCol))
        .groupBy(col("src"))
        .agg(sum(col("s") * col("f1")).as("m1"), sum(col("s") * col("f0")).as("m0"))
      f = y.join(msgs, y(idCol) === msgs("src"), "left")
        .select(y(idCol),
          (lit(alpha) * coalesce(col("m1"), lit(0.0)) + lit(1.0 - alpha) * col("y1")).as("f1"),
          (lit(alpha) * coalesce(col("m0"), lit(0.0)) + lit(1.0 - alpha) * col("y0")).as("f0"))
    }
    f
  }

  /** Threshold the normalized posterior (labelling_pipeline.py:460-466):
    * P(1) >= thresh -> 1, P(0) >= thresh -> 0, else -1 (incl. zero-mass rows
    * — nodes the spread never reached stay unlabelled, matching sklearn's
    * NaN-posterior rows failing both comparisons). */
  def thresholdLabels(f: DataFrame, idCol: String, thresh: Double): DataFrame = {
    val tot = col("f1") + col("f0")
    f.select(col(idCol),
      round(col("f1"), 6).as("f1"),
      round(col("f0"), 6).as("f0"),
      when(tot > 0 && col("f1") / tot >= thresh, 1)
        .when(tot > 0 && col("f0") / tot >= thresh, 0)
        .otherwise(-1).as("label_prop"))
  }
}
