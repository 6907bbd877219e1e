package graft

import org.apache.spark.sql.functions._

/** Temporary phase-level profiler for the expensive queries (guide §1:
  * measure first). Times each sub-pipeline with the noop sink. Not part of
  * the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", sys.env.getOrElse("GRAFT_EVENTLOG", "false"))
      .config("spark.eventLog.dir", "/tmp/spark-events")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("GRAFT_BYPASS_THRESHOLD", "200"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.registerFunctions(spark)

    // optional substring filter: GRAFT_PROBE_ONLY=q12.full runs just that probe
    val only = sys.env.get("GRAFT_PROBE_ONLY")
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = if (only.forall(name.contains)) {
      // warm once, then median of 3
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = Seq.fill(3)(once()).sorted
      println(f"PROBE $name%-40s ${ts(1)}%8.3f s")
    }

    import graft.graph.LabelSpreading
    val e = Graft.table(spark, sfDir, "embeddings")

    time("calibrate.scan_embeddings") { e }
    time("q12.widen_only") {
      Graft.widen(e.select(col("vec_id"), col("embedding")))
    }
    time("q12.knnEdges") {
      LabelSpreading.knnEdges(e, "vec_id", "embedding", 6)
    }
    time("q12.normalizedEdges") {
      LabelSpreading.normalizedEdges(LabelSpreading.knnEdges(e, "vec_id", "embedding", 6))
    }
    def spreadIters(n: Int) = {
      val edges = LabelSpreading.normalizedEdges(
        LabelSpreading.knnEdges(e, "vec_id", "embedding", 6))
      val y = e.select(col("vec_id"),
        when(col("vec_id") % 5 === 0 && col("label") === 0, 1.0).otherwise(0.0).as("y1"),
        when(col("vec_id") % 5 === 0 && col("label") =!= 0, 1.0).otherwise(0.0).as("y0"))
      LabelSpreading.spread(edges, y, "vec_id", 0.01, n)
    }
    time("q12.spread_iters1") { spreadIters(1) }
    time("q12.spread_iters5") { spreadIters(5) }
    // isolate the N^2 stage: join iteration alone vs +dot vs +cosine vs +window
    locally {
      import graft.expr.GraftFunctions.{cosine_sim, dot_product}
      val withN2 = e.select(col("vec_id"), col("embedding"),
        dot_product(col("embedding"), col("embedding")).as("n2"))
      val l = Graft.widen(withN2.select(col("vec_id").as("src"),
        col("embedding").as("vec_src"), col("n2").as("n2_src")))
      val r = withN2.select(col("vec_id").as("dst"),
        col("embedding").as("vec_dst"), col("n2").as("n2_dst"))
      def pairs = l.crossJoin(broadcast(r)).filter(col("src") =!= col("dst"))
      time("q12.pairs_lit") { pairs.select(col("src"), col("dst"), lit(0.0).as("sim")) }
      time("q12.pairs_dot") {
        pairs.select(col("src"), col("dst"),
          round(when(size(col("vec_src")) =!= size(col("vec_dst")), lit(null).cast("double"))
            .when(col("n2_src") === 0.0 || col("n2_dst") === 0.0, 0.0)
            .otherwise(dot_product(col("vec_src"), col("vec_dst")) /
              (sqrt(col("n2_src")) * sqrt(col("n2_dst")))), 6).as("sim"))
      }
      time("q12.pairs_cosine") {
        pairs.select(col("src"), col("dst"),
          round(cosine_sim(col("vec_src"), col("vec_dst")), 6).as("sim"))
      }
      def pairsDot = pairs.select(col("src"), col("dst"),
        round(when(size(col("vec_src")) =!= size(col("vec_dst")), lit(null).cast("double"))
          .when(col("n2_src") === 0.0 || col("n2_dst") === 0.0, 0.0)
          .otherwise(dot_product(col("vec_src"), col("vec_dst")) /
            (sqrt(col("n2_src")) * sqrt(col("n2_dst")))), 6).as("sim"))
      time("q12.pairs_dot_localsort") {
        pairsDot.sortWithinPartitions(col("src"), desc("sim"), asc("dst"))
      }
      time("q12.pairs_dot_window") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("src")).orderBy(desc("sim"), asc("dst"))
        pairsDot.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 6)
          .select(col("src"), col("dst"), col("sim"))
      }
    }
    time("q12.full") {
      graft.queries.GraphQueries.q12(spark, sfDir, materialize = true)
    }
    val nPlanes = sys.env.getOrElse("GRAFT_KNN_PLANES", "6").toInt
    val nTables = sys.env.getOrElse("GRAFT_KNN_TABLES", "8").toInt
    time("q12.knnEdgesApprox") {
      LabelSpreading.knnEdgesApprox(e, "vec_id", "embedding", 6, nPlanes, nTables)
    }
    if (only.forall("q12.knn_recall".contains)) {
      val exact = LabelSpreading.knnEdges(e, "vec_id", "embedding", 6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = LabelSpreading.knnEdgesApprox(e, "vec_id", "embedding", 6, nPlanes, nTables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"PROBE q12.knn_recall b=$nPlanes L=$nTables  ${(exact & approx).size.toDouble / exact.size}%.4f  (exact ${exact.size}, approx ${approx.size})")
    }

    // q17 phases
    val docsText = Graft.table(spark, sfDir, "documents")
      .where(col("text").isNotNull).select(col("doc_id"), col("text"))
    time("q17.scan_docs") { docsText }
    time("q17.widen_only") { Graft.widen(docsText) }
    time("q17.shingles") {
      Graft.widen(docsText).select(graft.queries.DedupQueries.shingles(col("text")).as("sh"))
    }
    time("q17.shingles_hashed") {
      Graft.widen(docsText)
        .select(col("doc_id"), graft.queries.DedupQueries.shingles(col("text")).as("sh"))
        .withColumn("hs", transform(col("sh"), x =>
          conv(substring(md5(x), 1, 15), 16, 10).cast("long") % 2147483647L))
        .select(col("doc_id"), col("hs"))
    }
    time("q17.sig12") {
      val hashed = Graft.widen(docsText)
        .select(col("doc_id"), graft.queries.DedupQueries.shingles(col("text")).as("sh"))
        .withColumn("hs", transform(col("sh"), x =>
          conv(substring(md5(x), 1, 15), 16, 10).cast("long") % 2147483647L))
      val A = Seq(7L, 13L, 31L, 61L, 127L, 251L, 509L, 1021L, 2039L, 4093L, 8191L, 16381L)
      val B = Seq(3L, 17L, 29L, 47L, 89L, 151L, 211L, 283L, 359L, 433L, 541L, 631L)
      A.indices.foldLeft(hashed) { (df, i) =>
        df.withColumn(s"sig_$i",
          array_min(transform(col("hs"), h => (lit(A(i)) * h + lit(B(i))) % 2147483647L)))
      }.drop("sh", "hs")
    }
    time("q17.full") {
      graft.queries.DedupQueries.queries("q17_minhash_neardup")(spark, sfDir)
    }
    time("q10.full") {
      graft.queries.SimilarityQueries.queries("q10_seed_label_fuzzy")(spark, sfDir)
    }
    time("q03.full") {
      graft.queries.RelationalQueries.queries("q03_star_join_revenue")(spark, sfDir)
    }
    spark.stop()
  }
}
