package graft

/** Temporary within-process A/B config prober: alternates SparkSessions
  * built with two values of a static conf, timing the heaviest queries in
  * each, so external machine noise affects both arms equally. */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val key = sys.env.getOrElse("GRAFT_AB_KEY", "spark.shuffle.sort.bypassMergeThreshold")
    val va = sys.env.getOrElse("GRAFT_AB_A", "200")
    val vb = sys.env.getOrElse("GRAFT_AB_B", "1")
    val qnames = sys.env.get("GRAFT_AB_QUERIES")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q12_label_propagation", "q17_minhash_neardup",
        "q10_seed_label_fuzzy", "q01_pricing_summary"))

    def runArm(v: String): Map[String, Double] = {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config(key, v)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      Graft.registerFunctions(spark)
      def once(n: String): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      qnames.foreach(once) // warm
      val res = qnames.map { n =>
        val ts = Seq.fill(3)(once(n)).sorted
        n -> ts(1)
      }.toMap
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      res
    }

    val rounds = 3
    val as = collection.mutable.ArrayBuffer[Map[String, Double]]()
    val bs = collection.mutable.ArrayBuffer[Map[String, Double]]()
    for (r <- 1 to rounds) {
      as += runArm(va)
      bs += runArm(vb)
      println(s"AB round $r done")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    qnames.foreach { n =>
      val a = med(as.map(_(n)).toSeq)
      val b = med(bs.map(_(n)).toSeq)
      println(f"AB $n%-28s $key=$va%-6s ${a}%7.3f s   $key=$vb%-6s ${b}%7.3f s")
    }
  }
}
