package graft

/** Plan-audit main: prints the formatted physical plan of the named queries
  * (all of them by default) at the given sf dir. Used to verify pushdown /
  * broadcast / WindowGroupLimit / codegen spans after every change.
  *
  * Usage: sbt "runMain graft.Explain [sfDir] [queryName...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Graft.session(master = "local[4]", shufflePartitions = 4)
    names.foreach { n =>
      println(s"\n================ $n ================")
      // q12's spread and q17's candidate set eagerly localCheckpoint, which
      // reduces their explain to a Scan ExistingRDD — print the identical
      // un-materialized plans.
      if (n == "q12_label_propagation")
        graft.queries.GraphQueries.q12(spark, sfDir, materialize = false).explain("formatted")
      else if (n == "q17_minhash_neardup")
        graft.queries.DedupQueries.q17(spark, sfDir, materialize = false).explain("formatted")
      else
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
