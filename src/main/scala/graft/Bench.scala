package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: a FULL-SUITE warm-up pass before any timing, then median
  * of 5 timed runs per query in a fixed order (alphabetical, except q12 —
  * the most GC-heavy query — forced last so its pressure can't contaminate
  * the sub-second queries). Round-4 verdict: per-query warm-up still let the first
  * timed query absorb one-time costs (JIT of shared codegen paths, parquet
  * footer/file-listing caches shared across queries) and HashMap iteration
  * order shuffled which query paid them — q01 swung 2.3 s vs 0.63 s on an
  * identical binary. Warming the whole suite first pays those costs outside
  * every timing window. A failed query is reported with time = -1.0 so a
  * crash can never masquerade as a fast run; the exception goes to stderr.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Always use the sort-based shuffle writer: the bypass-merge writer
      // opens numPartitions files PER MAP TASK (32x32 per stage here),
      // which dominates small-shuffle stages on file-create-slow storage
      // (r21 within-process A/B: q12 6.14s -> 2.65s). At production
      // partition counts (> 200) the sort writer is the default path
      // anyway, so this makes local runs match the at-scale behavior.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("GRAFT_BYPASS_THRESHOLD", "1"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop sink: fully materializes every output column (count() would let
    // Catalyst prune the select list and time a cheaper plan than the query)
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // q12 (label propagation, ~1/3 of suite time) is timed LAST so its GC +
    // shuffle pressure can't contaminate the sub-second queries that would
    // otherwise follow it — r14→r15 showed 3.7-4.3x identical-binary swings.
    val ordered = SparkEntry.queries.toSeq.sortBy { case (k, _) =>
      (if (k == "q12_label_propagation") 1 else 0, k)
    }
    // full-suite warm-up: JIT + codegen + file-listing caches for EVERY
    // query before ANY timing starts
    ordered.foreach { case (_, fn) =>
      try runOnce(fn)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val results = ordered.map { case (name, fn) =>
      val t =
        try {
          val times = Seq.fill(5)(runOnce(fn)).sorted
          times(2) // median of 5
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e")
            -1.0
        }
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
