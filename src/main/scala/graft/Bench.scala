package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one warm-up pass then median of 3 timed runs per query
  * (round-2 showed 2x run-to-run noise at n=1, which would swamp any real
  * regression signal). A failed query is reported with time = -1.0 so a
  * crash can never masquerade as a fast run; the exception goes to stderr.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t =
        try {
          runOnce(fn) // warm-up: JIT + codegen + file-listing caches
          val times = Seq.fill(3)(runOnce(fn)).sorted
          times(1) // median
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e")
            -1.0
        }
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
