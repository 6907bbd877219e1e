package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Entry helpers shared by the engine: session construction tuned for the
  * harness (local[32], 32 shuffle partitions, AQE on) and table access.
  *
  * Scale notes (100 TB target): every knob here is also correct on a real
  * cluster — AQE handles skew/coalescing at runtime, shuffle partitions are
  * overridden by AQE's coalescing, and broadcast threshold stays default so
  * dimension tables (region/nation/supplier/part at TPC-H ratios) broadcast.
  */
object Graft {

  /** Build a session with graft extensions (SQL function registration). */
  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // shuffle-writer threshold back at the Spark default — the r21 forced
      // sort writer (=1) regressed q02/q03 in the driver's ground-truth
      // bench (see Bench.scala)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("GRAFT_BYPASS_THRESHOLD", "200"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registerFunctions(spark)
    spark
  }

  // Sessions already configured (functions registered + confs set). Weak keys
  // so stopped sessions don't leak; guards the per-query registerFunctions
  // calls from SparkEntry so repeated invocation is a no-op (no
  // SimpleFunctionRegistry replace-WARN storms in driver logs).
  private val configured =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register graft's custom Catalyst expressions as SQL functions on an
    * existing session and set session confs the engine relies on. Idempotent
    * per session. Call on any externally-built session (e.g. the driver's
    * Verify/Bench sessions). */
  def registerFunctions(spark: SparkSession): Unit =
    if (configured.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      graft.expr.GraftFunctions.registerAll(spark)
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
      // default — read as long nanos (converted in table()).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }

  /** Spread a CPU-heavy per-row stage across all cores when the upstream
    * scan cannot: the harness fixtures are single-row-group parquet files,
    * which plan as ONE scan task regardless of `maxPartitionBytes` or core
    * count, serializing every downstream computation (guide §2 — make
    * partitioning scale-adaptive, not a constant). No-op when the input
    * already has at least default-parallelism partitions, so on a real
    * cluster (where a big scan yields many splits) this never adds a
    * shuffle. Row order is NOT preserved; callers must be order-insensitive
    * (rank with deterministic tie-breaks, min/max/count, per-row kernels).
    */
  def widen(df: DataFrame): DataFrame = {
    if (df.sparkSession.conf.get("graft.widen.enabled", "true") == "false") return df
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /** Read one harness table (TESTDATA.md layout: `<dir>/<name>.parquet`).
    * `events.ts` is TIMESTAMP(NANOS) parquet — read as long nanos and
    * floor-convert to microseconds (identical to DuckDB's ns->us handling
    * for positive epochs). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    registerFunctions(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
        d.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.floor(org.apache.spark.sql.functions.col("ts") / 1000L).cast("long")))
      else d
    }
  }
}
