package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-provided parquet tables
  * (`/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`, see TESTDATA.md).
  *
  * Columns are selected lazily by Catalyst; a plain parquet scan here
  * still gets column pruning + predicate pushdown from the final plan,
  * so no per-table schema declaration is needed (parquet footers carry
  * the schema).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects outright — the legacy conf reads
    * it as a nanosecond LONG instead, and we rebuild a microsecond
    * timestamp with integer division (`div`, not `/`: double division
    * loses precision above 2^53 ns). NOTE `div` truncates toward zero,
    * which equals the DuckDB CAST(ts AS TIMESTAMP) truncation only for
    * ts >= epoch — the testdata (and any event log) satisfies that;
    * pre-1970 nanos would round the other way by 1µs. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  /** CPU-bound modalities (text shingling/regex, vector math) need
    * scan-stage parallelism even when the input arrives as a handful
    * of small files: parquet splits at row-group granularity, so one
    * single-row-group file = ONE task, and every core but one idles
    * through the expensive narrow maps. When the scan yields fewer
    * partitions than the session's parallelism, round-robin
    * repartition up to it — the shuffle moves only the few small
    * files that triggered the guard, and the explicit partition count
    * is exempt from AQE coalescing so the downstream map really fans
    * out. At scale the guard is false (thousands of splits) and this
    * is a no-op, preserving pushdown-friendly plain scans. Filters
    * and pruning still reach the scan: Catalyst pushes both through a
    * deterministic Repartition. */
  private val scanPartitions =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Integer]()

  private def withMinParallelism(s: SparkSession, df: DataFrame, key: String): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    // df.rdd forces a full analysis + physical-planning pass just to
    // read a partition count; memoize it per (session, path) so the
    // ~30 consumers (several touching the table more than once per
    // query build) pay the planning cost once, not per call
    val parts = scanPartitions.computeIfAbsent(
      (s, key), _ => Integer.valueOf(df.rdd.getNumPartitions))
    if (parts < target) df.repartition(target) else df
  }

  def documents(s: SparkSession, d: String): DataFrame =
    withMinParallelism(s, apply(s, d, "documents"), s"$d/documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    withMinParallelism(s, apply(s, d, "embeddings"), s"$d/embeddings")
}
