package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for `local[32]` testing but designed for a multi-executor
  * cluster: AQE is enabled (runtime coalescing + skew-join splitting),
  * shuffle partitions default to the local core count (on a real
  * cluster this should be 2-3x total executor cores), and the session
  * time zone is pinned to UTC — the reference stamps UTC at ingest
  * (`/root/reference/src/collector/main.py:90`) and the DuckDB oracle
  * compares in UTC.
  */
object GraftSession {

  /** Engine configuration applied to every session (batch, bench,
    * verify, tests). Kept in one place so all entry points agree.
    *
    * @param defaultCores shuffle-width default when SPARK_GRAFT_CPUS
    *        is unset — [[local]] passes its core count through so a
    *        `local(4)` session actually gets 4 shuffle partitions as
    *        the scaladoc promises, not a hardcoded 32 (8× task fan-out
    *        per shuffle on a 4-core run).
    */
  def configure(b: SparkSession.Builder,
      defaultCores: Int = 32): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCores.toString))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // The driver's events table carries parquet TIMESTAMP(NANOS), which
    // Spark has no native type for: read the raw int64 and let
    // Tables.events truncate to microseconds (matching DuckDB's
    // ns -> us truncation on read).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Driver-generated timestamps are naive parquet TIMESTAMP(MICROS)
    // meaning UTC instants (the reference stamps UTC at ingest). Read
    // them as session-TZ TIMESTAMP — not TIMESTAMP_NTZ — so every
    // instant-based operation (unix_micros, watermarks, stream-batch
    // joins) type-checks, and Spark/DuckDB agree on rendered values
    // under the pinned UTC session.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.ui.enabled", "false")

  def local(cores: Int = 32): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"),
      defaultCores = cores
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.registerOn(spark)
    spark
  }

  /** Apply the dynamic subset of the engine confs to an
    * externally-created session (the driver's Verify/Bench sessions).
    */
  def prepare(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // env override for the persisted-artifact root (the cold-series
    // harness points each rep at a fresh dir; `run / fork := true`
    // means a -D on the sbt JVM never reaches the session, so the env
    // var is the contract — same style as SPARK_GRAFT_SF_DIR/CPUS)
    sys.env.get("SPARK_GRAFT_PERSISTED_ROOT").foreach(r =>
      spark.conf.set("spark.graft.persisted.root", r))
    graft.plans.GraftExtensions.registerOn(spark)
    spark
  }
}
