package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{DailyRollup, Incremental, LatestPerKey, MergeWriter, StageExtract}
import graft.quality.Checks

/** The full medallion pipeline as an ordered layer DAG — the engine's
  * replacement for the reference's Airflow task chain + dbt ref()
  * graph (SURVEY §2.12 O1/O2): bronze → stg → {int, dwh}, each layer a
  * pure transform + a keyed merge materialization, with the stg layer
  * incrementally filtered by the high-watermark of its own target
  * (SURVEY F2) and quality checks after the build (O1's test stage).
  *
  * Layer writes are parquet merges ([[MergeWriter]]); re-running the
  * pipeline over the same input is a no-op (replay idempotence — the
  * property the reference gets from `ON CONFLICT` upserts).
  */
object Medallion {

  /** Run every layer over the events table, materializing under
    * `root`; returns the dwh daily mart.
    *
    * @param cfg deployment knobs (the reference's env_var surface):
    *            `DBT_SCHEMA` names the warehouse layer directory, as
    *            in the reference's schema config.
    */
  def run(spark: SparkSession, dir: String, root: String,
      cfg: graft.Config = graft.Config()): DataFrame = {
    val bronze = Tables.events(spark, dir)

    // stg: typed extraction + incremental high-watermark vs own target.
    // The merge is PARTITIONED by day: an unpartitioned keyed upsert is
    // a full-table rewrite per run — O(|stg|) per batch, the term that
    // would turn the flat per-batch steady state superlinear once stg
    // is years deep. Partitioned on day, each batch reads and rewrites
    // only the day partitions it touches (O(batch)); the empty-update
    // path short-circuits inside upsertPartitioned, so a no-op replay
    // rewrites nothing.
    //
    // KEY CONTRACT: partitioning day-scopes the natural key — stg is
    // keyed by (day, event_id), the standard lakehouse posture for a
    // time-partitioned merge (a partition-pruned MERGE condition).
    // At-least-once replays carry the identical row (same ts ⇒ same
    // day) and collapse in place; a same-day corrected re-emission
    // resolves latest-wins. A re-emission whose corrected ts CROSSES a
    // day boundary is outside the key contract (its watermark-passing
    // ts lands it on the current day while the original stays put) —
    // the full-table uniqueness AUDIT for that class lives in the dq
    // query family as a scheduled maintenance check, while the
    // in-pipeline gate below checks the touched slice at O(batch).
    val stgDir = s"$root/stg_events"
    // High watermark = max ts of the LAST day partition (the dir
    // listing names the max day; one partition is scanned, not the
    // table) — max(ts) over day=to_date(ts) partitions always lives in
    // the max-day dir. The 1-row head() is metadata-bounded, same
    // class as the layer-watermark sidecars below.
    val stgWm: Option[Long] =
      if (!MergeWriter.exists(spark, stgDir)) None
      else MergeWriter.maxDayPartition(spark, stgDir, "day").flatMap { d =>
        val r = spark.read.parquet(stgDir)
          .filter(col("day") === lit(d))
          .agg(max(unix_micros(col("ts")))).head()
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      }
    // observe: per-layer row metrics surface on the QueryExecution
    // listener bus without a second scan (SURVEY A4's affected-row
    // counts, done the Spark way). The watermark predicate sits on the
    // bare bronze ts column → parquet row-group stats skip
    // already-landed files (F2 semantics — strict `>`, COALESCE-on-
    // empty preserved by the None branch admitting every row).
    val stgInc = stgWm match {
      case None => bronze
      case Some(v) => bronze.filter(col("ts") > timestamp_micros(lit(v)))
    }
    val stg = stgInc
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"),
        StageExtract.jsonField(col("props"), "$.k").cast("int").as("k"))
      .withColumn("day", to_date(col("ts")))
      .observe("stg_metrics", count(lit(1)).as("rows_in"),
        count(when(col("k").isNull, 1)).as("null_k"))
    MergeWriter.upsertPartitioned(spark, stgDir, stg,
      keys = Seq("event_id"), versionCols = Seq("ts"), partCol = "day")
    // an empty-source FIRST build materializes nothing (the fresh-empty
    // merge is a deliberate no-write); downstream sees a typed empty
    val stgOut =
      if (MergeWriter.exists(spark, stgDir)) spark.read.parquet(stgDir)
      else stg.limit(0)

    // Downstream layers scope incrementally from stg rows above their
    // OWN durable watermark (a 1-row sidecar recording the max stg ts
    // the layer has incorporated) — NEVER from this run's pre-merge
    // increment: stg's watermark advances when its merge commits, so a
    // crash between the stg merge and a downstream merge would hide
    // the missed rows from every later run's increment and leave the
    // layer stale FOREVER. With per-layer watermarks the next run sees
    // exactly the unincorporated rows (watermark written AFTER the
    // layer commits; a crash in between only re-processes, and the
    // keyed merges are idempotent). A missing sidecar (first build, or
    // crash before the first write) scopes to the full stg table —
    // self-healing by construction.
    // A sidecar that exists but holds no usable watermark (torn or
    // unparseable — a partial/corrupt write) degrades to the same
    // self-healing full rebuild as a missing sidecar, never an NPE.
    // The sidecar is ONE value of layer metadata, so it is read and
    // written by the DRIVER through the Hadoop FS (temp + atomic
    // rename), the way Spark's own streaming commit logs are — the
    // earlier 1-row-parquet form paid a whole Spark job per sidecar
    // write and another per read, pure per-run fixed cost (the same
    // shape r21 removed from the shard-append manifest).
    def layerWm(wmDir: String): Option[Long] = {
      val p = new org.apache.hadoop.fs.Path(wmDir)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!f.exists(p)) None
      // a DIRECTORY at the sidecar path is the pre-r21 1-row-parquet
      // form (a root built by an older engine version): degrade to the
      // self-healing full rebuild, which rewrites the sidecar as a file
      else if (f.getFileStatus(p).isDirectory) None
      else {
        val in = f.open(p)
        val body =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        body.trim match {
          case s if s.matches("""\{"wm":-?\d+\}""") =>
            Some(s.stripPrefix("""{"wm":""").stripSuffix("}").toLong)
          case _ => None // torn/corrupt → self-healing full rebuild
        }
      }
    }
    def writeLayerWm(wmDir: String, v: Long): Unit = {
      val p = new org.apache.hadoop.fs.Path(wmDir)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(
        p.getParent, s".${p.getName}.tmp")
      val out = f.create(tmp, true)
      try out.write(s"""{"wm":$v}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      f.delete(p, true) // recursive: may be a pre-r21 parquet-dir sidecar
      if (!f.rename(tmp, p))
        throw new java.io.IOException(s"watermark sidecar swap failed: $p")
    }
    // the watermark compare is phrased on the raw ts column (against a
    // foldable timestamp_micros literal), NOT as unix_micros(ts) > v:
    // a predicate on the bare column reaches the parquet scan and
    // row-group min/max stats skip every already-incorporated file —
    // the difference between "per-batch cost ∝ batch" and "per-batch
    // cost ∝ corpus" once the stg table is years deep. The companion
    // day >= date(wm) predicate hits the PARTITION layer: incorporated
    // day directories are never even listed into the plan.
    def pendingFor(wm: Option[Long]): DataFrame = wm match {
      case None => stgOut
      case Some(v) => stgOut
        .filter(col("day") >= to_date(timestamp_micros(lit(v))))
        .filter(col("ts") > timestamp_micros(lit(v)))
    }

    // int: latest state per key, merged on the key (20-row dimension
    // in the reference; |users| here). Incremental scope: latest-per-
    // key is DECOMPOSABLE — latest(history ∪ batch) = latest(latest
    // (history), latest(batch)) under the same total order — and the
    // keyed upsert's own LatestPerKey merge on (ts, event_id) computes
    // exactly that outer step against the target's existing row. So an
    // incremental run reduces ONLY the pending rows and never rejoins
    // or rescans stg history: per-batch cost ∝ batch. (An earlier
    // shape semi-joined stg back to the pending users — O(|stg|) scan
    // + shuffle per batch, superlinear in corpus on the steady state.)
    val intDir = s"$root/int_latest"
    val intWmDir = s"$root/int_latest_wm"
    val intWm = if (!MergeWriter.exists(spark, intDir)) None
      else layerWm(intWmDir)
    if (intWm.isEmpty) {
      // FIRST build: the merge runs unconditionally, and the pending
      // stat is only needed for the sidecar — so its max(ts) rides the
      // merge write itself as an `observe` metric (rows flow through
      // the observation node on the way into LatestPerKey) instead of
      // paying a dedicated full stg scan before the merge. Incremental
      // runs keep the pre-merge head(): it GATES the merge (empty
      // pending = no write at all) and its watermark predicate is
      // row-group-pruned, so it costs ∝ batch, not ∝ corpus.
      val obs = org.apache.spark.sql.Observation()
      val src = stgOut.observe(obs, max(unix_micros(col("ts"))).as("m"))
      MergeWriter.upsert(spark, intDir,
        LatestPerKey(src, Seq("user_id"), Seq("ts", "event_id")),
        keys = Seq("user_id"), versionCols = Seq("ts", "event_id"))
      obs.get.get("m").collect { case v: Long => writeLayerWm(intWmDir, v) }
    } else {
      val intPending = pendingFor(intWm)
      val intStat = intPending
        .agg(max(unix_micros(col("ts"))).as("m"), count(lit(1)).as("n")).head()
      if (intStat.getLong(1) > 0) {
        MergeWriter.upsert(spark, intDir,
          LatestPerKey(intPending, Seq("user_id"), Seq("ts", "event_id")),
          keys = Seq("user_id"), versionCols = Seq("ts", "event_id"))
        if (!intStat.isNullAt(0)) writeLayerWm(intWmDir, intStat.getLong(0))
      }
    }

    // dwh: daily mart merged on the surrogate key, PARTITIONED by day —
    // merges rewrite only touched date partitions and date-range reads
    // prune (the 100 TB layout; mirrors the reference's observed_date
    // incremental filter, SURVEY §4 partition-pruning row).
    // INCREMENTAL rebuild scope: only the days carrying unincorporated
    // rows are re-aggregated (a day's aggregate needs ALL of that
    // day's stg rows, so the filter is by touched DAY, not by new
    // row); days are non-null by construction (stg rows passed the ts
    // watermark). An empty pending set skips the merge entirely.
    val dwhDir = s"$root/${cfg.schema}_daily"
    val dwhWmDir = s"$root/${cfg.schema}_daily_wm"
    val dwhWm = if (!MergeWriter.exists(spark, dwhDir)) None
      else layerWm(dwhWmDir)
    if (dwhWm.isEmpty) {
      // FIRST build: same observe-instead-of-scan shape as the int
      // layer — the rollup consumes stgOut anyway, so the sidecar's
      // max(ts) rides its write action for free.
      val obs = org.apache.spark.sql.Observation()
      val src = stgOut.observe(obs, max(unix_micros(col("ts"))).as("m"))
      val daily = DailyRollup(src, key = "user_id", tsCol = "ts",
        metrics = Seq(
          round(avg(col("value")), 4).as("avg_value"),
          max(col("value")).as("max_value"),
          min(col("value")).as("min_value"),
          count(lit(1)).as("n_events")))
      MergeWriter.upsertPartitioned(spark, dwhDir, daily,
        keys = Seq("user_id_date"), versionCols = Seq("n_events"),
        partCol = "day")
      obs.get.get("m").collect { case v: Long => writeLayerWm(dwhWmDir, v) }
    } else {
      val dwhPending = pendingFor(dwhWm)
      val dwhStat = dwhPending
        .agg(max(unix_micros(col("ts"))).as("m"), count(lit(1)).as("n")).head()
      if (dwhStat.getLong(1) > 0) {
        // driver-side day values: bounded by the CALENDAR (one value
        // per day carrying unincorporated rows — with in-order
        // arrival, the days of this batch), never by data volume.
        // The cap turns a mis-keyed source (e.g. a per-row value
        // leaking into the day column) into a loud failure instead
        // of a driver OOM. `day` is stg's PARTITION column, so the
        // distinct is metadata-cheap and the isin filter prunes at
        // the directory-listing layer — untouched days never enter
        // the plan.
        val touchedDays = MergeWriter.boundedPartitionValues(
            dwhPending.select(col("day")), "day")
        val dailySrc = stgOut.filter(col("day").isInCollection(touchedDays))
        val daily = DailyRollup(dailySrc, key = "user_id", tsCol = "ts",
          metrics = Seq(
            round(avg(col("value")), 4).as("avg_value"),
            max(col("value")).as("max_value"),
            min(col("value")).as("min_value"),
            count(lit(1)).as("n_events")))
        MergeWriter.upsertPartitioned(spark, dwhDir, daily,
          keys = Seq("user_id_date"), versionCols = Seq("n_events"),
          partCol = "day")
        if (!dwhStat.isNullAt(0)) writeLayerWm(dwhWmDir, dwhStat.getLong(0))
      }
    }
    // schema-bearing empty when the empty-source first build wrote
    // nothing (mirrors the stgOut guard)
    val dwhOut =
      if (MergeWriter.exists(spark, dwhDir)) spark.read.parquet(dwhDir)
      else DailyRollup(stgOut.limit(0), key = "user_id", tsCol = "ts",
        metrics = Seq(
          round(avg(col("value")), 4).as("avg_value"),
          max(col("value")).as("max_value"),
          min(col("value")).as("min_value"),
          count(lit(1)).as("n_events")))

    // Post-build quality gate (SURVEY §2.10 applied to own layers),
    // SCOPED to what this run could have changed: partitions untouched
    // by a merge are byte-immutable, so a slice that passed its gate
    // stays passed — induction gives per-day validity over the whole
    // table at O(batch) per run instead of O(corpus). First build
    // (no watermark) checks everything. The one hole day-scoping
    // leaves — a replayed event whose corrected ts crosses a day
    // boundary, landing as a cross-PARTITION duplicate event_id this
    // gate cannot see — is owned by the dq family's scheduled
    // full-table audit, `OpsQueries.dqStgCrossdayAudit` (oracle-gated
    // as `dq_stg_crossday_audit`), which reports duplicate keys
    // across day partitions with their latest-wins repair target.
    // whole touched PARTITIONS, not just new rows: the boundary day is
    // partially pre-existing and its post-merge state is what needs
    // re-validating (still directory-pruned — the recent tail)
    val stgChecked = stgWm match {
      case None => stgOut
      case Some(v) =>
        stgOut.filter(col("day") >= to_date(timestamp_micros(lit(v))))
    }
    val dwhChecked = dwhWm match {
      case None => dwhOut
      case Some(v) =>
        dwhOut.filter(col("day") >= to_date(timestamp_micros(lit(v))))
    }
    Checks.enforce(Seq(
      Checks.notNull(stgChecked, "event_id", "stg_event_id_not_null"),
      Checks.unique(stgChecked, "event_id", "stg_event_id_unique"),
      Checks.unique(dwhChecked, "user_id_date", "dwh_key_unique")))

    dwhOut
  }
}
