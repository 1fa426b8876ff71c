package graft

import org.apache.spark.sql.SparkSession

/** The session factory a deployment uses: one place owning the configs
  * that make the engine behave at scale, so every entry point (Verify,
  * Bench, Smoke, user code) runs the same tuned session with the
  * graft_* SQL functions registered.
  *
  * Config rationale (cluster-sized reasoning, validated on local[N]):
  *  - AQE on with coalescing + skew-join split: runtime re-planning is
  *    the first line of defense at 100 TB (stats are always stale).
  *  - shuffle.partitions sized to the parallelism here; on a real
  *    cluster leave AQE's coalescing to shrink from a high initial.
  *  - maxPartitionBytes 128m: scan tasks sized so a row-group per task
  *    fits executor memory with room for the shuffle writer.
  *  - autoBroadcastJoinThreshold 32m: dimensions broadcast; fact-fact
  *    joins shuffle (never silently nested-loop — see the banded
  *    range-join / as-of operators for the inequality cases).
  *  - UTC session timezone: timestamp arithmetic must not depend on
  *    cluster locale (and the DuckDB oracles compare in UTC). */
object Sessions {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.autoBroadcastJoinThreshold", "33554432")
      .config("spark.sql.session.timeZone", "UTC")
      // bounded literal-probe fetches (lex postings In(t, …), slot
      // gather In(cell, …)) must reach parquet as MEMBERSHIP
      // predicates: past the default threshold (10) Spark degrades an
      // In to a [min, max] range filter, whose row-group pruning is
      // near-useless for a probe spanning the key space. The probe
      // unions these plans collect are bounded by construction
      // (query terms; nq·T·np cells), so raising the cap keeps the
      // executed pruning equal to the per-value rule the
      // lex_prune/slot_gather_prune families measure.
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      // events.ts is parquet TIMESTAMP(NANOS); read as raw long once,
      // session-wide, instead of mutating conf inside a reader.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  /** Build + post-create registration (covers getOrCreate returning a
    * pre-existing session, where builder extensions don't apply). */
  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s)
    s
  }

  /** Label every job `f` submits (optimization-guide §1.5: a program
    * that runs many actions per query is unreadable in the UI / job
    * listeners without descriptions). Thread-local, saved and restored
    * so nested labels and caller labels survive. */
  def labeled[T](s: SparkSession, desc: String)(f: => T): T = {
    val key = "spark.job.description"
    val prev = s.sparkContext.getLocalProperty(key)
    s.sparkContext.setJobDescription(desc)
    try f finally s.sparkContext.setJobDescription(prev)
  }
}
