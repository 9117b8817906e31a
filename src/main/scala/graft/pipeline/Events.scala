package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table: sessionization — the
  * canonical gaps-and-islands computation every behavioral dataset runs
  * before anything else. Batch form here (one window per user, so
  * parallelism scales with the user count and there is never a global
  * sort); the Structured-Streaming cousin of the same semantics is
  * `session_window` / `flatMapGroupsWithState` (see graft.streaming).
  */
object Events {

  /** Assign each event a per-user session: a session breaks when the gap
    * to the previous event exceeds `gapSeconds`. Timestamps compare in
    * exact epoch microseconds (no sub-second float drift across engines).
    * Output (event_id, user_id, ts_us, session_id 1-based, value). */
  def sessionize(events: DataFrame, gapSeconds: Long,
                 userCol: String = "user_id", tsCol: String = "ts",
                 idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col("ts_us"), col(idCol))
    events
      // parquet TIMESTAMP_NTZ → session-UTC timestamp → exact epoch micros
      // (matches DuckDB's epoch_us over the same naive values)
      .select(col(idCol), col(userCol),
        unix_micros(col(tsCol).cast("timestamp")).as("ts_us"), col("value"))
      .withColumn("new_s",
        when(lag(col("ts_us"), 1).over(w).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(w) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(idCol), col(userCol), col("ts_us"), col("session_id"), col("value"))
  }

  private def withUs(events: DataFrame, tsCol: String): DataFrame =
    events.withColumn("ts_us", unix_micros(col(tsCol).cast("timestamp")))

  /** Strict-order funnel: for each user, the first `steps(0)` event, the
    * first `steps(1)` event strictly after it, and so on. Each step is one
    * user-keyed hash agg + one join — never a per-user sort or a
    * sequence-explode, so a billion-user funnel costs steps × (agg+join).
    * Output (user_id, t_<step>... epoch µs nullable, stage = #steps
    * completed). */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    val e = withUs(events, tsCol)
      .select(col(userCol), col(typeCol).as("et"), col("ts_us"))
    val users = e.select(col(userCol)).distinct()
    val start = users.withColumn("t_prev", lit(Long.MinValue))
    val done = steps.zipWithIndex.foldLeft(start) { case (cur, (step, i)) =>
      val hit = e.filter(col("et") === step)
        .join(cur.select(col(userCol), col("t_prev")), userCol)
        .filter(col("ts_us") > col("t_prev"))
        .groupBy(userCol).agg(min("ts_us").as(s"t_$step"))
      cur.drop("t_prev").join(hit, Seq(userCol), "left")
        .withColumn("t_prev",
          coalesce(col(s"t_$step"), lit(Long.MaxValue)))
    }
    val stage = steps.map(s => when(col(s"t_$s").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    done.drop("t_prev").withColumn("stage", stage.cast("long"))
  }

  /** Weekly retention cohorts: cohort = the user's first-activity week
    * (epoch-µs integer division — engine-exact), one row per
    * (cohort_week, week_offset) with the distinct-user count. Two hash
    * aggs + one join, all user-keyed. */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val e = withUs(events, tsCol)
      .select(col(userCol), expr(s"ts_us div $weekUs").as("week"))
      .distinct()
    val cohort = e.groupBy(userCol).agg(min("week").as("cohort_week"))
    e.join(cohort, userCol)
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(userCol).as("n_users"))
  }

  /** Session-level rollup of [[sessionize]]: event count, bounds, and the
    * summed event value per (user, session). One additional hash agg.
    * Output (user_id, session_id, n_events, start_us, end_us, sum_value). */
  def sessionStats(events: DataFrame, gapSeconds: Long,
                   userCol: String = "user_id", tsCol: String = "ts",
                   idCol: String = "event_id"): DataFrame =
    sessionize(events, gapSeconds, userCol, tsCol, idCol)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        round(sum("value"), 6).as("sum_value"))
}
