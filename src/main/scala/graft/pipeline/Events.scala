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
