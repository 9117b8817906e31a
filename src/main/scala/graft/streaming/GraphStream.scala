package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.Gr._

/** Structured-Streaming ingestion for dynamic graphs.
  *
  * The reference has NO streaming surface (SURVEY §2.9) — its only dynamic-
  * graph artifact is an unused experimental slab allocator
  * (`cpp/include/cugraph/dynamic/`). This module is the documented
  * EXTENSION: an append-only edge stream feeding (a) watermarked windowed
  * degree aggregates and (b) stateful incremental per-vertex degree/
  * neighbor summaries via `mapGroupsWithState` — the two canonical
  * Structured Streaming shapes (windowed agg; keyed state). Full
  * algorithms re-run as periodic batch jobs over the accumulated edge
  * table (micro-batch snapshot pattern), which is the honest cost model at
  * 100 TB: incremental graph algorithms shuffle the same data a stream
  * would.
  */
object GraphStream {

  /** File-backed append-only edge stream: every new parquet file under
    * `path` becomes a micro-batch of edges (src, dst, weight, event_time). */
  def edgeFileStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema("src LONG, dst LONG, weight DOUBLE, event_time TIMESTAMP")
      .parquet(path)

  /** Sliding-window degree counts with a watermark: the streaming analogue
    * of `Structure.degrees`. One shuffle per micro-batch; late edges beyond
    * the watermark are dropped, state is bounded by (#windows × V). */
  def windowedDegrees(edges: DataFrame, windowDur: String = "10 minutes",
                      slideDur: String = "5 minutes",
                      watermark: String = "15 minutes"): DataFrame = {
    val wm = edges.withWatermark("event_time", watermark)
    val out = wm.select(col("event_time"), col(SRC).as(ID))
      .union(wm.select(col("event_time"), col(DST).as(ID)))
    out.groupBy(window(col("event_time"), windowDur, slideDur), col(ID))
      .agg(count(lit(1)).as("degree"))
      .select(col("window.start").as("window_start"), col(ID), col("degree"))
  }

  /** Per-vertex running summary maintained with keyed state: total degree,
    * weight sum, min/max neighbor — `mapGroupsWithState` over the incoming
    * edge stream keyed by source vertex (reference capability analogue:
    * incremental property maintenance on a dynamic graph). */
  final case class EdgeEvent(src: Long, dst: Long, weight: Double)
  final case class VertexSummary(id: Long, degree: Long, weightSum: Double,
                                 minNbr: Long, maxNbr: Long)

  def runningVertexSummary(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val typed = edges.select(col(SRC), col(DST), col(WEIGHT)).as[EdgeEvent]
    typed.groupByKey(_.src)
      .mapGroupsWithState[VertexSummary, VertexSummary](GroupStateTimeout.NoTimeout) {
        (id: Long, events: Iterator[EdgeEvent], state: GroupState[VertexSummary]) =>
          val prev = state.getOption.getOrElse(
            VertexSummary(id, 0L, 0.0, Long.MaxValue, Long.MinValue))
          val next = events.foldLeft(prev) { (s, e) =>
            VertexSummary(id, s.degree + 1, s.weightSum + e.weight,
              math.min(s.minNbr, e.dst), math.max(s.maxNbr, e.dst))
          }
          state.update(next)
          next
      }.toDF()
  }

  /** Snapshot pattern: periodically materialize the accumulated edge table
    * and run any batch algorithm over it (the documented dynamic-graph
    * story — SURVEY §1.4 "incremental graph = streaming sink appending to
    * an edge table + periodic re-run"). */
  def snapshotSink(edges: DataFrame, outPath: String, checkpoint: String,
                   triggerSeconds: Long = 60) =
    edges.writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerSeconds * 1000))
}
