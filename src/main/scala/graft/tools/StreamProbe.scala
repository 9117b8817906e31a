package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Drain-cost autopsy for the gated streaming queries (r7 verdict item #3:
  * q_stream_lsh_candidates cost 22.9s for ~6 jobs on a healthy host —
  * find out where the time goes and whether a trigger/partitioning config
  * removes it).
  *
  * Runs a gate-shaped streaming query at the given SF with per-micro-batch
  * progress reporting: batch count, per-batch duration, state-store rows,
  * and the add/commit/total times Structured Streaming tracks per stateful
  * operator. Variants are selected by args so A/B runs are separate JVMs
  * (fair cold-ish comparison, no shared state-store caches).
  *
  * Usage: runMain graft.tools.StreamProbe <sfDir> <variant>
  *   variant: lsh | lsh8 (8 shuffle partitions) | sessions | sessions8
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val variant = if (args.length > 1) args(1) else "lsh"
    val parts = if (variant.endsWith("8")) "8" else "32"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stream(name: String): DataFrame = graft.StreamTables(spark, sfDir, name)

    val df: DataFrame = variant.stripSuffix("8") match {
      case "lsh" =>
        graft.streaming.GraphStream.streamingLshCandidatesWatermarked(
          stream("documents").withColumn("ts",
            timestamp_seconds(lit(1704067200L) + col("doc_id") % 7200)),
          n = 3, bands = 4, rowsPerBand = 2, delay = "4 hours")
      case "lshr" =>
        // repartition BEFORE the signature projection: the streaming file
        // source yields one partition per file, so without it the whole
        // shingle+minhash compute runs in a single task
        graft.streaming.GraphStream.streamingLshCandidatesWatermarked(
          stream("documents").repartition(32).withColumn("ts",
            timestamp_seconds(lit(1704067200L) + col("doc_id") % 7200)),
          n = 3, bands = 4, rowsPerBand = 2, delay = "4 hours")
      case "sessions" =>
        graft.streaming.GraphStream.streamingSessionStats(
          stream("events").withColumn("ts", col("ts").cast("timestamp")),
          gapSeconds = 14400L, watermark = "0 seconds")
      case other => sys.error(s"unknown variant $other")
    }

    val t0 = System.nanoTime()
    val qn = "probe_sink"
    // lsh variants need the two start-time confs; the wrapper save/restores
    val sq = graft.streaming.GraphStream.withLshStreamingConfs(spark) {
      val q = df.writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
    val total = (System.nanoTime() - t0) / 1e9
    val n = spark.table(qn).count()
    println(f"[probe] variant=$variant parts=$parts total=$total%.1fs rows=$n")
    sq.recentProgress.foreach { p =>
      val states = Option(p.stateOperators).map(_.toSeq).getOrElse(Seq.empty)
      val stateStr = states.map { s =>
        s"op=${s.operatorName} rows=${s.numRowsTotal} " +
          s"add=${s.allUpdatesTimeMs}ms rem=${s.allRemovalsTimeMs}ms commit=${s.commitTimeMs}ms"
      }.mkString(" | ")
      println(f"[probe] batch=${p.batchId} dur=${p.batchDuration}ms " +
        f"in=${p.numInputRows} $stateStr")
    }
    spark.stop()
  }
}
