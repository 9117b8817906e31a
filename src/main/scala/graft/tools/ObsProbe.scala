package graft.tools
import org.apache.spark.sql.{SparkSession, Observation}
import org.apache.spark.sql.functions._

/** Probe: do Observation metrics fire on an eager localCheckpoint?
  * Decides whether loop convergence counts can ride the materialization
  * job instead of a separate scan job. */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(1000).toDF("id")
      .observe("probe", sum(when(col("id") % 7 === 0, 1L).otherwise(0L)).as("m"))
    val t0 = System.nanoTime()
    val ck = graft.prims.Iterate.materialize(df)
    // synchronous read off the executed plan's accumulator — no listener bus
    val got = df.queryExecution.observedMetrics.get("probe").map(_.getAs[Any]("m"))
    println(s"[obsprobe] metric=$got ckRows=${ck.count()} t=${(System.nanoTime() - t0) / 1e6}ms")
    // timing loop: 20 materializeCount-style rounds to expose per-round latency
    var cur = ck
    val t1 = System.nanoTime()
    for (i <- 1 to 20) {
      val nx = cur.withColumn("id", col("id") + 1)
        .observe(s"p$i", sum(when(col("id") % 7 === 0, 1L).otherwise(0L)).as("m"))
      cur = graft.prims.Iterate.materialize(nx)
      val v = nx.queryExecution.observedMetrics.get(s"p$i").map(_.getAs[Any]("m"))
      require(v.isDefined, s"round $i metric missing")
    }
    println(f"[obsprobe] 20 rounds sync-read t=${(System.nanoTime() - t1) / 1e6}%.0fms")
    spark.stop()
  }
}
