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
    val obs = Observation()
    val df = spark.range(1000).toDF("id")
      .observe(obs, sum(when(col("id") % 7 === 0, 1L).otherwise(0L)).as("m"))
    val t0 = System.nanoTime()
    val ck = graft.prims.Iterate.materialize(df)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val got = try Some(Await.result(Future(obs.get), 5.seconds)("m"))
              catch { case _: Throwable => None }
    println(s"[obsprobe] metric=$got ckRows=${ck.count()} t=${(System.nanoTime() - t0) / 1e6}ms")
    spark.stop()
  }
}
