package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures graft.Bench.calibrationProbe N times on this host — used to pin
  * Bench.CalibNominalSec (the divisor behind the bench artifact's
  * host_index field). Usage: CalibProbe [reps] [cpus]. */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val times = (1 to reps).map { i =>
      val t = graft.Bench.calibrationProbe(spark)
      val tj = graft.Bench.jobFloorProbe(spark)
      val tp = graft.Bench.planFloorProbe(spark)
      println(f"[calib] rep $i t=$t%.2fs jobs=$tj%.2fs plan=$tp%.2fs")
      (t, tj, tp)
    }
    val sorted = times.map(_._1).sorted
    val sortedJ = times.map(_._2).sorted
    val sortedP = times.map(_._3).sorted
    println(f"[calib] median=${sorted(sorted.length / 2)}%.2fs min=${sorted.head}%.2fs" +
      f" jobs_median=${sortedJ(sortedJ.length / 2)}%.2fs jobs_min=${sortedJ.head}%.2fs" +
      f" plan_median=${sortedP(sortedP.length / 2)}%.2fs plan_min=${sortedP.head}%.2fs")
    spark.stop()
  }
}
