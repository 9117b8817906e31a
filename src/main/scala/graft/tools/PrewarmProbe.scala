package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for the r12 parallel fixture prewarm (guide §2.6): times
  * `Fixtures.prewarm` (current code — parallel) or an inline copy of the
  * pre-r12 sequential getter order, in a Bench-shaped session.
  * Usage: tools/run_main.sh graft.tools.PrewarmProbe <sfDir> <cpus> [seq]
  */
object PrewarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val seq = args.length > 2 && args(2) == "seq"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    if (seq) {
      graft.Fixtures.supplierEdges(spark, sfDir); graft.Fixtures.supplierGraphUnd(spark, sfDir)
      graft.Fixtures.custSuppEdges(spark, sfDir); graft.Fixtures.partEdges(spark, sfDir)
      graft.Fixtures.partRepeatEdges(spark, sfDir)
      graft.Fixtures.cyclicSupplierGraph(spark, sfDir)
      graft.Fixtures.supplierSimInter(spark, sfDir); graft.Fixtures.supplierSimDeg(spark, sfDir)
      graft.Fixtures.supplierSimInterW(spark, sfDir); graft.Fixtures.supplierSimDegW(spark, sfDir)
      graft.Fixtures.supplierSimNV(spark, sfDir); graft.Fixtures.supplierSimNVW(spark, sfDir)
      graft.Fixtures.supplierEdgeSupport(spark, sfDir)
      graft.Fixtures.rmatGraph(spark)
    } else graft.Fixtures.prewarm(spark, sfDir)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[prewarm] mode=${if (seq) "seq" else "par"} cpus=$cpus t=$dt%.1fs")
    spark.stop()
  }
}
