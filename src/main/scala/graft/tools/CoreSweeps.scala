package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch probe: h-index sweep counts on the gated RMAT core fixture. */
object CoreSweeps {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.Fixtures.rmatGraph(spark)
    for (dt <- Seq("bidirectional", "incoming", "outgoing")) {
      val t0 = System.nanoTime()
      val (res, sweeps) = graft.algos.Components.coreNumberHIndex(g, degreeType = dt)
      val n = res.count()
      println(f"[sweeps] $dt rows=$n sweeps=$sweeps t=${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}
