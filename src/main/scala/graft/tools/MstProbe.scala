package graft.tools
import org.apache.spark.sql.SparkSession
object MstProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.Fixtures.supplierGraphUnd(spark, "/root/testdata/sf0.1")
    for (maxw <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val (mst, rounds) = graft.algos.TreeDag.boruvkaMstWithRounds(g, maximum = maxw)
      val n = mst.count()
      println(f"[mst] maximum=$maxw rows=$n rounds=$rounds t=${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}
