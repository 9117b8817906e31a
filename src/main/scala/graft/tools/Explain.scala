package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: print the formatted physical plan of selected SparkEntry
  * queries (default: a representative set) so broadcast placement, shuffle
  * count, parquet pushdown, and WholeStageCodegen spans can be reviewed.
  * Usage: Explain <sfDir> [q1,q2,...]. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_degrees", "q_pagerank", "q_jaccard", "q_triangles", "q_neighbor_sample")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
