package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch probe for the q_leiden exact-gate design: how many levels does
  * two-level Louvain actually take on the supplier graph at maxIter=5,
  * how many WCC rounds does the refinement need, and where does the
  * modularity land — the budgets the gate asserts and the oracle unrolls.
  * Usage: LeidenProbe <sfDir>. */
object LeidenProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.Fixtures.supplierGraph(spark, dir)
    val (labels, q, levels) =
      graft.algos.Community.louvainWithLevels(g, maxLevel = 2, maxIter = 5)
    val (refined, wr) = graft.algos.Community.leidenRefine(g, labels, "louvain")
    val nComm = refined.select("leiden").distinct().count()
    println(s"[leidenprobe] dir=$dir levels=$levels q=$q wccRounds=$wr nComm=$nComm rows=${refined.count()}")
    spark.stop()
  }
}
