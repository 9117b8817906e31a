package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch probe for the q_ecg exact-gate design: levels taken by the
  * final two-level Louvain over the integral vote-reweighted supplier
  * graph, and the resulting modularity — the budgets the gate asserts
  * and the oracle unrolls. Usage: EcgProbe <sfDir>. */
object EcgProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.Fixtures.supplierGraph(spark, dir)
    val votes = graft.algos.Community.ecgVotes(g, ensembleSize = 4)
    val rw = graft.algos.Community.ecgReweight(votes, ensembleSize = 4)
    val g2 = graft.core.PropertyGraph(
      graft.core.Structure.extractVertexList(rw), rw,
      g.props.copy(weighted = true, directed = false))
    val (labels, q, levels) =
      graft.algos.Community.louvainWithLevels(g2, maxLevel = 2, maxIter = 8)
    val nComm = labels.select("louvain").distinct().count()
    println(s"[ecgprobe] dir=$dir levels=$levels q=$q nComm=$nComm rows=${labels.count()}")
    spark.stop()
  }
}
