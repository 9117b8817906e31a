package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch runner: time a single SparkEntry query. Usage: RunOne <name> <sfDir>. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val n = df.count()
    println(f"[runone] $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.1fs")
    spark.stop()
  }
}
