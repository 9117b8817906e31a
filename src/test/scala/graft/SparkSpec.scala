package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs (one JVM per `sbt test` fork). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark

  def edgeDF(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.toDF(core.Gr.SRC, core.Gr.DST)
  }

  def wEdgeDF(edges: Seq[(Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    edges.toDF(core.Gr.SRC, core.Gr.DST, core.Gr.WEIGHT)
  }

  def graphOf(edges: Seq[(Long, Long)], directed: Boolean = true): core.PropertyGraph =
    core.PropertyGraph(core.Structure.extractVertexList(edgeDF(edges)), edgeDF(edges),
      core.GraphProperties(directed = directed))

  def wGraphOf(edges: Seq[(Long, Long, Double)], directed: Boolean = true): core.PropertyGraph =
    core.PropertyGraph(core.Structure.extractVertexList(wEdgeDF(edges)), wEdgeDF(edges),
      core.GraphProperties(directed = directed, weighted = true))
}
