package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{PropertyGraph, Structure, GraphProperties, Gr}
import graft.algos._
import graft.gen.Generators
import graft.prims.Mat._

/** RMAT benchmark harness — the reference workload shape
  * (`benchmarks/cugraph/pytest-based/bench_algos.py`: RMAT scale/edgefactor
  * graphs; Graph500 TTEPS metric `mg_graph500_bfs_test.cu:757`).
  *
  * Usage: RmatBench [scale] [edgefactor] [cpus]. Generates the RMAT graph
  * (a=.57,b=.19,c=.19, seed 42), builds the simple undirected graph, then
  * times one call per algorithm; BFS/SSSP also report TEPS (traversed
  * edges per second). Prints one JSON line.
  */
object RmatBench {
  import Gr._

  def main(args: Array[String]): Unit = {
    val scale = if (args.length > 0) args(0).toInt else 16
    val edgefactor = if (args.length > 1) args(1).toInt else 16
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val numEdges = (1L << scale) * edgefactor
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // graph construction (timed, like the reference's create_graph bench)
    val (g, tBuild) = time {
      val raw = Generators.rmat(spark, scale, numEdges, fastHash = true)
        .select(SRC, DST)
      val und = Structure.canonicalize(raw).withColumn(WEIGHT, lit(1.0)).mat
      val sym = Structure.symmetrize(und).mat
      val verts = Structure.extractVertexList(und).mat
      PropertyGraph(verts, sym, GraphProperties(directed = false, weighted = true))
    }
    val nV = g.numVertices
    val nE = g.edges.count() / 2

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results += "create_graph" -> tBuild

    val src = g.vertices.agg(min(ID)).first().getLong(0)
    val (bfsRes, tBfs) = time { Traversal.bfs(g, src).count() }
    results += "bfs" -> tBfs
    val (_, tSssp) = time { Traversal.sssp(g, src).count() }
    results += "sssp" -> tSssp
    val (_, tPr) = time { PageRank.runFixed(g, iters = 10).count() }
    results += "pagerank" -> tPr
    val (_, tWcc) = time { Components.wcc(g).count() }
    results += "wcc" -> tWcc
    val (_, tTri) = time { Triangles.countPerVertex(g).count() }
    results += "triangle_count" -> tTri
    val (_, tKatz) = time { Centrality.katz(g, alpha = 0.005, maxIter = 10, tol = -1).count() }
    results += "katz" -> tKatz
    val (_, tLv) = time { Community.louvain(g, maxLevel = 1, maxIter = 3)._1.count() }
    results += "louvain" -> tLv

    // TEPS: edges traversed (≈ edges incident to reached vertices ≈ 2E for
    // a mostly-connected RMAT graph) / time, Graph500-style.
    val reached = bfsRes
    val teps = 2.0 * nE / tBfs
    val tepsSssp = 2.0 * nE / tSssp

    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"rmat","scale":$scale,"edgefactor":$edgefactor,"vertices":$nV,"edges":$nE,"reached":$reached,"bfs_teps":$teps,"sssp_teps":$tepsSssp,"queries":$qs}""")
    spark.stop()
  }
}
