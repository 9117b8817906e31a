package graft

import org.apache.spark.sql.functions._
import graft.core.Gr._
import graft.sources.{Convert, Datasets}

/** Interop conversions + dataset registry. */
class SourcesSpec extends SparkSpec {

  test("adjacency list round trip preserves the weighted edge set") {
    val e = wEdgeDF(Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 3L, 2.0)))
    val adj = Convert.toAdjList(e)
      .select(col("id"), col("nbrs.dst").as("ns"), col("nbrs.weight").as("ws"))
    val back = Convert.fromAdjList(adj, idCol = "id", nbrsCol = "ns", wCol = Some("ws"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(back == Set((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 3L, 2.0)))
  }

  test("dense matrix melt keeps only non-zero cells") {
    import spark.implicits._
    val m = Seq((0L, Array(0.0, 1.0, 0.0)), (1L, Array(2.0, 0.0, 3.0)))
      .toDF("id", "row")
    val e = Convert.fromDense(m).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(e == Set((0L, 1L, 1.0), (1L, 0L, 2.0), (1L, 2L, 3.0)))
  }

  test("CSR offsets/indices to COO") {
    import spark.implicits._
    // vertex 0: indices [0,2) = {5,6}; vertex 1: [2,3) = {7}
    val offsets = Seq((0L, 0L, 2L), (1L, 2L, 3L)).toDF("id", "start", "end")
    val indices = Seq((0L, 5L), (1L, 6L), (2L, 7L)).toDF("pos", "dst")
    val e = Convert.fromCsr(offsets, indices).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((0L, 5L), (0L, 6L), (1L, 7L)))
  }

  test("MTX reader drops header+size lines and 1-shifts ids") {
    val dir = java.nio.file.Files.createTempDirectory("mtx").toFile
    val f = new java.io.File(dir, "g.mtx")
    val w = new java.io.PrintWriter(f)
    w.println("%%MatrixMarket matrix coordinate real general")
    w.println("% comment")
    w.println("3 3 2")
    w.println("1 2 5.0")
    w.println("2 3 7.0")
    w.close()
    val e = Convert.readMtx(spark, f.getAbsolutePath).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(e == Set((0L, 1L, 5.0), (1L, 2L, 7.0)))
  }

  test("karate dataset: 34 vertices, 78 canonical edges, 45 triangles") {
    val g = Datasets.getGraph(spark, "karate")
    assert(Datasets.karateEdges.length == 78)
    assert(core.Structure.extractVertexList(Datasets.getEdgelist(spark, "karate")).count() == 34)
    assert(algos.Triangles.countTotal(g) == 45)
  }

  test("karate-disjoint: two components rooted at 0 and 34, sizes 34+34") {
    val g = Datasets.getGraph(spark, "karate-disjoint")
    assert(Datasets.karateDisjointEdges.length == 156)
    val comp = algos.Components.wcc(g)
    val sizes = comp.groupBy("component").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(0L -> 34L, 34L -> 34L))
  }

  test("curated registry: dolphins / polbooks / netscience match published stats") {
    // published counts (reference dataset metadata YAMLs; the YAMLs count
    // both stored directions of the symmetric CSVs, we count canonical pairs)
    assert(Datasets.dolphinsEdges.length == 159)
    assert(Datasets.polbooksEdges.length == 441)
    assert(Datasets.netscienceEdges.length == 2742)
    val d = Datasets.getGraph(spark, "dolphins")
    assert(d.numVertices == 62 && !d.isWeighted && !d.isDirected)
    val p = Datasets.getGraph(spark, "polbooks")
    assert(p.numVertices == 105)
    val n = Datasets.getGraph(spark, "netscience")
    assert(n.numVertices == 1461 && n.isWeighted)
    // Newman 2006 reports the largest netscience component has 379 vertices
    val comp = algos.Components.wcc(n)
    val sizes = comp.groupBy("component").count()
    assert(sizes.agg(org.apache.spark.sql.functions.max("count"))
      .collect()(0).getLong(0) == 379)
    // every registry entry must load and agree with its metadata
    Datasets.registry.foreach { case (name, meta) =>
      val edges = Datasets.getEdgelist(spark, name)
      assert(core.Structure.extractVertexList(edges).count() == meta.vertices, name)
      assert(edges.count() == meta.edges, name)
    }
  }

  test("bundled demo datasets: line diameter, tree DAG depth, toy symmetry") {
    import org.apache.spark.sql.functions._
    // small_line: SSSP from 0 reaches distance 9 (max-diameter path)
    val line = Datasets.getGraph(spark, "small_line")
    val d = algos.Traversal.sssp(line, 0L)
      .agg(max("distance")).collect()(0).getDouble(0)
    assert(d == 9.0)
    // small_tree: a DAG of depth 3 (0 -> {1..4} -> 5 -> {6,7,8})
    val tree = Datasets.getGraph(spark, "small_tree")
    val lv = algos.TreeDag.topologicalLevels(tree)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lv(0L) == 0 && lv(5L) == 2 && lv(8L) == 3)
    // toy_graph stores both directions of toy_graph_undirected
    val toy = Datasets.toyGraphEdges.map(e => (e._1, e._2)).toSet
    assert(Datasets.toyGraphUndirectedEdges
      .forall { case (a, b, _) => toy((a, b)) && toy((b, a)) })
    // karate-asymmetric: 1-based directed storage of the karate club
    val ka = Datasets.getGraph(spark, "karate-asymmetric")
    assert(ka.isDirected && ka.numEdges == 78)
  }
}
