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
}
