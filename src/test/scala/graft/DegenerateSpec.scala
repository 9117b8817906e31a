package graft

import org.apache.spark.sql.functions._
import graft.algos._
import graft.core._

/** Degenerate-input behavior: empty edge lists, singleton graphs, and
  * no-match results must return empty/identity frames, not throw — the
  * contract a library user hits first when a filter upstream drains a
  * partition of the corpus. */
class DegenerateSpec extends SparkSpec {

  private def emptyGraph = graphOf(Seq.empty)
  private def singleton = graphOf(Seq((1L, 1L))) // one self-loop vertex

  test("structure ops on an empty graph return empty, not an error") {
    assert(Structure.degrees(emptyGraph).count() == 0)
    assert(Structure.symmetrize(edgeDF(Seq.empty)).count() == 0)
    assert(Structure.twoHopNeighbors(edgeDF(Seq.empty)).count() == 0)
    assert(Structure.extractVertexList(edgeDF(Seq.empty)).count() == 0)
  }

  test("traversal from an isolated vertex settles only the source") {
    val g = graphOf(Seq((2L, 3L))) // source 1 absent from the edge list
    val bfs = Traversal.bfs(g, 1L).collect()
    assert(bfs.length == 1 && bfs.head.getLong(0) == 1L)
    val sssp = Traversal.sssp(wGraphOf(Seq((2L, 3L, 1.0))), 1L).collect()
    assert(sssp.length == 1 && sssp.head.getDouble(1) == 0.0)
  }

  test("components and cores on a singleton self-loop") {
    val wcc = Components.wcc(singleton).collect()
    assert(wcc.length == 1 && wcc.head.getLong(1) == 1L)
    val core = Components.coreNumber(singleton)
    assert(core.count() == 1)
  }

  test("pagerank on a two-vertex graph sums to 1") {
    val g = wGraphOf(Seq((1L, 2L, 1.0), (2L, 1L, 1.0)), directed = false)
    val pr = PageRank.runFixed(g, iters = 5).agg(sum("pagerank")).first().getDouble(0)
    assert(math.abs(pr - 1.0) < 1e-9)
  }

  test("triangle count on a triangle-free graph is all zeros") {
    val g = wGraphOf(Seq((1L, 2L, 1.0), (2L, 3L, 1.0)), directed = false)
    val t = Triangles.countPerVertex(g).collect()
    assert(t.nonEmpty && t.forall(_.getLong(1) == 0L))
  }

  test("similarity: a lone wedge yields exactly its one co-neighbor pair") {
    // 1-3, 2-3: only (1,2) share a neighbor; a lone edge yields no pairs
    val pairs = Similarity.allPairs(
      wGraphOf(Seq((1L, 3L, 1.0), (2L, 3L, 1.0)), directed = false), Similarity.Jaccard)
    assert(pairs.count() == 1)
    assert(Similarity.allPairs(
      wGraphOf(Seq((1L, 2L, 1.0)), directed = false), Similarity.Jaccard).count() == 0)
  }

  test("dedup and text ops on an empty documents frame") {
    import spark.implicits._
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(pipeline.Dedup.exact(docs).count() == 0)
    assert(pipeline.TextAnalysis.tokenCounts(docs).count() == 0)
    assert(pipeline.TextAnalysis.gopherRules(docs).count() == 0)
    assert(pipeline.TextAnalysis.shardManifest(docs, 4).count() == 0)
  }

  test("louvain on a singleton community stays put") {
    val g = wGraphOf(Seq((1L, 2L, 1.0)), directed = false)
    val (labels, _) = Community.louvain(g, maxLevel = 2, maxIter = 4)
    val c = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c(1L) == c(2L)) // a lone edge is one community
  }
}
