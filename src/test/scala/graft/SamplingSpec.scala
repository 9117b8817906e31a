package graft

import org.apache.spark.sql.functions._
import graft.core.{Structure, Gr}
import graft.sampling.{NeighborSampling, Walks}

/** Sampling semantics: fanout bounds, option behaviors, walk shapes. */
class SamplingSpec extends SparkSpec {

  private def und = Structure.symmetrize(edgeDF(Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))))

  private def seeds = {
    import spark.implicits._
    Seq((1L, 1L)).toDF("batch_id", "vertex")
  }

  test("homogeneous sampling respects the per-hop fanout") {
    val s = NeighborSampling.homogeneous(und, seeds, Seq(2, 2))
    val perSrc = s.filter(col("hop") === 0).groupBy("src").count().collect()
    assert(perSrc.forall(_.getLong(1) <= 2))
    // sampled edges exist in the graph
    val es = und.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s.collect().forall(r => es((r.getLong(2), r.getLong(3)))))
  }

  test("prior_sources_behavior=exclude never re-expands a previous source") {
    val s = NeighborSampling.homogeneous(und, seeds, Seq(3, 3, 3),
      priorSourcesBehavior = "exclude")
    val srcByHop = s.collect().groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    // hop-1 sources exclude the seed; hop-2 sources exclude hops 0-1 sources
    assert(!srcByHop.getOrElse(1L, Set.empty).contains(1L))
    val reused = srcByHop.getOrElse(2L, Set.empty)
      .intersect(srcByHop.getOrElse(0L, Set.empty) ++ srcByHop.getOrElse(1L, Set.empty))
    assert(reused.isEmpty)
  }

  test("with-replacement sampling draws exactly fanout slots per source") {
    val s = NeighborSampling.homogeneousWithReplacement(und, seeds, Seq(5))
    val rows = s.filter(col("hop") === 0 && col("src") === 1L).collect()
    assert(rows.length == 5) // 5 slots even though vertex 1 has 3 neighbors
    assert(rows.map(_.getLong(4)).toSet.subsetOf(Set(2L, 3L, 4L)))
  }

  test("windowed temporal sampling bounds edge times and respects direction") {
    import spark.implicits._
    // line graph 1→2→3→4→5 with strictly increasing edge times 1..4, plus
    // a time-10 shortcut 2→9 that only an unbounded window may take
    val e = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (4L, 5L, 4L),
      (2L, 9L, 10L)).toDF("src", "dst", "t")
    // seed 1: window [1, 3]; seed 2: unbounded
    val s = Seq[(Long, Long, Option[Long], Option[Long])](
        (1L, 1L, Some(1L), Some(3L)), (2L, 1L, None, None))
      .toDF("batch_id", "vertex", "start_time", "end_time")
    val inc = NeighborSampling.temporalWindowed(e, s, Seq(2, 2, 2)).collect()
    val b1 = inc.filter(_.getLong(0) == 1L).map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    val b2 = inc.filter(_.getLong(0) == 2L).map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(b1.forall(x => x._3 >= 1L && x._3 <= 3L), s"window violated: ${b1.toSeq}")
    assert(!b1.exists(_._2 == 9L)) // t=10 shortcut outside [1,3]
    assert(b2.exists(_._2 == 9L))  // unbounded seed takes it
    // times along each sampled chain strictly increase (hop h edge newer
    // than the hop h-1 edge that reached its source)
    val chain = inc.filter(_.getLong(0) == 1L).sortBy(_.getLong(1)).map(_.getLong(4))
    assert(chain.sameElements(chain.sorted))
    // decreasing: seed at vertex 4, unbounded window — walks 4→? backwards:
    // only edges with t < +inf then t < arrival; from 4 the only out-edge
    // is (4,5,t=4); from 5 nothing. Add reverse edges to walk down times.
    val e2 = Seq((4L, 3L, 4L), (3L, 2L, 3L), (2L, 1L, 2L), (2L, 8L, 9L))
      .toDF("src", "dst", "t")
    val s2 = Seq[(Long, Long, Option[Long], Option[Long])]((7L, 4L, None, None))
      .toDF("batch_id", "vertex", "start_time", "end_time")
    val dec = NeighborSampling.temporalWindowed(e2, s2, Seq(2, 2, 2),
      decreasing = true).collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the t=9 edge (2,8) is NEWER than the arrival time at 2 (t=3) — a
    // decreasing walk must not take it
    assert(!dec.exists(_._3 == 8L), s"decreasing walk took a newer edge: ${dec.toSeq}")
    assert(dec.map(x => (x._2, x._3)).toSet == Set((4L, 3L), (3L, 2L), (2L, 1L)))
  }

  test("sampled DCSR/CSC offset views are partition-invariant (1 vs 64)") {
    import spark.implicits._
    // SURVEY §5c row for the r7 compression additions: the full
    // sample→renumber→compress pipeline must emit identical offset tables
    // whatever the input split (the hash-seeded sampler and the renumber
    // map are both order-free by construction).
    val seeds3 = Seq((1L, 1L), (3L, 3L), (5L, 5L)).toDF("batch_id", "vertex")
    def run(parts: Int, srcMajor: Boolean, doubly: Boolean) =
      NeighborSampling.compressSampledOffsets(
        NeighborSampling.renumberSampled(
          NeighborSampling.homogeneous(und.repartition(parts), seeds3, Seq(2, 2))),
        srcIsMajor = srcMajor, doublyCompress = doubly)
        .collect().map(_.toSeq).toSet
    assert(run(1, srcMajor = true, doubly = true) == run(64, srcMajor = true, doubly = true))
    assert(run(1, srcMajor = false, doubly = false) == run(64, srcMajor = false, doubly = false))
  }

  test("walks have one vertex per step and follow edges") {
    import spark.implicits._
    val starts = Seq((7L, 1L)).toDF("walk_id", "vertex")
    val w = Walks.uniform(und, starts, maxDepth = 3).collect()
      .sortBy(_.getLong(1))
    assert(w.length == 4) // steps 0..3, no sinks in the symmetrized graph
    val es = und.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    w.sliding(2).foreach { case Array(a, b) =>
      assert(es((a.getLong(2), b.getLong(2))))
    }
  }
}
