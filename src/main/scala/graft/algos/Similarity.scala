package graft.algos

import graft.prims.Mat._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{PropertyGraph, Structure, Gr}
import graft.prims.TopK

/** Link-prediction similarity coefficients: Jaccard / Sørensen / Overlap /
  * Cosine — all one kernel family, neighborhood-intersection per vertex pair
  * (reference `link_prediction/detail/similarity_impl.cuh`; python surface
  * `link_prediction/{jaccard,sorensen,overlap,cosine}.py`).
  *
  * Plan: candidate pairs (default: all two-hop pairs, as the reference's
  * all-pairs variants) → intersection size via wedge counting — for
  * unweighted graphs |N(a)∩N(b)| = number of common neighbors = number of
  * wedges a—m—b, one self-join + hash agg — then degree join + scalar math.
  * The quadratic all-pairs blowup is bounded exactly as the reference warns
  * (`jaccard.py:214-218`): restrict to a vertex subset and/or `topk`.
  */
object Similarity {
  import Gr._

  sealed trait Coefficient { def name: String }
  case object Jaccard extends Coefficient { val name = "jaccard_coeff" }
  case object Sorensen extends Coefficient { val name = "sorensen_coeff" }
  case object Overlap extends Coefficient { val name = "overlap_coeff" }
  case object Cosine extends Coefficient { val name = "cosine_coeff" }

  /** Undirected neighbor lists as edge rows both directions. */
  private def undirected(g: PropertyGraph): DataFrame =
    Structure.removeSelfLoops(Structure.symmetrize(g.edges.select(SRC, DST)))

  /** The shared kernel: per-pair intersection sizes + per-vertex degrees.
    * All four coefficients are scalar math over this one result (the
    * reference likewise shares `detail/similarity_impl.cuh`), so callers
    * computing several coefficients should materialize it ONCE and call
    * [[scoreFrom]] per coefficient — the wedge count is Σ deg², by far the
    * dominant cost. */
  def interAndDeg(g: PropertyGraph, minIntersection: Int = 1): (DataFrame, DataFrame) = {
    val und = undirected(g).mat
    val deg = und.groupBy(col(SRC).as(ID)).agg(count(lit(1)).as("d")).mat
    val canon = und.filter(col(SRC) < col(DST))
    val nE = canon.count()
    val verts = deg.select(ID)
    val nV = deg.count()
    val inter =
      if (nV > 2 && nE * 4 > nV * (nV - 1)) {
        // Density > 1/2: count over the COMPLEMENT (same identity family as
        // Triangles.edgeSupportOf, extended to non-adjacent pairs):
        //   |N(a)∩N(b)| = d(a)+d(b) − |V| + cc'(a,b) + (2 iff a,b non-adjacent)
        // where cc' counts common complement-neighbors excluding a,b (the
        // +2 restores a and b themselves, non-neighbors of both exactly
        // when the pair is not an edge). The complement wedge stream
        // shrinks quadratically with 1−density; the all-pairs frame is
        // O(|E|) because density > 1/2 bounds |V|² < 4|E|.
        val comp = verts.select(col(ID).as(SRC)).crossJoin(verts.select(col(ID).as(DST)))
          .filter(col(SRC) < col(DST))
          .join(canon.select(SRC, DST), Seq(SRC, DST), "left_anti").mat
        val cund = comp.select(SRC, DST)
          .union(comp.select(col(DST).as(SRC), col(SRC).as(DST)))
        val cc = cund.select(col(SRC).as("m"), col(DST).as("a"))
          .join(cund.select(col(SRC).as("m"), col(DST).as("b")), "m")
          .filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("cc"))
        verts.select(col(ID).as("a")).crossJoin(verts.select(col(ID).as("b")))
          .filter(col("a") < col("b"))
          .join(deg.select(col(ID).as("a"), col("d").as("da")), "a")
          .join(deg.select(col(ID).as("b"), col("d").as("db")), "b")
          .join(canon.select(col(SRC).as("a"), col(DST).as("b")).withColumn("adj", lit(1)),
            Seq("a", "b"), "left")
          .join(cc, Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            (col("da") + col("db") - lit(nV) + coalesce(col("cc"), lit(0L)) +
              when(col("adj").isNull, lit(2L)).otherwise(lit(0L))).as("i"))
          .filter(col("i") >= minIntersection)
      } else {
        val bounds = und.agg(least(min(SRC), min(DST)), greatest(max(SRC), max(DST))).first()
        val left = und.select(col(DST).as("m"), col(SRC).as("a"))
        val right = und.select(col(SRC).as("m"), col(DST).as("b"))
        val wedges = left.join(right, "m").filter(col("a") < col("b"))
        if (!bounds.isNullAt(0) && bounds.getLong(0) >= 0 && bounds.getLong(1) < (1L << 31))
          // single-long pair key through the Σ deg² hash agg
          wedges.select((shiftleft(col("a"), 32) + col("b")).as("p"))
            .groupBy("p").agg(count(lit(1)).as("i"))
            .select(shiftright(col("p"), 32).as("a"),
              col("p").bitwiseAND(lit((1L << 32) - 1)).as("b"), col("i"))
            .filter(col("i") >= minIntersection)
        else
          wedges.groupBy("a", "b").agg(count(lit(1)).as("i"))
            .filter(col("i") >= minIntersection)
      }
    (inter, deg)
  }

  /** Score candidate pairs from a precomputed (inter, deg) kernel. The
    * degree table is O(V) — broadcast when small so the O(pairs)
    * intersection stream never reshuffles. */
  def scoreFrom(inter: DataFrame, deg: DataFrame, coeff: Coefficient,
                nV: Long = -1L): DataFrame = {
    val d = graft.prims.Hint.state(deg, if (nV >= 0) nV else deg.count())
    inter
      .join(d.select(col(ID).as("a"), col("d").as("da")), "a")
      .join(d.select(col(ID).as("b"), col("d").as("db")), "b")
      .select(col("a").as(SRC), col("b").as(DST), scoreCol(coeff).as(coeff.name))
  }

  /** Similarity for all 2-hop candidate pairs (a<b).
    * @return DataFrame(src, dst, coeff-named column). */
  def allPairs(g: PropertyGraph, coeff: Coefficient, topK: Option[Int] = None,
               minIntersection: Int = 1): DataFrame = {
    val (inter, deg) = interAndDeg(g, minIntersection)
    val scored = scoreFrom(inter, deg, coeff)
    topK match {
      case Some(k) => scored.orderBy(desc(coeff.name), col(SRC), col(DST)).limit(k)
      case None => scored
    }
  }

  /** Similarity for explicit candidate pairs (reference `vertex_pair` arg). */
  def forPairs(g: PropertyGraph, pairs: DataFrame, coeff: Coefficient): DataFrame = {
    val und = undirected(g).mat
    val deg = und.groupBy(col(SRC).as(ID)).agg(count(lit(1)).as("d"))
    val p = pairs.select(col(pairs.columns(0)).as("a"), col(pairs.columns(1)).as("b"))
    val na = p.join(und.select(col(SRC).as("a"), col(DST).as("m")), "a")
    val inter = na.join(und.select(col(SRC).as("b"), col(DST).as("m")), Seq("b", "m"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    p.join(inter, Seq("a", "b"), "left")
      .join(deg.select(col(ID).as("a"), col("d").as("da")), Seq("a"), "left")
      .join(deg.select(col(ID).as("b"), col("d").as("db")), Seq("b"), "left")
      .na.fill(0, Seq("i", "da", "db"))
      .select(col("a").as(SRC), col("b").as(DST),
        when(col("da") === 0 || col("db") === 0, lit(0.0))
          .otherwise(scoreCol(coeff)).as(coeff.name))
  }

  private def scoreCol(coeff: Coefficient) = coeff match {
    case Jaccard  => col("i").cast("double") / (col("da") + col("db") - col("i"))
    case Sorensen => lit(2.0) * col("i") / (col("da") + col("db"))
    case Overlap  => col("i").cast("double") / least(col("da"), col("db"))
    case Cosine   => col("i").cast("double") / sqrt(col("da").cast("double") * col("db"))
  }

  /** WEIGHTED similarity kernel (reference `use_weight=True`,
    * `jaccard.py:20` / `similarity_impl.cuh` weighted path): intersection
    * weight Σ_m min(w_am, w_bm); per-vertex mass Σ w over the neighborhood.
    * Same one-kernel shape as [[interAndDeg]] — callers computing several
    * coefficients materialize this ONCE and call [[scoreFrom]] per
    * coefficient, exactly like the unweighted family. */
  def interAndDegWeighted(g: PropertyGraph, minIntersection: Int = 1): (DataFrame, DataFrame) = {
    val und = Structure.removeSelfLoops(
      Structure.symmetrize(g.weightedEdges.select(SRC, DST, WEIGHT), sumWeights = false)).mat
    val wdeg = und.groupBy(col(SRC).as(ID)).agg(sum(WEIGHT).as("d"))
    val left = und.select(col(DST).as("m"), col(SRC).as("a"), col(WEIGHT).as("wa"))
    val right = und.select(col(SRC).as("m"), col(DST).as("b"), col(WEIGHT).as("wb"))
    val wedges = left.join(right, "m").filter(col("a") < col("b"))
    val bounds = und.agg(least(min(SRC), min(DST)), greatest(max(SRC), max(DST))).first()
    val inter =
      if (!bounds.isNullAt(0) && bounds.getLong(0) >= 0 && bounds.getLong(1) < (1L << 31))
        // min-weight sums don't decompose over the complement, but the
        // Σ deg² hash agg still runs on a single packed long key
        wedges.select((shiftleft(col("a"), 32) + col("b")).as("p"),
            least(col("wa"), col("wb")).as("w"))
          .groupBy("p").agg(sum("w").as("i"), count(lit(1)).as("n"))
          .filter(col("n") >= minIntersection)
          .select(shiftright(col("p"), 32).as("a"),
            col("p").bitwiseAND(lit((1L << 32) - 1)).as("b"), col("i"))
      else
        wedges.groupBy("a", "b")
          .agg(sum(least(col("wa"), col("wb"))).as("i"), count(lit(1)).as("n"))
          .filter(col("n") >= minIntersection)
          .drop("n")
    (inter, wdeg)
  }

  def allPairsWeighted(g: PropertyGraph, coeff: Coefficient,
                       minIntersection: Int = 1): DataFrame = {
    val (inter, wdeg) = interAndDegWeighted(g, minIntersection)
    scoreFrom(inter, wdeg, coeff)
  }

  /** HUB-CAPPED weighted kernel — the power-law defense for use_weight=True
    * at scale. The uncapped wedge stream is Σ deg²: one degree-10⁶ hub
    * center emits 10¹² wedge rows. Min-weight sums don't decompose over the
    * complement (unlike the unweighted count), but they DO decompose over
    * any partition of the CENTER set:
    *   Σ_m min(w_am, w_bm) = Σ_{deg(m)≤cap} + Σ_{deg(m)>cap}.
    * So: mine candidate pairs (and their partial sums) from degree-≤cap
    * centers only — bounding the wedge stream at Σ_rare deg ≤ cap·|rare| —
    * then EXACTLY rescore each candidate against the few hub neighbors per
    * vertex (never against a hub's full posting list). The same rare/hub
    * split as `Dedup.ngramJaccardPairs(maxShingleDf)`; like there, only a
    * pair whose every common neighbor is a hub can be missed, and every
    * returned score is exact. */
  def interAndDegWeightedCapped(g: PropertyGraph, maxDegree: Int,
                                minIntersection: Int = 1): (DataFrame, DataFrame) = {
    require(maxDegree > 0, "maxDegree must be positive")
    val und = Structure.removeSelfLoops(
      Structure.symmetrize(g.weightedEdges.select(SRC, DST, WEIGHT), sumWeights = false)).mat
    val wdeg = und.groupBy(col(SRC).as(ID)).agg(sum(WEIGHT).as("d"))
    val ctr = und.select(col(SRC).as("m"), col(DST).as("nbr"), col(WEIGHT))
    val deg = ctr.groupBy("m").agg(count(lit(1)).as("deg")).mat
    // hub vertex list is tiny by construction (few vertices exceed the cap
    // on a power-law graph) — broadcast it into both semi-joins
    val hubs = broadcast(deg.filter(col("deg") > maxDegree).select("m"))
    val rareCtr = ctr.join(hubs, Seq("m"), "left_anti").mat
    val hubAdj = ctr.join(hubs, Seq("m"), "left_semi").mat
    val rare = rareCtr.as("x").join(rareCtr.as("y"),
        col("x.m") === col("y.m") && col("x.nbr") < col("y.nbr"))
      .groupBy(col("x.nbr").as("a"), col("y.nbr").as("b"))
      .agg(sum(least(col(s"x.$WEIGHT"), col(s"y.$WEIGHT"))).as("rare_i"),
        count(lit(1)).as("rare_n"))
    val hubInter = rare.select("a", "b")
      .join(hubAdj.select(col("nbr").as("a"), col("m"), col(WEIGHT).as("wa")), "a")
      .join(hubAdj.select(col("nbr").as("b"), col("m"), col(WEIGHT).as("wb")), Seq("b", "m"))
      .groupBy("a", "b")
      .agg(sum(least(col("wa"), col("wb"))).as("hub_i"), count(lit(1)).as("hub_n"))
    val inter = rare.join(hubInter, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        (col("rare_i") + coalesce(col("hub_i"), lit(0.0))).as("i"),
        (col("rare_n") + coalesce(col("hub_n"), lit(0L))).as("n"))
      .filter(col("n") >= minIntersection)
      .drop("n")
    (inter, wdeg)
  }

  /** Per-source top-k most similar vertices (window pattern, SURVEY §2.9). */
  def topKPerVertex(g: PropertyGraph, coeff: Coefficient, k: Int): DataFrame =
    TopK.perKey(allPairs(g, coeff), Seq(SRC), Seq(desc(coeff.name), col(DST)), k)
}
