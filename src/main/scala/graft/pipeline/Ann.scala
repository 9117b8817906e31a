package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.prims.{TopK, Mat}
import Mat._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: exact brute-force cosine top-k — a broadcast of the (small)
  * query set against the (huge) corpus, so the corpus is scanned once with
  * no shuffle of the vectors themselves; per-query top-k via the canonical
  * window row_number pattern (skew-safe: one partition per query id).
  *
  * Scale path: IVF — vectors are assigned to the nearest of `nlist` coarse
  * centroids (k-means over a sample, iterated as DataFrame joins); a query
  * probes only its `nprobe` nearest centroid buckets. The bucket assignment
  * is an equi-join on centroid id, so the 100 TB corpus is range-pruned to
  * nprobe/nlist of itself before any exact distance is computed.
  */
object Ann {
  import TextOps._

  private def withNorm(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Exact cosine top-k for each query vector. `queries` has the same
    * schema as `emb`; self-matches are excluded. Output:
    * (query_id, neighbor_id, cosine, rank). */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = withNorm(emb, idCol, vecCol)
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = corpus.join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosine(col("v"), col("qv"), col("nrm"), col("qn")), 6).as("cosine"))
    TopK.perKey(scored, Seq("query_id"), Seq(desc("cosine"), col("neighbor_id")), k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
  }

  /** Deterministic HASH-SPREAD seed selection for k-means init: the `n`
    * rows with the smallest md5-derived key, NOT the first `n` by id.
    * "First n ids" degenerates catastrophically on correlated corpora —
    * a replicated/near-duplicated id prefix (one crawl shard, one
    * language, a replica-salted probe corpus) yields seed rows that are
    * copies of a handful of distinct vectors; duplicate centroids tie,
    * lose every assignment to the lowest cid, drop out of the update's
    * GROUP BY, and the quantizer collapses to a few giant cells whose
    * s-squared candidate volume is exactly the blowup IVF exists to
    * avoid (found by the r10 ANN scale probe: knn_graph at scale 17 sat
    * on ~6 effective cells of 21k vectors = 2.7G candidate pairs).
    * Hash-spreading the seed draw is order-independent, reproducible by
    * the DuckDB oracle (same md5 key), and costs one extra column on an
    * O(n)-row top-k. */
  private def seedSelect(e: DataFrame, idCol: String, n: Int): DataFrame =
    e.withColumn("_sk", hash60(concat(lit("kmseed:"), col(idCol).cast("string"))))
      .orderBy(col("_sk"), col(idCol)).limit(n)

  /** K-means coarse quantizer trained with deterministic seeding
    * (hash-spread sample of `nlist` vectors — see [[seedSelect]]) —
    * returns (centroid_id, centroid vector).
    *
    * `trainPerCell` bounds the LLOYD TRAINING SET to ~nlist×trainPerCell
    * rows (0 = train on the full corpus). Full-corpus Lloyd is
    * O(iters × N × nlist) dot products — at 10⁹ vectors and nlist=√N
    * that is ~10¹⁴ dots per iteration, which no production IVF build
    * pays; the standard practice (FAISS trains its coarse quantizer on a
    * bounded sample) is a deterministic subsample, after which the FULL
    * corpus is assigned to the final centroids exactly once by the
    * caller. The sample is a hash-THRESHOLD filter (keep rows whose
    * 60-bit key falls below capN/N of the key space), not a top-k: a
    * global top-k of ~10⁵ rows would funnel partitions×capN rows through
    * a single-partition global limit, while the threshold filter is one
    * stateless scan. Deterministic under repartitioning (key depends on
    * the id only) and NON-BINDING when the corpus is at most
    * nlist×trainPerCell rows — gate-scale corpora train on everything,
    * so the DuckDB oracle unrolls are unaffected; the r10 scale-20 probe
    * measured the binding path (see BASELINE.md, ANN rows). */
  def kmeansCentroids(emb: DataFrame, nlist: Int, iters: Int = 5,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      trainPerCell: Int = 256): DataFrame = {
    val e = withNorm(emb, idCol, vecCol).select(col(idCol), col("v")).mat
    // dimension from the data, not an assumed width (ANSI element_at
    // throws past the array end)
    val dim = e.select(size(col("v"))).first().getInt(0)
    val capN = if (trainPerCell > 0) nlist.toLong * trainPerCell else Long.MaxValue
    val n = e.count() // e is materialized — a cached-frame count
    val train =
      if (n <= capN) e
      else e.filter(
        hash60(concat(lit("kmtrain:"), col(idCol).cast("string"))) <
          ((capN.toDouble / n) * (1L << 60).toDouble).toLong).mat
    // dense 0-based centroid ids via the distributed zipWithIndex helper —
    // the frame is limit(nlist) small, but a global-window row_number here
    // would still funnel it through a single partition
    var cents = graft.core.Renumber.assignIds(seedSelect(e, idCol, nlist))
      .select(col(graft.core.Gr.INT_ID).as("cid"), col("v").as("cv")).mat
    for (_ <- 0 until iters) {
      cents = assignFused(train, cents, idCol, Seq("v"))
        .select(col("cid"), col("v"))
        .groupBy("cid")
        .agg(array((0 until dim).map(i => avg(element_at(col("v"), i + 1))): _*).as("cv"))
        .mat
    }
    cents
  }

  /** Nearest-centroid assignment FUSED onto the corpus scan: the tiny
    * centroid table is broadcast, every (vector, centroid) dot is scored
    * map-side, and the arg-max centroid (ties → lowest cid) is taken with a
    * map-side-combined hash agg that carries the listed vector columns
    * through. ONE corpus-sized shuffle — never a corpus-sized broadcast or a
    * join back onto the corpus. */
  private[pipeline] def assignToCentroids(e: DataFrame, cents: DataFrame, idCol: String,
                                          carry: Seq[String]): DataFrame =
    assignFused(e, cents, idCol, carry)

  private def assignFused(e: DataFrame, cents: DataFrame, idCol: String,
                          carry: Seq[String]): DataFrame = {
    val scored = e.join(broadcast(cents))
      .select((col(idCol) +: carry.map(col)) :+ col("cid") :+
        dot(col("v"), col("cv")).as("d"): _*)
    scored.groupBy(col(idCol))
      .agg(min_by(col("cid"), struct((col("d") * -1).as("nd"), col("cid"))).as("cid"),
        carry.map(c => first(col(c)).as(c)): _*)
  }

  /** Product-quantization ANN (Jégou et al., TPAMI 2011 — public method):
    * vectors are split into `m` subvectors; per subspace a `ksub`-centroid
    * k-means codebook is trained (deterministic hash-spread seed init —
    * [[seedSelect]] — argmin-L2 assignment with lowest-cid tie-break,
    * per-dimension average updates); a vector's stored representation is
    * its `m` nearest-subspace-centroid ids. At ksub=16 that is 4 bits per
    * subspace — a 64-dim float vector (256 B) becomes 8 codes (4 B
    * packed), the ~64× memory compression that lets a billion-vector
    * index live in executor memory where raw floats cannot.
    *
    * Scoring is ADC (asymmetric distance computation): a per-query lookup
    * table of subspace dot products (`m × ksub` entries — tiny, broadcast)
    * is joined onto the corpus's pivoted code columns through `m`
    * broadcast equi-joins, so the corpus is scanned once with NO shuffle
    * of the vectors themselves; the approximate dot product is summed in
    * fixed subspace order, making results bit-stable across partitionings
    * (and reproducible by the DuckDB oracle). Output
    * (query_id, neighbor_id, adot, rank) — approximate, recall < 1. */
  def pqTopK(emb: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
             ksub: Int = 16, iters: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding",
             trainPerCell: Int = 256): DataFrame = {
    val e = withNorm(emb, idCol, vecCol).select(col(idCol), col("v")).mat
    val dim = e.select(size(col("v"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    def subSplit(df: DataFrame, vc: String, out: String): DataFrame =
      df.select(df.columns.map(col) :+ explode(sequence(lit(0), lit(m - 1))).as("sub"): _*)
        .withColumn(out, slice(col(vc), col("sub") * dsub + 1, lit(dsub)))
    val sv = subSplit(e, "v", "sv").select(col(idCol), col("sub"), col("sv")).mat
    // bounded codebook TRAINING set — the same rule as kmeansCentroids:
    // Lloyd over the full N×m subvector frame is a full-corpus scan +
    // shuffle per iteration, while ksub×trainPerCell whole vectors train
    // the same 16-entry-per-subspace codebooks (FAISS trains PQ codebooks
    // on a sample for the same reason). Hash-threshold filter on the
    // vector id — keeps all m subspaces of a sampled vector, deterministic
    // under repartitioning, NON-BINDING at gate scale so the DuckDB
    // unrolls are unaffected. The full index (`codes`) is still built over
    // every vector below.
    val capN = if (trainPerCell > 0) ksub.toLong * trainPerCell else Long.MaxValue
    val n = e.count()
    val svTrain =
      if (n <= capN) sv
      else sv.filter(
        hash60(concat(lit("kmtrain:"), col(idCol).cast("string"))) <
          ((capN.toDouble / n) * (1L << 60).toDouble).toLong).mat
    // hash-spread codebook seeds — same rationale as seedSelect: the first
    // `ksub` ids of a correlated corpus seed duplicate subspace centroids
    // that tie away to nothing
    var cents = subSplit(
        graft.core.Renumber.assignIds(seedSelect(e, idCol, ksub))
          .select(col(graft.core.Gr.INT_ID).as("cid"), col("v")), "v", "cv")
      .select(col("sub"), col("cid"), col("cv")).mat
    // argmin-L2 subspace assignment, fused onto one scan of the subvector
    // frame (centroids broadcast; ties -> lowest cid, mirroring the oracle)
    def assign(c: DataFrame, over: DataFrame): DataFrame = {
      val d2 = dot(col("sv"), col("sv")) - lit(2) * dot(col("sv"), col("cv")) +
        dot(col("cv"), col("cv"))
      over.join(broadcast(c), "sub")
        .select(col(idCol), col("sub"), col("sv"), col("cid"), d2.as("d2"))
        .groupBy(col(idCol), col("sub"))
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"),
          first(col("sv")).as("sv"))
    }
    for (_ <- 0 until iters)
      cents = assign(cents, svTrain)
        .groupBy("sub", "cid")
        .agg(array((0 until dsub).map(i => avg(element_at(col("sv"), i + 1))): _*).as("cv"))
        .mat
    // the PQ index: m code columns per vector (exactly one sub each)
    val codes = assign(cents, sv)
      .groupBy(idCol)
      .agg(max(when(col("sub") === 0, col("cid"))).as("c0"),
        (1 until m).map(s => max(when(col("sub") === s, col("cid"))).as(s"c$s")): _*)
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"))
    val lut = subSplit(q, "qv", "qsv")
      .join(broadcast(cents), "sub")
      .select(col("query_id"), col("sub"), col("cid"), dot(col("qsv"), col("cv")).as("p"))
      .mat
    var scored: DataFrame = codes
    for (s <- 0 until m) {
      val ls = lut.filter(col("sub") === s)
        .select((if (s == 0) col("query_id") else col("query_id").as(s"_q$s")),
          col("cid").as(s"_cid$s"), col("p").as(s"p$s"))
      scored =
        if (s == 0) scored.join(broadcast(ls), col("c0") === col("_cid0"))
        else scored.join(broadcast(ls),
          col("query_id") === col(s"_q$s") && col(s"c$s") === col(s"_cid$s"))
    }
    val adot = (1 until m).foldLeft(col("p0"))((a, s) => a + col(s"p$s"))
    val res = scored.filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"), round(adot, 6).as("adot"))
    TopK.perKey(res, Seq("query_id"), Seq(desc("adot"), col("neighbor_id")), k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(desc("adot"), col("neighbor_id"))))
  }

  /** IVF-PQ composed index (the FAISS IVFPQ shape, Jégou et al. 2011 —
    * public method): the billion-vector configuration, combining BOTH
    * scale levers in one operator. The coarse quantizer prunes the corpus
    * to `nprobe` of `nlist` cells per query (the IVF lever: only
    * nprobe/nlist of the corpus is ever scored), and within probed cells
    * scoring is ADC over RESIDUAL product-quantization codes (the PQ
    * lever: a vector is stored as m codebook ids, ~64× smaller than raw
    * floats):
    *
    *   v ≈ c_cell + Σ_s codebook[s][code_s(v)]        (residual encoding)
    *   dot(q, v) ≈ dot(q, c_cell) + Σ_s dot(q_s, codebook[s][code_s])
    *
    * Residual encoding (quantize v − c_cell, not v) is what makes the
    * shared codebook accurate: residuals of all cells live near the
    * origin, so 16 entries per subspace cover them far better than they
    * cover raw vectors. Plan shape: one corpus-sized shuffle for cell
    * assignment, one for code pivot, then scoring is codes ⋈ broadcast
    * probe-pairs ⋈ m broadcast LUT joins — the corpus's raw vectors are
    * never shuffled and never rejoined at query time. Training follows
    * the bounded-sample rule ([[kmeansCentroids]]): non-binding at gate
    * scale, so the DuckDB unroll is exact. Output
    * (query_id, neighbor_id, adot, rank) — approximate, recall < 1. */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16,
                nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
                itersCoarse: Int = 3, itersPq: Int = 2,
                idCol: String = "vec_id", vecCol: String = "embedding",
                trainPerCell: Int = 256): DataFrame = {
    val e = withNorm(emb, idCol, vecCol).select(col(idCol), col("v")).mat
    val dim = e.select(size(col("v"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val cents = kmeansCentroids(emb, nlist, itersCoarse, idCol, vecCol, trainPerCell).mat
    val bucketed = assignFused(e, cents, idCol, Seq("v")).mat
    // residuals r = v − c_cell: the broadcast centroid table again — the
    // corpus is scanned, never shuffled, for this step
    val resid = bucketed.join(broadcast(cents), "cid")
      .select(col(idCol), col("cid"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("rv")).mat
    def subSplit(df: DataFrame, vc: String, out: String): DataFrame =
      df.select(df.columns.map(col) :+ explode(sequence(lit(0), lit(m - 1))).as("sub"): _*)
        .withColumn(out, slice(col(vc), col("sub") * dsub + 1, lit(dsub)))
    val rsv = subSplit(resid, "rv", "sv")
      .select(col(idCol), col("cid"), col("sub"), col("sv")).mat
    val capN = if (trainPerCell > 0) ksub.toLong * trainPerCell else Long.MaxValue
    val n = e.count()
    val rsvTrain =
      if (n <= capN) rsv
      else rsv.filter(
        hash60(concat(lit("kmtrain:"), col(idCol).cast("string"))) <
          ((capN.toDouble / n) * (1L << 60).toDouble).toLong).mat
    // shared residual codebook, hash-spread seed init (same discipline and
    // the same seed key as seedSelect — mirrored by the oracle)
    var cb = subSplit(
        graft.core.Renumber.assignIds(
          resid.withColumn("_sk",
              hash60(concat(lit("kmseed:"), col(idCol).cast("string"))))
            .orderBy(col("_sk"), col(idCol)).limit(ksub))
          .select(col(graft.core.Gr.INT_ID).as("pcid"), col("rv")), "rv", "cv")
      .select(col("sub"), col("pcid"), col("cv")).mat
    def assign(c: DataFrame, over: DataFrame): DataFrame = {
      val d2 = dot(col("sv"), col("sv")) - lit(2) * dot(col("sv"), col("cv")) +
        dot(col("cv"), col("cv"))
      over.join(broadcast(c), "sub")
        .select(col(idCol), col("cid"), col("sub"), col("sv"), col("pcid"), d2.as("d2"))
        .groupBy(col(idCol), col("sub"))
        .agg(min_by(col("pcid"), struct(col("d2"), col("pcid"))).as("pcid"),
          first(col("sv")).as("sv"), first(col("cid")).as("cid"))
    }
    for (_ <- 0 until itersPq)
      cb = assign(cb, rsvTrain)
        .groupBy("sub", "pcid")
        .agg(array((0 until dsub).map(i => avg(element_at(col("sv"), i + 1))): _*).as("cv"))
        .mat
    // the index: coarse cell id + m residual code columns per vector
    val codes = assign(cb, rsv)
      .groupBy(idCol)
      .agg(max(col("cid")).as("cid"),
        (0 until m).map(s => max(when(col("sub") === s, col("pcid"))).as(s"c$s")): _*)
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"))
    // per-query probed cells, carrying the coarse dot term of the ADC sum
    val qProbes = TopK.perKey(
      q.join(broadcast(cents))
        .select(col("query_id"), col("cid"), dot(col("qv"), col("cv")).as("cdot")),
      Seq("query_id"), Seq(desc("cdot"), col("cid")), nprobe).mat
    // per-query LUT against the residual codebook (RAW query subvectors —
    // ADC is asymmetric: only the corpus side is quantized)
    val lut = subSplit(q, "qv", "qsv")
      .join(broadcast(cb), "sub")
      .select(col("query_id"), col("sub"), col("pcid"), dot(col("qsv"), col("cv")).as("p"))
      .mat
    var scored: DataFrame = codes.join(broadcast(qProbes), "cid")
    for (s <- 0 until m) {
      val ls = lut.filter(col("sub") === s)
        .select(col("query_id").as(s"_q$s"), col("pcid").as(s"_cid$s"), col("p").as(s"p$s"))
      scored = scored.join(broadcast(ls),
        col("query_id") === col(s"_q$s") && col(s"c$s") === col(s"_cid$s"))
    }
    // fixed accumulation order (coarse term first, then subspaces 0..m-1)
    // keeps the float sum bit-stable across partitionings and engines
    val adot = (1 until m).foldLeft(col("cdot") + col("p0"))((a, s) => a + col(s"p$s"))
    val res = scored.filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"), round(adot, 6).as("adot"))
    TopK.perKey(res, Seq("query_id"), Seq(desc("adot"), col("neighbor_id")), k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(desc("adot"), col("neighbor_id"))))
  }

  /** Cluster-balanced corpus sampling (the diversity-sampling step of an
    * embedding-curated corpus): every vector is assigned to its nearest
    * deterministic k-means centroid (same quantizer as IVF — one broadcast
    * of the tiny centroid table, one corpus shuffle), then each cluster
    * keeps its `perCluster` hash-priority winners. Uniform sampling
    * over-represents dense regions of embedding space; per-cluster caps
    * flatten that — the same shape DeepMind/Meta curation pipelines use
    * after SemDeDup. Deterministic (md5 priority, no rand()), so the
    * sample is stable under repartitioning and re-runs.
    * Output (vec_id, cid) for kept rows. */
  def clusterSample(emb: DataFrame, nlist: Int = 16, perCluster: Int = 8, iters: Int = 3,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    seed: Long = 42): DataFrame = {
    val e = withNorm(emb, idCol, vecCol).select(col(idCol), col("v")).mat
    val cents = kmeansCentroids(emb, nlist, iters, idCol, vecCol).mat
    val bucketed = assignFused(e, cents, idCol, Seq.empty)
    val pri = hash60(concat_ws("|", lit("csample"), col(idCol), lit(seed)))
    TopK.perKey(bucketed.withColumn("pri", pri),
        Seq("cid"), Seq(col("pri"), col(idCol)), perCluster)
      .select(col(idCol), col("cid"))
  }

  /** k-NN weak labeling: classify each query vector by majority vote over
    * its `k` exact-cosine nearest labeled neighbors (ties → more votes
    * first, then lowest label — deterministic). The auto-labeling /
    * label-propagation step of a semi-supervised data pipeline. The
    * neighbor list is queries×k rows — tiny — so the label attach is a
    * broadcast of the neighbor list onto the corpus label column, never a
    * shuffle of the corpus. Output (query_id, pred_label, n_votes). */
  def knnClassify(emb: DataFrame, queries: DataFrame, k: Int = 10,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    val nn = bruteForceTopK(emb, queries, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val labels = emb.select(col(idCol).as("neighbor_id"),
      col(labelCol).cast("long").as("nlabel"))
    val votes = labels.join(broadcast(nn), "neighbor_id")
      .groupBy(col("query_id"), col("nlabel"))
      .agg(count(lit(1)).as("n_votes"))
    votes.groupBy("query_id")
      .agg(min_by(struct(col("nlabel"), col("n_votes")),
        struct((col("n_votes") * -1).as("nv"), col("nlabel"))).as("b"))
      .select(col("query_id"), col("b.nlabel").as("pred_label"),
        col("b.n_votes").as("n_votes"))
  }

  /** Hard-negative mining for contrastive training: per query, the `k`
    * most-similar corpus vectors whose label DIFFERS from the query's —
    * the negatives that actually move a contrastive loss (random negatives
    * are trivially separable). Same corpus-scan shape as brute-force top-k
    * (query side broadcast, label filter fused into the join, per-query
    * window rank); an IVF prefilter composes in front of it at billion-
    * vector scale. Output (query_id, neighbor_id, cosine, rank). */
  def hardNegatives(emb: DataFrame, queries: DataFrame, k: Int = 10,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    def wn(df: DataFrame, lbl: String) = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"),
        col(labelCol).cast("long").as(lbl))
      .withColumn("nrm", norm(col("v")))
    val corpus = wn(emb, "nl")
    val q = wn(queries, "ql")
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("ql"))
    val scored = corpus.join(broadcast(q),
        col(idCol) =!= col("query_id") && col("nl") =!= col("ql"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosine(col("v"), col("qv"), col("nrm"), col("qn")), 6).as("cosine"))
    TopK.perKey(scored, Seq("query_id"), Seq(desc("cosine"), col("neighbor_id")), k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
  }

  /** Greedy maximal-marginal-relevance (MMR) selection (Carbonell &
    * Goldstein, SIGIR 1998 — public method): pick `k` corpus vectors that
    * are relevant to the query but mutually diverse,
    *   score_t(d) = λ·cos(q,d) − (1−λ)·max_{s∈S_{t−1}} cos(d,s)
    * with S_0 = ∅ (round 1 ranks by pure relevance). This is the
    * selection step of a diversity-aware few-shot / training-subset
    * pipeline — the "don't fill the context with five copies of the same
    * document" operator that composes after ANN retrieval.
    *
    * Plan shape — the greedy loop's state lives IN the corpus frame:
    * `maxsim` (similarity to the nearest already-selected vector) is a
    * column, updated after each pick by a map-only `greatest` against the
    * newly selected vector (a literal array, never a join), so each of
    * the k rounds costs one corpus scan + one scalar argmax agg and
    * nothing ever shuffles; at 100 TB the rounds are k broadcast-free
    * full scans, the same shape as k filters. The driver holds only the
    * k selected vectors (bounded collect — k is context-window-sized by
    * definition of the operator). Deterministic: ties break to the
    * lowest id, so the DuckDB k-round unroll (q_mmr_select) reproduces
    * the selection exactly.
    * Output: (vec_id, rank, relevance, mmr_score) for the k picks. */
  def mmrSelect(emb: DataFrame, queries: DataFrame, k: Int, lambda: Double = 0.7,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // single-query contract, enforced deterministically (ADVICE r10): the
    // lowest-id row is the query — a bare head() was partition-order
    // nondeterministic with >1 rows and threw bare on an empty frame
    val qRows = withNorm(queries, idCol, vecCol)
      .select(col(idCol).cast("long").as("qid"), col("v"), col("nrm"))
      .orderBy(col("qid")).limit(1).collect()
    require(qRows.nonEmpty, "mmrSelect: queries frame is empty — need one query row")
    val qRow = qRows(0)
    val qId = qRow.getLong(0)
    val qv = qRow.getSeq[Double](1)
    val qn = qRow.getDouble(2)
    var st = withNorm(emb, idCol, vecCol)
      .filter(col(idCol).cast("long") =!= qId)
      .select(col(idCol).cast("long").as("id"), col("v"), col("nrm"),
        cosine(col("v"), typedLit(qv), col("nrm"), lit(qn)).as("rel"),
        lit(0.0).as("maxsim"))
      .mat
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
    var t = 1
    var exhausted = false
    while (t <= k && !exhausted) {
      // 1.0 - lambda computed HERE (not a pre-simplified literal) so the
      // oracle's `(1.0 - 0.7)` reproduces the exact same double
      val score = lit(lambda) * col("rel") - lit(1.0 - lambda) * col("maxsim")
      val p = st
        .agg(max_by(struct(col("id"), col("v"), col("nrm"), col("rel"),
          score.as("score")), struct(score.as("s"), (-col("id")).as("ni"))).as("p"))
        .select("p.*").head()
      if (p.isNullAt(0)) exhausted = true // corpus smaller than k
      else {
        val (id, v, nrm) = (p.getLong(0), p.getSeq[Double](1), p.getDouble(2))
        out += ((id, t.toLong, p.getDouble(3), p.getDouble(4)))
        val simToNew = cosine(col("v"), typedLit(v), col("nrm"), lit(nrm))
        st = st.filter(col("id") =!= id)
          .withColumn("maxsim",
            if (t == 1) simToNew else greatest(col("maxsim"), simToNew))
          .mat
        t += 1
      }
    }
    out.toSeq.toDF(idCol, "rank", "relevance", "mmr_score")
      .select(col(idCol), col("rank"),
        round(col("relevance"), 6).as("relevance"),
        round(col("mmr_score"), 6).as("mmr_score"))
  }

  /** IVF top-k: probe the `nprobe` nearest centroid buckets per query and
    * rank exactly within them. Approximate (recall < 1) but the corpus-side
    * work is an equi-join on centroid id instead of a full scan per query. */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = withNorm(emb, idCol, vecCol).mat
    val cents = kmeansCentroids(emb, nlist, iters = 3, idCol, vecCol).mat
    val bucketed = assignFused(e, cents, idCol, Seq("v", "nrm"))
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val qProbes = TopK.perKey(
      q.join(broadcast(cents))
        .select(col("query_id"), col("qv"), col("qn"), col("cid"),
          dot(col("qv"), col("cv")).as("d")),
      Seq("query_id"), Seq(desc("d"), col("cid")), nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))
    val scored = bucketed.join(broadcast(qProbes),
        bucketed("cid") === qProbes("cid") && col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosine(col("v"), col("qv"), col("nrm"), col("qn")), 6).as("cosine"))
    TopK.perKey(scored, Seq("query_id"), Seq(desc("cosine"), col("neighbor_id")), k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
  }

  /** IVF-bucketed k-NN GRAPH over the whole corpus (corpus→corpus top-k):
    * deterministic k-means cells, exact cosine WITHIN each cell only,
    * top-k neighbors per vector — the shape for building a similarity
    * graph over billions of embeddings (one centroid broadcast + one
    * equi-join on cell id; never an all-pairs self-join). A vector alone
    * in its cell emits no edges, like the bucketed near-dup kernels; the
    * output edge list feeds the graph half of the engine directly (WCC →
    * semantic clusters, PageRank → centrality-weighted sampling).
    *
    * Scale note: a cell of size s costs s² candidate rows, so at corpus
    * scale pick nlist ≈ N / targetCellSize (the standard IVF sizing —
    * e.g. N=10⁹, cells of ~1k → nlist=10⁶) and AQE's skew split handles
    * residual imbalance; the oversized-natural-cluster failure mode is
    * bounded by the k-means balance, not by the join shape.
    * Output (vec_id, neighbor_id, cosine, rank). */
  def knnGraph(emb: DataFrame, k: Int, nlist: Int = 16, iters: Int = 3,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = withNorm(emb, idCol, vecCol).mat
    val cents = kmeansCentroids(emb, nlist, iters, idCol, vecCol).mat
    val bucketed = assignFused(e, cents, idCol, Seq("v", "nrm")).mat
    val nbr = bucketed.select(col(idCol).as("neighbor_id"), col("v").as("nv"),
      col("nrm").as("nn"), col("cid").as("ncid"))
    val scored = bucketed.join(nbr,
        col("cid") === col("ncid") && col(idCol) =!= col("neighbor_id"))
      .select(col(idCol), col("neighbor_id"),
        round(cosine(col("v"), col("nv"), col("nrm"), col("nn")), 6).as("cosine"))
    TopK.perKey(scored, Seq(idCol), Seq(desc("cosine"), col("neighbor_id")), k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(idCol).orderBy(desc("cosine"), col("neighbor_id"))))
  }
}
