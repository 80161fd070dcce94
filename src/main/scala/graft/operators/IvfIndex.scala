package graft.operators

import graft.PlanCapture.CheckpointOps
import graft.functions.{CosineSim, VectorOps}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path for E3 (SURVEY §2.4): k-means partitions the corpus into
  * `nlist` cells; a query scores only the candidates in its `nprobe`
  * nearest cells, so per-query work drops from |corpus| to
  * ~|corpus|·nprobe/nlist. All joins are equi-joins on the cell id — the
  * plan shape survives any corpus size; recall trades off with nprobe.
  *
  * Training is seeded and iteration-bounded → deterministic per input.
  */
object IvfIndex {

  /** Fit the coarse quantizer and assign every vector to its cell.
    * Returns (assigned frame with `cell`, centroid frame (cell, centroid)).
    *
    * The k-means FIT trains on a deterministic hash-mod sample capped at
    * `maxTrain` rows — at 100 TB the quantizer needs ~100·nlist training
    * points for stable centroids, not the corpus (FAISS trains IVF
    * quantizers the same way); ASSIGNMENT still covers every vector via
    * one codegen'd transform pass. Below the cap the sample is the whole
    * input, so small-scale results are unchanged. */
  def build(vectors: DataFrame, idCol: String, vecCol: String, nlist: Int,
            seed: Long = 42L, maxTrain: Long = 200000L,
            nHint: Long = 0L): (DataFrame, DataFrame) = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val withVec = vectors.withColumn("__v",
      array_to_vector(col(vecCol).cast("array<double>")))
    // nHint (catalog/footer statistics, e.g. Engine.parquetRowCount) spares
    // the full count() — the sample-rate derivation only needs a row-count
    // estimate, not an exact corpus pass
    val n = if (nHint > 0) nHint else withVec.count()
    val train =
      if (n <= maxTrain) withVec
      // ppm granularity: a whole-percent rate floors at 1%, which at
      // n = 10^9 is 10^7 training rows — 50x the documented cap, growing
      // linearly with the corpus. ppm holds the cap to ~maxTrain rows
      // (up to n = 2*10^11; beyond that the 1-ppm floor re-enters)
      else Sampling.deterministicSamplePpm(withVec, idCol,
        math.min(1000000, math.max(1, math.ceil(maxTrain * 1e6 / n).toInt)), seed)
    // training-sample-sized parallelism: the sample is <= maxTrain rows
    // but INHERITS the corpus's partitioning — at 100 TB that is tens of
    // thousands of near-empty tasks per k-means iteration (20+ jobs per
    // fit), pure scheduler burn; at toy scale it is what made the
    // persisted-anchor fits wall-clock-bound (BASELINE.md r14 fit costs).
    // ~50k rows per training partition keeps every task meaningful at any
    // corpus size. REPARTITION, not coalesce: coalesce would propagate
    // upstream and collapse the full-corpus sampling scan itself to a
    // handful of tasks, while this shuffle moves only the sample rows
    // (deterministic: index-based round-robin over deterministic input).
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("__v").setPredictionCol("cell")
      .fit(train.repartition(trainPartitions(math.min(n, maxTrain))))
    val assigned = model.transform(withVec).drop("__v")
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "centroid")
    (assigned, centroids)
  }

  /** Partition count for a k-means TRAINING frame of `rows` rows: ~50k
    * rows per task, at least 1 — shared by the IVF and PQ fits so the
    * sample-sized-parallelism rule cannot drift between them. */
  private[operators] def trainPartitions(rows: Long): Int =
    math.max(1, math.min(64, math.ceil(rows.toDouble / 50000).toInt))

  /** APPLY-side cell assignment from a centroid FRAME — the fit/apply
    * split for the coarse quantizer (same pattern as
    * [[QuantileGate.fitThreshold]] / [[LmScore.fitUnigram]]): [[build]]
    * fits ONCE, the (cell, centroid) frame persists as an ordinary table,
    * and any later corpus — including one arriving after the fit, on a
    * cluster that never saw the MLlib model object — is assigned by pure
    * DataFrame ops: broadcast the nlist-row centroid frame, score every
    * (vector, centroid) pair with the fused codegen distance, keep the
    * argmin cell via one max_by aggregation (no window, no shuffle of the
    * vector corpus beyond the argmin's own hash agg — and that aggregates
    * |vectors|·nlist down to |vectors| with map-side partial combine).
    *
    * Assignment is by L2 distance (k-means geometry; same argmin as the
    * squared form); ties break toward the LOWER cell id, deterministic
    * under any partitioning.
    * Equality with the fitted model's own `transform` is asserted in
    * SimilaritySpec. */
  def assign(vectors: DataFrame, centroids: DataFrame,
             idCol: String, vecCol: String): DataFrame = {
    // a null / null-element / mis-sized vector makes l2_dist NULL against
    // EVERY centroid and the argmin would silently funnel the row into a
    // bogus cell (poisoning occupancy cards, probes, and persisted codes)
    // while the fit path throws on the same row — refuse loudly instead,
    // keeping fit/frozen result-equality honest on dirty input too
    // guarded take(1), matching assignInline's require: a bare .head on an
    // empty centroid frame throws an undiagnosable NoSuchElementException
    val dRow = centroids.select(size(col("centroid"))).take(1)
    require(dRow.nonEmpty, "assign: centroid frame is empty — fit the index first")
    val d = dRow(0).getInt(0)
    val scored = checkedVectors(vectors, vecCol, d, "assign")
      .crossJoin(broadcast(centroids))
      .withColumn("__d2", graft.functions.L2Dist.l2_dist(col(vecCol), col("centroid")))
    // argmin as max_by over (-d2, -cell): associative, partial-aggregated
    // map-side — the windowed row_number form would sort |vectors|·nlist
    scored.groupBy(col(idCol))
      .agg(max_by(col("cell"),
        struct((-col("__d2")).as("nd"), (-col("cell")).as("nc"))).as("cell"))
  }

  /** Top-k by cosine within the query's `nprobe` nearest cells.
    *
    * Probe cells rank by L2 distance to the centroid even though the final
    * ranking is cosine: k-means cells are L2-Voronoi regions, so the L2
    * probe matches the index geometry — a measured sweep (SimilaritySpec)
    * showed cosine-ranked probing strictly LOWERS recall at every nprobe
    * on this corpus. Recall is monotone in nprobe and reaches 1.0 at
    * nprobe = nlist (probing every cell = exhaustive scan); tune nprobe
    * against a sampled exact top-k, as the spec's sweep does. */
  def topK(candidates: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           k: Int, nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
           nHint: Long = 0L): DataFrame = {
    val (assigned, centroids) = build(candidates, idCol, vecCol, nlist, seed, nHint = nHint)
    probeTopK(assigned, centroids, queries, idCol, vecCol, k, nprobe)
  }

  /** MAP-ONLY cell assignment against a driver-side centroid frame — the
    * 100 TB apply shape: the centroid matrix rides the fused
    * [[graft.functions.CellArgmin]] kernel as ONE reference object whose
    * generated code loops cells × dims (O(1) code size at any nlist —
    * the earlier unrolled `least` over nlist structs crossed janino's
    * 64 KB method limit near nlist ≈ 300, dropping the corpus pass out
    * of whole-stage codegen exactly at production cell counts; r16
    * append ladder). Ties go to the LOWER cell id — the same rule as
    * [[assign]] — and the corpus is touched by ONE whole-stage-codegen
    * projection: no shuffle, no join, no aggregation, every input column
    * rides along untouched. Use [[assign]] when the centroids are only
    * available as a distributed frame too big to collect. */
  def assignInline(vectors: DataFrame, centroids: DataFrame, vecCol: String,
                   outCol: String = "cell"): DataFrame = {
    val cents = centroids.select(col("cell").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(cents.nonEmpty, "centroid frame is empty")
    val dim = cents.head._2.length
    require(cents.forall(_._2.length == dim),
      s"assignInline: ragged centroid frame (expected dim $dim)")
    val cells = cents.map(_._1)
    val matrix = new Array[Double](cents.length * dim)
    cents.zipWithIndex.foreach { case ((_, c), i) =>
      var j = 0
      while (j < dim) { matrix(i * dim + j) = c(j); j += 1 }
    }
    // same refusal as [[assign]]: a corrupt vector must raise the
    // descriptive error here, never silently land in a cell (the kernel
    // itself refuses with null; the guard turns that class of input into
    // a diagnosis before the argmin ever evaluates)
    checkedVectors(vectors, vecCol, dim, "assignInline")
      .withColumn(outCol,
        graft.functions.CellArgminExpr.cell_argmin(col(vecCol), cells, matrix))
  }

  /** Fused vector validity gate for the assignment paths: refuses null,
    * null-element, and mis-sized vectors with a descriptive error (the
    * raise_error rides the value path so pruning cannot drop it; the
    * message coalesces — size(NULL) is NULL and a bare concat would fire
    * with no text). */
  private def checkedVectors(vectors: DataFrame, vecCol: String, d: Int,
                             fn: String): DataFrame =
    vectors.withColumn(vecCol,
      // null-element detection via the fused L2 kernel (l2_dist(v,v) is
      // NULL iff v is null or carries a null element), NOT an exists()
      // HOF — ArrayExists is interpreted and would break the frozen-path
      // whole-stage-codegen plan pin (PlanSpec qe3d)
      when(size(col(vecCol)) === d &&
          graft.functions.L2Dist.l2_dist(col(vecCol), col(vecCol)).isNotNull,
        col(vecCol))
        .otherwise(raise_error(concat(
          lit(s"$fn: invalid vector (null, null element, or dim != $d): size="),
          coalesce(size(col(vecCol)).cast("string"), lit("null"))))))

  /** Fit-ONCE-per-process frozen centroid table: the first call per
    * (cacheKey, vecCol, nlist, seed) runs [[build]]'s seeded k-means and
    * collects its nlist-row centroid frame to the driver; every later call
    * replays the cached rows as a LocalRelation. This is the sandbox stand-in
    * for a persisted centroid artifact table: the registered frozen-IVF query
    * (qe3d) and a real deployment both read centroids as plain data, with NO
    * k-means fit anywhere in the executed plan. */
  def frozenCentroids(vectors: DataFrame, cacheKey: String, idCol: String,
                      vecCol: String, nlist: Int, seed: Long = 42L,
                      nHint: Long = 0L): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // EVERY fit-affecting param rides the key (the cosine_pairs idCol
    // lesson): idCol and nHint steer the maxTrain hash-mod training
    // sample, so two calls differing only there fit DIFFERENT centroids
    val rows = centroidCache.computeIfAbsent(
      s"$cacheKey|$idCol|$vecCol|$nlist|$seed|h$nHint", _ => {
      val (_, cents) = build(vectors, idCol, vecCol, nlist, seed, nHint = nHint)
      cents.collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    })
    rows.toDF("cell", "centroid")
  }

  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, Seq[Double])]]()

  /** PERSISTED frozen centroid table — the production form of
    * [[frozenCentroids]]: the first call per (input fingerprint, vecCol,
    * nlist, seed) fits the seeded k-means and writes the (cell, centroid)
    * frame as a parquet artifact ([[graft.Artifacts]]); every later call —
    * in THIS process or a fresh one — reads the artifact back, so the
    * quantizer fit survives restarts exactly as a centroid table in a real
    * deployment would. The returned frame is always the parquet read-back:
    * consumer plans contain a tiny scan, never k-means lineage. Keyed by
    * content fingerprint of `dataPath`, so a regenerated input refits
    * instead of serving stale centroids. */
  def persistedCentroids(vectors: DataFrame, dataPath: String, idCol: String,
                         vecCol: String, nlist: Int, seed: Long = 42L,
                         nHint: Long = 0L): DataFrame = {
    val spark = vectors.sparkSession
    val key = graft.Artifacts.fitKey(spark, Seq(dataPath),
      s"$idCol-$vecCol-nlist$nlist-seed$seed-h$nHint")
    graft.Artifacts.getOrFit(spark, "ivf_centroids", key,
      build(vectors, idCol, vecCol, nlist, seed, nHint = nHint)._2)
  }

  /** Top-k by cosine from a FROZEN centroid table ([[frozenCentroids]] or
    * any persisted (cell, centroid) frame): [[assignInline]] buckets the
    * corpus map-only, then the shared probe/score/top-k stage runs — the
    * plan a 1000-executor cluster would ship, with the quantizer fit
    * amortized across every corpus and query batch that reuses the
    * artifact. Result-equal to [[topK]] at the same nlist/nprobe/seed
    * (asserted in OperatorsSpec). */
  def topKFrozen(candidates: DataFrame, centroids: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    probeTopK(assignInline(candidates, centroids, vecCol), centroids, queries,
      idCol, vecCol, k, nprobe)

  /** Probe/score/top-k over an ALREADY-ASSIGNED postings frame — (idCol,
    * vecCol, cell) rows, e.g. a persisted postings artifact or the append
    * path's base∪batch union (r15, the qe76b key-set-append pattern on
    * the ANN index): the apply half of [[topKFrozen]] without
    * re-assigning. At a fixed centroid table, assignment is a pointwise
    * deterministic function of each vector ([[assignInline]]'s lexicographic
    * tie rule) and [[Similarity.rankTopK]] tiebreaks on cid, so searching
    * appended postings is provably row-identical to re-assigning the
    * union corpus from scratch — history is never re-assigned, append
    * cost is one batch projection plus a union (qe3f certifies the
    * equality per query against the DuckDB oracle). */
  def topKAssigned(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    probeTopK(assigned, centroids, queries, idCol, vecCol, k, nprobe)

  /** Index-health card for a frozen IVF index: per-cell occupancy
    * (cell, n, frac) ordered by cell. The number every IVF deployment
    * watches — a hot cell means the quantizer no longer fits the data
    * distribution (probe cost grows quadratically with occupancy) and it
    * is time to refit. One map-only [[assignInline]] pass + one tiny hash
    * aggregate; the frac window runs over the nlist-row card, never the
    * corpus. */
  def occupancyCard(vectors: DataFrame, centroids: DataFrame,
                    vecCol: String): DataFrame = {
    // localCheckpoint: counts feeds both the card and its total — without
    // it the corpus-assignment scan would run once per consumer
    val occupied = assignInline(vectors, centroids, vecCol)
      .groupBy("cell").agg(count(lit(1)).as("n"))
    // EVERY cell appears, zero-occupancy included: a dead cell is itself
    // a quantizer-misfit signal (data drifted away from the centroid),
    // and omitting it would hide exactly what the card exists to surface
    val counts = centroids.select(col("cell").cast("int").as("cell"))
      .join(occupied, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n"), lit(0L)).as("n"))
      .auditedCheckpoint()
    // total via a broadcast 1-row cross join, not an empty-partition window
    // (which would emit the single-partition WARN even on this tiny card)
    counts.crossJoin(broadcast(counts.agg(sum(col("n")).as("__t"))))
      // empty corpus: every n is 0 and n/__t is 0/0 (NULL here, an error
      // under ANSI) — an all-zero card with frac 0.0 is the honest read
      .withColumn("frac",
        when(col("__t") === 0, lit(0.0))
          .otherwise(round(col("n") / col("__t"), 4))).drop("__t")
      .orderBy("cell")
  }

  /** Shared probe/score/top-k stage over an already-cell-assigned corpus.
    * Probe list is the query's nprobe nearest centroids (tiny |q| x nlist
    * broadcast cross join); candidate scoring joins EQUI on the cell id;
    * final ranking is a per-query window whose input is already cut to
    * ~|corpus|*nprobe/nlist. */
  private def probeTopK(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val probes = probeCells(centroids, queries, idCol, vecCol, nprobe)
    val cands = assigned.select(col(idCol).as("cid"), col(vecCol).as("cv"), col("cell"))
    // the ONE ranking contract (Similarity.rankTopK): score/tiebreak/rank
    // semantics shared with every other ladder rung, so a contract fix
    // cannot reach brute/SRP and miss IVF (the qe60 certificates assume
    // identical ranking across rungs)
    Similarity.rankTopK(cands.join(probes, "cell"), k)
  }

  /** The query-side probe list — each query expanded to its `nprobe`
    * L2-nearest cells: (qid, qv, cell). A tiny |q| × nlist broadcast cross
    * join; shared by the IVF scorer above and the IVF-PQ ADC scorer
    * ([[PqIndex]]) so probe-cell selection can never drift between the
    * full-vector and quantized paths. */
  private[operators] def probeCells(centroids: DataFrame, queries: DataFrame,
                                    idCol: String, vecCol: String, nprobe: Int): DataFrame = {
    val probeW = Window.partitionBy("qid").orderBy(col("dist"), col("cell"))
    queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("dist", graft.functions.L2Dist.l2_dist(col("qv"), col("centroid")))
      .withColumn("pr", row_number().over(probeW)).filter(col("pr") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))
  }
}
