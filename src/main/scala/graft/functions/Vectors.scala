package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Numeric discipline for the differential oracle: each elementwise
  * product is computed in double, rounded to fixed-point 1e-12 and summed
  * as BIGINT (exact, order-independent — see [[graft.functions.expr.FixedPointDot]]),
  * so the total is identical across engines; the final divide/sqrt are
  * correctly-rounded double ops.
  *
  * Scale design: brute-force kNN is the baseline (query-set broadcast ×
  * corpus scan — fine for small query batches); the LSH-bucketed variant
  * hashes every vector to a sign-pattern bucket with one narrow map, so
  * candidate pairs are bucket-local and the all-pairs O(n²) never
  * materializes. On a cluster, bucket the corpus table by `bucket` to
  * make the pair join co-partitioned.
  */
object Vectors {

  /** Exact, order-independent dot product of two float-array columns:
    * each double product is rounded to fixed-point 1e-12 and summed as
    * BIGINT (exact, < 2^53), then scaled back — identical in any engine.
    * (A decimal fold would hit Spark's precision-capping on +.) */
  def dot(a: Column, b: Column): Column = dotExpr(a, b)

  private def dotExpr(a: Column, b: Column): Column =
    graft.functions.expr.FixedPointDot(a, b).cast("double") / lit(1e12)

  /** L2 norm (same decimal-exact discipline). */
  def norm(v: Column): Column = sqrt(dotExpr(v, v))

  /** Cosine between two vector columns. */
  def cosine(a: Column, b: Column): Column = dotExpr(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors for a query subset.
    * `emb` must have (vec_id, embedding). */
  def knnBrute(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    // norms once per vector (not per pair) — the pair loop pays only the dot
    val queries = emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        norm(col("embedding")).as("qn"))
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"),
      norm(col("embedding")).as("nn"))
    val scored = broadcast(queries).join(corpus, col("qid") =!= col("nid"))
      .withColumn("cosine", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for plane j, dim k:
    * (((j*31 + k*17 + j*k*13) % 101) % 7) - 3 — integers, identical in
    * any engine. The j·k cross term matters: a form linear in j and k
    * collapses mod the small modulus (31 ≡ 17 ≡ 3 mod 7 made plane j
    * depend only on j mod 7 — SEVEN distinct planes in the whole family,
    * so "independent" plane-sets produced identical cuts and band OR-ing
    * gained nothing). With the cross term, planes are distinct for
    * j up to the outer modulus 101. */
  def hyperplane(j: Int, dims: Int): Seq[Double] =
    (0 until dims).map(k => ((((j * 31 + k * 17 + j * k * 13) % 101) % 7) - 3).toDouble)

  /** Sign-LSH bucket id (nPlanes-bit int) for each vector. */
  def withLshBucket(emb: DataFrame, dims: Int, nPlanes: Int = 8): DataFrame = {
    val bucket = (0 until nPlanes).map { j =>
      val h = hyperplane(j, dims)
      // dot(v, h_j) with the same fixed-point-exact expression
      val prods = graft.functions.expr.FixedPointDot(
        col("embedding"), array(h.map(x => lit(x)): _*))
      when(prods >= 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)
    emb.withColumn("bucket", bucket)
  }

  /** IVF (inverted-file) ANN: deterministic coarse quantizer — the first
    * nCells vectors (by id) act as centroids; every vector is assigned to
    * its best cell by cosine, queries probe their top-`nProbe` cells.
    * The cell column is the partition/bucket key at cluster scale: a
    * probe touches nProbe/nCells of the corpus instead of all of it. */
  def withIvfCell(emb: DataFrame, nCells: Int): DataFrame = {
    val centroids = emb.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cellId"), col("embedding").as("cv"))
    val scored = emb.crossJoin(broadcast(centroids))
      .withColumn("cellCos", dot(col("embedding"), col("cv")) /
        (norm(col("embedding")) * norm(col("cv"))))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cellCos").desc, col("cellId"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cellId"))
  }

  /** IVF search: top-k neighbors for `queryPred` vectors probing the
    * query's own cell plus the next (nProbe-1) best cells. */
  def ivfSearch(emb: DataFrame, nCells: Int, nProbe: Int,
                queryPred: Column, k: Int): DataFrame = {
    // celled is consumed once in this plan — lazy, no cache
    val celled = withIvfCell(emb, nCells)
    val centroids = emb.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cellId"), col("embedding").as("cv"))
    // per-query probe list: top-nProbe cells by centroid cosine
    val probes = emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        norm(col("embedding")).as("qn"))
      .crossJoin(broadcast(centroids))
      .withColumn("cellCos", dot(col("qv"), col("cv")) / (col("qn") * norm(col("cv"))))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cellCos").desc, col("cellId"))))
      .filter(col("__rn") <= nProbe)
      .select(col("qid"), col("qv"), col("qn"), col("cellId"))
    val candidates = probes.join(celled, Seq("cellId"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cosine", dot(col("qv"), col("embedding")) /
        (col("qn") * norm(col("embedding"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("cellId"), col("cosine"), col("rank"))
  }

  /** ANN near-duplicate pairs: same LSH bucket, cosine above threshold.
    * Norms are computed once per vector; the bucket join is the only
    * shuffle, and both self-join sides shuffle the SAME bucketed subtree
    * so ReuseExchange scans/hashes the corpus once — no cache, lazy plan.
    *
    * Sizing `nPlanes` at scale: each bucket holds ~n/2^nPlanes vectors and
    * the within-bucket pair join is quadratic in bucket size, so pick
    * nPlanes ≈ log2(n / 10^4) (buckets ≳ n/10⁴) — e.g. 8 planes up to
    * ~2.5M vectors, 17 planes at 1B. More planes trade recall for speed;
    * compensate with band OR-ing (run r plane-sets and union pairs) the
    * same way [[Dedup.lshCandidates]] bands minhashes. On a cluster,
    * bucket the corpus table by `bucket` to co-partition the join. */
  def annPairs(emb: DataFrame, dims: Int, minCosine: Double,
               nPlanes: Int = 8): DataFrame = {
    val b = withLshBucket(emb, dims, nPlanes)
      .select(col("vec_id"), col("embedding"), col("bucket"),
        norm(col("embedding")).as("nrm"))
    val left = b.select(col("vec_id").as("id1"), col("embedding").as("v1"),
      col("bucket"), col("nrm").as("n1"))
    val right = b.select(col("vec_id").as("id2"), col("embedding").as("v2"),
      col("bucket"), col("nrm").as("n2"))
    // shuffled (not broadcast) so the scan+norm+bucket subtree is computed
    // once via ReuseExchange — see the note in Dedup.lshCandidates
    left.hint("shuffle_hash").join(right.hint("shuffle_hash"), Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("cosine", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cosine") >= minCosine)
      .select(col("bucket"), col("id1"), col("id2"), col("cosine"))
  }

  /** Multi-probe (band-OR) sign-LSH near-duplicate pairs: `r` independent
    * plane-sets (set t uses hyperplanes t·nPlanes … t·nPlanes+nPlanes−1),
    * candidate pairs are the UNION over sets of bucket-local pairs — the
    * recall dial [[Dedup.withBands]] gives minhash LSH, applied to the
    * embedding index. With r sets a true near-dup pair is missed only if
    * it splits in EVERY set, so recall rises as 1−(1−p)^r per pair while
    * cost stays r × the single-set bucket join.
    *
    * Same narrow-pair shape as [[Dedup.lshCandidates]]: only
    * (vec_id, setIdx, bucket) flows through the bucket join and the pair
    * `distinct()`; full vectors join back AFTER the dedup for the exact
    * cosine filter. r=1 reproduces [[annPairs]]' pair set exactly. */
  def annPairsMulti(emb: DataFrame, dims: Int, minCosine: Double,
                    nPlanes: Int = 8, r: Int = 2): DataFrame = {
    val bucketCols = (0 until r).map { t =>
      (0 until nPlanes).map { j =>
        val h = hyperplane(t * nPlanes + j, dims)
        val prods = graft.functions.expr.FixedPointDot(
          col("embedding"), array(h.map(x => lit(x)): _*))
        when(prods >= 0, 1L << j).otherwise(0L)
      }.reduce(_ + _)
    }
    val melted = emb.select(col("vec_id"),
      posexplode(array(bucketCols: _*)).as(Seq("setIdx", "bucket")))
    val left = melted.select(col("vec_id").as("id1"), col("setIdx"), col("bucket"))
    val right = melted.select(col("vec_id").as("id2"), col("setIdx"), col("bucket"))
    // shuffled so ReuseExchange computes the r-bucket melt once — see the
    // note in Dedup.lshCandidates
    val pairs = left.hint("shuffle_hash")
      .join(right.hint("shuffle_hash"), Seq("setIdx", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    val v = emb.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val vL = v.select(col("vec_id").as("id1"), col("embedding").as("v1"), col("nrm").as("n1"))
    val vR = v.select(col("vec_id").as("id2"), col("embedding").as("v2"), col("nrm").as("n2"))
    pairs.join(vL, Seq("id1")).join(vR, Seq("id2"))
      .withColumn("cosine", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cosine") >= minCosine)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** Exact all-pairs cosine-threshold ground truth — O(n²), the
    * gate/test-scale baseline the LSH pair recall is measured against
    * (never the 100 TB path; annPairsMulti is). */
  def bruteCosinePairs(emb: DataFrame, minCosine: Double): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val a = v.select(col("vec_id").as("id1"), col("embedding").as("v1"), col("nrm").as("n1"))
    val b = v.select(col("vec_id").as("id2"), col("embedding").as("v2"), col("nrm").as("n2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cosine", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cosine") >= minCosine)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  // ---- Product quantization (PQ) --------------------------------------

  /** Fixed-point squared-L2 distance between two vector columns (BIGINT,
    * scale 1e12 — exact and engine-independent, see FixedPointL2). */
  def l2sq(a: Column, b: Column): Column = graft.functions.expr.FixedPointL2(a, b)

  /** Deterministic PQ codebook: the first `kCode` vectors (by vec_id)
    * donate their subvectors as centroids — one row per (subspace j,
    * centroid c), cv = the dsub-dim slice. kCode·m rows total, always
    * broadcast. (A trained k-means codebook drops in by replacing this
    * frame; everything downstream is codebook-agnostic.) */
  def pqCodebook(emb: DataFrame, m: Int, dsub: Int, kCode: Int): DataFrame = {
    // kCode rows — the single-partition window ranks a bounded frame
    val w = Window.orderBy(col("vec_id"))
    emb.orderBy(col("vec_id")).limit(kCode)
      .withColumn("c", (row_number().over(w) - 1).cast("long"))
      .select(col("c"), explode(sequence(lit(0L), lit(m - 1L))).as("j"), col("embedding"))
      .select(col("j"), col("c"),
        slice(col("embedding"), col("j").cast("int") * dsub + 1, lit(dsub)).as("cv"))
  }

  /** PQ code assignment: every vector × broadcast codebook, nearest
    * centroid per subspace by exact fixed-point L2² (ties → lower c).
    * The cross join fans each row out m·kCode ways INSIDE its task and
    * min_by's map-side partials collapse it back to m rows before the
    * one skinny shuffle on (vec_id, j) — at 100 TB the codes build is a
    * single linear pass over the corpus. Output: (vec_id, j, code). */
  def pqCodes(emb: DataFrame, codebook: DataFrame, dsub: Int): DataFrame =
    emb.crossJoin(broadcast(codebook))
      .withColumn("d2",
        l2sq(slice(col("embedding"), col("j").cast("int") * dsub + 1, lit(dsub)), col("cv")))
      .groupBy(col("vec_id"), col("j"))
      .agg(min_by(col("c"), struct(col("d2"), col("c"))).as("code"))

  /** PQ asymmetric-distance (ADC) top-k search: queries keep their full
    * vectors, the corpus is represented only by its codes. Per query the
    * distance table lut(qid, j, c) = L2²(query subvector, centroid) is
    * tiny (nq·m·kCode rows) and broadcast; the search is then ONE scan of
    * the codes table — join on (j, code), partial-aggregated SUM per
    * (qid, vec_id) — no full-vector math against the corpus at all.
    * This is the 100 TB path: 8 bytes of code replace 256 bytes of
    * floats, and scan cost is independent of dimensionality. Distances
    * are exact BIGINTs end-to-end (sum of fixed-point subspace terms),
    * so ranking is engine-independent. */
  def pqAdcSearch(emb: DataFrame, m: Int, dsub: Int, kCode: Int,
                  queryPred: Column, k: Int): DataFrame = {
    val cb = pqCodebook(emb, m, dsub, kCode)
    val codes = pqCodes(emb, cb, dsub)
    val lut = emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .crossJoin(broadcast(cb))
      .select(col("qid"), col("j"), col("c"),
        l2sq(slice(col("qv"), col("j").cast("int") * dsub + 1, lit(dsub)), col("cv")).as("qd2"))
    val scored = codes
      .join(broadcast(lut), codes("j") === lut("j") && col("code") === lut("c"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("qd2")).as("adcDist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adcDist").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("adcDist"), col("rank"))
  }

  /** Exact top-k by full-vector fixed-point L2² for a query subset — the
    * ground truth the PQ recall gate measures against. */
  def l2BruteTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val queries = emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("nid").asc)
    broadcast(queries).join(corpus, col("qid") =!= col("nid"))
      .withColumn("d2", l2sq(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("d2"), col("rank"))
  }

  /** recall@k of the PQ-ADC index vs the exact L2 ground truth — the
    * accept dial every approximate index ships with (same contract as
    * the IVF gate, sim4). */
  def pqRecall(emb: DataFrame, m: Int, dsub: Int, kCode: Int,
               queryPred: Column, k: Int): DataFrame = {
    val approx = pqAdcSearch(emb, m, dsub, kCode, queryPred, k)
      .select(col("qid"), col("nid"))
    val exact = l2BruteTopK(emb, queryPred, k).select(col("qid"), col("nid"))
    // denominator = the exact rows actually present per query (count(*)
    // over the left side), not lit(k): with fewer than k other vectors the
    // ground truth has < k rows and a perfect index must still score 1.0
    exact.join(approx.withColumn("hit", lit(1)), Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg(count(col("hit")).as("hits"),
        (count(col("hit")).cast("double") / count(lit(1))).as("recall"))
  }
}
