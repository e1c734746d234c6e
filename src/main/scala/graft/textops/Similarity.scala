package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ArrayExprs

/** Similarity search over embedding columns (`Array[Float]`): exact
  * brute-force cosine top-k as the correctness baseline, and a random-
  * hyperplane LSH-bucketed approximate variant as the scale path (IVF-style
  * coarse quantization is the same shape: replace the hyperplane bucket
  * with a nearest-centroid id).
  *
  * Vector math is row-local native expressions (one pass per array, see
  * [[graft.functions.ArrayExprs]]) — no UDF, no driver collect, no shuffle
  * beyond the join/rank structure. Embedding-cosine near-dup
  * (dedup by semantic similarity) is `cosineTopK` with query==corpus plus a
  * threshold filter.
  */
object Similarity {

  /** Σ aᵢ·bᵢ — native one-pass expression ([[graft.functions.ArrayExprs]]);
    * same semantics as `aggregate(zip_with(a,b,_*_), 0.0, _+_)`.
    */
  def dot(a: Column, b: Column): Column = ArrayExprs.dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, dot and both norms accumulated in one array pass. */
  def cosine(a: Column, b: Column): Column = ArrayExprs.cosine(a, b)

  /** Exact top-k nearest neighbors (cosine) for each query vector.
    *
    * The query side is explicitly `broadcast()`: top-k search is a
    * broadcast-nested-loop against the corpus — each corpus partition
    * scores all queries locally, then one shuffle on query id ranks the
    * per-query candidates. At 1000 executors this scans the corpus once;
    * the thing that must NEVER happen (corpus × corpus shuffle) can't.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** Embedding near-dup pairs: all (a<b) pairs with cosine ≥ threshold.
    * EXACT baseline — O(n²) pair evaluations by construction, so it's the
    * spec/verification reference for modest corpora, never the fleet path.
    * The scale route is [[cosineNearDupPairsLsh]]: hyperplane-banded
    * buckets, within-bucket pairs, exact cosine verify.
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // O(n²) pair evaluations are unavoidable for the exact variant, but
    // each vector's L2 norm is computed once here (n sqrt'd self-dots)
    // instead of twice per pair, and — critically — the similarity
    // threshold lives INSIDE the join condition: the broadcast-nested-loop
    // join evaluates the (codegen'd, see ArrayExprs.DotProduct) predicate
    // per pair and only MATERIALIZES surviving rows. A join-then-filter
    // formulation copies both embedding arrays into 12.5M joined rows at
    // sf0.1 (~12 GB of row traffic) before dropping nearly all of them —
    // that copy, not the arithmetic, was 3.3 s of round 1's q34.
    // Bit-identical to CosineSim: sab/(√saa·√sbb), same accumulation order;
    // the survivors' cos_sim re-evaluation is ~|result| dots, negligible.
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      l2Norm(col(vecCol)).as("norm_a"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      l2Norm(col(vecCol)).as("norm_b"))
    val sim = dot(col("va"), col("vb")) / (col("norm_a") * col("norm_b"))
    a.join(b, col("id_a") < col("id_b") && sim >= threshold)
      .withColumn("cos_sim", sim)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64 over (plane, dim)
    * index — identical on every executor, no Math.random).
    */
  private[graft] def hyperplane(plane: Int, dims: Int): Seq[Double] =
    (0 until dims).map { d =>
      var z = (plane.toLong * 1048573L + d.toLong + 1L) * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)).toDouble / Long.MaxValue.toDouble)
    }

  /** Random-hyperplane signature: bit i = sign(v · hᵢ), packed to a long.
    * Charikar 2002 — P(bits agree) = 1 − θ/π. At most 64 planes fit the
    * packing (shiftleft past bit 63 would silently wrap).
    */
  def hyperplaneSignature(vec: Column, planes: Int, dims: Int): Column = {
    require(planes >= 1 && planes <= 64,
      s"planes must be in [1,64] to pack into a long, got $planes")
    // one band of `planes` bits — the same single-pass native expression
    // as [[banded]] ([[ArrayExprs.BandBuckets]]); bit-identical to the
    // when(dot > 0) composition it replaces for non-null vectors (a
    // whole-null vector now yields a null signature instead of the
    // legacy all-zero 0L — see the BandBuckets null-semantics scaladoc)
    element_at(ArrayExprs.bandBuckets(vec, 1, planes, dims,
      planeMatrix(planes, dims)), 1)
  }

  /** Flattened row-major [nPlanes × dims] hyperplane matrix for
    * [[ArrayExprs.BandBuckets]].
    */
  private def planeMatrix(nPlanes: Int, dims: Int): IndexedSeq[Double] =
    (0 until nPlanes).flatMap(p => hyperplane(p, dims))

  /** Bits-per-band for a corpus of `corpusCount` vectors: expected bucket
    * density is n/2^r, so r = ⌈log₂(n / targetBucketDensity)⌉ holds the
    * expected same-bucket population at ~`targetBucketDensity` regardless
    * of corpus size — the knob the round-4 audit flagged as missing (fixed
    * r=4 puts ~6×10⁷ ids in every bucket at n=10⁹, and the `maxBucket` cap
    * then silently drops them all). Floored at 4 bits (below that the
    * within-bucket quadratic term dominates even for tiny corpora) and
    * capped at 63 (the long packing bound). Recall at a fixed band count
    * falls as r grows — `bands` is the recall knob: grow it alongside r
    * (total dot tests = bands × r; the banding no longer packs into a
    * single 64-bit word, so bands × r may exceed 64 freely).
    */
  def autoBandBits(corpusCount: Long, targetBucketDensity: Long = 256): Int = {
    require(targetBucketDensity >= 1, "targetBucketDensity must be >= 1")
    val ratio = math.max(corpusCount.toDouble / targetBucketDensity, 1.0)
    math.min(63, math.max(4, math.ceil(math.log(ratio) / math.log(2.0)).toInt))
  }

  /** Shared banding: `bands` independent buckets per vector, band j's
    * bucket bit i = sign(v · hyperplane(j·r + i)). Each band's bucket is
    * built directly (one long per band), so bands × bitsPerBand — the total
    * hyperplane count — is NOT capped at 64; bitsPerBand itself is capped
    * at 63: `(1L << 64) - 1` is 0 on the JVM, which would collapse every
    * vector into bucket 0 — and a 1-band/64-bit config belongs in an exact
    * join on the full signature anyway. For bands × bitsPerBand ≤ 64 the
    * buckets are bit-identical to slicing [[hyperplaneSignature]] (band j =
    * bits [j·r, (j+1)·r)), which is what the driver's SQL oracle restates.
    */
  private[textops] def banded(df: DataFrame, idName: String, bands: Int,
      bitsPerBand: Int, dims: Int, vecCol: String,
      payload: Seq[String] = Nil): DataFrame = {
    require(bands >= 1, "bands must be >= 1")
    require(bitsPerBand >= 1 && bitsPerBand <= 63,
      s"bits per band must be in [1,63], got $bitsPerBand")
    // `payload` columns ride along under each exploded band row — the
    // inline-verify shape keeps the vector itself here, saving the id
    // re-join the id-only shape pays at verification time. All buckets
    // come from ONE [[ArrayExprs.BandBuckets]] pass (bit-identical to
    // the 64-separate-dot composition; see its scaladoc), posexploded
    // so the array index IS the band id.
    df.select(col(idName) +: payload.map(col) :+
        posexplode(ArrayExprs.bandBuckets(col(vecCol), bands, bitsPerBand,
          dims, planeMatrix(bands * bitsPerBand, dims)))
          .as(Seq("band", "bucket")): _*)
  }

  /** Integer quantization grid for the IVF coarse quantizer: component
    * x → floor(x · 4096), kept as integer-VALUED doubles. The point is
    * exactness, not compression: dot products and cluster sums of
    * integers below 2^53 are EXACT in IEEE double, hence
    * order-independent — the whole trainer becomes bit-deterministic
    * across run orders AND across engines, which is what lets the driver
    * oracle restate it in DuckDB SQL ([[graft.OracleGen.q44Sql]]). The
    * 1/4096 grid error is ~2⁻¹² relative on unit-scale embeddings —
    * far below the coarse quantizer's own approximation (recall specs
    * are unaffected).
    */
  private[graft] val IvfQuantScale = 4096.0

  private[graft] def ivfQuantized(vec: Column): Column =
    transform(vec, x => floor(x * IvfQuantScale).cast("double"))

  /** Per-centroid spherical-similarity scores for a QUANTIZED vector
    * against integer-grid centroids: score_c = dot(qv, c) / √|c|² ranks
    * identically to cosine (|qv| is constant per row) but costs one
    * division, and with exact-integer inputs both dot and |c|² are exact —
    * the score is ONE deterministic rounding, so rankings can never flip
    * on accumulation order. An all-zero centroid scores -∞. SHARED by
    * assignment ([[nearestCentroidQ]]) and probe selection
    * ([[ivfTopKWith]]) — the q44 oracle requires the two to stay
    * bit-identical, so there is exactly one definition.
    */
  private def centroidScores(qvec: Column,
      cents: Array[Array[Double]]): Seq[Column] =
    cents.toIndexedSeq.map { c =>
      val n2 = c.map(x => x * x).sum
      if (n2 == 0.0) lit(Double.NegativeInfinity)
      else dot(qvec, lit(c)) / math.sqrt(n2)
    }

  /** Argmax of [[centroidScores]]; first index wins ties
    * (array_position).
    */
  private def nearestCentroidQ(qvec: Column,
      cents: Array[Array[Double]]): Column = {
    val sims = array(centroidScores(qvec, cents): _*)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** Full-corpus cluster assignment for trained centroids — spherical
    * k-means as a first-class operator (semantic grouping / diversity
    * sampling / the IVF coarse quantizer reused standalone): every vector
    * argmax-assigned on the [[IvfQuantScale]] integer grid, first cid
    * winning ties — bit-identical to what training and probing use
    * ([[nearestCentroidQ]] is the single definition). A pure projection
    * over k inlined centroid columns: no shuffle, no per-row state —
    * embarrassingly parallel at any corpus size.
    */
  def kmeansAssign(corpus: DataFrame, cents: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol),
      nearestCentroidQ(ivfQuantized(col(vecCol)), cents).as("cid"))

  /** Quantized Johnson–Lindenstrauss random projection: `outDim`
    * components, component p = ⟨⌊v·scale⌋, ⌊h_p·scale⌋⟩ over the
    * deterministic [[hyperplane]] matrix — dimensionality reduction as a
    * pure PROJECTION (no shuffle, no training, no state), the cheap
    * pre-filter in front of exact/ANN search when 64-float vectors are
    * too wide to ship. Both the vector and the planes are quantized to
    * a small integer grid first, so every component is an EXACT integer
    * in a double (|qv|,|qh| ≤ scale ⇒ |proj| ≤ dims·scale² = 2^18 at the
    * defaults) and downstream cosine dot/norm sums stay exact too
    * (≤ outDim·2^36 ≪ 2^53) — rankings can never flip on accumulation
    * order, the q44/q75 exactness discipline applied to JL. The scale
    * trades quantization error against that exactness headroom; the
    * recall spec quantifies the error at the defaults.
    */
  def randomProjectQ(corpus: DataFrame, outDim: Int, dims: Int,
      scale: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(outDim >= 1 && dims >= 1 && scale >= 1)
    // the guard covers the FULL exactness claim: not just each projected
    // component (|proj| ≤ dims·scale²) but the downstream cosine dot/norm
    // sums over outDim squared components — outDim·(dims·scale²)² must
    // stay under 2^53 or projected-space rankings could flip on
    // accumulation order despite exact components (BigInt: the square
    // overflows Long well inside otherwise-plausible configs)
    val comp = BigInt(dims) * scale * scale
    require(BigInt(outDim) * comp * comp < (BigInt(1) << 53),
      s"grid overflow: dims=$dims scale=$scale outDim=$outDim — " +
        s"outDim·(dims·scale²)² = ${BigInt(outDim) * comp * comp} ≥ 2^53; " +
        "downstream cosine sums would lose exactness")
    // quantize ONCE through its own projection: referencing the transform
    // expression from all outDim dot components would inline (and
    // re-evaluate) it outDim times per row — CollapseProject declines to
    // merge the two projections precisely because qv is multiply
    // referenced and non-cheap
    val quantized = corpus.select(col(idCol),
      transform(col(vecCol),
        x => floor(x * lit(scale.toDouble)).cast("double")).as("graft_qv"))
    val comps = (0 until outDim).map { p =>
      val hq = hyperplane(p, dims)
        .map(x => math.floor(x * scale)).toArray
      dot(col("graft_qv"), lit(hq))
    }
    quantized.select(col(idCol), array(comps: _*).as("proj"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by cluster-then-prune — assign every vector to its
    * nearest trained centroid ([[kmeansAssign]] semantics, bit-identical
    * grid assignment), then mark as duplicate every vector that has a
    * SMALLER-id neighbor in the SAME cluster with cosine ≥ `threshold`.
    * Survivors are the id-minimal elements of each ε-neighborhood — the
    * same deterministic keep-smallest policy as the q68 dedup survivors.
    *
    * Scale shape — the whole point of the method: candidate pairs are
    * confined to clusters, so pair volume is Σ|cluster|² instead of n².
    * At fleet scale k grows ∝ n to hold E[cluster] bounded (the paper
    * runs k = 50k on LAION); `maxCluster` is the safety valve — a
    * cluster larger than the cap contributes NO pairs (its members are
    * all kept, recall forfeited loudly rather than the job dying on a
    * quadratic straggler), same posture as the LSH bucket caps. The
    * within-cluster self-join is pinned `shuffle_hash`: a per-vector
    * array frame must never ride a broadcast at any scale (the 100×
    * smoke lane's AQE-misestimate lesson), and sort-merge would sort
    * both sides on cid for nothing.
    *
    * Returns (id, cid, kept 0/1) for EVERY corpus vector, `idCol`-named
    * id column preserved.
    */
  def semDedup(corpus: DataFrame, cents: Array[Array[Double]],
      threshold: Double, maxCluster: Int = 1 << 20,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    { val (r, release) = semDedupReleasable(corpus, cents, threshold,
        maxCluster, idCol, vecCol)
      graft.CacheHandles.register(release); r }

  /** [[semDedup]] plus a release handle freeing the persisted assignment
    * frame — the O(n·k·d) nearest-centroid assignment feeds FOUR plan
    * subtrees (the cluster-size gate, both self-join sides, the final
    * keep/drop select), so without the persist it recomputes per
    * consumer (the minhashLshPairsReleasable discipline). Call the
    * handle once the caller's action has materialized the result.
    */
  def semDedupReleasable(corpus: DataFrame, cents: Array[Array[Double]],
      threshold: Double, maxCluster: Int = 1 << 20,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, () => Unit) = {
    val asg = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        nearestCentroidQ(ivfQuantized(col(vecCol)), cents).as("cid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // k is driver-small by construction (it's an Array in memory), so the
    // size gate is a broadcast of at most k rows; clusters over the cap
    // are excluded from pair generation entirely.
    val okClusters = broadcast(asg.groupBy("cid")
      .agg(count(lit(1)).as("csz"))
      .filter(col("csz") <= maxCluster)
      .select("cid"))
    val a = asg.join(okClusters, "cid").select(col("cid"),
      col("id").as("id_a"), col("v").as("va"), l2Norm(col("v")).as("na"))
    val b = asg.join(okClusters, "cid").select(col("cid"),
      col("id").as("id_b"), col("v").as("vb"), l2Norm(col("v")).as("nb"))
    // threshold inside the join condition: only surviving pairs
    // materialize rows (the q34 lesson — the copy, not the arithmetic,
    // is the cost of a join-then-filter formulation)
    val sim = dot(col("va"), col("vb")) / (col("na") * col("nb"))
    val dups = a.hint("shuffle_hash")
      .join(b.hint("shuffle_hash"),
        a("cid") === b("cid") && col("id_a") < col("id_b")
          && sim >= threshold)
      .select(col("id_b").as("id")).distinct()
    val out = asg.select("id", "cid")
      .join(dups.withColumn("dup", lit(1)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cid"),
        when(col("dup").isNull, 1).otherwise(0).as("kept"))
    (out, () => { asg.unpersist(blocking = false); () })
  }

  // ------------------------------------------------------------------- PQ

  /** Per-centroid L2 ranking scores for a quantized SUBvector: argmin
    * ‖v−c‖² = argmax (2·⟨v,c⟩ − ‖c‖²) (‖v‖² is constant per row) — and
    * with exact-integer grid inputs both terms are exact in doubles
    * (|2·dot| ≤ 2^47, ‖c‖² ≤ 2^46 at 16 dims), so the score is an exact
    * integer and rankings can never flip on accumulation order. The PQ
    * counterpart of [[centroidScores]]' spherical ranking (PQ codebooks
    * are Euclidean — Jégou et al. 2011).
    */
  private def l2Scores(qvec: Column,
      cents: Array[Array[Double]]): Seq[Column] =
    cents.toIndexedSeq.map { c =>
      val n2 = c.map(x => x * x).sum
      lit(2.0) * dot(qvec, lit(c)) - lit(n2)
    }

  /** Product-quantization codebooks (Jégou et al. 2011): the vector space
    * is split into `m` contiguous subspaces of dims/m components; each
    * subspace trains its own `k`-centroid EUCLIDEAN Lloyd codebook on the
    * [[IvfQuantScale]] integer grid, over the same deterministic hash
    * subsample and smallest-hash init as [[trainIvfCentroids]] (the same
    * rows seed every subspace). A vector's PQ code is the m-tuple of
    * nearest codewords — dims floats compressed to m small ints, the
    * standard ANN serving compression (IVF routes, PQ codes score).
    *
    * Determinism contract as the IVF trainer: no RNG, exact-integer
    * arithmetic end to end (the [[l2Scores]] ranking and floor-mean
    * updates), every step restated in the q84 DuckDB oracle. Training
    * cost is m small sampled jobs per iteration (offline, like every
    * codebook build); assignment is a pure projection.
    *
    * Returns m codebooks, each k × (dims/m).
    */
  def trainPqCodebooks(corpus: DataFrame, m: Int = 4, k: Int = 16,
      iters: Int = 2, trainMod: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : Array[Array[Array[Double]]] = {
    require(m >= 1 && k >= 1 && iters >= 1)
    val train = (if (trainMod <= 1) corpus
      else corpus.filter(pmod(xxhash64(col(idCol)), lit(trainMod)) === 0))
      .select(col(idCol), ivfQuantized(col(vecCol)).as("qv"))
      .cache()
    try {
      val statsRow = train
        .agg(max(array_max(transform(col("qv"), x => abs(x)))),
          max(size(col("qv"))))
        .head()
      require(!statsRow.isNullAt(0) && !statsRow.isNullAt(1),
        s"empty PQ training sample: no rows survive trainMod=$trainMod " +
          "(empty corpus or over-aggressive subsampling)")
      val (maxAbs, dims) = (statsRow.getDouble(0), statsRow.getInt(1))
      require(maxAbs <= (1L << 20).toDouble,
        f"PQ quantized components reach |$maxAbs%.0f| > 2^20 — inputs " +
          "must be roughly unit-scale (the IVF grid exactness contract)")
      require(dims % m == 0, s"dims $dims not divisible by m=$m")
      val sub = dims / m
      // the k smallest-id-hash sample rows seed every subspace's codebook
      val seeds = train
        .orderBy(xxhash64(col(idCol)), col(idCol))
        .limit(k)
        .select(col("qv")).collect()
        .map(_.getSeq[Double](0).toArray)
      (0 until m).map { s =>
        val sv = train.select(col(idCol),
          slice(col("qv"), s * sub + 1, sub).as("sv"))
        var cents: Array[Array[Double]] =
          seeds.map(_.slice(s * sub, (s + 1) * sub))
        for (_ <- 1 to iters) {
          val sums = sv
            .select(argmaxIdx(l2Scores(col("sv"), cents)).as("cid"),
              posexplode(col("sv")).as(Seq("pos", "v")))
            .groupBy("cid", "pos")
            .agg(sum("v").as("s"), count(lit(1)).as("n"))
            .collect()
          val next = cents.map(_.clone())
          sums.foreach { r =>
            next(r.getAs[Int]("cid"))(r.getAs[Int]("pos")) =
              math.floor(r.getAs[Double]("s") / r.getAs[Long]("n"))
          }
          cents = next
        }
        cents
      }.toArray
    } finally train.unpersist(blocking = false)
  }

  /** Full-corpus PQ code assignment + reconstruction distortion: per
    * vector the m nearest-codeword indices as SCALAR columns
    * `code_0..code_{m-1}` and the exact integer squared reconstruction
    * error Σ_s ‖sv_s − c_code(s)‖² on the grid (`recon_sq`) — publishing
    * the distortion makes the gate pin the codebook VALUES, not only
    * which codeword won. Scalar columns (not one array) keep the result
    * sortable/hashable by any downstream tooling — an array-typed gate
    * column defeats generic result canonicalizers. Pure projection over
    * m·k inlined codeword columns: no shuffle, embarrassingly parallel.
    */
  def pqAssign(corpus: DataFrame, books: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = books.length
    val sub = books(0)(0).length
    val withQ = corpus.withColumn("graft_qv", ivfQuantized(col(vecCol)))
    val subCols = (0 until m).map(s =>
      slice(col("graft_qv"), s * sub + 1, sub))
    val scoreArrs = (0 until m).map(s =>
      array(l2Scores(subCols(s), books(s)): _*))
    val codes = scoreArrs.zipWithIndex.map { case (sc, s) =>
      (array_position(sc, array_max(sc)) - 1).cast("int").as(s"code_$s")
    }
    val recon = (0 until m).map(s =>
      dot(subCols(s), subCols(s)) - array_max(scoreArrs(s)))
      .reduce(_ + _)
    withQ.select(col(idCol) +: codes :+
      recon.cast("long").as("recon_sq"): _*)
  }

  /** Argmax over literal score columns; first index wins ties (the
    * [[nearestCentroidQ]] convention).
    */
  private def argmaxIdx(scores: Seq[Column]): Column = {
    val arr = array(scores: _*)
    (array_position(arr, array_max(arr)) - 1).cast("int")
  }

  /** IVF+PQ serving probe — the FAISS IVFPQ layout as Spark operators:
    * IVF routes each query to its `nProbe` inverted lists (the exact
    * [[ivfTopKWith]] probe selection); candidates are scored by
    * ASYMMETRIC DISTANCE COMPUTATION over their PQ codes. Each query
    * precomputes, per subspace, the exact grid-L2 table to all k
    * codewords (‖q_s‖² − 2⟨q_s,c_j⟩ + ‖c_j‖², exact integers on the
    * [[IvfQuantScale]] grid); a candidate's distance is the sum of m
    * table lookups on its code — the raw vector is never touched.
    *
    * THE serving-scale property: the probe join's corpus side carries
    * (cid, pq_code) — m small ints of payload per vector instead of the
    * dims-float embedding, so at 100 TB the shuffle/scan moves codes,
    * never vectors (with [[saveIvfIndex]]-style cid partitioning the
    * probed lists are the only ones read). ADC ranking is deterministic
    * (exact integers, ties by neighbor id) and fully restated in the q85
    * DuckDB oracle. Returns (query_id, neighbor_id, adc_sq, rank ≤ k).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(cents.forall(_.forall(_.isWhole)) &&
      books.forall(_.forall(_.forall(_.isWhole))),
      "IVF centroids and PQ codewords live on the integer grid — train " +
        "with trainIvfCentroids/trainPqCodebooks")
    val m = books.length
    val sub = books(0)(0).length
    // corpus index rows: inverted-list id + PQ code, nothing else
    val withQ = corpus.withColumn("graft_qv", ivfQuantized(col(vecCol)))
    val corpusCodes = {
      val subCols = (0 until m).map(s =>
        slice(col("graft_qv"), s * sub + 1, sub))
      val codes = (0 until m).map(s => argmaxIdx(l2Scores(subCols(s), books(s))))
      withQ.select(col(idCol).as("neighbor_id"),
        nearestCentroidQ(col("graft_qv"), cents).as("cid"),
        array(codes: _*).as("pq_code"))
    }
    // query rows: probed lists + per-subspace ADC tables
    val probeW = Window.partitionBy("query_id").orderBy(
      col("centroid_sim").desc, col("cid"))
    // ADC tables materialize BELOW the probe explode (withColumn, then
    // attribute pass-through): in the same projection as the generator
    // they would re-evaluate once per exploded centroid row — the q81
    // recompute hazard, nCentroids× per query at serving volume
    val qBase = (0 until m).foldLeft(
      queries.withColumn("graft_qv", ivfQuantized(col(vecCol)))) {
      case (df, s) =>
        val qs = slice(col("graft_qv"), s * sub + 1, sub)
        df.withColumn(s"graft_tbl$s", array(books(s).toIndexedSeq.map { c =>
          val n2 = c.map(x => x * x).sum
          dot(qs, qs) - lit(2.0) * dot(qs, lit(c)) + lit(n2)
        }: _*))
    }
    val q = qBase
      .select(Seq(col(idCol).as("query_id"),
        posexplode(array(centroidScores(col("graft_qv"), cents): _*))
          .as(Seq("cid", "centroid_sim"))) ++
        (0 until m).map(s => col(s"graft_tbl$s")): _*)
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nProbe)
      .drop("centroid_sim", "probe_rank")
    val adc = (0 until m).map(s =>
      element_at(col(s"graft_tbl$s"),
        element_at(col("pq_code"), s + 1) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_sq").asc, col("neighbor_id"))
    broadcast(q).join(corpusCodes, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_sq", adc.cast("long"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adc_sq", "rank")
  }

  /** Train an IVF coarse quantizer: spherical k-means over a deterministic
    * hash subsample (standard IVF practice — FAISS trains on a sample),
    * computed on the [[IvfQuantScale]] integer grid. Each Lloyd iteration
    * is one distributed assign (argmax over k literal centroids,
    * codegen'd) + one posexplode/groupBy sum whose RESULT (k·dims rows) is
    * collected — the only driver traffic is the centroid table itself.
    * Centroid components update to floor(Σv / n), staying on the grid;
    * empty clusters keep their previous centroid.
    *
    * BIT-DETERMINISTIC, not merely "up to FP aggregation order": no RNG
    * (the subsample and init use `xxhash64(id)` — a fixed public algorithm
    * the oracle reimplements in mod-2^64 SQL arithmetic), and every sum
    * the trainer takes is over exact integers (< 2^53) in double, which is
    * order-independent. The same arithmetic is restatable in ANSI SQL, so
    * the driver gate recomputes training + probe end to end
    * ([[graft.OracleGen.q44Sql]]). Train ONCE and reuse via
    * [[ivfTopKWith]] — the index is built offline, probed by many jobs.
    */
  def trainIvfCentroids(corpus: DataFrame, nCentroids: Int = 16,
      iters: Int = 3, trainMod: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : Array[Array[Double]] = {
    val train = (if (trainMod <= 1) corpus
      else corpus.filter(pmod(xxhash64(col(idCol)), lit(trainMod)) === 0))
      .select(col(idCol), ivfQuantized(col(vecCol)).as("qv"))
      .cache() // scanned iters+1 times; the sample is small by construction
    // ENFORCE the exactness invariant the whole contract rests on, don't
    // just document it: with |component| ≤ 2^20 on the grid, dots stay
    // ≤ dims·2^40 and cluster sums stay exact up to ~2^33 members — all
    // far inside double's 2^53 exact-integer range. Un-normalized inputs
    // (components ~1e10) would silently reintroduce order-dependent
    // rounding; fail loudly instead. One tiny aggregate on the cached
    // sample.
    import org.apache.spark.sql.Row
    val maxAbs = train
      .agg(max(array_max(transform(col("qv"), x => abs(x)))))
      .head() match { case Row(v: Double) => v; case _ => 0.0 }
    require(maxAbs <= (1L << 20).toDouble,
      f"IVF quantized components reach |$maxAbs%.0f| > 2^20 — inputs must " +
        "be roughly unit-scale for the integer-grid exactness contract " +
        "(rescale embeddings before training)")
    // deterministic init: the nCentroids rows with smallest id-hash
    var cents: Array[Array[Double]] = train
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(nCentroids)
      .select(col("qv")).collect()
      .map(_.getSeq[Double](0).toArray)
    try {
      for (_ <- 1 to iters) {
        val sums = train
          .select(nearestCentroidQ(col("qv"), cents).as("cid"),
            posexplode(col("qv")).as(Seq("pos", "v")))
          .groupBy("cid", "pos")
          .agg(sum("v").as("s"), count(lit(1)).as("n"))
          .collect()
        val next = cents.map(_.clone())
        sums.foreach { r =>
          next(r.getAs[Int]("cid"))(r.getAs[Int]("pos")) =
            math.floor(r.getAs[Double]("s") / r.getAs[Long]("n"))
        }
        cents = next
      }
    } finally train.unpersist(blocking = false)
    cents
  }

  /** [[trainIvfCentroids]] as a saveable centroid TABLE (cid, centroid) —
    * a real pipeline parquets this next to the corpus and probes it from
    * every serving job.
    */
  def trainIvf(corpus: DataFrame, nCentroids: Int = 16, iters: Int = 3,
      trainMod: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    trainIvfCentroids(corpus, nCentroids, iters, trainMod, idCol, vecCol)
      .toSeq.map(_.toSeq).zipWithIndex
      .map { case (c, i) => (i, c) }
      .toDF("cid", "centroid")
  }

  /** Centroid table → in-memory array (tiny: nCentroids × dims), ordered
    * by cid — the literal form the codegen'd argmax probes against.
    */
  def centroidArray(centroids: DataFrame): Array[Array[Double]] =
    centroids.select("cid", "centroid").collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)

  /** IVF probe+score against a PRE-TRAINED quantizer: corpus vectors are
    * assigned to inverted lists by a codegen'd argmax projection (no
    * shuffle); each query scores only its `nProbe` closest lists. The probe
    * join is keyed on centroid id — bounded fan-out, the corpus never
    * self-shuffles. Assignment and probe selection run on the
    * [[IvfQuantScale]] integer grid (exact arithmetic — deterministic by
    * construction, see [[trainIvfCentroids]]); final scoring uses the RAW
    * vectors. Centroids must lie on the grid (integral components), which
    * [[trainIvfCentroids]] guarantees.
    */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, k: Int,
      cents: Array[Array[Double]], nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(cents.forall(_.forall(_.isWhole)),
      "IVF centroids live on the integer quantization grid — train with " +
        "trainIvfCentroids (arbitrary float centroids would re-introduce " +
        "the FP-order nondeterminism the grid removes)")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cid", nearestCentroidQ(ivfQuantized(col("cv")), cents))
    // each query probes its nProbe closest inverted lists; the probe score
    // is the same exact-integer spherical similarity as assignment
    val probeW = Window.partitionBy("query_id").orderBy(
      col("centroid_sim").desc, col("cid"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qq", ivfQuantized(col("qv")))
      .select(col("query_id"), col("qv"),
        posexplode(array(centroidScores(col("qq"), cents): _*))
          .as(Seq("cid", "centroid_sim")))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nProbe)
      .select("query_id", "qv", "cid")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** Materialize the IVF INDEX in its serving layout: the corpus assigned
    * to its inverted lists and written `partitionBy("cid")` — one
    * directory per list. This is what makes probe cost O(probed lists):
    * a reader that filters on `cid` (statically or via a join against a
    * broadcast probe side — [[ivfTopKIndexed]]) scans only the probed
    * `cid=` directories; the other (nCentroids − nProbe)/nCentroids of
    * the corpus is never opened. The FAISS on-disk analogue, expressed as
    * a partitioned parquet table.
    */
  def saveIvfIndex(corpus: DataFrame, cents: Array[Array[Double]],
      path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cid", nearestCentroidQ(ivfQuantized(col("cv")), cents))
      .write.mode("overwrite").partitionBy("cid").parquet(path)

  /** Probe a SAVED index ([[saveIvfIndex]]): identical semantics to
    * [[ivfTopKWith]] (same probe selection, same exact-integer centroid
    * scores, same raw-vector final scoring), but the corpus side is the
    * cid-partitioned index scan. The probe side is tiny (queries ×
    * nProbe) and explicitly `broadcast()`, so Catalyst turns the `cid`
    * equi-join into DYNAMIC PARTITION PRUNING on the scan — only the
    * probed inverted-list directories are read (IvfIndexSpec asserts the
    * pruning on the physical plan). At fleet scale this is the claim the
    * ivf scaladoc makes, proven: probing 4 of 1024 lists reads ~0.4 % of
    * a 100 TB corpus, not all of it.
    */
  def ivfTopKIndexed(indexPath: String, queries: DataFrame, k: Int,
      cents: Array[Array[Double]], nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(cents.forall(_.forall(_.isWhole)),
      "IVF centroids live on the integer quantization grid — train with " +
        "trainIvfCentroids")
    val spark = queries.sparkSession
    val c = spark.read.parquet(indexPath)
    val probeW = Window.partitionBy("query_id").orderBy(
      col("centroid_sim").desc, col("cid"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qq", ivfQuantized(col("qv")))
      .select(col("query_id"), col("qv"),
        posexplode(array(centroidScores(col("qq"), cents): _*))
          .as(Seq("cid", "centroid_sim")))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nProbe)
      .select("query_id", "qv", "cid")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    broadcast(q).join(c, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** IVF (inverted-file) ANN — the FAISS IVF shape in DataFrames: train a
    * coarse quantizer ([[trainIvfCentroids]]), then probe it
    * ([[ivfTopKWith]]). One-shot convenience; pipelines that probe more
    * than once should train once and call [[ivfTopKWith]] directly —
    * or materialize the index in its serving layout ([[saveIvfIndex]] /
    * [[ivfTopKIndexed]]) so probes only READ the probed lists. LSH
    * ([[annLshTopK]]) cuts the same candidate space data-independently;
    * IVF adapts to the actual embedding distribution.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, iters: Int = 3,
      trainMod: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopKWith(corpus, queries, k,
      trainIvfCentroids(corpus, nCentroids, iters, trainMod, idCol, vecCol),
      nProbe, idCol, vecCol)

  /** Embedding near-dup PAIRS at scale — the hyperplane-LSH analogue of
    * [[Dedup.minhashLshPairs]]: each vector's `planes`-bit random-
    * hyperplane signature is banded into `bands` chunks of r bits; vectors
    * colliding in ≥1 band's 2^r-way bucket become candidate pairs; every
    * candidate is verified by EXACT cosine, so emitted values are exact
    * and output ⊆ the exact [[cosineNearDupPairs]] result (approximation
    * shows up only as recall, never as wrong rows).
    *
    * Shuffle plan: only (id, band, bucket) triples ride the banding
    * shuffle and the pair dedup — never the embedding arrays; vectors
    * rejoin the (small) candidate-pair set for verification, same
    * discipline as [[Dedup.minhashLshPairs]] / [[annLshTopK]]. Per-bucket
    * fan-out is bounded by `maxBucket` (drops observable via `dropStats`,
    * a CollectMetrics observation — see [[Dedup.groupPairs]]).
    *
    * Geometry is N-AWARE by default: `bitsPerBand = 0` derives r from the
    * corpus size via [[autoBandBits]] (r = ⌈log₂(n / targetBucketDensity)⌉,
    * floored at 4), so bucket density stays ~targetBucketDensity at ANY
    * corpus size instead of collapsing the cap at fleet scale. The count
    * comes from `corpusCount` when supplied (a fleet pipeline knows its
    * table size; metadata-cheap on parquet) or one `corpus.count()`
    * otherwise. Pass `bitsPerBand > 0` to pin the geometry explicitly.
    *
    * Tuning (Charikar 2002: P(bits agree) = 1 − θ/π): recall at a target
    * cosine t needs bands of FEW bits when t is low — at t=0.38 (θ≈68°,
    * p≈0.62) 16 bands of 4 bits measure ~0.94 recall on the synthetic
    * corpus, whose pairs all sit just above the threshold (the worst case:
    * no cluster structure to exploit). True near-dup corpora (t≥0.8,
    * p≥0.8) reach the same recall with far fewer bands. As auto-r grows
    * with log n, per-band match probability p^r falls — `bands` is the
    * recall knob to grow alongside it (total dot tests = bands × r, no
    * longer capped at 64); `maxBucket` stays the hard memory bound, and
    * cap hits are never silent: callers that don't pass `dropStats` get a
    * WARN-logged [[DropWarnings]] observation instead.
    *
    * `dedupCandidates` places the duplicate-elimination shuffle, and with
    * it the whole physical shape:
    *   - `true` (default, the fleet posture for CLUSTERED corpora):
    *     id-only banding, collect-capped buckets, dedup the id-pair set
    *     BEFORE verification — near-identical vectors collide in many/all
    *     bands, so dedup saves up to `bands`× the verification dot
    *     products, and nothing wider than (id, band, bucket) ever
    *     shuffles;
    *   - `false` (low-collision regimes, e.g. near-threshold corpora
    *     where pairs collide in ~1 band): INLINE-VERIFY self-join — the
    *     vectors ride the (band, bucket) exchange, each bucket's pairs
    *     are generated by a size-gated self-join, and the exact cosine +
    *     threshold filter run in the SAME stage, so only surviving rows
    *     (plus their ≤`bands`−1 duplicates) are ever materialized or
    *     shuffled again. No candidate-pair shuffle, no vector re-join,
    *     no collection buffers (the cap is enforced by semi-joining
    *     size-gated keys, [[Dedup.sizeGatedKeys]] — per-group state is
    *     one counter). Byte math per band per vector: this shape moves
    *     dims·8+16 bytes where the `true` shape's candidate shuffle
    *     moves ~density·8 — cheaper whenever bucket density ≳ 2·dims,
    *     i.e. exactly the dense-bucket regimes where candidate volume
    *     hurts (measured 2.2 s → 1.8 s on the q46 gate).
    * Identical output either way (cos_sim is a deterministic function of
    * the pair, so duplicate rows are exact duplicates; the size gate
    * drops the same over-cap buckets the collect path drops).
    */
  def cosineNearDupPairsLsh(corpus: DataFrame, threshold: Double,
      bands: Int = 16, bitsPerBand: Int = 0,
      corpusCount: Option[Long] = None, targetBucketDensity: Long = 256,
      dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucket: Int = 1 << 12, dedupCandidates: Boolean = true,
      dropStats: Option[org.apache.spark.sql.Observation] = None)
      : DataFrame = {
    val r =
      if (bitsPerBand > 0) bitsPerBand
      else autoBandBits(corpusCount.getOrElse(corpus.count()),
        targetBucketDensity)
    if (dedupCandidates) {
      val chunks = banded(corpus.select(col(idCol).as("id"), col(vecCol)),
        "id", bands, r, dims, vecCol)
      Dedup.groupPairs(chunks, Seq("band", "bucket"), col("id"),
          maxBucket, dropStats)
        .select(col("a").as("id_a"), col("b").as("id_b"))
        .dropDuplicates("id_a", "id_b")
        .join(corpus.select(col(idCol).as("id_a"), col(vecCol).as("va")),
          "id_a")
        .join(corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb")),
          "id_b")
        .withColumn("cos_sim", cosine(col("va"), col("vb")))
        .filter(col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    } else {
      // inline-verify self-join (see the scaladoc's shape discussion):
      // vectors ride the banding exchange once per band; pairs are born,
      // cosine-verified and threshold-filtered inside one stage
      val chunks = banded(
        corpus.select(col(idCol).as("id"), col(vecCol).as("graft_v")),
        "id", bands, r, dims, "graft_v", payload = Seq("graft_v"))
      // size gate over the same banded frame (column pruning strips the
      // vector payload before the count aggregate), no broadcast hint:
      // its row count is O(bands · n / density) — tiny here,
      // vocabulary-sized at fleet scale, and the join key (band, bucket)
      // is the self-join's own key, so the shuffle-join fallback rides
      // the existing exchange
      val okKeys = Dedup.sizeGatedKeys(
        chunks.select("id", "band", "bucket"),
        Seq("band", "bucket"), maxBucket, dropStats, minSize = 2)
      val gated = chunks.join(okKeys, Seq("band", "bucket"))
      val a = gated.select(col("band"), col("bucket"),
        col("id").as("id_a"), col("graft_v").as("va"))
      val b = gated.select(col("band"), col("bucket"),
        col("id").as("id_b"), col("graft_v").as("vb"))
      a.join(b, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos_sim", cosine(col("va"), col("vb")))
        .filter(col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
        .dropDuplicates("id_a", "id_b", "cos_sim")
    }
  }

  /** Approximate top-k: corpus and queries bucketed by hyperplane
    * signature bands; each query only scores corpus vectors sharing ≥1
    * band bucket. Recall is tunable via bands×bits; the corpus-side
    * shuffle is keyed on (band, bucket) — bounded fan-out, no full scan
    * per query, which is the property that survives 100 TB.
    *
    * Geometry is N-AWARE by default, exactly like
    * [[cosineNearDupPairsLsh]]: `bitsPerBand = 0` derives r from the
    * corpus size via [[autoBandBits]], holding expected bucket density at
    * ~`targetBucketDensity` at ANY corpus size. The pre-round-5 fixed
    * geometry (16 planes / 4 bands → 2^4 buckets per band FOREVER) put
    * ~n/16 corpus vectors in every bucket — at n=10⁹ each query fanned
    * out against ~6×10⁷ candidates per band. Pass `bitsPerBand > 0` to
    * pin the geometry explicitly (the driver's SQL oracle does). As
    * auto-r grows with log n, per-band match probability p^r falls —
    * `bands` is the recall knob to grow alongside it.
    *
    * The corpus side of the bucket join is CAPPED: buckets larger than
    * `maxBucket` are dropped (via [[Dedup.cappedGroups]] — the same
    * observe-then-cap node as every banded operator here), so a
    * degenerate bucket (all-zero vectors, an adversarial cluster) bounds
    * candidate fan-out instead of joining ~n rows against every query
    * sharing it. Drops are never silent: observable through `dropStats`,
    * WARN-logged ([[DropWarnings]]) otherwise.
    *
    * Shuffle plan (mirrors [[Dedup.minhashLshPairs]]): only
    * (id, band, bucket) triples flow through the banding join and the
    * candidate-pair dedup — at fleet scale an embedding is ~KBs/row, and
    * round 2 carried BOTH the query and corpus vectors through the dedup
    * Exchange. Vectors rejoin the (small) deduped pair set for scoring:
    * the query side re-reads only (id, vec) — a pruned scan, no signature
    * recompute — and is broadcast; the corpus side joins on its id.
    */
  def annLshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bands: Int = 4, bitsPerBand: Int = 0,
      corpusCount: Option[Long] = None, targetBucketDensity: Long = 256,
      dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucket: Int = 1 << 12,
      dropStats: Option[org.apache.spark.sql.Observation] = None)
      : DataFrame = {
    val r =
      if (bitsPerBand > 0) bitsPerBand
      else autoBandBits(corpusCount.getOrElse(corpus.count()),
        targetBucketDensity)
    val c = banded(corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol)), "neighbor_id", bands, r, dims, vecCol)
    // group the corpus side per (band, bucket) and cap it BEFORE the join:
    // a singleton bucket is still a valid candidate source (minSize = 1 —
    // unlike the within-group pair operators, the pairing partner is a
    // query, not another member). The collection buffer itself is capped
    // (CollectCapped + count-based drop), so a degenerate ~n-member bucket
    // never materializes an n-element array on one executor before being
    // dropped — the cap bounds the aggregation state, not just the output.
    val cCapped = Dedup.cappedGroups(c, Seq("band", "bucket"),
        col("neighbor_id"), maxBucket, dropStats, minSize = 1)
      .select(col("band"), col("bucket"),
        explode(col("members")).as("neighbor_id"))
    val q = banded(queries.select(col(idCol).as("query_id"),
      col(vecCol)), "query_id", bands, r, dims, vecCol)
    val pairs = q.join(cCapped, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val qv = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"))
    val cand = pairs.join(qv, "query_id").join(cv, "neighbor_id")
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  /** Smallest `r` in [lo, hi] with density·2^r ≥ n — [[autoBandBits]]
    * restated in EXACT integer arithmetic so the driver's SQL oracle can
    * re-derive the same band width from `COUNT(*)` at any scale factor
    * (the float `ceil(log2(ratio))` form risks a 1-ULP `ceil` flip
    * between libm implementations when the ratio sits on a power of
    * two). The upper clamp `hi` is the INLINED-PLANE-MATRIX bound of the
    * static oracle SQL (bands·hi hyperplanes are baked into the query
    * text), not an engine limit — grow `hi` together with the matrix the
    * oracle inlines. At hi=16 and density 64 the rule is exact up to
    * n = 64·2¹⁶ ≈ 4.2M vectors per corpus; beyond that buckets grow
    * linearly and the `maxBucket` cap starts dropping the densest.
    */
  def exactBandBits(corpusCount: Long, targetBucketDensity: Long = 64,
      lo: Int = 4, hi: Int = 16): Int = {
    require(lo >= 1 && lo <= hi && hi <= 62,
      s"band bits range must satisfy 1 <= lo <= hi <= 62, got [$lo, $hi]")
    require(targetBucketDensity >= 1, "targetBucketDensity must be >= 1")
    var r = lo
    // 2^r < ceil(n/d)  ⟺  2^r ≤ (n−1)/d — overflow-free in Long
    while (r < hi &&
        (1L << r) <= (corpusCount - 1) / targetBucketDensity) r += 1
    r
  }

  /** Navigable-small-world proximity graph over the corpus — the
    * construction half of the graph-ANN serving stack ([[nswTopK]]), the
    * HNSW-class answer to "the true neighbor lives outside every probed
    * bucket". Each vector links to its `m` nearest peers WITHIN each of
    * its `bands` LSH buckets (so `bands` independent partitionings of
    * the corpus each contribute up to `m` out-edges per node); because
    * the bands are independent hyperplane draws, the union is a
    * connected-ish small-world graph whose neighbors-of-neighbors reach
    * buckets the entry probe never opened.
    *
    * Construction is DENSITY-BOUNDED, never all-pairs: candidates for a
    * node's links are only its same-bucket peers (expected
    * `targetBucketDensity` of them — [[exactBandBits]] holds that flat
    * at any corpus size), so total link-scoring work is
    * Θ(n · density · bands). Degenerate buckets beyond `maxBucket` are
    * dropped loudly ([[Dedup.sizeGatedKeys]] — observable via
    * `dropStats`, WARN-logged otherwise); their members simply
    * contribute no links from that band.
    *
    * Shuffle plan: both sides of the within-bucket self-join carry the
    * quantized vector as bucket-join payload, so pair GENERATION, link
    * scoring and the vector drop all pipeline inside the one
    * (band, bucket)-keyed exchange — the pair stream with vectors
    * attached is never itself shuffled (only the slim
    * (src, band, dst, qsim) rows reach the per-source rank exchange).
    * The join is PINNED shuffle-hash: a per-vector array frame must
    * never ride an AQE broadcast (the r13 100×-lane failure).
    *
    * Determinism contract (what lets the driver oracle restate the whole
    * build in SQL, [[graft.OracleGen.q106Sql]]): link RANKING uses the
    * [[IvfQuantScale]] integer grid — dots of quantized vectors are
    * exact integers, and `dot/(√n₁·√n₂)` is a fixed tree of correctly-
    * rounded IEEE ops, hence bit-identical across engines (the q44
    * trainer's argument). Vectors whose QUANTIZED norm is zero
    * (identically ~0 embeddings) are excluded from the graph up front —
    * their similarity to anything is 0/0.
    *
    * Returns distinct directed (src, dst) link rows.
    */
  def nswGraph(corpus: DataFrame, m: Int = 6, bands: Int = 2,
      bitsPerBand: Int = 0, targetBucketDensity: Long = 64,
      dims: Int = 64, maxBucket: Int = 1 << 12,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dropStats: Option[org.apache.spark.sql.Observation] = None)
      : DataFrame = {
    require(m >= 1, "m must be >= 1")
    val r = if (bitsPerBand > 0) bitsPerBand
      else exactBandBits(corpus.count(), targetBucketDensity)
    val qz = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        ivfQuantized(col(vecCol)).as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
      .filter(col("nq") > 0)
    val bRows = banded(qz, "id", bands, r, dims, "v",
      payload = Seq("qv", "nq"))
    val gate = Dedup.sizeGatedKeys(bRows, Seq("band", "bucket"),
      maxBucket, dropStats, minSize = 2)
    // bucket-key gate is ≤ bands·2^r rows — broadcast, never a shuffle
    val ok = bRows.join(broadcast(gate), Seq("band", "bucket"))
    val src = ok.select(col("band"), col("bucket"), col("id").as("src"),
      col("qv").as("sqv"), col("nq").as("snq"))
    val dst = ok.select(col("band"), col("bucket"), col("id").as("dst"),
      col("qv").as("dqv"), col("nq").as("dnq"))
    val w = Window.partitionBy("src", "band")
      .orderBy(col("qsim").desc, col("dst"))
    src.join(dst.hint("shuffle_hash"), Seq("band", "bucket"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("band"), col("dst"),
        (dot(col("sqv"), col("dqv")) / (col("snq") * col("dnq")))
          .as("qsim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= m)
      .select("src", "dst").distinct()
  }

  /** Graph-ANN top-k: fixed-hop beam search over an [[nswGraph]]
    * proximity graph — entry candidates from the query's own LSH
    * buckets, then `hops` rounds of "expand the beam by its graph
    * neighbors, re-rank, keep the best `beam`". The hops are what LSH
    * probing alone cannot do: escape the entry buckets through
    * neighbor-of-neighbor links, at a bounded cost of
    * beam·m·bands candidate additions per hop per query.
    *
    * Scale shape: the per-hop state is queries·beam id rows —
    * BROADCAST into keyed joins against the (persisted) edge frame and
    * the corpus projection, so the corpus is never shuffled by the
    * search; each hop streams the two big frames once. Fixed `hops`
    * (not convergence-driven) keeps the plan static and the SQL oracle
    * expressible as unrolled CTEs.
    *
    * Determinism mirrors [[nswGraph]]: beam SELECTION ranks on the
    * integer-grid similarity (bit-identical across engines,
    * ties → smaller id); only the FINAL top-k ranks on raw-double
    * cosine — the same single cross-engine FP link every ANN gate here
    * accepts (q31/q32/q44 precedent: a raw-cosine near-tie could flip a
    * rank at some untested scale; the id tiebreak bounds the damage).
    *
    * Output: (query_id, neighbor_id, cos_sim, rank), rank 1..k per
    * query by raw cosine.
    */
  def nswTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 6, bands: Int = 2, bitsPerBand: Int = 0,
      targetBucketDensity: Long = 64, beam: Int = 24, hops: Int = 2,
      dims: Int = 64, maxBucket: Int = 1 << 12,
      idCol: String = "vec_id", vecCol: String = "embedding",
      edges: Option[DataFrame] = None,
      dropStats: Option[org.apache.spark.sql.Observation] = None)
      : DataFrame = {
    require(k >= 1 && beam >= k, s"need beam >= k >= 1, got k=$k beam=$beam")
    require(hops >= 0, "hops must be >= 0")
    val r = if (bitsPerBand > 0) bitsPerBand
      else exactBandBits(corpus.count(), targetBucketDensity)
    val graph = edges.getOrElse(
        nswGraph(corpus, m, bands, r, targetBucketDensity, dims,
          maxBucket, idCol, vecCol, dropStats))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // corpus projection for rescoring: quantized (beam ranks) + raw
    // (final ranks); the zero-quantized-norm exclusion matches the graph
    val cz = corpus.select(col(idCol).as("cand"), col(vecCol).as("cv"),
        ivfQuantized(col(vecCol)).as("cqv"))
      .withColumn("cnq", sqrt(dot(col("cqv"), col("cqv"))))
      .filter(col("cnq") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qProj = queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"), ivfQuantized(col(vecCol)).as("qqv"))
      .withColumn("qnq", sqrt(dot(col("qqv"), col("qqv"))))
      .filter(col("qnq") > 0)
    // entry: the query's own buckets, corpus side gated 1..maxBucket
    // (singleton corpus buckets still seed the beam — the q32 rule)
    val cb = banded(cz.select(col("cand").as("id"), col("cv")),
      "id", bands, r, dims, "cv")
    // a Spark Observation attaches to ONE dataset — `dropStats` rides the
    // graph build above; this second gate falls back to the WARN logger
    val cGate = Dedup.sizeGatedKeys(cb, Seq("band", "bucket"),
      maxBucket, None, minSize = 1)
    val cOk = cb.join(broadcast(cGate), Seq("band", "bucket"))
      .select(col("band"), col("bucket"), col("id").as("cand"))
    val qb = banded(qProj.select(col("query_id").as("id"), col("qv")),
      "id", bands, r, dims, "qv")
      .select(col("band"), col("bucket"), col("id").as("query_id"))
    def trim(cand: DataFrame, width: Int): DataFrame =
      cz.select("cand", "cqv", "cnq")
        .join(broadcast(cand.select("query_id", "cand").distinct()),
          Seq("cand"))
        .join(broadcast(qProj.select("query_id", "qqv", "qnq")),
          Seq("query_id"))
        .select(col("query_id"), col("cand"),
          (dot(col("qqv"), col("cqv")) / (col("qnq") * col("cnq")))
            .as("qsim"))
        .withColumn("rn", row_number().over(Window
          .partitionBy("query_id").orderBy(col("qsim").desc, col("cand"))))
        .filter(col("rn") <= width)
        .select("query_id", "cand")
    var beamDf = trim(
      qb.join(cOk.hint("shuffle_hash"), Seq("band", "bucket"))
        .filter(col("query_id") =!= col("cand"))
        .select("query_id", "cand"),
      beam)
    for (_ <- 1 to hops) {
      val expand = graph
        .join(broadcast(beamDf), graph("src") === beamDf("cand"))
        .filter(col("dst") =!= col("query_id"))
        .select(col("query_id"), col("dst").as("cand"))
      beamDf = trim(beamDf.unionByName(expand), beam)
    }
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    cz.select(col("cand"), col("cv"))
      .join(broadcast(beamDf), Seq("cand"))
      .join(broadcast(qProj.select(col("query_id"), col("qv"))),
        Seq("query_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
      .select(col("query_id"), col("cand").as("neighbor_id"),
        col("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ------------------------------------------------ NSW index persistence

  /** Materialize an [[nswGraph]] as a SERVING INDEX on disk — the
    * graph-ANN analogue of [[saveIvfIndex]]/[[graft.textops.Dedup
    * .saveMinhashIndex]], so the proximity graph builds once and every
    * session probes it instead of rebuilding Θ(n·density·bands) links.
    * Layout under `path`:
    *
    *   - `params/`  one row (m, bands, bits_per_band, dims, max_bucket) —
    *     probing or extending with mismatched parameters is a silent-
    *     wrong-results hazard, so both doors `require` a match against
    *     this manifest (the saveMinhashIndex ADVICE lesson applied from
    *     the start);
    *   - `edges/`   the distinct (src, dst) link rows;
    *   - `buckets/` the corpus's (band, bucket, id) assignment — what
    *     lets [[nswExtend]] admit a new batch by touching only the
    *     batch's own buckets (the q111 admission discipline: the corpus
    *     is never re-banded, never rescanned).
    *
    * Returns the resolved bits-per-band (the [[exactBandBits]] outcome
    * when `bitsPerBand` = 0), which the manifest records.
    */
  def saveNswIndex(corpus: DataFrame, path: String, m: Int = 6,
      bands: Int = 2, bitsPerBand: Int = 0,
      targetBucketDensity: Long = 64, dims: Int = 64,
      maxBucket: Int = 1 << 12,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dropStats: Option[org.apache.spark.sql.Observation] = None): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val r = if (bitsPerBand > 0) bitsPerBand
      else exactBandBits(corpus.count(), targetBucketDensity)
    nswGraph(corpus, m, bands, r, targetBucketDensity, dims, maxBucket,
        idCol, vecCol, dropStats)
      .write.mode("overwrite").parquet(s"$path/edges")
    banded(corpus.select(col(idCol).as("id"), col(vecCol).as("v")),
        "id", bands, r, dims, "v")
      .select("band", "bucket", "id")
      .write.mode("overwrite").parquet(s"$path/buckets")
    Seq((m, bands, r, dims, maxBucket))
      .toDF("m", "bands", "bits_per_band", "dims", "max_bucket")
      .write.mode("overwrite").parquet(s"$path/params")
    r
  }

  private def nswParams(spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, Int, Int, Int, Int) = {
    val row = spark.read.parquet(s"$path/params").head()
    (row.getAs[Int]("m"), row.getAs[Int]("bands"),
      row.getAs[Int]("bits_per_band"), row.getAs[Int]("dims"),
      row.getAs[Int]("max_bucket"))
  }

  /** Probe a SAVED graph index ([[saveNswIndex]]): identical semantics
    * to [[nswTopK]] with the same parameters — the gate proves it
    * against the same oracle — but the proximity graph is the persisted
    * edge frame, so the Θ(n·density·bands) build cost is never paid at
    * query time. Band width, link degree and bucket cap come from the
    * index's own manifest; passing a corpus banded differently than the
    * index was built with is impossible by construction.
    */
  def nswTopKIndexed(indexPath: String, corpus: DataFrame,
      queries: DataFrame, k: Int, beam: Int = 24, hops: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val (m, bands, r, dims, maxBucket) = nswParams(spark, indexPath)
    nswTopK(corpus, queries, k, m, bands, bitsPerBand = r,
      beam = beam, hops = hops, dims = dims, maxBucket = maxBucket,
      idCol = idCol, vecCol = vecCol,
      edges = Some(spark.read.parquet(s"$indexPath/edges")))
  }

  /** Incrementally ADMIT a new batch into a saved NSW index — the daily-
    * crawl shape ([[graft.textops.Dedup.minhashLshAdmit]]'s discipline
    * applied to the graph): per-batch cost is O(batch + touched-bucket
    * peers), the existing corpus is never re-banded or rescanned.
    *
    *   1. the batch is banded with the INDEX's own manifest parameters;
    *   2. only the batch's (band, bucket) keys are read back from the
    *     saved bucket assignment, and only THOSE peers' vectors are
    *     fetched from `corpus` (one id-keyed join, O(peers));
    *   3. new out-links: batch → (peers ∪ batch) top-m per band, and
    *     touched peers → batch top-m per band — both APPENDED. Existing
    *     links are never re-ranked: a touched node's degree grows by at
    *     most m per band per admitted batch, and the beam search simply
    *     sees more candidates (TextOpsSpec pins post-extend recall).
    *     Buckets beyond the manifest's cap are dropped loudly, as at
    *     build time.
    *
    * `corpus` must be the PRE-batch corpus (vector source for touched
    * peers); the batch's own vectors ride `batch`. After the call the
    * index serves corpus ∪ batch.
    */
  def nswExtend(indexPath: String, corpus: DataFrame, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dropStats: Option[org.apache.spark.sql.Observation] = None): Unit = {
    val spark = corpus.sparkSession
    val (m, bands, r, dims, maxBucket) = nswParams(spark, indexPath)
    val bz = batch.select(col(idCol).as("id"), col(vecCol).as("v"),
        ivfQuantized(col(vecCol)).as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
      .filter(col("nq") > 0)
    val bb = banded(bz, "id", bands, r, dims, "v",
      payload = Seq("qv", "nq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = bb.select("band", "bucket").distinct()
      val peerIds = spark.read.parquet(s"$indexPath/buckets")
        .join(broadcast(touched), Seq("band", "bucket"))
      val peerVecs = corpus.select(col(idCol).as("id"),
          ivfQuantized(col(vecCol)).as("qv"))
        .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
        .join(peerIds.hint("shuffle_hash"), Seq("id"))
        .select("band", "bucket", "id", "qv", "nq")
      val batchRows = bb.select("band", "bucket", "id", "qv", "nq")
      val all = peerVecs.unionByName(batchRows)
      val gate = Dedup.sizeGatedKeys(all, Seq("band", "bucket"),
        maxBucket, dropStats, minSize = 2)
      val ok = all.join(broadcast(gate), Seq("band", "bucket"))
      def links(src: DataFrame, dst: DataFrame): DataFrame = {
        val s = src.select(col("band"), col("bucket"),
          col("id").as("src"), col("qv").as("sqv"), col("nq").as("snq"))
        val d = dst.select(col("band"), col("bucket"),
          col("id").as("dst"), col("qv").as("dqv"), col("nq").as("dnq"))
        val w = Window.partitionBy("src", "band")
          .orderBy(col("qsim").desc, col("dst"))
        s.join(d.hint("shuffle_hash"), Seq("band", "bucket"))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("band"), col("dst"),
            (dot(col("sqv"), col("dqv")) / (col("snq") * col("dnq")))
              .as("qsim"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= m)
          .select("src", "dst").distinct()
      }
      // batch → everything in its buckets; touched peers → batch only
      val gatedBatch = batchRows.join(broadcast(gate), Seq("band", "bucket"))
      val gatedPeers = peerVecs.join(broadcast(gate), Seq("band", "bucket"))
      links(gatedBatch, ok).unionByName(links(gatedPeers, gatedBatch))
        .distinct()
        .write.mode("append").parquet(s"$indexPath/edges")
      bb.select("band", "bucket", "id")
        .write.mode("append").parquet(s"$indexPath/buckets")
    } finally { bb.unpersist(); () }
  }
}
