package graft

import graft.textops.{Dedup, Similarity}

/** DuckDB oracle SQL for the sketch-family queries (q29 MinHash+LSH, q30
  * SimHash, q32 hyperplane-LSH ANN top-k, q46 hyperplane-LSH near-dup
  * pairs) — the q47
  * winnowing precedent generalized: every pseudo-random constant the Spark
  * expressions use (hyperplane components, MinHash permutation params) is
  * deterministic, so it can be INLINED into ANSI SQL and the whole pipeline
  * restated independently in DuckDB. The SQL recomputes signatures from
  * scratch (dot-sign tests / Horner Karp–Rabin + universal-hash mins), bands
  * them with plain integer arithmetic, and re-verifies candidates — no Spark
  * value is trusted, only the shared constants.
  *
  * The one semantic shortcut: Spark buckets MinHash bands by
  * `xxhash64(slice)` (not available in DuckDB); the SQL groups by the slice
  * VALUES directly. Identical partitioning unless xxhash64 collides — a
  * 2^-64-scale event that would only ADD a candidate pair, which the
  * est-jaccard filter then re-checks.
  *
  * Constants are emitted via Double.toString (shortest round-trip repr), so
  * DuckDB parses back the exact same IEEE double; integer constants are
  * exact by construction. Lists are cast `::DOUBLE[][]` so decimal literals
  * never land in DECIMAL arithmetic.
  */
object OracleGen {

  /** `[[h00, h01, ...], ...]` literal of the SAME hyperplanes the Spark
    * signature uses ([[Similarity.hyperplane]]).
    */
  private def planesSql(planes: Int, dims: Int): String =
    (0 until planes).map(p => Similarity.hyperplane(p, dims)
      .map(_.toString).mkString("[", ", ", "]"))
      .mkString("[", ",\n       ", "]")

  /** Bit values 2^p as signed int64 — bit 63 is Long.MinValue, exactly the
    * signed bit pattern Spark's `shiftleft(1L, 63)` packs.
    */
  private def bitsSql(planes: Int): String =
    (0 until planes).map(p => (1L << p).toString).mkString("[", ", ", "]")

  /** Shared CTE: per-vector `planes`-bit signature as a signed int64 —
    * bit p set iff v · hyperplane(p) > 0. Bits are disjoint so summing the
    * bit values equals the bitwise OR; HUGEINT intermediates keep the
    * (negative) bit-63 value exact before the BIGINT cast.
    */
  private def sigSql(planes: Int): String =
    s"""sg AS (SELECT id, CAST(list_sum(list_transform(range($planes), p ->
       CASE WHEN list_dot_product(v, pl[p + 1]) > 0
            THEN CAST(bits[p + 1] AS HUGEINT) ELSE CAST(0 AS HUGEINT) END))
       AS BIGINT) AS sig FROM e, consts)"""

  /** q46: hyperplane-LSH near-dup pairs — band signatures into `bands`
    * r-bit buckets, within-bucket (a<b) pairs with the 2..maxBucket group
    * cap, exact-cosine verify at `threshold`. Mirrors
    * [[Similarity.cosineNearDupPairsLsh]] including the cap semantics.
    */
  def q46Sql(threshold: Double = 0.38, planes: Int = 64, bands: Int = 16,
      dims: Int = 64, maxBucket: Int = 1 << 12): String = {
    val r = planes / bands
    val mask = (1L << r) - 1
    s"""WITH consts AS (SELECT ${planesSql(planes, dims)}::DOUBLE[][] AS pl,
       ${bitsSql(planes)} AS bits),
     e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
     ${sigSql(planes)},
     bb AS (SELECT id, b AS band, (sig >> (b * $r)) & $mask AS bucket
            FROM sg, (SELECT unnest(range($bands)) AS b)),
     ok AS (SELECT band, bucket FROM bb GROUP BY 1, 2
            HAVING COUNT(*) BETWEEN 2 AND $maxBucket),
     pr AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
            FROM bb x JOIN bb y ON x.band = y.band AND x.bucket = y.bucket
              AND x.id < y.id
            JOIN ok o ON o.band = x.band AND o.bucket = x.bucket)
     SELECT p.id_a, p.id_b,
       ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
     FROM pr p JOIN e a ON a.id = p.id_a JOIN e b ON b.id = p.id_b
     WHERE list_cosine_similarity(a.v, b.v) >= $threshold
     ORDER BY id_a, id_b"""
  }

  /** q32: hyperplane-LSH ANN top-k — queries (vec_id < `maxQueryId`) and
    * corpus banded identically; candidates = same-bucket (query, neighbor)
    * pairs drawn from corpus buckets of ≤ `maxBucket` members (the
    * 1..maxBucket cap — singleton corpus buckets still pair with queries,
    * unlike q46's within-bucket 2..maxBucket); exact cosine scored and
    * ranked per query. Mirrors [[Similarity.annLshTopK]] with its pinned
    * 4×4 geometry including the corpus-side bucket cap.
    */
  def q32Sql(k: Int = 5, planes: Int = 16, bands: Int = 4, dims: Int = 64,
      maxQueryId: Int = 8, maxBucket: Int = 1 << 12): String = {
    val r = planes / bands
    val mask = (1L << r) - 1
    s"""WITH consts AS (SELECT ${planesSql(planes, dims)}::DOUBLE[][] AS pl,
       ${bitsSql(planes)} AS bits),
     e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
     ${sigSql(planes)},
     bb AS (SELECT id, b AS band, (sig >> (b * $r)) & $mask AS bucket
            FROM sg, (SELECT unnest(range($bands)) AS b)),
     ok AS (SELECT band, bucket FROM bb GROUP BY 1, 2
            HAVING COUNT(*) BETWEEN 1 AND $maxBucket),
     pr AS (SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id
            FROM bb q JOIN bb c ON q.band = c.band AND q.bucket = c.bucket
              AND q.id <> c.id
            JOIN ok o ON o.band = c.band AND o.bucket = c.bucket
            WHERE q.id < $maxQueryId),
     sc AS (SELECT query_id, neighbor_id,
              list_cosine_similarity(a.v, b.v) AS cs
            FROM pr JOIN e a ON a.id = query_id JOIN e b ON b.id = neighbor_id),
     rk AS (SELECT query_id, neighbor_id, cs,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cs DESC, neighbor_id) AS INTEGER) AS rank
            FROM sc)
     SELECT query_id, neighbor_id, ROUND(cs, 4) AS cos_sim, rank
     FROM rk WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** q29: MinHash+LSH near-dup candidates — word-3-gram shingles (the q28
    * formulation), Karp–Rabin shingle hashes (Horner over ascii codes, the
    * exact [[graft.functions.TextExprs.KrHash]] recurrence), 64 universal-
    * hash permutation mins with the Spark side's (a, b) params inlined,
    * 16 bands of 4 signature rows grouped by slice value, the 2..maxBucket
    * cap, and estimated-Jaccard scoring over the full signatures.
    */
  def q29Sql(n: Int = 3, k: Int = 64, bands: Int = 16,
      estThreshold: Double = 0.5, maxBucket: Int = 1 << 12): String = {
    val r = k / bands
    val params = Dedup.hashParams(k)
    val pa = params.map(_._1).mkString("[", ", ", "]")
    val pb = params.map(_._2).mkString("[", ", ", "]")
    s"""WITH consts AS (SELECT $pa AS pa, $pb AS pb),
     d AS (SELECT doc_id AS id,
             string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents),
     sh AS (SELECT id, list_distinct(
             CASE WHEN len(w) < $n THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w) - ${n - 2}),
               i -> ${(0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")}) END) AS s
           FROM d),
     hx AS (SELECT id, list_transform(s, g -> list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(regexp_extract_all(g, '(?s).'),
                 c -> CAST(ascii(c) AS BIGINT))),
             (acc, c) -> (acc * 257 + c) % 1000000007)) AS xs
           FROM sh),
     sg AS (SELECT id, list_transform(range($k), j ->
             list_min(list_transform(xs,
               x -> (x * pa[j + 1] + pb[j + 1]) % ${Dedup.P}))) AS sig
           FROM hx, consts),
     bb AS (SELECT id, b AS band, sig[b * $r + 1 : b * $r + $r] AS key
            FROM sg, (SELECT unnest(range($bands)) AS b)),
     ok AS (SELECT band, key FROM bb GROUP BY 1, 2
            HAVING COUNT(*) BETWEEN 2 AND $maxBucket),
     pr AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
            FROM bb x JOIN bb y ON x.band = y.band AND x.key = y.key
              AND x.id < y.id
            JOIN ok o ON o.band = x.band AND o.key = x.key),
     est AS (SELECT id_a, id_b,
              CAST(len(list_filter(range($k),
                j -> sa.sig[j + 1] = sb.sig[j + 1])) AS DOUBLE) / $k AS ej
             FROM pr JOIN sg sa ON sa.id = id_a JOIN sg sb ON sb.id = id_b)
     SELECT id_a, id_b, ROUND(ej, 4) AS est_jaccard
     FROM est WHERE ej >= $estThreshold ORDER BY id_a, id_b"""
  }

  /** q30: SimHash near-dup pairs — whitespace tokens, splitmix64-finalized
    * Karp–Rabin token hashes ([[graft.functions.TextExprs.KrHash64]]),
    * 64 majority-vote bit counters packed into a signed int64, 16-bit
    * chunk banding with the 2..maxBucket cap, Hamming ≤ `maxDist`.
    *
    * The splitmix64 finalizer is exact mod-2^64 arithmetic: DuckDB
    * reproduces it in UHUGEINT (multiply can reach 2^128 − ε, which
    * UHUGEINT holds; `% 2^64` then truncates exactly like Java's wrapping
    * long multiply). The nested single-element `list_transform` chain is a
    * let-binding — each xor/multiply step's result is bound once instead
    * of textually duplicated. Signed packing reuses the q46 bits trick
    * (bit 63 = Long.MinValue); the chunk extraction maps the signed value
    * back to its unsigned bit pattern before shifting.
    *
    * Tokenizer boundary: both sides split on `\s+`, but Java's regex `\s`
    * includes `\x0B` (vertical tab) while DuckDB's RE2 `\s` does not — a
    * document containing a vertical tab would tokenize differently across
    * engines. The test corpus contains none; documented as the known
    * cross-engine seam rather than papered over with a custom class.
    */
  def q30Sql(maxDist: Int = 6, maxBucket: Int = 1 << 12): String = {
    val two64 = "18446744073709551616"
    val c1 = java.lang.Long.toUnsignedString(0xbf58476d1ce4e5b9L)
    val c2 = java.lang.Long.toUnsignedString(0x94d049bb133111ebL)
    s"""WITH consts AS (SELECT ${bitsSql(64)} AS bits),
     d AS (SELECT doc_id AS id,
             string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents),
     hx AS (SELECT id, list_transform(w, t -> list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(regexp_extract_all(t, '(?s).'),
                 c -> CAST(ascii(c) AS BIGINT))),
             (acc, c) -> (acc * 257 + c) % 1000000007)) AS ks
           FROM d),
     mx AS (SELECT id, list_transform(ks, x ->
             list_transform([xor(x::UHUGEINT, x::UHUGEINT >> 30::UHUGEINT)],
               a ->
               list_transform([(a * $c1::UHUGEINT) % $two64::UHUGEINT], b ->
                 list_transform([xor(b, b >> 27::UHUGEINT)], c ->
                   list_transform([(c * $c2::UHUGEINT) % $two64::UHUGEINT],
                     m -> xor(m, m >> 31::UHUGEINT))[1])[1])[1])[1]) AS hs
           FROM hx),
     sm AS (SELECT id, CAST(list_sum(list_transform(range(64), p ->
             CASE WHEN 2 * len(list_filter(hs,
                      h -> (h >> CAST(p AS UHUGEINT)) & 1::UHUGEINT
                             = 1::UHUGEINT)) > len(hs)
                  THEN CAST(bits[p + 1] AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END)) AS BIGINT) AS sh
           FROM mx, consts),
     cc AS (SELECT id, sh, j AS chunk,
             CAST(((CASE WHEN sh < 0
                    THEN CAST(sh AS HUGEINT) + $two64::HUGEINT
                    ELSE CAST(sh AS HUGEINT) END)::UHUGEINT
                 >> CAST(j * 16 AS UHUGEINT)) & 65535::UHUGEINT
               AS BIGINT) AS key
            FROM sm, (SELECT unnest(range(4)) AS j)),
     ok AS (SELECT chunk, key FROM cc GROUP BY 1, 2
            HAVING COUNT(*) BETWEEN 2 AND $maxBucket),
     pr AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b,
              CAST(bit_count(xor(x.sh, y.sh)) AS INTEGER) AS hamming
            FROM cc x JOIN cc y ON x.chunk = y.chunk AND x.key = y.key
              AND x.id < y.id
            JOIN ok o ON o.chunk = x.chunk AND o.key = x.key)
     SELECT id_a, id_b, hamming FROM pr
     WHERE hamming <= $maxDist ORDER BY id_a, id_b"""
  }

  /** Spark's `xxhash64` of a single BIGINT (seed 42) as a SQL scalar —
    * XXH64's one-8-byte-block path is a fixed sequence of mod-2^64
    * multiplies/rotates/xors, reproduced in UHUGEINT (validated
    * bit-for-bit against the Spark builtin). The nested single-element
    * `list_transform` chain is the q30 let-binding idiom.
    */
  private def xx64LongSql(inner: String): String = {
    val two64 = "18446744073709551616::UHUGEINT"
    def u(x: Long) = java.lang.Long.toUnsignedString(x) + "::UHUGEINT"
    val (p1, p2, p3, p4, p5) = (0x9E3779B185EBCA87L, 0xC2B2AE3D27D4EB4FL,
      0x165667B19E3779F9L, 0x85EBCA77C2B2AE63L, 0x27D4EB2F165667C5L)
    val h0 = 42L + p5 + 8L // seed + PRIME64_5 + input length (8 bytes)
    // two's complement into the unsigned domain first: a negative BIGINT
    // is a legal xxhash64 input on the Spark side, but DuckDB rejects a
    // direct negative→UHUGEINT cast
    val unsignedInner = s"""(CASE WHEN ($inner) < 0
       THEN CAST(($inner) AS HUGEINT) + 18446744073709551616::HUGEINT
       ELSE CAST(($inner) AS HUGEINT) END)::UHUGEINT"""
    s"""CAST(list_transform([($unsignedInner * ${u(p2)}) % $two64], k ->
     list_transform([((k << 31::UHUGEINT) % $two64 + (k >> 33::UHUGEINT))], k1 ->
     list_transform([xor(${u(h0)}, (k1 * ${u(p1)}) % $two64)], h1 ->
     list_transform([((h1 << 27::UHUGEINT) % $two64 + (h1 >> 37::UHUGEINT))], h2 ->
     list_transform([((h2 * ${u(p1)}) % $two64 + ${u(p4)}) % $two64], h4 ->
     list_transform([xor(h4, h4 >> 33::UHUGEINT)], f1 ->
     list_transform([(f1 * ${u(p2)}) % $two64], f2 ->
     list_transform([xor(f2, f2 >> 29::UHUGEINT)], f3 ->
     list_transform([(f3 * ${u(p3)}) % $two64], f4 ->
     list_transform([xor(f4, f4 >> 32::UHUGEINT)], f5 ->
      CASE WHEN f5 >= 9223372036854775808::UHUGEINT
           THEN CAST(f5 AS HUGEINT) - 18446744073709551616::HUGEINT
           ELSE CAST(f5 AS HUGEINT)
      END)[1])[1])[1])[1])[1])[1])[1])[1])[1])[1] AS BIGINT)"""
  }

  /** q70: corpus mixture rebalancing — per-stratum counts and their min
    * derived in SQL, then the EXACT integer keep rule
    * `bucket(doc_id)·n_s < min_count·granularity` with the bucket from
    * [[xx64LongSql]] (the q52 hash restatement), so the kept set matches
    * Spark's bit-for-bit.
    */
  def q70Sql(granularity: Int = 10000): String = {
    val bucket = s"""((${xx64LongSql("doc_id")}) % $granularity
       + $granularity) % $granularity"""
    s"""WITH c AS (SELECT source, COUNT(*) AS n FROM documents
         GROUP BY source),
       m AS (SELECT MIN(n) AS mn FROM c)
       SELECT d.doc_id, d.source
       FROM documents d JOIN c USING (source) CROSS JOIN m
       WHERE ($bucket) * c.n < m.mn * $granularity
       ORDER BY d.doc_id"""
  }

  /** q91: weighted PPS sample — [[q70Sql]]'s exact-integer threshold
    * construction with per-row rates: keep iff
    * bucket(doc_id)·1000·Σw < w·targetPerMille·N·granularity, all in
    * HUGEINT (Spark runs the same comparison in DECIMAL(38,0)) —
    * multiplication only, so the kept set is engine-exact.
    */
  /** q94: Z-order layout key ([[graft.operators.Layout.zOrderKey]]) —
    * min-max normalization (exact integer `//`) and the Morton bit
    * interleave restated term by term: output bit (i·c + j) = bit i of
    * scaled column j. All arithmetic is integer-exact, so the oracle
    * reproduces the key bit-for-bit.
    */
  def q94Sql(cols: Seq[String] = Seq("l_partkey", "l_suppkey"),
      bits: Int = 8): String = {
    val span = (1L << bits) - 1
    val mmSelect = cols.zipWithIndex.map { case (c, j) =>
      s"CAST(MIN($c) AS BIGINT) AS lo$j, CAST(MAX($c) AS BIGINT) AS hi$j"
    }.mkString(", ")
    val scaledSelect = cols.zipWithIndex.map { case (c, j) =>
      s"""((CAST(l.$c AS BIGINT) - mm.lo$j) * $span)
         // GREATEST(1, mm.hi$j - mm.lo$j) AS s$j"""
    }.mkString(", ")
    val interleave = cols.indices.flatMap { j =>
      (0 until bits).map(i =>
        s"(((s$j >> $i) & 1) << ${i * cols.size + j})")
    }.mkString(" | ")
    s"""WITH mm AS (SELECT $mmSelect FROM lineitem),
     s AS (SELECT l.l_orderkey, l.l_linenumber,
         ${cols.map(c => s"l.$c").mkString(", ")}, $scaledSelect
       FROM lineitem l CROSS JOIN mm)
     SELECT l_orderkey, l_linenumber, ${cols.mkString(", ")},
       CAST($interleave AS BIGINT) AS zkey
     FROM s ORDER BY l_orderkey, l_linenumber"""
  }

  /** q98: integer-grid PageRank ([[graft.operators.Graph.pageRank]]) —
    * the damped iterations unrolled as one CTE pair per round, every
    * step in exact integer arithmetic (`//` = Spark's DIV on positives),
    * so the final ranks hash-match bit-for-bit.
    */
  def q98Sql(iters: Int = 3, scale: Long = 1000000L): String = {
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst AS node, SUM(p.pr // d.deg) AS cin
         FROM e JOIN pr${i - 1} p ON e.src = p.node
         JOIN deg d ON e.src = d.node GROUP BY 1),
       pr$i AS (SELECT n.node,
           (${15 * scale} + 85 * COALESCE(c$i.cin, 0)) // 100 AS pr
         FROM nodes n LEFT JOIN c$i USING (node))"""
    }.mkString(",\n       ")
    s"""WITH base AS (SELECT DISTINCT l_partkey * 2 AS p,
           l_suppkey * 2 + 1 AS s FROM lineitem),
       e AS (SELECT p AS src, s AS dst FROM base
         UNION ALL SELECT s, p FROM base),
       nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
         FROM e GROUP BY 1),
       pr0 AS (SELECT node, CAST($scale AS BIGINT) AS pr FROM nodes),
       $rounds
       SELECT node, CAST(pr AS BIGINT) AS pr FROM pr$iters
       ORDER BY node"""
  }

  def q91Sql(targetPerMille: Int = 300, granularity: Int = 10000): String = {
    val bucket = s"""((${xx64LongSql("doc_id")}) % $granularity
       + $granularity) % $granularity"""
    s"""WITH s AS (SELECT CAST(SUM(n_chars) AS HUGEINT) AS sw,
           CAST(COUNT(*) AS HUGEINT) AS n FROM documents)
     SELECT d.doc_id, d.n_chars
     FROM documents d CROSS JOIN s
     WHERE CAST(($bucket) AS HUGEINT) * 1000 * s.sw
         < CAST(d.n_chars AS HUGEINT) * $targetPerMille * s.n * $granularity
     ORDER BY d.doc_id"""
  }

  /** q52: deterministic stratified sample — Spark's `xxhash64(doc_id)
    * mod granularity < rate(lang)·granularity` rule restated with
    * [[xx64LongSql]], so the oracle reproduces the EXACT kept set (not a
    * statistical approximation): hash-based sampling is a pure function
    * of the id and therefore engine-portable. `pmod` semantics (Spark's
    * pmod is non-negative; SQL `%` follows the dividend sign) are matched
    * by adding the modulus before the final mod.
    */
  def q52Sql(rates: Seq[(String, Long)], defaultThresh: Long,
      granularity: Int = 10000): String = {
    val cases = rates.map { case (lang, th) =>
      s"WHEN '$lang' THEN ${th}" }.mkString(" ")
    val bucket = s"""((${xx64LongSql("doc_id")}) % $granularity
       + $granularity) % $granularity"""
    s"""SELECT doc_id, lang FROM documents
     WHERE $bucket < (CASE lang $cases ELSE $defaultThresh END)
     ORDER BY doc_id"""
  }

  /** q44: IVF top-k with the quantizer TRAINED IN SQL — the whole
    * train-then-probe pipeline restated: xxhash64 subsample + init order
    * ([[xx64LongSql]]), `iters` unrolled Lloyd iterations on the
    * [[Similarity.IvfQuantScale]] integer grid (every dot/sum is exact
    * integer arithmetic in double — order-independent, so centroids are
    * bit-identical to Spark's), nProbe probe lists per query, exact-cosine
    * scoring of the probed lists on the RAW vectors. Assignment argmax
    * ranks by dot/√|c|² (≡ cosine per row), first cid wins ties; empty
    * clusters keep their previous centroid.
    *
    * Exactness boundary (the q31/q32 precedent): training, assignment and
    * probe SELECTION are bit-identical across engines (integer-grid
    * arithmetic). The final `ORDER BY cs DESC` ranks on RAW-double cosine
    * computed independently by each engine (DuckDB
    * `list_cosine_similarity` vs Spark's one-pass CosineSim) — the one
    * cross-engine FP link: a near-tie in raw cosine, or a value exactly on
    * a 4-dp rounding boundary, could flip a rank or a rounded `cos_sim`
    * at some other scale factor even though sf0.1/sf0.01 hash-match. The
    * `neighbor_id` tiebreak bounds the damage to genuinely-equal scores.
    */
  /** The IVF/k-means train-and-assign CTE prefix shared by [[q44Sql]]
    * (top-k probe) and [[q75Sql]] (full-corpus assignment): quantize →
    * hash subsample → deterministic init → `iters` unrolled Lloyd
    * iterations on the integer grid → `asg` (every corpus vector argmax-
    * assigned to its final centroid, first cid wins ties). Exposes CTEs
    * e, qz, nf (final centroids + norms) and asg.
    */
  private def ivfTrainAsgCtes(nCentroids: Int, iters: Int,
      trainMod: Int): String = {
    require(iters >= 1, "iters must be >= 1 (0 would emit invalid SQL)")
    require(trainMod >= 1, "trainMod must be >= 1 (h % 0 is NULL in SQL)")
    val scale = Similarity.IvfQuantScale
    def iter(i: Int): String = {
      val (prev, nxt) = (s"c$i", s"c${i + 1}")
      s"""n$i AS (SELECT cid, c, list_dot_product(c, c) AS nrm FROM $prev),
     a$i AS (SELECT id, qv, cid FROM (
            SELECT t.id, t.qv, n.cid,
              ROW_NUMBER() OVER (PARTITION BY t.id ORDER BY
                (CASE WHEN n.nrm = 0 THEN '-infinity'::DOUBLE
                      ELSE list_dot_product(t.qv, n.c) / sqrt(n.nrm) END)
                DESC, n.cid) AS rn
            FROM tr t CROSS JOIN n$i n) WHERE rn = 1),
     s$i AS (SELECT cid, unnest(range(len(qv))) AS pos, unnest(qv) AS val
             FROM a$i),
     g$i AS (SELECT cid, pos, floor(SUM(val) / COUNT(*)) AS m
             FROM s$i GROUP BY 1, 2),
     $nxt AS (SELECT o.cid, CASE WHEN COUNT(g.m) = 0 THEN ANY_VALUE(o.c)
                  ELSE list(g.m ORDER BY g.pos) END AS c
              FROM $prev o LEFT JOIN g$i g ON g.cid = o.cid
              GROUP BY o.cid)"""
    }
    val cf = s"c$iters"
    s"""e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
           FROM embeddings),
     qz AS (SELECT id, v, list_transform(v,
              x -> CAST(floor(x * $scale) AS DOUBLE)) AS qv FROM e),
     hh AS (SELECT id, qv, ${xx64LongSql("id")} AS h FROM qz),
     tr AS (SELECT id, qv, h FROM hh WHERE ((h % $trainMod) + $trainMod)
              % $trainMod = 0),
     c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, id) - 1 AS INTEGER)
              AS cid, qv AS c
            FROM tr ORDER BY h, id LIMIT $nCentroids),
     ${(0 until iters).map(iter).mkString(",\n     ")},
     nf AS (SELECT cid, c, list_dot_product(c, c) AS nrm FROM $cf),
     asg AS (SELECT id, cid FROM (
            SELECT z.id, n.cid,
              ROW_NUMBER() OVER (PARTITION BY z.id ORDER BY
                (CASE WHEN n.nrm = 0 THEN '-infinity'::DOUBLE
                      ELSE list_dot_product(z.qv, n.c) / sqrt(n.nrm) END)
                DESC, n.cid) AS rn
            FROM qz z CROSS JOIN nf n) WHERE rn = 1)"""
  }

  def q44Sql(k: Int = 5, nCentroids: Int = 16, iters: Int = 2,
      trainMod: Int = 2, nProbe: Int = 4,
      maxQueryId: Int = 8): String = {
    s"""WITH ${ivfTrainAsgCtes(nCentroids, iters, trainMod)},
     prb AS (SELECT query_id, cid FROM (
            SELECT z.id AS query_id, n.cid,
              ROW_NUMBER() OVER (PARTITION BY z.id ORDER BY
                (CASE WHEN n.nrm = 0 THEN '-infinity'::DOUBLE
                      ELSE list_dot_product(z.qv, n.c) / sqrt(n.nrm) END)
                DESC, n.cid) AS pr
            FROM qz z CROSS JOIN nf n WHERE z.id < $maxQueryId)
            WHERE pr <= $nProbe),
     sc AS (SELECT p.query_id, a.id AS neighbor_id,
              list_cosine_similarity(q.v, b.v) AS cs
            FROM prb p
            JOIN asg a ON a.cid = p.cid AND a.id <> p.query_id
            JOIN e q ON q.id = p.query_id
            JOIN e b ON b.id = a.id),
     rk AS (SELECT query_id, neighbor_id, cs,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cs DESC, neighbor_id) AS INTEGER) AS rank
            FROM sc)
     SELECT query_id, neighbor_id, ROUND(cs, 4) AS cos_sim, rank
     FROM rk WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** q81: exact n-gram decontamination — the q29 shingle CTE idiom over
    * both parities: distinct word-n-grams per train doc (even doc_id),
    * the benchmark gram SET (odd doc_id), exhaustive membership join,
    * per-doc match counts ([[graft.textops.Overlap
    * .exactNgramContamination]]'s semantics including the shorter-than-n
    * whole-text gram).
    */
  def q81Sql(n: Int = 13): String = {
    val concat = (0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    s"""WITH d AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS w
         FROM documents),
     sh AS (SELECT doc_id, list_distinct(
             CASE WHEN len(w) < $n THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w) - ${n - 2}),
               i -> $concat) END) AS s
           FROM d),
     tg AS (SELECT doc_id, len(s) AS n_grams, unnest(s) AS g FROM sh
            WHERE doc_id % 2 = 0),
     eg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 2 = 1)
     SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched_grams,
       CAST(ANY_VALUE(t.n_grams) AS INTEGER) AS n_grams
     FROM tg t JOIN eg USING (g)
     GROUP BY t.doc_id ORDER BY t.doc_id"""
  }

  /** q103: the composite curation pipeline — the q55 (fold), q27
    * (fingerprint dedup), q81 (13-gram decontamination), q70 (mixture
    * rebalance) and q56 (sequence packing) oracle chains composed as one
    * CTE pipeline, each stage reading the previous stage's SET. Any
    * intermediate divergence (a wrong survivor, a missed contaminated
    * doc, one extra sampled row) shifts pack boundaries and fails the
    * final hash, so this is an end-to-end pin of the whole chain.
    */
  def q103Sql(granularity: Int = 10000, n: Int = 13,
      capacity: Int = 512): String = {
    val concat = (0 until n).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    val bucket = s"""((${xx64LongSql("doc_id")}) % $granularity
       + $granularity) % $granularity"""
    s"""WITH f AS (SELECT doc_id, source,
           trim(regexp_replace(strip_accents(lower(text)),
             '[ \\t\\n\\f\\r]+', ' ', 'g'), ' ') AS folded
         FROM documents),
     fp AS (SELECT doc_id, source, folded,
         sha256(array_to_string(
           string_split_regex(lower(trim(folded)), '\\s+'), ' '))
           AS fingerprint
         FROM f),
     keep AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fingerprint),
     ded AS (SELECT fp.* FROM fp JOIN keep USING (doc_id)),
     w13 AS (SELECT doc_id, source, folded,
         string_split_regex(lower(trim(folded)), '\\s+') AS w FROM ded),
     sh AS (SELECT doc_id, source, folded, list_distinct(
         CASE WHEN len(w) < $n THEN [array_to_string(w, ' ')]
         ELSE list_transform(range(1, len(w) - ${n - 2}), i -> $concat)
         END) AS s
       FROM w13),
     eg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 2 = 1),
     contam AS (SELECT DISTINCT t.doc_id
       FROM (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 2 = 0) t
       JOIN eg USING (g)),
     clean AS (SELECT doc_id, source, folded FROM sh
       WHERE doc_id % 2 = 0
         AND doc_id NOT IN (SELECT doc_id FROM contam)),
     c AS (SELECT source, COUNT(*) AS cnt FROM clean GROUP BY source),
     m AS (SELECT MIN(cnt) AS mn FROM c),
     bal AS (SELECT d.doc_id, d.source, d.folded
       FROM clean d JOIN c USING (source) CROSS JOIN m
       WHERE ($bucket) * c.cnt < m.mn * $granularity),
     tok AS (SELECT doc_id, source,
         CASE WHEN len(trim(folded)) = 0 THEN 0
              ELSE len(string_split_regex(lower(trim(folded)), '\\s+'))
         END AS tok
       FROM bal),
     wn AS (SELECT doc_id, source, tok,
         SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) - tok AS cum_before
       FROM tok)
     SELECT source, CAST(cum_before // $capacity AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
     FROM wn GROUP BY source, pack_id ORDER BY source, pack_id"""
  }

  /** q82: exact substring dedup — [[graft.textops.Dedup
    * .exactSubstringSpans]] restated end to end: per-token double
    * Karp–Rabin hashes (the q29 Horner idiom, both residue fields),
    * per-position window hashes as the NON-rolling Horner over token-hash
    * slices (identical residues to the Spark side's rolling update — same
    * recurrence, exact int64 mod arithmetic), the injective two-residue
    * packing, the count ≥ 2 duplicated-window rule, and the
    * gaps-and-islands merge into maximal covered runs.
    */
  def q82Sql(minTokens: Int = 50): String = {
    val L = minTokens
    def tokHash(mod: Long): String =
      s"""list_transform(w, tok -> list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(regexp_extract_all(tok, '(?s).'),
               c -> CAST(ascii(c) AS BIGINT))),
           (acc, c) -> (acc * 257 + c) % $mod))"""
    def winHash(arr: String, mod: Long): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT), $arr[i:i + ${L - 1}]),
           (acc, t) -> (acc * 257 + t) % $mod)"""
    s"""WITH d AS (SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS w
         FROM documents),
     f AS (SELECT doc_id, w, len(w) AS m FROM d WHERE len(w) >= $L),
     th AS (SELECT doc_id, m, ${tokHash(1000000007L)} AS t1,
             ${tokHash(998244353L)} AS t2
           FROM f),
     gh AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
             ${winHash("t1", 1000000007L)} * 998244353
               + ${winHash("t2", 998244353L)} AS h
           FROM th, LATERAL unnest(range(1, m - ${L - 2})) AS u(i)),
     dup AS (SELECT h FROM gh GROUP BY h HAVING COUNT(*) >= 2),
     dp AS (SELECT doc_id, pos FROM gh JOIN dup USING (h)),
     fl AS (SELECT doc_id, pos, CASE WHEN
              lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
              OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > $L
              THEN 1 ELSE 0 END AS nw
            FROM dp),
     isl AS (SELECT doc_id, pos,
              SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM fl),
     sp AS (SELECT doc_id, grp, MIN(pos) AS s, MAX(pos) + ${L - 1} AS e
            FROM isl GROUP BY doc_id, grp)
     SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
       CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
       CAST(MAX(e - s + 1) AS INTEGER) AS max_span_tokens
     FROM sp GROUP BY doc_id ORDER BY doc_id"""
  }

  /** q75: spherical k-means full-corpus cluster assignment — the q44
    * trainer CTEs ([[ivfTrainAsgCtes]]: integer-grid Lloyd, bit-identical
    * centroids) with the assignment itself as the gated result: every
    * vector's cluster id plus per-cluster sizes, proving the
    * train+assign pipeline end to end without the probe stage.
    */
  def q75Sql(nCentroids: Int = 16, iters: Int = 2,
      trainMod: Int = 2): String =
    s"""WITH ${ivfTrainAsgCtes(nCentroids, iters, trainMod)},
     sz AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM asg GROUP BY cid)
     SELECT a.id AS vec_id, CAST(a.cid AS INTEGER) AS cid, s.cluster_size
     FROM asg a JOIN sz s ON s.cid = a.cid
     ORDER BY vec_id"""

  /** q76: histogram approximate percentiles — equi-width binning,
    * cumulative bin counts, first bin reaching rank ⌈p·n⌉, upper-edge
    * report ([[graft.operators.Profile.percentilesHistogram]]). Every
    * float operation is restated in the identical order (width =
    * (hi−lo)/bins, bin = floor((v−lo)/width), est = lo + width·(bin+1)),
    * so each correctly-rounded IEEE step produces the same double on both
    * engines; p literals are forced ::DOUBLE (a bare 0.5 would be DuckDB
    * DECIMAL and change the rank arithmetic).
    */
  def q76Sql(ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      bins: Int = 256): String = {
    val binsD = s"$bins.0"
    val vals = ps.map(p =>
      s"('p${math.round(p * 100)}', ${p}::DOUBLE)").mkString(", ")
    s"""WITH s AS (SELECT o_orderpriority AS g, o_totalprice AS v
           FROM orders),
     r AS (SELECT g, MIN(v) AS lo, MAX(v) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY g),
     b AS (SELECT s.g,
             CASE WHEN r.hi = r.lo THEN 0
                  ELSE LEAST($bins - 1, CAST(floor((s.v - r.lo) /
                    ((r.hi - r.lo) / $binsD)) AS BIGINT)) END AS bin
           FROM s JOIN r USING (g)),
     c AS (SELECT g, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
     cm AS (SELECT g, bin,
              SUM(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum FROM c),
     pv(p_name, p) AS (VALUES $vals),
     pick AS (SELECT cm.g, pv.p_name, MIN(cm.bin) AS minbin
              FROM cm JOIN r USING (g) CROSS JOIN pv
              WHERE cm.cum >= CAST(ceil(r.n * pv.p) AS BIGINT)
              GROUP BY 1, 2)
     SELECT k.g AS o_orderpriority, k.p_name AS p,
       CASE WHEN r.hi = r.lo THEN r.lo
            ELSE r.lo + (r.hi - r.lo) / $binsD * (k.minbin + 1) END AS est,
       r.n AS n_rows
     FROM pick k JOIN r USING (g)
     ORDER BY o_orderpriority, p"""
  }

  /** q84: product-quantization codes — all `m` per-subspace Euclidean
    * Lloyd codebooks retrained in DuckDB ([[ivfTrainAsgCtes]]'s pattern
    * with the L2 ranking 2·⟨v,c⟩ − ‖c‖² — exact integers on the grid, so
    * DESC/cid ordering is deterministic), then every vector's code tuple
    * and exact integer reconstruction distortion Σ_s (‖sv‖² − best
    * score). Same hash sample, same smallest-hash seeds (shared across
    * subspaces), same floor-mean / empty-cluster-keeps rules as the
    * Spark trainer.
    */
  /** The q84 per-subspace Euclidean Lloyd chains (tr$s/c{s}_i/nf$s/asg$s
    * CTEs), shared by [[q84Sql]] and [[q85Sql]]. Expects `tr (id, qv, h)`
    * and `qz (id, qv, …)` CTEs in scope — both [[q84Sql]]'s head and
    * [[ivfTrainAsgCtes]] provide them with identical semantics (same
    * grid, same hash sample).
    */
  private def pqChainCtes(m: Int, k: Int, iters: Int, dims: Int): String = {
    require(dims % m == 0)
    val sub = dims / m
    def chain(s: Int): String = {
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      def iter(i: Int): String = {
        val (prev, nxt) = (s"c${s}_$i", s"c${s}_${i + 1}")
        s"""n${s}_$i AS (SELECT cid, c, list_dot_product(c, c) AS nrm
               FROM $prev),
     a${s}_$i AS (SELECT id, sv, cid FROM (
            SELECT t.id, t.sv, n.cid,
              ROW_NUMBER() OVER (PARTITION BY t.id ORDER BY
                (2 * list_dot_product(t.sv, n.c) - n.nrm) DESC, n.cid)
                AS rn
            FROM tr$s t CROSS JOIN n${s}_$i n) WHERE rn = 1),
     s${s}_$i AS (SELECT cid, unnest(range(len(sv))) AS pos,
               unnest(sv) AS val
             FROM a${s}_$i),
     g${s}_$i AS (SELECT cid, pos, floor(SUM(val) / COUNT(*)) AS mean
             FROM s${s}_$i GROUP BY 1, 2),
     $nxt AS (SELECT o.cid, CASE WHEN COUNT(g.mean) = 0
                  THEN ANY_VALUE(o.c)
                  ELSE list(g.mean ORDER BY g.pos) END AS c
              FROM $prev o LEFT JOIN g${s}_$i g ON g.cid = o.cid
              GROUP BY o.cid)"""
      }
      s"""tr$s AS (SELECT id, h, qv[$lo:$hi] AS sv FROM tr),
     c${s}_0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, id) - 1
              AS INTEGER) AS cid, qv[$lo:$hi] AS c
            FROM tr ORDER BY h, id LIMIT $k),
     ${(0 until iters).map(iter).mkString(",\n     ")},
     nf$s AS (SELECT cid, c, list_dot_product(c, c) AS nrm
            FROM c${s}_$iters),
     asg$s AS (SELECT id, cid, vv - sc AS rc FROM (
            SELECT z.id, n.cid,
              (2 * list_dot_product(z.qv[$lo:$hi], n.c) - n.nrm) AS sc,
              list_dot_product(z.qv[$lo:$hi], z.qv[$lo:$hi]) AS vv,
              ROW_NUMBER() OVER (PARTITION BY z.id ORDER BY
                (2 * list_dot_product(z.qv[$lo:$hi], n.c) - n.nrm) DESC,
                n.cid) AS rn
            FROM qz z CROSS JOIN nf$s n) WHERE rn = 1)"""
    }
    (0 until m).map(chain).mkString(",\n     ")
  }

  def q84Sql(m: Int = 4, k: Int = 16, iters: Int = 2,
      trainMod: Int = 2, dims: Int = 64): String = {
    val scale = Similarity.IvfQuantScale
    val codeCols = (0 until m)
      .map(s => s"CAST(a$s.cid AS INTEGER) AS code_$s").mkString(", ")
    val reconSum = (0 until m).map(s => s"a$s.rc").mkString(" + ")
    val joins = (1 until m)
      .map(s => s"JOIN asg$s a$s ON a$s.id = a0.id").mkString(" ")
    s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
           FROM embeddings),
     qz AS (SELECT id, list_transform(v,
              x -> CAST(floor(x * $scale) AS DOUBLE)) AS qv FROM e),
     hh AS (SELECT id, qv, ${xx64LongSql("id")} AS h FROM qz),
     tr AS (SELECT id, qv, h FROM hh WHERE ((h % $trainMod) + $trainMod)
              % $trainMod = 0),
     ${pqChainCtes(m, k, iters, dims)}
     SELECT a0.id AS vec_id, $codeCols,
       CAST($reconSum AS BIGINT) AS recon_sq
     FROM asg0 a0 $joins
     ORDER BY vec_id"""
  }

  /** q85: IVF+PQ ADC probe — [[ivfTrainAsgCtes]] (coarse quantizer +
    * corpus list assignment + the q44 probe selection) composed with
    * [[pqChainCtes]] (per-subspace codebooks + per-vector codes), then
    * asymmetric distance computed EXACTLY: per candidate,
    * Σ_s (‖q_s‖² − 2⟨q_s, c_code(s)⟩ + ‖c_code(s)‖²) over the neighbor's
    * codewords — all exact grid integers, so the ADC ranking (ASC, ties
    * by neighbor id) is deterministic on both engines.
    */
  def q85Sql(k: Int = 5, nCentroids: Int = 16, ivfIters: Int = 2,
      trainMod: Int = 2, nProbe: Int = 4, maxQueryId: Int = 8,
      m: Int = 4, kCode: Int = 16, pqIters: Int = 2,
      dims: Int = 64): String = {
    val sub = dims / m
    val adcTerms = (0 until m).map { s =>
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      s"""(list_dot_product(z.qv[$lo:$hi], z.qv[$lo:$hi])
            - 2 * list_dot_product(z.qv[$lo:$hi], n$s.c) + n$s.nrm)"""
    }.mkString(" + ")
    val codeJoins = (0 until m).map(s =>
      s"""JOIN asg$s x$s ON x$s.id = a.id
            JOIN nf$s n$s ON n$s.cid = x$s.cid""").mkString("\n            ")
    s"""WITH ${ivfTrainAsgCtes(nCentroids, ivfIters, trainMod)},
     ${pqChainCtes(m, kCode, pqIters, dims)},
     prb AS (SELECT query_id, cid FROM (
            SELECT z.id AS query_id, n.cid,
              ROW_NUMBER() OVER (PARTITION BY z.id ORDER BY
                (CASE WHEN n.nrm = 0 THEN '-infinity'::DOUBLE
                      ELSE list_dot_product(z.qv, n.c) / sqrt(n.nrm) END)
                DESC, n.cid) AS pr
            FROM qz z CROSS JOIN nf n WHERE z.id < $maxQueryId)
            WHERE pr <= $nProbe),
     sc AS (SELECT p.query_id, a.id AS neighbor_id,
              $adcTerms AS adc
            FROM prb p
            JOIN asg a ON a.cid = p.cid AND a.id <> p.query_id
            $codeJoins
            JOIN qz z ON z.id = p.query_id),
     rk AS (SELECT query_id, neighbor_id, adc,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY adc ASC, neighbor_id) AS INTEGER) AS rank
            FROM sc)
     SELECT query_id, neighbor_id, CAST(adc AS BIGINT) AS adc_sq, rank
     FROM rk WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** q83: per-hour-window HyperLogLog distinct users — the q71 sketch
    * restatement ([[q71Sql]]'s exact-integer register sum and estimator,
    * same scaladoc contract) with the scope generalized to the tumbling
    * window start (`date_trunc('hour', ts)` — identical to Spark's
    * epoch-aligned 1-hour window under the pinned UTC session), proving
    * the streaming operator's per-window registers bit-for-bit in batch.
    */
  def q83Sql(p: Int = 10): String = {
    val m = 1 << p
    val sw = 64 - p
    val mask = (1L << sw) - 1
    val emptyContrib = 1L << (sw + 1)
    val alphaC = graft.operators.Sketches.alphaM(m) * m * m *
      math.pow(2.0, sw + 1)
    val two64 = "18446744073709551616::HUGEINT"
    s"""WITH a AS (SELECT date_trunc('hour', ts) AS w,
             ${xx64LongSql("user_id")} AS h
           FROM events),
     r AS (SELECT w,
             CAST(((CASE WHEN h < 0 THEN CAST(h AS HUGEINT) + $two64
                    ELSE CAST(h AS HUGEINT) END)::UHUGEINT
                 >> $sw::UHUGEINT) AS BIGINT) AS b,
             (h & $mask) AS v
           FROM a),
     mx AS (SELECT w, b,
              MAX(CASE WHEN v = 0 THEN ${sw + 1}
                  ELSE ${sw + 1} - length(bin(v)) END) AS mreg
            FROM r GROUP BY 1, 2),
     t AS (SELECT w,
             SUM(CAST((1::UHUGEINT << CAST(${sw + 1} - mreg AS UHUGEINT))
               AS DECIMAL(38,0))) AS tp,
             COUNT(*) AS np
           FROM mx GROUP BY 1),
     est AS (SELECT w, $m - np AS v_empty,
              $alphaC / CAST(tp + CAST($m - np AS DECIMAL(38,0))
                * ${emptyContrib}::DECIMAL(38,0) AS DOUBLE) AS raw
             FROM t),
     ex AS (SELECT date_trunc('hour', ts) AS w,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
            FROM events GROUP BY 1)
     SELECT e.w AS window_start, ex.n_exact,
       CAST(e.v_empty AS BIGINT) AS v_empty,
       CAST(round(CASE WHEN e.raw <= ${2.5 * m} AND e.v_empty > 0
         THEN ${m.toDouble} * ln(${m.toDouble} / e.v_empty)
         ELSE e.raw END) AS BIGINT) AS hll_est
     FROM est e JOIN ex ON ex.w = e.w
     ORDER BY window_start"""
  }

  /** q71: HyperLogLog distinct-count — the WHOLE sketch recomputed in
    * DuckDB: [[xx64LongSql]] hashes, bucket = top p bits (unsigned shift
    * via the q30 HUGEINT bridge), rank rho = sw+1 − length(bin(v)) (exact
    * integer/string arithmetic — no float log2), per-bucket MAX register,
    * then the estimator with the EXACT DECIMAL(38,0) register sum
    * Σ 2^(sw+1−M) (+ 2^(sw+1) per empty register) so FP summation order
    * cannot split the engines; the single final division and the
    * linear-counting ln both collapse into a whole-count ROUND, absorbing
    * the libm last-ulp seam ([[graft.operators.Sketches.hllDistinct]]'s
    * determinism contract, restated here).
    */
  def q71Sql(p: Int = 10): String = {
    val m = 1 << p
    val sw = 64 - p
    val mask = (1L << sw) - 1
    val emptyContrib = 1L << (sw + 1)
    val alphaC = graft.operators.Sketches.alphaM(m) * m * m *
      math.pow(2.0, sw + 1)
    val two64 = "18446744073709551616::HUGEINT"
    def sketch(scopeExpr: String, valueExpr: String): String =
      s"""SELECT $scopeExpr AS scope, ${xx64LongSql(valueExpr)} AS h
          FROM events"""
    s"""WITH a AS (${sketch("event_type", "user_id")}
          UNION ALL ${sketch("'ALL'", "event_id")}),
     r AS (SELECT scope,
             CAST(((CASE WHEN h < 0 THEN CAST(h AS HUGEINT) + $two64
                    ELSE CAST(h AS HUGEINT) END)::UHUGEINT
                 >> $sw::UHUGEINT) AS BIGINT) AS b,
             (h & $mask) AS v
           FROM a),
     mx AS (SELECT scope, b,
              MAX(CASE WHEN v = 0 THEN ${sw + 1}
                  ELSE ${sw + 1} - length(bin(v)) END) AS mreg
            FROM r GROUP BY 1, 2),
     t AS (SELECT scope,
             SUM(CAST((1::UHUGEINT << CAST(${sw + 1} - mreg AS UHUGEINT))
               AS DECIMAL(38,0))) AS tp,
             COUNT(*) AS np
           FROM mx GROUP BY 1),
     est AS (SELECT scope, $m - np AS v_empty,
              $alphaC / CAST(tp + CAST($m - np AS DECIMAL(38,0))
                * ${emptyContrib}::DECIMAL(38,0) AS DOUBLE) AS raw
             FROM t),
     ex AS (SELECT event_type AS scope,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
            FROM events GROUP BY 1
            UNION ALL
            SELECT 'ALL', CAST(COUNT(DISTINCT event_id) AS BIGINT)
            FROM events)
     SELECT e.scope, ex.n_exact, CAST(e.v_empty AS BIGINT) AS v_empty,
       CAST(round(CASE WHEN e.raw <= ${2.5 * m} AND e.v_empty > 0
         THEN ${m.toDouble} * ln(${m.toDouble} / e.v_empty)
         ELSE e.raw END) AS BIGINT) AS hll_est
     FROM est e JOIN ex ON ex.scope = e.scope
     ORDER BY e.scope"""
  }

  /** q73: deterministic corpus shuffle — shuffle_key = xxhash64(doc_id ⊕
    * seed) via [[xx64LongSql]], batch = top logBatches bits (unsigned
    * shift through the q30 HUGEINT bridge). The ORDER BY is the
    * permutation itself; equality proves it element-for-element.
    */
  def q73Sql(seed: Long, logBatches: Int): String = {
    val shift = 64 - logBatches
    val two64 = "18446744073709551616::HUGEINT"
    s"""WITH k AS (SELECT doc_id,
           ${xx64LongSql(s"xor(doc_id, $seed)")} AS shuffle_key
         FROM documents)
     SELECT doc_id, shuffle_key,
       CAST(((CASE WHEN shuffle_key < 0
              THEN CAST(shuffle_key AS HUGEINT) + $two64
              ELSE CAST(shuffle_key AS HUGEINT) END)::UHUGEINT
           >> $shift::UHUGEINT) AS BIGINT) AS batch
     FROM k ORDER BY shuffle_key, doc_id"""
  }

  /** Splitmix64-finalized Karp–Rabin of a VARCHAR expression as an
    * UHUGEINT-typed SQL scalar — the q30 per-token hash factored for
    * reuse (KR Horner over codepoints mod 1e9+7, then the exact mod-2^64
    * xor-shift-multiply finalizer via the nested let-binding idiom).
    */
  /** q105: approximate table profile — [[graft.operators.Profile
    * .describeApprox]]'s whole per-column HLL sketch replayed in DuckDB:
    * the q99 unpivot, the [[krSplitmix64Sql]] string hash (already
    * UHUGEINT/unsigned), q71's register arithmetic (exact-integer
    * harmonic sum, linear-counting branch, round-to-whole-count
    * absorbing the ln seam), plus the exact row/null/min/max counters
    * riding the same per-(column, register) grouping.
    */
  def q105Sql(p: Int = 10): String = {
    val m = 1 << p
    val sw = 64 - p
    val mask = (1L << sw) - 1
    val emptyContrib = 1L << (sw + 1)
    val alphaC = graft.operators.Sketches.alphaM(m) * m * m *
      math.pow(2.0, sw + 1)
    s"""WITH u AS (
           SELECT 'o_orderkey' AS "column",
             CAST(o_orderkey AS VARCHAR) AS v FROM orders
           UNION ALL SELECT 'o_custkey',
             CAST(o_custkey AS VARCHAR) FROM orders
           UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
           UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders),
     hx AS (SELECT "column", v,
              CASE WHEN v IS NULL THEN NULL
                   ELSE ${krSplitmix64Sql("v")} END AS hu
            FROM u),
     r AS (SELECT "column", v,
             CASE WHEN v IS NULL THEN -1
                  ELSE CAST((hu >> $sw::UHUGEINT) AS BIGINT) END AS b,
             CASE WHEN v IS NULL THEN 0
                  ELSE CAST((hu & $mask::UHUGEINT) AS BIGINT) END AS hv
           FROM hx),
     regs AS (SELECT "column", b,
              MAX(CASE WHEN b = -1 THEN 0
                  WHEN hv = 0 THEN ${sw + 1}
                  ELSE ${sw + 1} - length(bin(hv)) END) AS mreg,
              CAST(COUNT(*) AS BIGINT) AS c,
              MIN(v) AS mn, MAX(v) AS mx
            FROM r GROUP BY 1, 2),
     fin AS (SELECT "column",
              CAST(SUM(c) AS BIGINT) AS n_rows,
              CAST(SUM(CASE WHEN b = -1 THEN c ELSE 0 END) AS BIGINT)
                AS n_nulls,
              MIN(mn) AS min_str, MAX(mx) AS max_str,
              SUM(CASE WHEN b >= 0 THEN
                CAST((1::UHUGEINT << CAST(${sw + 1} - mreg AS UHUGEINT))
                  AS DECIMAL(38,0)) ELSE NULL END) AS tp,
              CAST(SUM(CASE WHEN b >= 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS np
            FROM regs GROUP BY 1)
     SELECT "column", n_rows, n_nulls,
       CAST(round(CASE WHEN ($alphaC / CAST(COALESCE(tp, 0)
             + CAST($m - np AS DECIMAL(38,0))
             * ${emptyContrib}::DECIMAL(38,0) AS DOUBLE)) <= ${2.5 * m}
           AND $m - np > 0
         THEN ${m.toDouble} * ln(${m.toDouble} / ($m - np))
         ELSE ($alphaC / CAST(COALESCE(tp, 0)
             + CAST($m - np AS DECIMAL(38,0))
             * ${emptyContrib}::DECIMAL(38,0) AS DOUBLE)) END) AS BIGINT)
         AS n_distinct_approx,
       min_str, max_str
     FROM fin ORDER BY "column""""
  }

  private def krSplitmix64Sql(strExpr: String): String = {
    val two64 = "18446744073709551616::UHUGEINT"
    val c1 = java.lang.Long.toUnsignedString(0xbf58476d1ce4e5b9L) + "::UHUGEINT"
    val c2 = java.lang.Long.toUnsignedString(0x94d049bb133111ebL) + "::UHUGEINT"
    s"""list_transform([CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(regexp_extract_all($strExpr, '(?s).'),
          c -> CAST(ascii(c) AS BIGINT))),
        (acc, c) -> (acc * 257 + c) % 1000000007) AS UHUGEINT)], x ->
      list_transform([xor(x, x >> 30::UHUGEINT)], a ->
      list_transform([(a * $c1) % $two64], b ->
      list_transform([xor(b, b >> 27::UHUGEINT)], cc ->
      list_transform([(cc * $c2) % $two64], m ->
        xor(m, m >> 31::UHUGEINT))[1])[1])[1])[1])[1]"""
  }

  /** q74: count-min heavy hitters — the whole sketch in DuckDB: per-token
    * exact counts, [[krSplitmix64Sql]] hashes, Kirsch–Mitzenmacher cells
    * (lo + i·(hi|1) mod w over the hash halves), cell sums, min-over-d
    * estimates for the exact top-k. Integer arithmetic end to end.
    */
  def q74Sql(d: Int = 4, logW: Int = 12, topK: Int = 30): String = {
    val w = 1L << logW
    s"""WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)),
           '\\s+')) AS token FROM documents),
     tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok
            WHERE token <> '' GROUP BY token),
     kh AS (SELECT token, n, ${krSplitmix64Sql("token")} AS h FROM tc),
     hp AS (SELECT token, n,
              CAST(h & 4294967295::UHUGEINT AS BIGINT) AS lo,
              CAST(h >> 32::UHUGEINT AS BIGINT) | 1 AS hi
            FROM kh),
     cells AS (SELECT token, n, i, (lo + i * hi) % $w AS cell
               FROM hp, (SELECT unnest(range($d)) AS i)),
     sk AS (SELECT i, cell, SUM(n) AS c FROM cells GROUP BY 1, 2),
     top AS (SELECT token, n FROM tc ORDER BY n DESC, token LIMIT $topK)
     SELECT t.token, t.n AS n_exact, CAST(MIN(s.c) AS BIGINT) AS cms_est
     FROM top t JOIN cells cl USING (token)
     JOIN sk s ON s.i = cl.i AND s.cell = cl.cell
     GROUP BY t.token, t.n
     ORDER BY n_exact DESC, t.token"""
  }

  /** q90: per-hour-window count-min frequencies — the q74 sketch
    * restatement ([[krSplitmix64Sql]] hash, Kirsch–Mitzenmacher cells,
    * cell sums, min-over-d estimates) with the scope generalized to the
    * tumbling window start (the q83 convention: `date_trunc('hour', ts)`
    * ≡ Spark's epoch-aligned 1-hour window under the pinned UTC session)
    * and the estimate probed for a FIXED value list — empty cells count
    * 0, so a probe absent from a window still gets its (collision-only)
    * estimate, exactly like the operator's untouched counters.
    */
  def q90Sql(probes: Seq[String], d: Int = 4, logW: Int = 10): String = {
    val w = 1L << logW
    val probeList = probes.map(p => s"'$p'").mkString(", ")
    s"""WITH e AS (SELECT date_trunc('hour', ts) AS w, event_type AS v
           FROM events),
     vc AS (SELECT w, v, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
     kh AS (SELECT w, v, n, ${krSplitmix64Sql("v")} AS h FROM vc),
     hp AS (SELECT w, v, n,
              CAST(h & 4294967295::UHUGEINT AS BIGINT) AS lo,
              CAST(h >> 32::UHUGEINT AS BIGINT) | 1 AS hi
            FROM kh),
     cells AS (SELECT w, v, n, i, (lo + i * hi) % $w AS cell
               FROM hp, (SELECT unnest(range($d)) AS i)),
     sk AS (SELECT w, i, cell, SUM(n) AS c FROM cells GROUP BY 1, 2, 3),
     pr AS (SELECT unnest([$probeList]) AS v),
     ph AS (SELECT v, ${krSplitmix64Sql("v")} AS h FROM pr),
     pp AS (SELECT v,
              CAST(h & 4294967295::UHUGEINT AS BIGINT) AS lo,
              CAST(h >> 32::UHUGEINT AS BIGINT) | 1 AS hi
            FROM ph),
     pc AS (SELECT v, i, (lo + i * hi) % $w AS cell
            FROM pp, (SELECT unnest(range($d)) AS i)),
     wins AS (SELECT DISTINCT w FROM e),
     est AS (SELECT n.w, p.v,
               CAST(MIN(COALESCE(s.c, 0)) AS BIGINT) AS cms_est
             FROM wins n CROSS JOIN pc p
             LEFT JOIN sk s ON s.w = n.w AND s.i = p.i AND s.cell = p.cell
             GROUP BY 1, 2)
     SELECT e2.w AS window_start, e2.v AS probe,
       CAST(COALESCE(x.n, 0) AS BIGINT) AS n_exact, e2.cms_est
     FROM est e2 LEFT JOIN vc x ON x.w = e2.w AND x.v = e2.v
     ORDER BY 1, 2"""
  }

  /** q106: graph-ANN top-k — the WHOLE navigable-small-world pipeline
    * restated: band width from the integer-exact COUNT(*) rule
    * ([[graft.textops.Similarity.exactBandBits]] — `(1<<r) > (n−1)//d`
    * is pure integer logic, no libm log), per-plane sign bits against
    * the inlined `bands`·`hi` hyperplane matrix, variable-width bucket
    * packing, the 2..maxBucket (graph) and 1..maxBucket (entry) caps,
    * within-bucket top-`m` links per band, `hops` unrolled
    * expand-rescore-trim beam rounds, and the final raw-cosine top-k.
    *
    * Exactness boundary (the q44 statement, verbatim logic): every
    * SELECTION — link ranking, beam ranking — runs on the
    * [[Similarity.IvfQuantScale]] integer grid, where dots are exact
    * integers and `dot/(√n·√n)` is a fixed tree of correctly-rounded
    * IEEE ops, bit-identical across engines. Only the final `ORDER BY
    * cs DESC` ranks on raw-double cosine (DuckDB
    * `list_cosine_similarity` vs Spark's one-pass CosineSim) — the one
    * cross-engine FP link, damage bounded by the `neighbor_id` tiebreak.
    */
  def q106Sql(k: Int = 5, m: Int = 6, bands: Int = 2, density: Int = 64,
      lo: Int = 4, hi: Int = 16, beam: Int = 24, hops: Int = 2,
      maxBucket: Int = 1 << 12, maxQueryId: Int = 8,
      dims: Int = 64): String = {
    val scale = Similarity.IvfQuantScale
    // rescore-and-trim round: candidates `src` → beam CTE `out`
    def trim(out: String, src: String, width: Int): String =
      s"""$out AS (SELECT query_id, cand FROM (
          SELECT t.query_id, t.cand,
            ROW_NUMBER() OVER (PARTITION BY t.query_id ORDER BY
              (list_dot_product(q.qv, c.qv) / (q.nq * c.nq)) DESC,
              t.cand) AS rn
          FROM $src t JOIN nz q ON q.id = t.query_id
            JOIN nz c ON c.id = t.cand)
        WHERE rn <= $width)"""
    def hop(i: Int): String = {
      val prev = if (i == 1) "b0" else s"b${i - 1}"
      s"""x$i AS (SELECT query_id, cand FROM $prev
          UNION
          SELECT p.query_id, g.dst AS cand FROM $prev p
            JOIN ed g ON g.src = p.cand WHERE g.dst <> p.query_id),
     ${trim(s"b$i", s"x$i", beam)}"""
    }
    val last = s"b$hops"
    s"""WITH consts AS (SELECT ${planesSql(bands * hi, dims)}::DOUBLE[][]
         AS pl),
     rr AS (SELECT COALESCE((SELECT MIN(r)
              FROM (SELECT unnest(range($lo, ${hi + 1})) AS r)
              WHERE (1::BIGINT << r) >
                ((SELECT COUNT(*) FROM embeddings) - 1) // $density),
            $hi) AS r),
     e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
     qz AS (SELECT id, v, list_transform(v,
              x -> floor(x * $scale)) AS qv FROM e),
     nz AS (SELECT id, v, qv, sqrt(list_dot_product(qv, qv)) AS nq
            FROM qz WHERE list_dot_product(qv, qv) > 0),
     bt AS (SELECT id, list_transform(range($bands * rr.r), p ->
              CASE WHEN list_dot_product(v, pl[p + 1]) > 0
                   THEN 1 ELSE 0 END) AS b
            FROM nz, consts, rr),
     bb AS (SELECT id, bd AS band,
              CAST(list_sum(list_transform(range(rr.r), i ->
                CASE WHEN b[bd * rr.r + i + 1] = 1
                     THEN (1::BIGINT << i) ELSE 0::BIGINT END))
                AS BIGINT) AS bucket
            FROM bt, rr, (SELECT unnest(range($bands)) AS bd)),
     okg AS (SELECT band, bucket FROM bb GROUP BY 1, 2
             HAVING COUNT(*) BETWEEN 2 AND $maxBucket),
     oke AS (SELECT band, bucket FROM bb GROUP BY 1, 2
             HAVING COUNT(*) BETWEEN 1 AND $maxBucket),
     pg AS (SELECT s.id AS src, s.band, d.id AS dst
            FROM bb s JOIN bb d ON s.band = d.band
              AND s.bucket = d.bucket AND s.id <> d.id
            JOIN okg o ON o.band = s.band AND o.bucket = s.bucket),
     ps AS (SELECT src, band, dst,
              list_dot_product(a.qv, b.qv) / (a.nq * b.nq) AS qsim
            FROM pg JOIN nz a ON a.id = pg.src
              JOIN nz b ON b.id = pg.dst),
     ed AS (SELECT DISTINCT src, dst FROM (
              SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src, band
                ORDER BY qsim DESC, dst) AS rn FROM ps)
            WHERE rn <= $m),
     ent AS (SELECT DISTINCT q.id AS query_id, c.id AS cand
             FROM bb q JOIN bb c ON q.band = c.band
               AND q.bucket = c.bucket AND q.id <> c.id
             JOIN oke o ON o.band = c.band AND o.bucket = c.bucket
             WHERE q.id < $maxQueryId),
     ${trim("b0", "ent", beam)},
     ${(1 to hops).map(hop).mkString(",\n     ")},
     fin AS (SELECT t.query_id, t.cand AS neighbor_id,
               list_cosine_similarity(q.v, c.v) AS cs
             FROM $last t JOIN nz q ON q.id = t.query_id
               JOIN nz c ON c.id = t.cand),
     rk AS (SELECT query_id, neighbor_id, cs,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cs DESC, neighbor_id) AS INTEGER) AS rank
            FROM fin)
     SELECT query_id, neighbor_id, ROUND(cs, 4) AS cos_sim, rank
     FROM rk WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** q107: SemDeDup — centroids retrained from scratch
    * ([[ivfTrainAsgCtes]]: integer-grid Lloyd, bit-identical to Spark's
    * trainer, q75-proven), every vector reassigned, then the duplicate
    * set re-derived independently: within each ≤`maxCluster` cluster,
    * a vector is a duplicate iff a smaller-id member has raw cosine ≥
    * `threshold` (`list_cosine_similarity` vs Spark's one-pass CosineSim
    * — the q46 FP boundary; pairs away from the threshold on this
    * corpus). Oversize clusters contribute no pairs — the cap semantics
    * are part of the contract and mirrored exactly.
    */
  def q107Sql(threshold: Double = 0.38, nCentroids: Int = 16,
      iters: Int = 2, trainMod: Int = 2,
      maxCluster: Int = 1 << 20): String =
    s"""WITH ${ivfTrainAsgCtes(nCentroids, iters, trainMod)},
     ok AS (SELECT cid FROM asg GROUP BY cid
            HAVING COUNT(*) <= $maxCluster),
     dup AS (SELECT DISTINCT b.id
             FROM asg a JOIN ok USING (cid)
             JOIN asg b ON b.cid = a.cid AND a.id < b.id
             JOIN e va ON va.id = a.id
             JOIN e vb ON vb.id = b.id
             WHERE list_cosine_similarity(va.v, vb.v) >= $threshold)
     SELECT a.id AS vec_id, CAST(a.cid AS INTEGER) AS cid,
       CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS kept
     FROM asg a LEFT JOIN dup d ON d.id = a.id
     ORDER BY vec_id"""

  /** q108: BM25 top-k — tokenizer (the q67-proven whitespace split),
    * document lengths (the q25 CASE), corpus stats, Lucene idf, the k1/b
    * saturation term and the rounded-rank total order all restated. The
    * float literals are interpolated from the SAME Scala doubles the
    * Spark expression tree uses (round-trip decimal repr), so every
    * per-term IEEE step is bit-identical; ln's last ulp and the sum order
    * over a query's ≤|terms| contributions are the only cross-engine
    * links, both absorbed by ROUND(…, 4) before ranking.
    */
  def q108Sql(k: Int = 5, k1: Double = 1.2, b: Double = 0.75): String = {
    // mirror bm25TopK's term normalization (lowercase), and escape the
    // SQL literal so a term containing a quote cannot break the VALUES
    val vals = graft.operators.TextQueries.Bm25QueryBatch
      .flatMap { case (qid, ts) => ts.map(_.toLowerCase).distinct
        .map(t => s"($qid, '${t.replace("'", "''")}')") }
      .mkString(", ")
    s"""WITH q(query_id, term) AS (VALUES $vals),
     tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)),
               '\\s+')) AS term FROM documents),
     dl AS (SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END
              AS dl FROM documents),
     st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
              CAST(SUM(dl) AS DOUBLE) AS tt FROM dl),
     tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
            WHERE term <> '' AND term IN (SELECT term FROM q)
            GROUP BY 1, 2),
     dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfc
             FROM tf GROUP BY 1),
     sc AS (SELECT q.query_id, tf.doc_id,
              ROUND(SUM(ln(1.0 + (st.nd - d.dfc + 0.5) / (d.dfc + 0.5)) *
                (tf.tf * ${k1 + 1.0}) /
                (tf.tf + $k1 * (${1.0 - b} + $b * dl.dl /
                  (st.tt / st.nd)))), 4) AS score
            FROM tf JOIN dfq d USING (term) JOIN q USING (term)
            JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st
            GROUP BY 1, 2),
     r AS (SELECT query_id, doc_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS INTEGER) AS rank FROM sc)
     SELECT query_id, rank, doc_id, score FROM r WHERE rank <= $k
     ORDER BY query_id, rank"""
  }

  /** q111: incremental near-dup admission — the q29 MinHash pipeline
    * re-derived from scratch (shingles, KR hashes, k permutation mins,
    * band split) over BOTH populations, with the pair space restricted to
    * new×existing and the bucket cap applied to the EXISTING side only
    * (the build-time rule: capped buckets never enter the index; a
    * singleton index bucket IS probe-able, so no lower bound — unlike
    * q29's within-set BETWEEN 2). Band keys compare as value lists where
    * Spark buckets by xxhash64 of the list — identical grouping unless
    * xxhash64 collides (the q29 contract).
    */
  def q111Sql(n: Int = 3, k: Int = 64, bands: Int = 16,
      estThreshold: Double = 0.5, maxBucket: Int = 1 << 12,
      newMod: Int = 5): String = {
    val r = k / bands
    val params = Dedup.hashParams(k)
    val pa = params.map(_._1).mkString("[", ", ", "]")
    val pb = params.map(_._2).mkString("[", ", ", "]")
    s"""WITH consts AS (SELECT $pa AS pa, $pb AS pb),
     d AS (SELECT doc_id AS id,
             string_split_regex(lower(trim(text)), '\\s+') AS w
           FROM documents),
     sh AS (SELECT id, list_distinct(
             CASE WHEN len(w) < $n THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w) - ${n - 2}),
               i -> ${(0 until n).map(j => s"w[i + $j]")
                 .mkString(" || ' ' || ")}) END) AS s
           FROM d),
     hx AS (SELECT id, list_transform(s, g -> list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(regexp_extract_all(g, '(?s).'),
                 c -> CAST(ascii(c) AS BIGINT))),
             (acc, c) -> (acc * 257 + c) % 1000000007)) AS xs
           FROM sh),
     sg AS (SELECT id, list_transform(range($k), j ->
             list_min(list_transform(xs,
               x -> (x * pa[j + 1] + pb[j + 1]) % ${Dedup.P}))) AS sig
           FROM hx, consts),
     bbx AS (SELECT id, b AS band, sig[b * $r + 1 : b * $r + $r] AS key
             FROM sg, (SELECT unnest(range($bands)) AS b)
             WHERE id % $newMod <> 0),
     okx AS (SELECT band, key FROM bbx GROUP BY 1, 2
             HAVING COUNT(*) <= $maxBucket),
     bbn AS (SELECT id, b AS band, sig[b * $r + 1 : b * $r + $r] AS key
             FROM sg, (SELECT unnest(range($bands)) AS b)
             WHERE id % $newMod = 0),
     pr AS (SELECT DISTINCT nb.id AS new_id, xb.id AS old_id
            FROM bbn nb JOIN bbx xb
              ON nb.band = xb.band AND nb.key = xb.key
            JOIN okx o ON o.band = xb.band AND o.key = xb.key),
     est AS (SELECT new_id, old_id,
              CAST(len(list_filter(range($k),
                j -> sa.sig[j + 1] = sb.sig[j + 1])) AS DOUBLE) / $k AS ej
             FROM pr JOIN sg sa ON sa.id = new_id
             JOIN sg sb ON sb.id = old_id)
     SELECT new_id, old_id, ROUND(ej, 4) AS est_jaccard
     FROM est WHERE ej >= $estThreshold ORDER BY new_id, old_id"""
  }

  /** q113: quantized JL random projection + projected-space top-k — the
    * quantized plane matrix re-materialized as literals, projections as
    * integer-exact `list_dot_product`s, and the cosine written as the
    * SAME `sab/(√saa·√sbb)` composition as Spark's CosineSim: with exact
    * integer inputs every IEEE rounding is shared, so the ranking is
    * bit-deterministic across engines (no raw-float seam).
    */
  def q113Sql(k: Int = 5, outDim: Int = 16, dims: Int = 64,
      scale: Int = 64, maxQueryId: Int = 8): String = {
    val pq = (0 until outDim).map(p => Similarity.hyperplane(p, dims)
        .map(x => math.floor(x * scale).toString).mkString("[", ", ", "]"))
      .mkString("[", ",\n       ", "]")
    s"""WITH consts AS (SELECT $pq::DOUBLE[][] AS pq),
     e AS (SELECT vec_id AS id, list_transform(embedding::DOUBLE[],
             x -> CAST(floor(x * $scale) AS DOUBLE)) AS qv
           FROM embeddings),
     pj AS (SELECT id, list_transform(range($outDim),
             p -> list_dot_product(qv, pq[p + 1])) AS v FROM e, consts),
     sc AS (SELECT q.id AS query_id, c.id AS neighbor_id,
             list_dot_product(q.v, c.v) /
               (sqrt(list_dot_product(q.v, q.v)) *
                sqrt(list_dot_product(c.v, c.v))) AS cs
            FROM pj q JOIN pj c ON c.id <> q.id
            WHERE q.id < $maxQueryId),
     rk AS (SELECT query_id, neighbor_id, cs,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cs DESC, neighbor_id) AS INTEGER) AS rank FROM sc)
     SELECT query_id, neighbor_id, ROUND(cs, 4) AS cos_sim, rank
     FROM rk WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** q109: token-budget mixture — the SEMANTIC restatement of
    * [[graft.textops.Sampling.tokenBudgetMixture]]'s two-level prefix:
    * one running-sum window per language over UNSIGNED xxhash64 order
    * (`hu` reconstructs the unsigned domain from the signed
    * [[xx64LongSql]] value), keep while the running token total stays ≤
    * the configured budget. All-integer arithmetic — no cross-engine FP
    * link anywhere. Equality proves bucket-decomposed ≡ global prefix.
    */
  def q109Sql(): String = {
    val cases = graft.operators.TextQueries.MixtureBudgets.toSeq.sorted
      .map { case (l, b) => s"WHEN '$l' THEN $b" }.mkString(" ")
    s"""WITH t AS (SELECT doc_id, lang,
           CAST(CASE WHEN len(trim(text)) = 0 THEN 0
             ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END
             AS BIGINT) AS n_tokens,
           ${xx64LongSql("doc_id")} AS h
         FROM documents),
     u AS (SELECT doc_id, lang, n_tokens,
             CASE WHEN h < 0
                  THEN CAST(h AS HUGEINT) + 18446744073709551616::HUGEINT
                  ELSE CAST(h AS HUGEINT) END AS hu FROM t),
     c AS (SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY hu, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum FROM u)
     SELECT doc_id, lang, n_tokens FROM c
     WHERE cum <= (CASE lang $cases ELSE 0 END)
     ORDER BY doc_id"""
  }
}
