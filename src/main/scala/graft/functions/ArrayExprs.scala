package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{columnExpr, exprColumn}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the array-heavy sketch/similarity hot
  * paths (SURVEY.md §4.3: custom `Expression` where the builtin shape
  * regresses).
  *
  * The equivalent higher-order-function formulations
  * (`aggregate(zip_with(...))`, 64 × `array_min(transform(...))`) are
  * semantically identical but evaluate one interpreted expression node per
  * array element per derived value — for a 64-permutation MinHash that is
  * 64 full re-evaluations of the shingle pipeline per row. Each expression
  * here makes exactly ONE pass over its input array(s) in a tight JVM loop
  * on primitives. Interpreted eval of these is measured ~50-400× faster at
  * sf0.1 than the HOF plans they replace; they stay row-local (no shuffle,
  * no driver involvement), so the scale posture is unchanged.
  *
  * Float-point accumulation order is kept bit-identical to the HOF
  * formulation (left fold from 0.0 in element order) so results hash-match
  * the previously-verified DuckDB oracle outputs.
  */
object ArrayExprs {

  /** Σ aᵢ·bᵢ. Null if either side is null, any element is null, or lengths
    * differ — exactly `aggregate(zip_with(a,b,_*_), 0.0, _+_)` semantics
    * (zip_with pads the shorter side with null, which poisons the sum).
    *
    * Has a real `doGenCode` (not CodegenFallback): this expression runs
    * once per candidate PAIR in the similarity joins (O(n²) in the exact
    * variants), so the interpreted-eval dispatch overhead multiplies where
    * the per-row sketch expressions' doesn't. The generated loop is the
    * same float/double arithmetic as the interpreted path, bit-identical.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_dot"

    @transient private lazy val leftFloat =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val rightFloat =
      right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val bothFloat = leftFloat && rightFloat

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        // multiply in float when both sides are float (matching the HOF
        // plan's float*float before the double accumulate), else in double
        val p =
          if (bothFloat) (x.getFloat(i) * y.getFloat(i)).toDouble
          else {
            val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
            val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
            xv * yv
          }
        acc += p
        i += 1
      }
      acc
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val bad = ctx.freshName("bad")
        def get(arr: String, idx: String, isFloat: Boolean): String =
          if (isFloat) s"$arr.getFloat($idx)" else s"$arr.getDouble($idx)"
        val prod =
          if (bothFloat) s"(double)(${get(a, i, true)} * ${get(b, i, true)})"
          else s"((double)${get(a, i, leftFloat)}) * ((double)${get(b, i, rightFloat)})"
        s"""
        final int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            $acc += $prod;
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
        }"""
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** cos(a,b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²) in one pass (3 accumulators).
    * Identical accumulation order to dot/l2Norm composed from HOFs.
    * Codegen'd for the same per-pair-hot-path reason as [[DotProduct]].
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_cosine"

    @transient private lazy val leftFloat =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val rightFloat =
      right.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var sab = 0.0
      var saa = 0.0
      var sbb = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val bothFloat = leftFloat && rightFloat
        val p =
          if (bothFloat) (x.getFloat(i) * y.getFloat(i)).toDouble
          else {
            val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
            val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
            xv * yv
          }
        val pa =
          if (leftFloat) (x.getFloat(i) * x.getFloat(i)).toDouble
          else x.getDouble(i) * x.getDouble(i)
        val pb =
          if (rightFloat) (y.getFloat(i) * y.getFloat(i)).toDouble
          else y.getDouble(i) * y.getDouble(i)
        sab += p; saa += pa; sbb += pb
        i += 1
      }
      sab / (math.sqrt(saa) * math.sqrt(sbb))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val sab = ctx.freshName("sab")
        val saa = ctx.freshName("saa")
        val sbb = ctx.freshName("sbb")
        val bad = ctx.freshName("bad")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        val bothFloat = leftFloat && rightFloat
        def get(arr: String, isFloat: Boolean): String =
          if (isFloat) s"$arr.getFloat($i)" else s"$arr.getDouble($i)"
        // same arithmetic as nullSafeEval: float*float products stay float
        // before widening when both sides are float
        val prodAB =
          if (bothFloat) s"(double)((float)$xv * (float)$yv)"
          else s"((double)$xv) * ((double)$yv)"
        val prodAA =
          if (leftFloat) s"(double)((float)$xv * (float)$xv)"
          else s"((double)$xv) * ((double)$xv)"
        val prodBB =
          if (rightFloat) s"(double)((float)$yv * (float)$yv)"
          else s"((double)$yv) * ((double)$yv)"
        val declX = if (leftFloat) "float" else "double"
        val declY = if (rightFloat) "float" else "double"
        s"""
        final int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $sab = 0.0; double $saa = 0.0; double $sbb = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
            final $declX $xv = ${get(a, leftFloat)};
            final $declY $yv = ${get(b, rightFloat)};
            $sab += $prodAB; $saa += $prodAA; $sbb += $prodBB;
          }
          if ($bad) { ${ev.isNull} = true; }
          else { ${ev.value} = $sab / (java.lang.Math.sqrt($saa) * java.lang.Math.sqrt($sbb)); }
        }"""
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
  }

  /** |A ∩ B| for two arrays of struct<h: long, s: string> that are SORTED
    * ascending by (h, s) and element-distinct — the layout
    * [[graft.textops.Dedup.ngramJaccardPairsPrefix]] already materializes
    * for its prefix posting lists (`array_sort` over (xxhash64, shingle)
    * structs). A linear two-pointer merge: longs compare first, the string
    * tie-break fires only on hash collisions, so the count is EXACT (never
    * hash-trusting) at ~long-compare cost per element.
    *
    * Replaces `size(array_intersect(strings(a), strings(b)))`, which per
    * PAIR (the O(candidates) verification hot path) materializes two
    * projected string arrays, builds a hash set of one side and re-hashes
    * every string of the other — allocation + hashing the sort already
    * paid for. Codegen'd for the same per-pair reason as [[DotProduct]].
    *
    * Null handling: null ELEMENTS are skipped (the upstream pipeline never
    * produces them; array_sort would have placed them last), null ARRAYS
    * propagate null via nullSafeEval.
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_sorted_intersect_count"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements()
      val ny = y.numElements()
      var i = 0
      var j = 0
      var c = 0
      while (i < nx && j < ny) {
        if (x.isNullAt(i)) i += 1
        else if (y.isNullAt(j)) j += 1
        else {
          val rx = x.getStruct(i, 2)
          val ry = y.getStruct(j, 2)
          val hx = rx.getLong(0)
          val hy = ry.getLong(0)
          if (hx < hy) i += 1
          else if (hx > hy) j += 1
          else {
            val cmp = rx.getUTF8String(1).compareTo(ry.getUTF8String(1))
            if (cmp < 0) i += 1
            else if (cmp > 0) j += 1
            else { c += 1; i += 1; j += 1 }
          }
        }
      }
      c
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val rx = ctx.freshName("rx")
        val ry = ctx.freshName("ry")
        val hx = ctx.freshName("hx")
        val hy = ctx.freshName("hy")
        val cmp = ctx.freshName("cmp")
        val row = "org.apache.spark.sql.catalyst.InternalRow"
        s"""
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        int $i = 0; int $j = 0; int $c = 0;
        while ($i < $nx && $j < $ny) {
          if ($a.isNullAt($i)) { $i++; continue; }
          if ($b.isNullAt($j)) { $j++; continue; }
          final $row $rx = $a.getStruct($i, 2);
          final $row $ry = $b.getStruct($j, 2);
          final long $hx = $rx.getLong(0);
          final long $hy = $ry.getLong(0);
          if ($hx < $hy) { $i++; }
          else if ($hx > $hy) { $j++; }
          else {
            final int $cmp = $rx.getUTF8String(1).compareTo($ry.getUTF8String(1));
            if ($cmp < 0) { $i++; } else if ($cmp > 0) { $j++; }
            else { $c++; $i++; $j++; }
          }
        }
        ${ev.value} = $c;"""
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  /** Multiset |A ∩ B| for two SORTED-ascending array<long> — the long-only
    * twin of [[SortedIntersectCount]], used as the cheap pre-verification
    * SCREEN in [[graft.textops.Dedup.ngramJaccardPairsPrefix]]: hash
    * arrays are ~5× smaller than the (h, s) struct arrays, so the
    * screening joins move a fraction of the bytes, and only pairs the
    * screen keeps ever touch the exact struct verification. The count can
    * exceed the true distinct-shingle intersection ONLY via a cross-pair
    * xxhash64 collision, and the screen keeps every pair the true count
    * would (ĉ ≥ c and j(c) is monotone), so screening is sound — the
    * exact pass downstream remains the decider; values are never
    * hash-trusted.
    *
    * Null handling mirrors [[SortedIntersectCount]]: null elements
    * skipped, null arrays propagate null.
    */
  case class SortedIntersectCountLong(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_sorted_intersect_count_long"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements()
      val ny = y.numElements()
      var i = 0
      var j = 0
      var c = 0
      while (i < nx && j < ny) {
        if (x.isNullAt(i)) i += 1
        else if (y.isNullAt(j)) j += 1
        else {
          val hx = x.getLong(i)
          val hy = y.getLong(j)
          if (hx < hy) i += 1
          else if (hx > hy) j += 1
          else { c += 1; i += 1; j += 1 }
        }
      }
      c
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val hx = ctx.freshName("hx")
        val hy = ctx.freshName("hy")
        s"""
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        int $i = 0; int $j = 0; int $c = 0;
        while ($i < $nx && $j < $ny) {
          if ($a.isNullAt($i)) { $i++; continue; }
          if ($b.isNullAt($j)) { $j++; continue; }
          final long $hx = $a.getLong($i);
          final long $hy = $b.getLong($j);
          if ($hx < $hy) { $i++; }
          else if ($hx > $hy) { $j++; }
          else { $c++; $i++; $j++; }
        }
        ${ev.value} = $c;"""
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCountLong =
      copy(left = newLeft, right = newRight)
  }

  /** k-permutation MinHash over an array<long> of element hashes in [0,p):
    * out[j] = min over x of (a(j)·x + b(j)) mod p. One pass over the input
    * updates all k mins — replaces k × `array_min(transform(...))`, which
    * re-evaluates the (expensive) child k times per row. Empty input →
    * all-Long.MaxValue signature (deterministic; never occurs for the word
    * shinglers, which emit ≥1 shingle even for empty text).
    */
  case class MinHashSig(child: Expression, a: IndexedSeq[Long],
      b: IndexedSeq[Long], p: Long)
      extends UnaryExpression with CodegenFallback {
    require(a.length == b.length && a.nonEmpty)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_sig"

    @transient private lazy val aArr = a.toArray
    @transient private lazy val bArr = b.toArray

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val k = aArr.length
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = arr.getLong(i)
          var j = 0
          while (j < k) {
            val v = (x * aArr(j) + bArr(j)) % p
            if (v < mins(j)) mins(j) = v
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def withNewChildInternal(c: Expression): MinHashSig =
      copy(child = c)
  }

  /** 64-bit SimHash over an array<long> of token hashes: bit j of the
    * result is set iff Σ over tokens of (bit j set ? +1 : −1) > 0.
    * One pass updates all 64 counters — replaces 64 interpreted
    * `aggregate(...)` re-evaluations of the token pipeline per row.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = arr.getLong(i)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) {
        if (counts(j) > 0) out |= (1L << j)
        j += 1
      }
      out
    }

    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  /** Word n-gram shingles over an array<string> of words, one pass:
    * out[i] = words[i..i+n-1] joined by " "; fewer than n words → a single
    * shingle of all words. Exactly the semantics of
    * `transform(sequence(1, size(ws)-n+1), i -> concat_ws(" ", slice(ws,i,n)))`
    * — which re-evaluates the whole upstream word-split pipeline once PER
    * SHINGLE POSITION in interpreted HOF eval (~50× per doc; measured 3 s
    * for 5k docs at sf0.1 vs ~0.1 s here). Null words are skipped by the
    * join, matching concat_ws.
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_word_shingles"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val sep = UTF8String.fromString(" ")
      def join(from: Int, len: Int): UTF8String = {
        val parts = new Array[UTF8String](len)
        var i = 0
        while (i < len) {
          // concat_ws skips nulls; represent them as null inputs to concatWs
          parts(i) = if (arr.isNullAt(from + i)) null
            else arr.getUTF8String(from + i)
          i += 1
        }
        UTF8String.concatWs(sep, parts: _*)
      }
      if (m < n) new GenericArrayData(Array[Any](join(0, m)))
      else {
        val out = new Array[Any](m - n + 1)
        var i = 0
        while (i <= m - n) { out(i) = join(i, n); i += 1 }
        new GenericArrayData(out)
      }
    }

    override protected def withNewChildInternal(c: Expression): WordShingles =
      copy(child = c)
  }

  /** Row-local term histogram: array<string> →
    * array<struct<term string, tf bigint>> with one entry per DISTINCT
    * element, in first-occurrence order, nulls skipped.
    *
    * This is the per-document tf computation as a PROJECTION: the
    * `explode → groupBy(doc, term) → count` formulation it replaces
    * moves every (doc, token) occurrence through an Exchange and hash-
    * aggregates tens of millions of string-keyed rows, for a statistic
    * that never leaves the row — per-doc term counts are as row-local as
    * [[RepetitionSignals]]'s dup fractions. Downstream term-keyed work
    * (vocabulary df, unigram models, tf-idf joins) starts from the
    * already-deduplicated (doc, term, tf) stream — one exploded row per
    * DISTINCT doc-term, not per occurrence. O(m) time, O(distinct)
    * transient memory per row, same order as the token array itself.
    */
  case class ArrayHistogram(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_array_histogram"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) {
          val t = arr.getUTF8String(i)
          val c = counts.get(t)
          if (c == null) counts.put(t.clone(), Array(1L)) else c(0) += 1L
        }
        i += 1
      }
      val out = new Array[Any](counts.size)
      val it = counts.entrySet().iterator()
      var j = 0
      while (it.hasNext) {
        val e = it.next()
        out(j) = new GenericInternalRow(
          Array[Any](e.getKey, e.getValue.apply(0)))
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): ArrayHistogram =
      copy(child = c)
  }

  /** All four Gopher repetition signals in ONE O(m) row-local pass over
    * the token array — struct(n_words, dup_word_frac, dup_3gram_frac,
    * top_2gram_frac):
    *
    *   - tokens are interned to dense ids through an exact-equality hash
    *     map; its size IS the distinct-word count (dup_word_frac for
    *     free);
    *   - 2-gram mode share counts packed (id₁,id₂) longs — pair identity
    *     equals joined-gram identity because tokens contain no spaces;
    *   - distinct 3-grams count packed 21-bit id-triples (id-string
    *     fallback beyond 2^21 distinct tokens/doc), replacing the
    *     WordShingles(3) string materialization + array_distinct that
    *     dominated the fused-projection profile.
    *
    * No per-gram strings, no explode, no shuffle. The explode → count →
    * max/sum formulation this replaces moved every (doc, gram) pair
    * through two Exchanges and joined the result back — 3 shuffles for a
    * row-local statistic; the row-local HOF alternative it originally
    * guarded against was O(m²) per row. This is O(m) time and O(distinct
    * grams) transient memory, the same order as the token array the row
    * already holds.
    *
    * Shorter-than-n edges follow WordShingles: one whole-text gram, so
    * m ≤ 1 → top_2gram_frac = 1.0, m ≤ 3 → dup_3gram_frac = 0.0, and
    * dup fracs divide by max(count, 1). Fractions are UNROUNDED — the
    * caller applies the gate's 4 dp convention.
    */
  case class RepetitionSignals(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("dup_word_frac", DoubleType, nullable = false),
      StructField("dup_3gram_frac", DoubleType, nullable = false),
      StructField("top_2gram_frac", DoubleType, nullable = false)))
    override def prettyName: String = "graft_repetition_signals"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val ids = new java.util.HashMap[UTF8String, Integer](m * 2)
      val tok = new Array[Int](m)
      var next = 0
      var i = 0
      while (i < m) {
        val s = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
          else arr.getUTF8String(i)
        var id = ids.get(s)
        if (id == null) { id = Integer.valueOf(next); ids.put(s, id); next += 1 }
        tok(i) = id.intValue()
        i += 1
      }
      val dupWord =
        1.0 - next.toDouble / math.max(m, 1)
      // 2-gram mode share over packed pairs
      val top2 =
        if (m <= 1) 1.0
        else {
          val counts = new java.util.HashMap[java.lang.Long, Integer](m * 2)
          var maxC = 0
          i = 0
          while (i < m - 1) {
            val key = java.lang.Long.valueOf(
              (tok(i).toLong << 32) | (tok(i + 1).toLong & 0xffffffffL))
            val prev = counts.get(key)
            val c = if (prev == null) 1 else prev.intValue() + 1
            counts.put(key, Integer.valueOf(c))
            if (c > maxC) maxC = c
            i += 1
          }
          maxC.toDouble / (m - 1)
        }
      // distinct 3-grams over packed 21-bit triples (id-string fallback
      // for pathological vocabularies)
      val dup3 =
        if (m <= 3) 0.0
        else if (next <= (1 << 21)) {
          val seen = new java.util.HashSet[java.lang.Long](m * 2)
          i = 0
          while (i < m - 2) {
            seen.add(java.lang.Long.valueOf(
              (tok(i).toLong << 42) | (tok(i + 1).toLong << 21)
                | tok(i + 2).toLong))
            i += 1
          }
          1.0 - seen.size.toDouble / (m - 2)
        } else {
          val seen = new java.util.HashSet[String](m * 2)
          i = 0
          while (i < m - 2) {
            seen.add(s"${tok(i)} ${tok(i + 1)} ${tok(i + 2)}")
            i += 1
          }
          1.0 - seen.size.toDouble / (m - 2)
        }
      new GenericInternalRow(Array[Any](m.toLong, dupWord, dup3, top2))
    }

    override protected def withNewChildInternal(
        c: Expression): RepetitionSignals = copy(child = c)
  }

  /** Rolling Karp–Rabin hashes of every word `n`-gram window — the
    * suffix-array-free engine for exact substring dedup (Lee et al. 2021's
    * ExactSubstr family): each token's char-level KR hash (the
    * [[graft.functions.TextExprs.KrHash]] recurrence) is folded into
    * per-window Horner hashes h_p = fold(th_p..th_{p+n−1}) mod M,
    * maintained with the O(1) rolling update
    * h_{p+1} = ((h_p − th_p·Bⁿ⁻¹)·B + th_{p+n}) mod M — ONE O(m) pass per
    * document, no per-window string materialization (WordShingles + a
    * per-gram hash would copy n tokens per position: O(m·n) bytes; at
    * n = 50 that is a 50× allocation blowup a 100 TB scan pays in full).
    *
    * TWO independent residues (mod 1000000007 and 998244353) are packed
    * injectively into one long (h₁·998244353 + h₂ < 2^60): a single
    * ~30-bit residue would birthday-collide constantly at corpus scale
    * (10^12 windows), marking unrelated spans as duplicated; the packed
    * pair gives ~60 bits. Both chains are exact int64 arithmetic
    * (operands < 2^63), restated non-rolling in DuckDB by Horner over
    * token-hash slices — identical residues, so the gate proves the whole
    * pipeline.
    *
    * Output: array<long>, one hash per window start (positions
    * 0..m−n). A document with fewer than n tokens yields an EMPTY array
    * by default (no n-token window exists — exact-substring callers
    * filter those out); with `wholeDocIfShort` it instead yields ONE
    * hash folding ALL m tokens — mirroring [[WordShingles]]' short-doc
    * rule ("fewer than n words → a single shingle of all words"), so a
    * hash-level pre-screen of the shingle sets has no false negatives
    * on short documents either (equal token sequences ⇒ equal hashes,
    * at every length).
    */
  case class RollingGramKrHashes(child: Expression, n: Int,
      wholeDocIfShort: Boolean = false)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, s"window must be >= 1 token, got $n")
    private val Base = 257L
    private val Mod1 = 1000000007L
    private val Mod2 = 998244353L
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_rolling_gram_kr"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      if (m < n && !wholeDocIfShort)
        return new GenericArrayData(Array.empty[Any])
      // per-token char-level KR hashes in both residue fields
      val t1 = new Array[Long](m)
      val t2 = new Array[Long](m)
      var i = 0
      while (i < m) {
        var h1 = 0L
        var h2 = 0L
        if (!arr.isNullAt(i)) {
          val cps = arr.getUTF8String(i).toString.codePoints().toArray
          var j = 0
          while (j < cps.length) {
            h1 = (h1 * Base + cps(j)) % Mod1
            h2 = (h2 * Base + cps(j)) % Mod2
            j += 1
          }
        }
        t1(i) = h1; t2(i) = h2
        i += 1
      }
      // effective window: n normally; the whole doc for the short-doc rule
      val w = if (m < n) m else n
      // B^(w-1) mod M for the rolling subtraction
      var bp1 = 1L
      var bp2 = 1L
      i = 1
      while (i < w) { bp1 = bp1 * Base % Mod1; bp2 = bp2 * Base % Mod2; i += 1 }
      val out = new Array[Any](m - w + 1)
      var h1 = 0L
      var h2 = 0L
      i = 0
      while (i < w) {
        h1 = (h1 * Base + t1(i)) % Mod1
        h2 = (h2 * Base + t2(i)) % Mod2
        i += 1
      }
      out(0) = h1 * Mod2 + h2
      var p = 1
      while (p <= m - w) {
        h1 = ((h1 - t1(p - 1) * bp1 % Mod1 + Mod1) % Mod1 * Base
          + t1(p + w - 1)) % Mod1
        h2 = ((h2 - t2(p - 1) * bp2 % Mod2 + Mod2) % Mod2 * Base
          + t2(p + w - 1)) % Mod2
        out(p) = h1 * Mod2 + h2
        p += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        c: Expression): RollingGramKrHashes = copy(child = c)
  }

  /** Language ID over an array<string> of lowered words: counts stopword
    * hits per language profile in ONE pass (hash-map membership), then
    * argmax with ties resolved by profile order; zero hits → "und".
    * Semantically identical to the `greatest(countIn..) + CASE` chain over
    * per-profile `size(filter(...))` columns — which re-evaluates the word
    * split once per profile per CASE reference (~12×/row; q33 ran 3.1× over
    * the DuckDB oracle in round 1 from exactly this).
    */
  case class LangIdExpr(child: Expression, langs: IndexedSeq[String],
      profiles: IndexedSeq[Seq[String]])
      extends UnaryExpression with CodegenFallback {
    require(langs.length == profiles.length && langs.nonEmpty)
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_lang_id"

    @transient private lazy val langU: Array[UTF8String] =
      langs.map(UTF8String.fromString).toArray
    @transient private lazy val und = UTF8String.fromString("und")
    @transient private lazy val wordMap: java.util.HashMap[UTF8String, Array[Int]] = {
      val m = new java.util.HashMap[UTF8String, Array[Int]]()
      profiles.zipWithIndex.foreach { case (ws, i) =>
        ws.foreach { w =>
          val k = UTF8String.fromString(w)
          val prev = m.get(k)
          m.put(k, if (prev == null) Array(i) else prev :+ i)
        }
      }
      m
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](langU.length)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val hit = wordMap.get(arr.getUTF8String(i))
          if (hit != null) {
            var j = 0
            while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
          }
        }
        i += 1
      }
      // argmax, first-profile-wins on ties; all-zero → "und".
      var best = 0
      var bi = -1
      var j = 0
      while (j < counts.length) {
        if (counts(j) > best) { best = counts(j); bi = j }
        j += 1
      }
      if (bi < 0) und else langU(bi)
    }

    override protected def withNewChildInternal(c: Expression): LangIdExpr =
      copy(child = c)
  }

  /** All `bands` hyperplane-LSH band buckets of a vector in ONE array
    * pass: band j's bucket bit i = sign(v · plane(j·bitsPerBand+i)), the
    * exact arithmetic of the `when(dot(vec, lit(plane)) > 0, 1L<<i)`
    * composition it replaces ([[graft.textops.Similarity]] banding) —
    * same left-fold accumulation order per dot, float elements widened
    * per element like [[DotProduct]], `> 0` strict. The composed form
    * evaluates bands×bits SEPARATE dot expression trees per row (64
    * codegen'd-but-distinct loops, each re-walking the array with
    * per-element null checks); this expression loads the vector into a
    * primitive buffer once and runs the whole plane matrix over it —
    * measured ~4× on the q46 banding stage.
    *
    * Null semantics — ONE deliberate difference from the composed form
    * (round-10 ADVICE): a whole-NULL input array returns null here
    * (nullSafeEval), so banding's posexplode DROPS null vectors, where
    * `when(dot(null,…) > 0, …).otherwise(0L)` used to land them all in
    * bucket 0 of every band — colliding every null vector with every
    * other and with genuine bucket-0 vectors. Excluding them is the
    * defensible behavior (a null vector has no similarity to anything);
    * callers needing the legacy collision can `coalesce` the input to a
    * zero vector. A null ELEMENT or a length ≠ `dims` matches the
    * composed form exactly: every dot poisons to null and
    * `when(null > 0, …).otherwise(0L)` lands every bucket at 0L — those
    * rows yield all-zero buckets, not null.
    *
    * `planes` is the flattened [bands·bitsPerBand × dims] row-major
    * matrix, passed in by the caller (keeps this expression free of the
    * plane-generation policy; ~32 KB serialized for the 64-plane
    * default).
    */
  case class BandBuckets(child: Expression, bands: Int, bitsPerBand: Int,
      dims: Int, planes: IndexedSeq[Double])
      extends UnaryExpression {
    require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 64,
      s"bands=$bands bitsPerBand=$bitsPerBand out of range")
    require(planes.length == bands * bitsPerBand * dims,
      s"planes length ${planes.length} != $bands*$bitsPerBand*$dims")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_band_buckets"

    @transient private lazy val flat: Array[Double] = planes.toArray
    @transient private lazy val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val out = new Array[Long](bands)
      var ok = arr.numElements() == dims
      var d = 0
      while (ok && d < dims) { if (arr.isNullAt(d)) ok = false; d += 1 }
      if (ok) {
        val v = new Array[Double](dims)
        var i = 0
        while (i < dims) {
          v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          i += 1
        }
        var b = 0
        while (b < bands) {
          var bucket = 0L
          var bit = 0
          while (bit < bitsPerBand) {
            val base = (b * bitsPerBand + bit) * dims
            var acc = 0.0
            var k = 0
            while (k < dims) { acc += v(k) * flat(base + k); k += 1 }
            if (acc > 0) bucket |= (1L << bit)
            bit += 1
          }
          out(b) = bucket
          b += 1
        }
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val flatRef = ctx.addReferenceObj("planes", flat, "double[]")
        val out = ctx.freshName("out")
        val okv = ctx.freshName("ok")
        val v = ctx.freshName("v")
        val d = ctx.freshName("d")
        val b = ctx.freshName("b")
        val bit = ctx.freshName("bit")
        val base = ctx.freshName("base")
        val acc = ctx.freshName("acc")
        val k = ctx.freshName("k")
        val bucket = ctx.freshName("bucket")
        val get = if (isFloat) "getFloat" else "getDouble"
        s"""
        final long[] $out = new long[$bands];
        if ($c.numElements() == $dims) {
          boolean $okv = true;
          for (int $d = 0; $d < $dims; $d++) {
            if ($c.isNullAt($d)) { $okv = false; break; }
          }
          if ($okv) {
            final double[] $v = new double[$dims];
            for (int $d = 0; $d < $dims; $d++) {
              $v[$d] = (double) $c.$get($d);
            }
            for (int $b = 0; $b < $bands; $b++) {
              long $bucket = 0L;
              for (int $bit = 0; $bit < $bitsPerBand; $bit++) {
                final int $base = ($b * $bitsPerBand + $bit) * $dims;
                double $acc = 0.0;
                for (int $k = 0; $k < $dims; $k++) {
                  $acc += $v[$k] * $flatRef[$base + $k];
                }
                if ($acc > 0) $bucket |= (1L << $bit);
              }
              $out[$b] = $bucket;
            }
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
        """
      })

    override protected def withNewChildInternal(c: Expression): BandBuckets =
      copy(child = c)
  }

  // ------------------------------------------------------- Column wrappers

  def dot(a: Column, b: Column): Column =
    exprColumn(DotProduct(columnExpr(a), columnExpr(b)))

  def bandBuckets(vec: Column, bands: Int, bitsPerBand: Int, dims: Int,
      planes: IndexedSeq[Double]): Column =
    exprColumn(BandBuckets(columnExpr(vec), bands, bitsPerBand, dims, planes))

  def cosine(a: Column, b: Column): Column =
    exprColumn(CosineSim(columnExpr(a), columnExpr(b)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    exprColumn(SortedIntersectCount(columnExpr(a), columnExpr(b)))

  def sortedIntersectCountLong(a: Column, b: Column): Column =
    exprColumn(SortedIntersectCountLong(columnExpr(a), columnExpr(b)))

  def minhashSig(hashes: Column, a: IndexedSeq[Long], b: IndexedSeq[Long],
      p: Long): Column =
    exprColumn(MinHashSig(columnExpr(hashes), a, b, p))

  def simhash64(tokenHashes: Column): Column =
    exprColumn(SimHash64(columnExpr(tokenHashes)))

  def wordShingles(words: Column, n: Int): Column =
    exprColumn(WordShingles(columnExpr(words), n))

  def rollingGramKrHashes(words: Column, n: Int,
      wholeDocIfShort: Boolean = false): Column =
    exprColumn(RollingGramKrHashes(columnExpr(words), n, wholeDocIfShort))

  def repetitionSignals(words: Column): Column =
    exprColumn(RepetitionSignals(columnExpr(words)))

  def arrayHistogram(elems: Column): Column =
    exprColumn(ArrayHistogram(columnExpr(elems)))

  def langId(words: Column, profiles: Seq[(String, Seq[String])]): Column =
    exprColumn(LangIdExpr(columnExpr(words),
      profiles.map(_._1).toIndexedSeq, profiles.map(_._2).toIndexedSeq))
}
