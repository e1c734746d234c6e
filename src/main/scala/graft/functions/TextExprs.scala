package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.{columnExpr, exprColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-pattern substring matching for the rule cascade
  * (SURVEY.md §4.3 item 1: "custom Expression with Aho–Corasick automaton
  * ... emitting highest-priority category id in one pass").
  *
  * The flat 308-branch CaseWhen evaluates up to 308 independent
  * `Contains(lower(attr), pat)` scans per row — O(patterns × len). The
  * automaton walks the text ONCE — O(len) — and reports the highest
  * priority among all matched patterns, which is exactly the cascade's
  * last-writer-wins winner (priority = rule index). Measured 3.6× faster
  * than the CaseWhen on the full rule table at sf0.1 (q41).
  */
object TextExprs {

  /** Byte-level Aho–Corasick automaton with DENSE goto tables (fail links
    * resolved at build time → exactly one array read per input byte).
    * Patterns must be byte sequences to match literally; the cascade feeds
    * ASCII-lowered patterns and `lower()`-ed text, so byte-level matching
    * is exact (UTF-8 multi-byte units have the high bit set and can never
    * alias an ASCII pattern byte).
    */
  private[functions] final class AhoCorasick(
      patterns: Array[Array[Byte]], priorities: Array[Int])
      extends Serializable {
    private val nStates = patterns.map(_.length).sum + 1
    private val goto_ = Array.fill(nStates * 256)(-1)
    private val fail = new Array[Int](nStates)
    private val out = Array.fill(nStates)(-1)

    {
      var n = 1
      var i = 0
      while (i < patterns.length) {
        var s = 0
        val p = patterns(i)
        var j = 0
        while (j < p.length) {
          val c = p(j) & 0xff
          if (goto_(s * 256 + c) == -1) { goto_(s * 256 + c) = n; n += 1 }
          s = goto_(s * 256 + c)
          j += 1
        }
        if (priorities(i) > out(s)) out(s) = priorities(i)
        i += 1
      }
      val queue = new java.util.ArrayDeque[Integer]()
      var c = 0
      while (c < 256) {
        val t = goto_(c)
        if (t == -1) goto_(c) = 0 else { fail(t) = 0; queue.add(t) }
        c += 1
      }
      while (!queue.isEmpty) {
        val s = queue.poll().intValue()
        if (out(fail(s)) > out(s)) out(s) = out(fail(s))
        var c2 = 0
        while (c2 < 256) {
          val t = goto_(s * 256 + c2)
          val viaFail = goto_(fail(s) * 256 + c2)
          if (t == -1) goto_(s * 256 + c2) = viaFail
          else { fail(t) = viaFail; queue.add(t) }
          c2 += 1
        }
      }
    }

    /** Highest priority among all patterns occurring in `bytes`; -1 if none. */
    def maxMatch(bytes: Array[Byte]): Int = {
      var s = 0
      var best = -1
      var i = 0
      while (i < bytes.length) {
        s = goto_(s * 256 + (bytes(i) & 0xff))
        if (out(s) > best) best = out(s)
        i += 1
      }
      best
    }
  }

  /** max over matched patterns of the pattern's priority; -1 when nothing
    * matches. Exactly `greatest(when(contains(text, p_i), prio_i), ...)` in
    * one text pass. The automaton is @transient — tasks serialize only the
    * pattern list and rebuild locally (~ms), never the dense tables.
    */
  case class MultiContainsMax(child: Expression, patterns: Seq[String],
      priorities: Seq[Int])
      extends UnaryExpression with CodegenFallback {
    require(patterns.nonEmpty && patterns.length == priorities.length)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_multi_contains_max"

    @transient private lazy val ac = new AhoCorasick(
      patterns.map(_.getBytes("UTF-8")).toArray, priorities.toArray)

    override def nullSafeEval(input: Any): Any =
      ac.maxMatch(input.asInstanceOf[UTF8String].getBytes)

    override protected def withNewChildInternal(c: Expression): MultiContainsMax =
      copy(child = c)
  }

  def multiContainsMax(text: Column, patterns: Seq[String],
      priorities: Seq[Int]): Column =
    exprColumn(MultiContainsMax(columnExpr(text), patterns, priorities))

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    * "Winnowing: Local Algorithms for Document Fingerprinting"):
    * Karp–Rabin ROLLING hashes over character k-grams, then the minimum of
    * every w-hash window; the distinct selected minima (sorted) are the
    * document's fingerprint set.
    *
    * Guarantees: any substring match of length ≥ w+k−1 contributes at
    * least one COMMON fingerprint to both documents; no fingerprint
    * matches without a shared k-gram. Density ≈ 2/(w+1) of the gram
    * count — a compact, alignment-robust signature for copy detection
    * and containment-style dedup, complementary to the whole-document
    * sketches (MinHash estimates global resemblance; winnowing localizes
    * shared passages).
    *
    * ONE pass over the text: O(len) rolling updates (each gram hash from
    * its predecessor: drop cps[i-1]·B^(k-1), shift by B, add cps[i+k-1],
    * all mod M) plus an O(len) monotonic-deque window minimum. The
    * non-rolling formulation is O(len·k) hash work — the gap the "rolling"
    * in rolling hash exists to close. Values are pure modular arithmetic
    * over code points — reproducible in ANSI SQL, so the gate oracle
    * recomputes every gram hash DIRECTLY (non-rolling) and equality
    * proves the recurrence. Per-row projection: no shuffle, trivially
    * data-parallel at any scale.
    */
  /** Rolling Karp–Rabin hashes of every char k-gram: hs(i) covers
    * cps[i, i+k). O(len) — each gram hash derived from its predecessor.
    * Shared by [[WinnowingFp]] and [[WinnowingFpPos]].
    */
  private def gramHashes(cps: Array[Int], k: Int, base: Long,
      mod: Long): Array[Long] = {
    val g = cps.length - k + 1
    var dropPow = 1L // B^(k-1) mod M
    var p = 0
    while (p < k - 1) { dropPow = dropPow * base % mod; p += 1 }
    val hs = new Array[Long](g)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * base + cps(i)) % mod; i += 1 }
    hs(0) = h
    i = 1
    while (i < g) {
      h = ((h - cps(i - 1) * dropPow % mod + mod) % mod * base +
        cps(i + k - 1)) % mod
      hs(i) = h
      i += 1
    }
    hs
  }

  case class WinnowingFp(child: Expression, k: Int, w: Int,
      base: Long, mod: Long)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1 && w >= 1 && base > 0 && mod > 1)
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_winnow"

    override def nullSafeEval(input: Any): Any = {
      val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
      val g = cps.length - k + 1
      if (g < 1)
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array.emptyLongArray)
      val hs = gramHashes(cps, k, base, mod)
      // sliding-window minimum via monotonic index deque; the >= pop keeps
      // the LATEST index on ties — irrelevant here because only the
      // selected VALUES are emitted (robust winnowing, which records
      // (hash, position) pairs, would need the rightmost-min policy this
      // happens to implement)
      val sel = new java.util.TreeSet[java.lang.Long]()
      val dq = new Array[Int](g)
      var head = 0; var tail = 0
      var j = 0
      while (j < g) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j; tail += 1
        while (dq(head) <= j - w) head += 1
        if (j >= w - 1) sel.add(hs(dq(head)))
        j += 1
      }
      if (g < w) sel.add(hs(dq(head))) // short doc: one window over all
      val out = new Array[Long](sel.size)
      val it = sel.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): WinnowingFp =
      copy(child = c)
  }

  def winnowingFp(text: Column, k: Int, w: Int,
      base: Long = 257L, mod: Long = 1000000007L): Column =
    exprColumn(WinnowingFp(columnExpr(text), k, w, base, mod))

  /** ROBUST winnowing (Schleimer/Wilkerson/Aiken SIGMOD'03 §3.2.1): like
    * [[WinnowingFp]] but each selected minimum is emitted WITH the gram
    * position it was selected at — `array<struct<fp, pos>>` ordered by
    * position — enabling passage LOCALIZATION, the main consumer of
    * winnowing in contamination/plagiarism checks (a matching fp tells you
    * two docs share a passage; the positions tell you WHERE).
    *
    * The robust variant's tie rule — within a window, select the RIGHTMOST
    * minimal hash, and record an occurrence only once even when many
    * windows select it — is exactly what the monotonic deque's `>=` pop
    * implements: the selected gram index is non-decreasing as the window
    * slides, so "new occurrence" == "selected index changed". Documents
    * shorter than w grams yield their single whole-document window's
    * selection; shorter than k chars yield an empty array.
    */
  case class WinnowingFpPos(child: Expression, k: Int, w: Int,
      base: Long, mod: Long)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1 && w >= 1 && base > 0 && mod > 1)
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("fp", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "graft_winnow_pos"

    override def nullSafeEval(input: Any): Any = {
      val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
      val g = cps.length - k + 1
      if (g < 1)
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array.empty[Any])
      val hs = gramHashes(cps, k, base, mod)
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      val dq = new Array[Int](g)
      var head = 0; var tail = 0
      var last = -1
      var j = 0
      while (j < g) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j; tail += 1
        while (dq(head) <= j - w) head += 1
        if (j >= w - 1 && dq(head) != last) {
          last = dq(head)
          out += new GenericInternalRow(Array[Any](hs(last), last))
        }
        j += 1
      }
      if (g < w) // short doc: one window over all grams
        out += new GenericInternalRow(Array[Any](hs(dq(head)), dq(head)))
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): WinnowingFpPos =
      copy(child = c)
  }

  def winnowingFpPos(text: Column, k: Int, w: Int,
      base: Long = 257L, mod: Long = 1000000007L): Column =
    exprColumn(WinnowingFpPos(columnExpr(text), k, w, base, mod))

  /** Karp–Rabin polynomial hash of a WHOLE string: Horner fold over code
    * points, h ← (h·B + cp) mod M — the same arithmetic family as
    * [[WinnowingFp]]'s gram hashes. Chosen as the MinHash shingle hash
    * (replacing Murmur3) precisely because it is restatable in ANSI SQL
    * (`list_reduce` Horner over `ascii()` codes), which lets the driver
    * oracle recompute the ENTIRE MinHash+LSH pipeline in DuckDB; hash
    * quality is equivalent for sketching (distinct shingles → near-uniform
    * residues mod the prime). Intermediates stay < B·M ≈ 2^38 — exact in
    * int64 on both engines.
    */
  case class KrHash(child: Expression, base: Long, mod: Long)
      extends UnaryExpression with CodegenFallback {
    require(base > 0 && mod > 1)
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def prettyName: String = "graft_kr_hash"

    override def nullSafeEval(input: Any): Any = {
      val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
      var h = 0L
      var i = 0
      while (i < cps.length) { h = (h * base + cps(i)) % mod; i += 1 }
      h
    }

    override protected def withNewChildInternal(c: Expression): KrHash =
      copy(child = c)
  }

  def krHash(s: Column, base: Long = 257L, mod: Long = 1000000007L): Column =
    exprColumn(KrHash(columnExpr(s), base, mod))

  /** [[KrHash]] diffused to 64 bits: the ~30-bit Karp–Rabin residue is
    * passed through the splitmix64 finalizer (Steele et al. 2014's
    * xor-shift-multiply chain), giving per-bit uniformity so ALL 64
    * SimHash bit-counters carry signal (the raw residue would leave bits
    * 30..63 constant and the sketch 30-bit). Chosen over xxhash64 as the
    * SimHash token hash because it stays SQL-restatable: the finalizer is
    * exact mod-2^64 arithmetic, which DuckDB reproduces in UHUGEINT
    * ([[graft.OracleGen.q30Sql]]) — the q29 Karp–Rabin precedent extended
    * to 64-bit hashing.
    */
  case class KrHash64(child: Expression, base: Long, mod: Long)
      extends UnaryExpression {
    require(base > 0 && mod > 1)
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def prettyName: String = "graft_kr_hash64"

    override def nullSafeEval(input: Any): Any =
      krHash64Utf8(input.asInstanceOf[UTF8String], base, mod)

    // whole-stage-friendly via a static call ([[FoldText]]'s technique);
    // the previous CodegenFallback boxed every row through eval() —
    // measured 2× on the q105 profile shuffle-light plan, where the
    // per-row hash IS the work
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextExprs$$.MODULE$$.krHash64Utf8($c, ${base}L, ${mod}L)")

    override protected def withNewChildInternal(c: Expression): KrHash64 =
      copy(child = c)
  }

  /** [[KrHash64]]'s kernel — public because generated code calls it.
    * Allocation-free on the common path: walks UTF8String chars via
    * String only when non-ASCII is present; pure ASCII hashes straight
    * from the bytes (identical code points).
    */
  def krHash64Utf8(u: UTF8String, base: Long, mod: Long): Long = {
    val nBytes = u.numBytes()
    var h = 0L
    var i = 0
    var ascii = true
    while (ascii && i < nBytes) {
      val b = u.getByte(i)
      if (b < 0) ascii = false
      else { h = (h * base + b) % mod; i += 1 }
    }
    if (!ascii) h = {
      val cps = u.toString.codePoints().toArray
      var hh = 0L
      var j = 0
      while (j < cps.length) { hh = (hh * base + cps(j)) % mod; j += 1 }
      hh
    }
    var z = h
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Scala-side twin of [[KrHash64]] for driver/state code that needs the
    * SAME hash outside a Column context (e.g. pre-hashing a fixed probe
    * list for the streaming CMS) — one implementation, shared with the
    * expression's eval, so the two can never drift.
    */
  def krHash64Value(s: String, base: Long = 257L,
      mod: Long = 1000000007L): Long =
    krHash64Utf8(UTF8String.fromString(s), base, mod)

  def krHash64(s: Column, base: Long = 257L, mod: Long = 1000000007L): Column =
    exprColumn(KrHash64(columnExpr(s), base, mod))

  /** Single-pass multi-class PII redaction: ONE compiled alternation
    * (class i = group i+1) walks the text once, emitting the redacted
    * string AND the per-class redaction counts as a struct — where the
    * separate `regexp_replace` + `regexp_count` formulation traverses the
    * text once per pattern per output (2·k passes for k classes; the q54
    * pipeline paid 6). Counts are REDACTIONS PERFORMED per class under
    * leftmost-first alternation priority (class order = priority), which
    * also makes them robust to nested patterns: a digit run inside an
    * email's local part is part of the email redaction, not a separate
    * digit-run count.
    *
    * Equivalent to the sequential per-class replace chain whenever the
    * placeholders are inert (match no pattern) and every class's match
    * start is leftmost among overlapping matches of lower-priority
    * classes — both hold for the email/IP/digit-run rule set, and the
    * DuckDB oracle replays the sequential chain against this expression's
    * output, so the equivalence is gate-checked, not assumed.
    */
  case class RedactPiiAll(child: Expression, names: Seq[String],
      patterns: Seq[String], placeholders: Seq[String])
      extends UnaryExpression with CodegenFallback {
    require(patterns.nonEmpty && patterns.length == placeholders.length
      && patterns.length == names.length, "names/patterns/placeholders")
    override def dataType: DataType = StructType(
      StructField("redacted", StringType, nullable = false) +:
        names.map(n => StructField(n, IntegerType, nullable = false)))
    override def prettyName: String = "graft_redact_pii"

    @transient private lazy val rx = java.util.regex.Pattern.compile(
      patterns.map(p => "(" + p + ")").mkString("|"))

    /** Group index of each class's wrapping group in the combined
      * alternation: a pattern may contain its OWN capturing groups, which
      * shift every later class's numbering — walking `cls + 1` directly
      * would then mis-classify (or walk past the last group and throw).
      * Offsets are computed from each pattern's compiled groupCount, so
      * arbitrary patterns are safe, not just group-free ones.
      */
    @transient private lazy val classGroup: Array[Int] = {
      val idx = new Array[Int](patterns.length)
      var g = 1
      var i = 0
      while (i < patterns.length) {
        idx(i) = g
        g += 1 + java.util.regex.Pattern.compile(patterns(i))
          .matcher("").groupCount()
        i += 1
      }
      idx
    }

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val m = rx.matcher(s)
      val counts = new Array[Int](patterns.length)
      val sb = new java.lang.StringBuilder(s.length)
      var last = 0
      while (m.find()) {
        var cls = 0
        while (m.group(classGroup(cls)) == null) cls += 1
        counts(cls) += 1
        sb.append(s, last, m.start()).append(placeholders(cls))
        last = m.end()
      }
      sb.append(s, last, s.length)
      val out = new Array[Any](1 + counts.length)
      out(0) = UTF8String.fromString(sb.toString)
      var i = 0
      while (i < counts.length) { out(i + 1) = counts(i); i += 1 }
      new GenericInternalRow(out)
    }

    override protected def withNewChildInternal(
        c: Expression): RedactPiiAll = copy(child = c)
  }

  def redactPiiAll(text: Column, names: Seq[String], patterns: Seq[String],
      placeholders: Seq[String]): Column =
    exprColumn(RedactPiiAll(columnExpr(text), names, patterns, placeholders))

  /** Unicode text folding for dedup/normalization pipelines: NFD
    * decomposition, combining-mark (accent) stripping, per-codepoint
    * lowercasing, and whitespace-run collapse to a single space with
    * leading/trailing trim — one pass, one output string. The canonical
    * pre-dedup canonicalization (case/accent/spacing variants of the same
    * sentence must fingerprint identically).
    *
    * Spark has no accent-stripping builtin (`translate` would need the
    * full Latin diacritic table inlined per call site); a native
    * expression keeps this a single codegen'd projection. The whitespace
    * class is the explicit RE2 `\s` set [ \t\n\f\r] — NOT Java's `\s`
    * (which adds \x0B) — so the DuckDB oracle's
    * `regexp_replace(..., '[ \t\n\f\r]+', ' ', 'g')` is character-exact.
    * Lowercasing is per-codepoint `Character.toLowerCase` (Unicode table,
    * locale-independent — never the default-locale String.toLowerCase,
    * the Turkish-İ bug class CliSpec pins for Report).
    *
    * Codegen: whole-stage-friendly via a static call into [[foldUtf8]]
    * (same technique as Spark's own StaticInvoke expressions) — the loop
    * itself would gain nothing from inlining into Janino source.
    */
  case class FoldText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_fold_text"

    override def nullSafeEval(input: Any): Any =
      TextExprs.foldUtf8(input.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextExprs$$.MODULE$$.foldUtf8($c)")

    override protected def withNewChildInternal(c: Expression): FoldText =
      copy(child = c)
  }

  /** NFD → strip Mn marks → lowercase codepoints → collapse [ \t\n\f\r]
    * runs to ' ' → trim. Public because generated code calls it.
    */
  def foldUtf8(u: UTF8String): UTF8String = {
    val n = java.text.Normalizer.normalize(u.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(n.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < n.length) {
      val cp = n.codePointAt(i)
      i += Character.charCount(cp)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) {
        if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' ||
            cp == '\r') {
          pendingSpace = true
        } else {
          if (pendingSpace && started) sb.append(' ')
          pendingSpace = false
          started = true
          sb.appendCodePoint(Character.toLowerCase(cp))
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  def foldText(text: Column): Column = exprColumn(FoldText(columnExpr(text)))

  /** Byte-exact replacement for `split(str, "\\s+")` (Java regex, limit
    * −1): parts between MAXIMAL whitespace runs, keeping a leading empty
    * part when the string starts with whitespace and a trailing one when
    * it ends with it; the empty string yields [""]. Java's `\s` (no
    * UNICODE flag) is exactly [\t\n\x0B\f\r ] — six single-byte ASCII
    * values that can never alias a UTF-8 continuation byte, so ONE byte
    * scan replaces the regex machinery. This is the corpus tokenizer's
    * hot loop ([[graft.textops.TextStats.words]]): every dedup shingle,
    * vocabulary, tf and quality pass runs it over the full text column,
    * so it gets a real `doGenCode`, not CodegenFallback.
    */
  case class WhitespaceSplit(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_ws_split"

    override def nullSafeEval(input: Any): Any =
      TextExprs.wsSplit(input.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextExprs$$.MODULE$$.wsSplit($c)")

    override protected def withNewChildInternal(c: Expression)
        : WhitespaceSplit = copy(child = c)
  }

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Public because generated code calls it. */
  def wsSplit(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = u.getBytes
    val n = bytes.length
    val parts = new scala.collection.mutable.ArrayBuffer[Any](16)
    var start = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        parts += UTF8String.fromBytes(bytes, start, i - start)
        while (i < n && isWs(bytes(i))) i += 1
        start = i
      } else i += 1
    }
    parts += UTF8String.fromBytes(bytes, start, n - start)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(parts.toArray)
  }

  /** `size(split(str, "\\s+"))` without materializing the array — the
    * token-COUNT twin for stats passes (corpus Σdl, quality length
    * signals) where only the number matters. Same whitespace class and
    * part-count semantics as [[WhitespaceSplit]] (runs + 1, boundary
    * empties included). */
  case class WhitespaceCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_ws_count"

    override def nullSafeEval(input: Any): Any =
      TextExprs.wsCount(input.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextExprs$$.MODULE$$.wsCount($c)")

    override protected def withNewChildInternal(c: Expression)
        : WhitespaceCount = copy(child = c)
  }

  /** Public because generated code calls it. */
  def wsCount(u: UTF8String): Int = {
    val bytes = u.getBytes
    val n = bytes.length
    var runs = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        runs += 1
        while (i < n && isWs(bytes(i))) i += 1
      } else i += 1
    }
    runs + 1
  }

  def whitespaceSplit(text: Column): Column =
    exprColumn(WhitespaceSplit(columnExpr(text)))

  def whitespaceCount(text: Column): Column =
    exprColumn(WhitespaceCount(columnExpr(text)))

  /** `get_json_object(json, '$.<key>')` for TOP-LEVEL SCALAR fields as a
    * single byte-scan — the codegen'd fast path for the ubiquitous
    * "one numeric/string property out of a flat props object" shape
    * (q19): Spark's GetJsonObject builds a Jackson streaming parser per
    * row and navigates a compiled path; this walks the object's bytes
    * once, skipping nested values structurally. Semantics vs
    * GetJsonObject, for the contract's domain (top-level key, scalar
    * value): identical — string values unescape (incl. \uXXXX and
    * surrogate pairs), numbers/booleans return their literal text,
    * JSON null / missing key / malformed input return SQL NULL.
    * DELIBERATE seam: a matched value that is an OBJECT or ARRAY
    * returns NULL (GetJsonObject re-serializes it) — this expression is
    * for scalar fields, the name says so, and [[jsonScalarField]]'s
    * caller contract pins it. Duplicate keys: first wins (Jackson's
    * GetJsonObject matches the first too). Keys needing JSON escapes
    * are out of contract (the wrapper restricts to simple keys, which
    * no standard writer escapes).
    */
  case class JsonScalarField(child: Expression, key: String)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_json_field"

    private lazy val keyU = UTF8String.fromString(key)

    override def nullSafeEval(input: Any): Any =
      TextExprs.jsonScalar(input.asInstanceOf[UTF8String], keyU)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val keyRef = ctx.addReferenceObj("graftJsonKey", keyU,
        classOf[UTF8String].getName)
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.TextExprs$$.MODULE$$.jsonScalar(
          $c, $keyRef);
        ${ev.isNull} = ${ev.value} == null;
      """)
    }

    override protected def withNewChildInternal(c: Expression)
        : JsonScalarField = copy(child = c)
  }

  /** Public because generated code calls it. Returns null for
    * missing/null/non-scalar/malformed — see [[JsonScalarField]]. */
  def jsonScalar(json: UTF8String, key: UTF8String): UTF8String = {
    val b = json.getBytes
    val kb = key.getBytes
    val n = b.length
    var i = 0
    def ws(): Unit = { while (i < n && (b(i) == ' ' || b(i) == '\t' ||
      b(i) == '\n' || b(i) == '\r')) i += 1 }
    // skip a string already positioned ON the opening quote; leaves i
    // after the closing quote; returns (contentStart, contentEnd, hadEsc)
    def skipString(): (Int, Int, Boolean) = {
      i += 1
      val start = i
      var esc = false
      while (i < n && b(i) != '"') {
        if (b(i) == '\\') { esc = true; i += 2 } else i += 1
      }
      if (i >= n) return null // unterminated — malformed
      val end = i
      i += 1
      (start, end, esc)
    }
    // skip a balanced object/array positioned ON '{' or '['
    def skipNested(): Boolean = {
      var depth = 0
      while (i < n) {
        b(i).toChar match {
          case '{' | '[' => depth += 1; i += 1
          case '}' | ']' => depth -= 1; i += 1
            if (depth == 0) return true
          case '"' => if (skipString() == null) return false
          case _ => i += 1
        }
      }
      false
    }
    ws()
    if (i >= n || b(i) != '{') return null
    i += 1
    var first = true
    while (i < n) {
      ws()
      if (i < n && b(i) == '}') return null // end of object: not found
      if (!first) {
        if (i >= n || b(i) != ',') return null
        i += 1; ws()
      }
      first = false
      if (i >= n || b(i) != '"') return null
      val k = skipString()
      if (k == null) return null
      val matches = !k._3 && (k._2 - k._1) == kb.length && {
        var j = 0; var ok = true
        while (ok && j < kb.length) { ok = b(k._1 + j) == kb(j); j += 1 }
        ok
      }
      ws()
      if (i >= n || b(i) != ':') return null
      i += 1; ws()
      if (i >= n) return null
      b(i).toChar match {
        case '"' =>
          val v = skipString()
          if (v == null) return null
          if (matches) return jsonUnescape(b, v._1, v._2, v._3)
        case '{' | '[' =>
          if (!skipNested()) return null
          if (matches) return null // non-scalar: out of contract
        case _ =>
          val start = i
          while (i < n && b(i) != ',' && b(i) != '}' && b(i) != ' ' &&
            b(i) != '\t' && b(i) != '\n' && b(i) != '\r') i += 1
          if (matches) {
            val len = i - start
            // JSON null → SQL NULL
            if (len == 4 && b(start) == 'n' && b(start + 1) == 'u' &&
              b(start + 2) == 'l' && b(start + 3) == 'l') return null
            // GetJsonObject (Jackson) re-renders NON-INTEGER numbers
            // ("-12.5e3" → "-12500.0"); integers pass through verbatim.
            // Match that: normalize only when a '.', 'e' or 'E' appears.
            val c0 = b(start)
            val numeric = c0 == '-' || (c0 >= '0' && c0 <= '9')
            var j = start; var float = false
            while (j < i) {
              val ch = b(j)
              if (ch == '.' || ch == 'e' || ch == 'E') float = true
              j += 1
            }
            if (numeric && float) {
              val txt = new String(b, start, len,
                java.nio.charset.StandardCharsets.US_ASCII)
              return try UTF8String.fromString(
                java.lang.Double.toString(java.lang.Double.parseDouble(txt)))
              catch { case _: NumberFormatException => null }
            }
            return UTF8String.fromBytes(b, start, len)
          }
      }
    }
    null
  }

  /** Decode a JSON string value's bytes [start, end); fast path when no
    * escape was seen. */
  private def jsonUnescape(b: Array[Byte], start: Int, end: Int,
      hadEsc: Boolean): UTF8String = {
    if (!hadEsc) return UTF8String.fromBytes(b, start, end - start)
    val s = new String(b, start, end - start,
      java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => out.append('"');  i += 2
          case '\\' => out.append('\\'); i += 2
          case '/'  => out.append('/');  i += 2
          case 'b'  => out.append('\b'); i += 2
          case 'f'  => out.append('\f'); i += 2
          case 'n'  => out.append('\n'); i += 2
          case 'r'  => out.append('\r'); i += 2
          case 't'  => out.append('\t'); i += 2
          case 'u' if i + 6 <= s.length =>
            out.append(Integer.parseInt(s.substring(i + 2, i + 6), 16)
              .toChar)
            i += 6
          case o    => out.append(o); i += 2
        }
      } else { out.append(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }

  /** Column wrapper: the native scan for simple `$.key` paths, falling
    * back to Spark's `get_json_object` for anything beyond the
    * contract (nested paths, array indexing, keys needing escapes). */
  def jsonScalarField(json: Column, path: String): Column = {
    val Simple = """\$\.([A-Za-z0-9_\- ]+)""".r
    path match {
      case Simple(key) => exprColumn(JsonScalarField(columnExpr(json), key))
      case _ => org.apache.spark.sql.functions.get_json_object(json, path)
    }
  }
}
