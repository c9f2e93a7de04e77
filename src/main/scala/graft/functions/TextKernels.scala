package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level text kernels shared by interpreted eval and generated code.
  *
  * The composed built-in form of shingling —
  * `transform(sequence(0, size-n), i -> concat_ws(' ', slice(tokens, i+1, n)))`
  * — is a higher-order-function chain, which Spark evaluates INTERPRETED
  * (one boxed lambda call per element per row). This kernel is the same
  * computation as one tight loop behind a single static call, so the
  * shingle stage that feeds every dedup operator (MinHash, n-gram Jaccard,
  * fingerprinting) stays out of the interpreter. Output is bit-identical to
  * the composed form: same split-on-space tokens, same first-occurrence
  * dedup order (array_distinct semantics), same single-space joins, empty
  * array for short or null input.
  */
object TextKernels {

  /** Fused one-pass curation counting kernel — replaces FIVE separate
    * regex passes over the document (`[A-Za-z0-9]+` word runs, `[.,;:!?]`
    * punctuation, and one `\b(w1|w2|...)\b` stopword scan per language)
    * plus the whitespace-token count with a single byte-level scan and
    * ZERO allocation beyond the 7-int result. Counting via
    * `size(regexp_extract_all(...))` materializes every match as a
    * UTF8String in an array per regex per row; the curation ingest is
    * exactly this shape and was measured regex-bound (~3.2k docs/s,
    * BASELINE.md).
    *
    * Exact equivalences (FunctionsSpec pins each against the composed
    * regex form; the DuckDB oracles are unchanged):
    *  - n_ws: non-empty segments between single 0x20 bytes — the
    *    `string_split(text, ' ')` + filter count. 0x20 never occurs
    *    inside a UTF-8 multi-byte sequence, so byte scanning is exact.
    *  - n_word: maximal `[A-Za-z0-9]+` runs. A regex match of that class
    *    is a maximal ASCII-alnum byte run (continuation bytes have the
    *    high bit set and never extend one).
    *  - n_punct: bytes in `[.,;:!?]`.
    *  - per-language marker hits: Java/RE2 `\b` tests the ASCII word
    *    class `[A-Za-z0-9_]` on both sides, so `\bword\b` for an
    *    all-word-char `word` matches exactly the maximal word-char runs
    *    equal to it — each language counts its own runs independently.
    *
    * Layout of the returned ints: [n_ws, n_word, n_punct, hits(lang 0),
    * ..., hits(lang L-1)] with languages in the caller's marker order.
    */
  def curationCounts(text: UTF8String, markers: Array[Array[Byte]],
                     markerLang: Array[Int], nLangs: Int): ArrayData = {
    val n = text.numBytes
    var nWs = 0; var nWord = 0; var nPunct = 0
    val hits = new Array[Int](nLangs)
    var inSeg = false
    var inAlnum = false
    var runStart = -1
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      val alnum = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
        (b >= '0' && b <= '9')
      val word = alnum || b == '_'
      if (b == ' ') inSeg = false
      else if (!inSeg) { inSeg = true; nWs += 1 }
      if (alnum && !inAlnum) nWord += 1
      inAlnum = alnum
      if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?')
        nPunct += 1
      if (word) { if (runStart < 0) runStart = i }
      else if (runStart >= 0) {
        countMarkerRun(text, runStart, i, markers, markerLang, hits)
        runStart = -1
      }
      i += 1
    }
    if (runStart >= 0)
      countMarkerRun(text, runStart, n, markers, markerLang, hits)
    val out = new Array[Any](3 + nLangs)
    out(0) = nWs; out(1) = nWord; out(2) = nPunct
    var l = 0
    while (l < nLangs) { out(3 + l) = hits(l); l += 1 }
    new GenericArrayData(out)
  }

  /** One maximal word-char run against every marker: a byte-equal marker
    * increments ITS language. No early exit across languages — the regex
    * scans are per-language independent, so a run shared by two languages'
    * marker lists must count for both.
    */
  private def countMarkerRun(text: UTF8String, start: Int, end: Int,
      markers: Array[Array[Byte]], markerLang: Array[Int],
      hits: Array[Int]): Unit = {
    val len = end - start
    var m = 0
    while (m < markers.length) {
      val mk = markers(m)
      if (mk.length == len) {
        var j = 0
        while (j < len && text.getByte(start + j) == mk(j)) j += 1
        if (j == len) hits(markerLang(m)) += 1
      }
      m += 1
    }
  }

  /** Whitespace tokenization shared by every text kernel below: split on
    * single spaces, compact out empties. Returns (tokens, count) — the
    * array may be over-sized past `count`. ONE definition: the kernels'
    * documented bit-identity with the composed forms and the DuckDB
    * oracle's `list_filter(string_split(...))` all assume this exact
    * tokenization, so it must never drift between kernels.
    */
  private def tokenize(text: UTF8String): (Array[String], Int) = {
    val parts = text.toString.split(" ", -1)
    var m = 0
    val toks = new Array[String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) { toks(m) = parts(i); m += 1 }
      i += 1
    }
    (toks, m)
  }

  /** Distinct word n-gram shingles of `text`, first-occurrence order. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val (toks, m) = tokenize(text)
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.max(8, (m - n + 1) * 2))
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j + n <= m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-gram shingles of `text` in document order — duplicates kept.
    * The multiset form behind the weighted (bag) Jaccard operators, where a
    * shingle's occurrence count is its weight.
    */
  def shinglesAll(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val (toks, m) = tokenize(text)
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j + n <= m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** (shingle, occurrence-count) pairs in first-occurrence order — one
    * document's bag postings computed in a single pass, so the per-corpus
    * counting aggregation (a full (doc, hash) shuffle) disappears from the
    * weighted-dedup plans entirely: counts become per-row generator
    * output.
    */
  def shingleCounts(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val (toks, m) = tokenize(text)
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[String, Integer](math.max(8, (m - n + 1) * 2))
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j + n <= m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      val s = sb.toString
      val prev = counts.get(s)
      counts.put(s, if (prev == null) 1 else prev + 1)
      j += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue.longValue()))
      o += 1
    }
    new GenericArrayData(out)
  }

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5 as a positive long — bit-identical to
    * [[graft.engine.PortableHash.md5LongScala]] (15 hex digits == big-endian
    * first 8 bytes >>> 4), without the hex-string round-trip.
    */
  private def md5Long60(s: String): Long = {
    val d = md5.get()
    d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Per-row MinHash signature: the `perms` minima over the document's
    * DISTINCT shingle hashes, computed in one pass — the signature is a
    * pure function of the row, so the 64-column min-aggregation (and its
    * full posting exchange) disappears from the sketch plans. Bit-identical
    * to [[graft.llm.Dedup.minhashSignaturesFromPosts]] over
    * [[shingles]]-postings: same md5-derived hashes, same (a·h+b) mod P
    * permutations. Documents with fewer than n tokens return an EMPTY
    * array (the aggregation form emits no row) — callers filter on size.
    */
  def minhashSig(text: UTF8String, n: Int, a: Array[Long], b: Array[Long],
                 p: Long): ArrayData = {
    val perms = a.length
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val (toks, m) = tokenize(text)
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[String](math.max(8, (m - n + 1) * 2))
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j + n <= m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      val s = sb.toString
      if (seen.add(s)) {
        val hp = md5Long60(s) % p
        var q = 0
        while (q < perms) {
          val v = (hp * a(q) + b(q)) % p
          if (v < mins(q)) mins(q) = v
          q += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** MinHash signature from a document's DISTINCT shingle-hash array (the
    * docsets relation's `hs`): one pass over the longs, all `perms` minima
    * at once. Output-equal to [[minhashSig]] over the document's text —
    * the postings hold exactly the kernel's deduped shingle hashes, and
    * the permutation math is identical — so the banded family's WIDE
    * regime can derive signatures off the docsets cache it already fills
    * (for sizes and verification) instead of paying a second full text
    * scan (re-tokenize + re-shingle + one md5 per shingle). Empty array in
    * → empty array out, matching the kernel's <n-tokens sentinel.
    */
  def minhashSigFromHashes(hs: ArrayData, a: Array[Long], b: Array[Long],
                           p: Long): ArrayData = {
    val perms = a.length
    val m = hs.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < m) {
      val hp = hs.getLong(j) % p
      var q = 0
      while (q < perms) {
        val v = (hp * a(q) + b(q)) % p
        if (v < mins(q)) mins(q) = v
        q += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Per-row WEIGHTED MinHash signature over the multiset expansion: the
    * k-th occurrence of a shingle contributes element hash h (k=1, the
    * base) or md5(h + "#" + k) (k ≥ 2) — the same mapping as
    * [[graft.llm.Dedup.minhashWeightedPairs]]'s expansion, processed
    * incrementally in one pass (occurrence counts tracked as they stream,
    * no second loop). Signature collision probability = bag Jaccard,
    * computed with zero exchanges.
    */
  def minhashSigWeighted(text: UTF8String, n: Int, a: Array[Long], b: Array[Long],
                         p: Long): ArrayData = {
    val perms = a.length
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val (toks, m) = tokenize(text)
    if (m < n) return new GenericArrayData(Array.empty[Any])
    // per-shingle state: base hash + occurrences seen so far
    val state = new java.util.HashMap[String, Array[Long]](math.max(8, (m - n + 1) * 2))
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j + n <= m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      val s = sb.toString
      var st = state.get(s)
      if (st == null) { st = Array(md5Long60(s), 0L); state.put(s, st) }
      st(1) += 1
      val h = if (st(1) == 1L) st(0) else md5Long60(st(0).toString + "#" + st(1))
      val hp = h % p
      var q = 0
      while (q < perms) {
        val v = (hp * a(q) + b(q)) % p
        if (v < mins(q)) mins(q) = v
        q += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Per-ROW frequency-weighted SimHash over whitespace tokens — the same
    * function as the aggregation form ([[graft.llm.Dedup.simhashSignatures]]:
    * bit j set when Σ_token-occurrences (±1 from bit j of md5(token)) > 0),
    * computed in one pass inside codegen with NO shuffle and NO state.
    * That statelessness is the point: a document STREAM can be signed row
    * by row and banded against a static corpus index without any streaming
    * aggregation (see `Streaming.neardupStream`). Docs with no tokens sign
    * to 0L (the aggregation form emits no row for them — align filters at
    * call sites).
    */
  def simhash(text: UTF8String, bits: Int): Long = {
    if (text == null) return 0L
    val parts = text.toString.split(" ", -1)
    val sums = new Array[Int](bits)
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) {
        val h = md5Long60(parts(i))
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Catalyst expression wrapping [[TextKernels.shingles]]: null text → null
  * (standard null propagation; the kernel itself never returns null for
  * non-null input, and the generated code never assigns the isNull slot —
  * see the DotProductFP nullability lesson in SCALE.md). Call sites that
  * need the composed form's null → empty-array behavior wrap in
  * `coalesce` ([[TextFunctions.graftShingles]] does).
  */
case class ShinglesFP(child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingles expects a string column, got $t")
    }

  private def kernel: String = if (distinct) "shingles" else "shinglesAll"

  override def nullSafeEval(text: Any): Any =
    if (distinct) TextKernels.shingles(text.asInstanceOf[UTF8String], n)
    else TextKernels.shinglesAll(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.$kernel($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Catalyst expression wrapping [[TextKernels.shingleCounts]]:
  * array<struct<s: string, cnt: bigint>> of a document's bag postings.
  * Null text → null (explode drops it).
  */
case class ShingleCountsFP(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_counts expects a string column, got $t")
    }

  override def nullSafeEval(text: Any): Any =
    TextKernels.shingleCounts(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.shingleCounts($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Catalyst expression wrapping [[TextKernels.minhashSig]]: a document's
  * full MinHash signature (array<bigint>, length `perms`) as a pure row
  * function; empty array for docs with fewer than n tokens. Null text →
  * null.
  */
case class MinhashSigFP(child: Expression, n: Int, perms: Int,
                        weighted: Boolean = false) extends UnaryExpression {

  private val params = graft.engine.PortableHash.minhashParams(perms)
  private val aArr: Array[Long] = params.map(_._1).toArray
  private val bArr: Array[Long] = params.map(_._2).toArray

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects a string column, got $t")
    }

  private def kernel: String = if (weighted) "minhashSigWeighted" else "minhashSig"

  override def nullSafeEval(text: Any): Any =
    if (weighted)
      TextKernels.minhashSigWeighted(text.asInstanceOf[UTF8String], n, aArr, bArr,
        graft.engine.PortableHash.P)
    else
      TextKernels.minhashSig(text.asInstanceOf[UTF8String], n, aArr, bArr,
        graft.engine.PortableHash.P)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.$kernel($c, $n, $aRef, $bRef, " +
        s"${graft.engine.PortableHash.P}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Catalyst expression wrapping [[TextKernels.minhashSigFromHashes]]: the
  * MinHash signature recomputed from a doc's distinct shingle-hash array
  * instead of its text. Same permutation parameters as [[MinhashSigFP]],
  * so the two are output-equal wherever the array holds the kernel's
  * deduped shingle hashes (FunctionsSpec proves it over the docsets
  * relation). Null array → null, like the text kernel's null text.
  */
case class MinhashSigFromHashesFP(child: Expression, perms: Int)
    extends UnaryExpression {

  private val params = graft.engine.PortableHash.minhashParams(perms)
  private val aArr: Array[Long] = params.map(_._1).toArray
  private val bArr: Array[Long] = params.map(_._2).toArray

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_from_hashes expects array<bigint>, got $t")
    }

  override def nullSafeEval(hs: Any): Any =
    TextKernels.minhashSigFromHashes(hs.asInstanceOf[ArrayData], aArr, bArr,
      graft.engine.PortableHash.P)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.minhashSigFromHashes($c, $aRef, $bRef, " +
        s"${graft.engine.PortableHash.P}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Catalyst expression wrapping [[TextKernels.simhash]]: null text → null,
  * empty/short text → 0L. Never assigns the isNull slot in generated code
  * (the nullability lesson in SCALE.md).
  */
case class SimhashFP(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects a string column, got $t")
    }

  override def nullSafeEval(text: Any): Any =
    TextKernels.simhash(text.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.simhash($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Catalyst expression wrapping [[TextKernels.curationCounts]]:
  * array<int> of [n_ws, n_word, n_punct, marker-hits per language] computed
  * in one byte scan — the curation ingest's whole stateless counting load
  * fused into a single kernel evaluation. `markerLists` is one word list
  * per language, order preserved in the output. Null text → null.
  */
case class CurationCountsFP(child: Expression, markerLists: Seq[Seq[String]])
  extends UnaryExpression {

  // The kernel's equivalence to the `\b(w1|w2|...)\b` regex scan (argued
  // per count in the scaladoc above curationCounts) holds ONLY for markers
  // that are lowercase ASCII word tokens with no duplicates inside a list:
  // an accented marker ('más') can never byte-equal a maximal ASCII
  // word-char run (silent 0), and a duplicate inside one list counts every
  // occurrence twice where the regex alternation counts it once. Fail at
  // construction, not silently at scan time, when a marker-list edit
  // breaks the precondition. (The same marker in TWO lists is fine and
  // intentional — per-language scans are independent.)
  markerLists.zipWithIndex.foreach { case (ws, l) =>
    ws.foreach { w =>
      require(w.nonEmpty && w.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'),
        s"graft_curation_counts marker '$w' (list $l) must match [a-z0-9_]+ — " +
          "the fused byte-scan kernel only equals the \\b-regex form for lowercase ASCII word tokens")
    }
    require(ws.distinct.length == ws.length,
      s"graft_curation_counts marker list $l contains duplicates: " +
        ws.diff(ws.distinct).distinct.mkString(", "))
  }

  @transient private lazy val markerBytes: Array[Array[Byte]] =
    markerLists.flatten.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  @transient private lazy val markerLang: Array[Int] =
    markerLists.zipWithIndex.flatMap { case (ws, l) => ws.map(_ => l) }.toArray

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_curation_counts expects a string column, got $t")
    }

  override def nullSafeEval(text: Any): Any =
    TextKernels.curationCounts(text.asInstanceOf[UTF8String],
      markerBytes, markerLang, markerLists.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("curationMarkers", markerBytes, "byte[][]")
    val lRef = ctx.addReferenceObj("curationMarkerLang", markerLang, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.curationCounts($c, $mRef, " +
        s"$lRef, ${markerLists.length});")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Column API for the shingle kernel, with the composed form's
    * null-text → empty-array semantics.
    */
  def graftShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.functions.coalesce(
      ColumnBridge.column(ShinglesFP(ColumnBridge.expression(text), n)),
      org.apache.spark.sql.functions.array().cast("array<string>"))

  /** All-occurrences (multiset) variant — duplicates kept, document order. */
  def graftShinglesAll(text: Column, n: Int): Column =
    org.apache.spark.sql.functions.coalesce(
      ColumnBridge.column(ShinglesFP(ColumnBridge.expression(text), n, distinct = false)),
      org.apache.spark.sql.functions.array().cast("array<string>"))

  /** Per-row 60-bit frequency-weighted SimHash (shuffle-free, state-free). */
  def graftSimhash(text: Column, bits: Int = 60): Column =
    ColumnBridge.column(SimhashFP(ColumnBridge.expression(text), bits))

  /** Fused curation counts: array<int> [n_ws, n_word, n_punct,
    * marker-hits per language list] in one byte scan. */
  def graftCurationCounts(text: Column, markerLists: Seq[Seq[String]]): Column =
    ColumnBridge.column(CurationCountsFP(ColumnBridge.expression(text), markerLists))

  /** Per-row bag postings: array<struct<s, cnt>> of (shingle, count). */
  def graftShingleCounts(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleCountsFP(ColumnBridge.expression(text), n))

  /** Per-row MinHash signature (array<bigint>; empty when < n tokens). */
  def graftMinhashSig(text: Column, n: Int, perms: Int): Column =
    ColumnBridge.column(MinhashSigFP(ColumnBridge.expression(text), n, perms))

  /** Weighted (bag) variant over the multiset expansion. */
  def graftMinhashSigWeighted(text: Column, n: Int, perms: Int): Column =
    ColumnBridge.column(MinhashSigFP(ColumnBridge.expression(text), n, perms,
      weighted = true))

  /** MinHash signature from a distinct-shingle-hash array (the docsets
    * relation's `hs`) — output-equal to [[graftMinhashSig]] over the text.
    */
  def graftMinhashSigFromHashes(hs: Column, perms: Int): Column =
    ColumnBridge.column(MinhashSigFromHashesFP(ColumnBridge.expression(hs), perms))

  /** Arity gate for the SQL builders: a wrong argument count must surface
    * as the same IllegalArgumentException with the usage string, not an
    * IndexOutOfBoundsException from exprs(i).
    */
  private def requireArity(exprs: Seq[Expression], n: Int, usage: String): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$usage: expected $n arguments, got ${exprs.length}")

  /** SQL surface: `SELECT graft_shingles(text, 3)` — the n-gram width must
    * be a literal (it parameterizes generated code).
    */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                     org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                     Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ShinglesFP].getName, "graft_shingles"),
    (exprs: Seq[Expression]) => {
      requireArity(exprs, 2, "graft_shingles(text, n)")
      exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
          ShinglesFP(exprs.head, n)
        case other => throw new IllegalArgumentException(
          s"graft_shingles(text, n): n must be an integer literal, got $other")
      }
    })

  /** SQL surface: `SELECT graft_minhash(text, 3, 64)` — n-gram width and
    * permutation count must be literals (they parameterize the kernel).
    */
  val registrationMinhash: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                            org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                            Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[MinhashSigFP].getName, "graft_minhash"),
    (exprs: Seq[Expression]) => {
      requireArity(exprs, 3, "graft_minhash(text, n, perms)")
      (exprs(1), exprs(2)) match {
        case (org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _),
              org.apache.spark.sql.catalyst.expressions.Literal(p: Int, _)) =>
          MinhashSigFP(exprs.head, n, p)
        case other => throw new IllegalArgumentException(
          s"graft_minhash(text, n, perms): n and perms must be integer literals, got $other")
      }
    })

  /** SQL surface: `SELECT graft_simhash(text, 60)`. */
  val registrationSimhash: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                            org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                            Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[SimhashFP].getName, "graft_simhash"),
    (exprs: Seq[Expression]) => {
      requireArity(exprs, 2, "graft_simhash(text, bits)")
      exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(bits: Int, _) =>
          SimhashFP(exprs.head, bits)
        case other => throw new IllegalArgumentException(
          s"graft_simhash(text, bits): bits must be an integer literal, got $other")
      }
    })

  /** SQL surface for the multiset variant:
    * `SELECT graft_shingles_all(text, 3)`.
    */
  val registrationAll: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                        Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles_all"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ShinglesFP].getName, "graft_shingles_all"),
    (exprs: Seq[Expression]) => {
      requireArity(exprs, 2, "graft_shingles_all(text, n)")
      exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
          ShinglesFP(exprs.head, n, distinct = false)
        case other => throw new IllegalArgumentException(
          s"graft_shingles_all(text, n): n must be an integer literal, got $other")
      }
    })
}
