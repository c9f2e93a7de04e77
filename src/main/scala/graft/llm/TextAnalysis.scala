package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM training-data pipelines: tokenization,
  * shingling, language-ID heuristics, quality scoring, fingerprinting.
  *
  * Everything here is a pure Catalyst expression (higher-order array
  * functions + regex built-ins) — no UDFs, so the whole pipeline stays inside
  * WholeStageCodegen and scales linearly with no shuffle until the first
  * aggregation. All arithmetic that reaches an oracle-compared column is
  * integer or md5-derived (see [[graft.engine.PortableHash]]) so DuckDB
  * reproduces it exactly.
  */
object TextAnalysis {

  /** Whitespace tokens, empty strings dropped (split-on-space parity with
    * DuckDB's string_split + filter). `array_remove` instead of the
    * `filter` higher-order function — same result, stays in codegen.
    */
  def tokens(text: Column): Column =
    array_remove(split(text, " "), "")

  /** Distinct word n-gram shingles joined by single spaces; empty array when
    * the document is shorter than n tokens (or null). Backed by the native
    * [[graft.functions.TextKernels]] kernel — the composed built-in form
    * (`transform(sequence(...), i => concat_ws(" ", slice(...)))`) is a
    * higher-order-function chain that Spark evaluates interpreted, and it
    * sat under every dedup operator; `shinglesComposed` keeps that form as
    * the spec cross-check.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextFunctions.graftShingles(text, n)

  /** ALL word n-gram shingles, duplicates kept in document order — the
    * multiset form whose occurrence counts weight the bag-Jaccard operators
    * ([[graft.llm.Dedup.bagPostings]]).
    */
  def shinglesAll(text: Column, n: Int): Column =
    graft.functions.TextFunctions.graftShinglesAll(text, n)

  /** The built-in HOF composition of [[shingles]] — output-equal (proven by
    * FunctionsSpec), kept as the kernel's correctness reference.
    */
  def shinglesComposed(text: Column, n: Int): Column = {
    val ts = tokens(text)
    when(size(ts) >= n,
      array_distinct(transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Escape a literal for BOTH Java regex (Spark) and RE2 (DuckDB oracle):
    * backslash every non-alphanumeric. `Pattern.quote`'s \Q...\E would work
    * only on the Java side.
    */
  private[graft] def escapeRegex(s: String): String =
    s.replaceAll("([^A-Za-z0-9])", "\\\\$1")

  /** Stopword-hit count for a language marker list (word-boundary regex).
    * Words are regex-escaped: a marker like `c++` must count as a literal,
    * not blow up as a dangling quantifier. This is the correctness
    * REFERENCE for the fused [[curationCounts]] kernel's per-language
    * columns (FunctionsSpec pins equality); the hot curation path runs
    * the kernel.
    */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(text,
      lit("\\b(" + words.map(escapeRegex).mkString("|") + ")\\b"), lit(0)))

  /** Fused one-pass curation counts ([[graft.functions.TextKernels
    * .curationCounts]]): array<int> `[n_ws, n_word, n_punct, s_en, s_es,
    * s_fr, s_de]` — the whole stateless counting load of the curation
    * ingest (five regex passes + a tokenize) in ONE byte scan of the
    * document, no per-match allocation. Each element is output-equal to
    * its composed form: `size(tokens(text))`, `regexCount(wordRe)`,
    * `regexCount(punctRe)`, and `stopwordHits(langMarkers(i))`
    * respectively (FunctionsSpec).
    */
  def curationCounts(text: Column): Column =
    graft.functions.TextFunctions.graftCurationCounts(text, langMarkers.map(_._2))

  /** Language markers used by the n-gram/stopword language-ID heuristic.
    * Order is the deterministic tie-break priority.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "es" -> Seq("el", "la", "que", "de", "los"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "de" -> Seq("der", "die", "und", "ist", "das"))

  /** Counting regexes shared with the oracle. */
  val wordRe = "[A-Za-z0-9]+"
  /** BPE-ish pre-tokenizer: letter runs, single digits, single punctuation. */
  val bpeIshRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  val punctRe = "[.,;:!?]"

  def regexCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** PII-ish surface patterns (curation signals — detection counts only;
    * redaction is a `regexp_replace` away with the same patterns). Shared
    * verbatim with the oracle; RE2/Java-compatible syntax only.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[^\\s]+"
  val longDigitRe = "[0-9]{7,}"
}
