package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, n-gram language ID, quality scoring, token counting and
  * document fingerprinting. All are pure Column expressions (codegen'd,
  * no UDFs) so they stay inside WholeStageCodegen and scale linearly with
  * the corpus — the 100 TB path is a single narrow map stage.
  */
object TextFunctions {

  /** Lowercase alnum-run tokenizer (shared with the DuckDB oracle which
    * uses the same RE2/Java-compatible pattern). */
  val TokenPattern = "[a-z0-9]+"

  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenPattern), lit(0))

  /** Language-ID by stopword-set hit counting — the classic n-gram/
    * stopword heuristic. Ties break by the fixed chain order (en, es, de),
    * making the classifier fully deterministic. */
  val StopEn: Seq[String] = Seq("the", "a", "of", "and", "to")
  val StopEs: Seq[String] = Seq("data", "row", "query", "tabla", "fila")
  val StopDe: Seq[String] = Seq("der", "die", "das", "und", "ist")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  def langId(text: Column): Column = {
    val t = tokens(text)
    val (en, es, de) = (hits(t, StopEn), hits(t, StopEs), hits(t, StopDe))
    when(en >= es && en >= de && en > 0, lit("en"))
      .when(es >= de && es > 0, lit("es"))
      .when(de > 0, lit("de"))
      .otherwise(lit("und"))
  }

  /** Quality features: token count, mean token length, punctuation ratio,
    * stopword ratio — returned as a struct of named columns; the composite
    * score is a fixed linear blend (deterministic double arithmetic). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  def qualityScore(text: Column, nChars: Column): Column = {
    val t = tokens(text)
    val nTok = size(t)
    val meanLen = when(nTok > 0,
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / nTok)
      .otherwise(lit(0.0))
    val stopRatio = when(nTok > 0,
      hits(t, StopEn ++ StopEs ++ StopDe).cast("double") / nTok).otherwise(lit(0.0))
    val punctRatio = when(nChars > 0,
      punctCount(text).cast("double") / nChars).otherwise(lit(0.0))
    meanLen * lit(10.0) + stopRatio * lit(50.0) - punctRatio * lit(100.0) +
      when(nTok >= 20, lit(25.0)).otherwise(lit(0.0))
  }

  /** Token counting: whitespace-ish tokens, BPE-ish subword pieces
    * (greedy ≤4-char alpha runs, digits, symbols), and the chars/4
    * approximation. */
  val BpePattern = "[a-z]{1,4}|[0-9]|[^a-z0-9 ]"

  def wsTokenCount(text: Column): Column = size(tokens(text))
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpePattern), lit(0)))
  def approxTokenCount(nChars: Column): Column =
    ceil(nChars.cast("double") / 4.0).cast("long")

  /** Document fingerprint: bottom-4 sketch of the distinct-token md5 set
    * (a deterministic min-hash-style content signature). */
  def fingerprint(text: Column): Column =
    concat_ws(",", slice(array_sort(transform(array_distinct(tokens(text)),
      t => md5(t))), 1, 4))

  /** PII scrubbing + normalization for training corpora. The regexes are
    * deliberately RE2-compatible (no backrefs/lookaround) so the DuckDB
    * differential oracle — and any RE2-based production scrubber — matches
    * byte-for-byte. Applied to the lowercased text; whitespace is
    * collapsed last so redaction tokens never glue words together. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Phone shapes: optional +country (1-3 digits), optional area code —
    * parenthesized `(555) ` or separated `555-` — then the NNN<sep>NNNN
    * core; separators are `-`, `.` or space. Matches 555-123-4567,
    * +1-555-123-4567, (555) 123-4567, 555.123.4567, 555 123 4567 and the
    * bare 7-digit local form 555-0123 … 555-0199. Deliberately
    * conservative the other way: bare 10-digit runs (no separators) are
    * NOT matched — they collide with record ids — and non-NANP groupings
    * redact only their trailing NNN<sep>NNNN digits. A separated numeric
    * range like `100-2026` also matches (over-redaction is the safe
    * failure mode for a PII scrubber). */
  val PhonePattern =
    "(\\+?[0-9]{1,3}[-. ])?(\\([0-9]{3}\\)[ ]?|[0-9]{3}[-. ])?[0-9]{3}[-. ][0-9]{4}"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(EmailPattern), lit(0)))
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(PhonePattern), lit(0)))

  def piiScrub(text: Column): Column = {
    val noEmail = regexp_replace(lower(text), EmailPattern, "<email>")
    val noPhone = regexp_replace(noEmail, PhonePattern, "<phone>")
    trim(regexp_replace(noPhone, "\\s+", " "))
  }
}
