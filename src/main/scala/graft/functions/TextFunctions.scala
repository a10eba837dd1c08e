package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * normalization, token counting, fingerprinting, language ID, quality
  * scoring. All are compositions of codegen'd built-ins (no UDFs), so they
  * stay inside whole-stage codegen and are portable to an ANSI-SQL oracle.
  *
  * Design note: every function here is deterministic and engine-portable
  * (same result in DuckDB given the mirrored SQL) — that is what lets a
  * 100 TB dedup job be resumed/verified across engines.
  */
object TextFunctions {

  /** Lowercase, collapse whitespace runs to single spaces, trim. */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace token count over normalized text. */
  def tokenCount(c: Column): Column = {
    val t = normalizeText(c)
    when(length(t) === 0, 0).otherwise(size(split(t, " ")))
  }

  /** "BPE-ish" token estimate over normalized text: pre-tokenize into
    * letter runs, digit runs, and single symbols (the GPT-2-style
    * pre-tokenizer shape, ASCII-simplified — a CJK character counts as
    * one symbol each), then charge ceil(len/4) subword tokens per run —
    * the ~4-chars-per-token rule of thumb real tokenizers average out
    * to. Composable built-ins only, portable to the SQL oracle. The
    * extract-all result is referenced exactly once (higher-order
    * functions evaluate interpreted with no CSE).
    */
  def tokenCountBpe(c: Column): Column =
    aggregate(
      transform(
        regexp_extract_all(normalizeText(c), lit(BpeChunkPattern), lit(0)),
        x => ((length(x) + 3) / 4).cast("int")
      ),
      lit(0),
      (acc, x) => acc + x
    )

  /** Pre-tokenizer chunk pattern shared with the oracle SQL. */
  val BpeChunkPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Content fingerprint: md5 of normalized text (portable across
    * engines; for a pure-Spark fast path use xxhash64 instead).
    */
  def fingerprint(c: Column): Column = normalizeText(c).pipe(md5Utf8)

  private def md5Utf8(c: Column): Column = md5(c.cast("binary"))

  /** Count non-overlapping occurrences of `sub` in `c` — the classic
    * (len(s) - len(replace(s, sub, ''))) / len(sub) identity, identical
    * in any SQL engine.
    */
  def occurrences(c: Column, sub: String): Column =
    (length(c) - length(replace(c, lit(sub), lit("")))) / sub.length

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Counted with padded spaces over normalized text.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "fr" -> Seq(" le ", " la ", " et ", " les "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "es" -> Seq(" el ", " que ", " los ", " es ")
  )

  /** Heuristic language ID: argmax of marker-word hit counts, 'zh' if CJK
    * characters present, 'und' when nothing matches. Ties resolve in
    * `langMarkers` declaration order. Backed by the one-pass
    * [[graft.plans.LangId]] expression (composable argmax-of-counts
    * formulations re-evaluate the count subexpressions per CASE branch
    * whenever codegen falls back to interpreted mode); callers must have
    * run [[graft.plans.VectorFunctions.register]] on the session.
    */
  def langId(c: Column): Column = call_function("lang_id", c)

  /** Document quality score in [0,100]: rewards reasonable length and
    * stopword presence, penalizes punctuation/digit excess. Mirrors the
    * shape of C4/Gopher-style quality rules with engine-portable
    * arithmetic (exact integer counts, one double formula at the end).
    */
  def qualityScore(c: Column): Column = {
    val t       = normalizeText(c)
    val chars   = length(t)
    val tokens  = tokenCount(c)
    val stops   = langMarkers
      .find(_._1 == "en").get._2
      .map(m => occurrences(concat(lit(" "), t, lit(" ")), m))
      .reduce(_ + _)
    val punct   = length(regexp_replace(t, "[^.!?,;:]", ""))
    val digits  = length(regexp_replace(t, "[^0-9]", ""))
    val lenScore  = when(chars.between(200, 4000), 40)
      .when(chars.between(50, 199), 25)
      .otherwise(10)
    val stopScore = when(stops >= 3, 30).when(stops >= 1, 20).otherwise(5)
    val punctPenalty = least(punct * lit(2), lit(20))
    val digitPenalty = least(digits, lit(10))
    greatest(
      least(lenScore + stopScore + lit(30) - punctPenalty - digitPenalty, lit(100)),
      lit(0)
    )
  }

  /** Distinct word 3-gram shingles over normalized text, exposed for the
    * dedup operators. Backed by the one-pass [[graft.plans.WordShingles]]
    * expression (see its scaladoc for why the higher-order-function
    * formulation is O(words²) and ~50x slower); callers must have run
    * [[graft.plans.VectorFunctions.register]] on the session.
    */
  def shingles3(c: Column): Column =
    call_function("word_shingles3", normalizeText(c))

  implicit final class ColumnPipe(private val c: Column) extends AnyVal {
    def pipe(f: Column => Column): Column = f(c)
  }
}
