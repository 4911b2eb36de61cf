package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis layer for large-scale training-data pipelines: language
  * ID, quality scoring, token counting, fingerprinting. Everything is a
  * pure column expression (codegen'd, no UDFs) and every function has an
  * exact ANSI-SQL equivalent so the DuckDB oracle can check values.
  *
  * The reference has no text analytics (its only string op is the phone
  * split, `src/services/groupContact.js:2-9`) — this is the north-star
  * extension surface.
  */
object TextAnalytics {

  /** Whitespace tokenization, empty-safe. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword proxy: runs of letters, runs of digits, single
    * other non-space chars — the standard pre-tokenizer split.
    */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Mean token length (double division — IEEE-identical across engines). */
  def avgTokenLen(c: Column): Column = {
    val t = tokens(c)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
      size(t).cast("double")
  }

  private val stopwords = Seq("the", "a")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(c: Column): Column = {
    val t = tokens(c)
    size(filter(t, x => x.isin(stopwords: _*))).cast("double") /
      size(t).cast("double")
  }

  /** Fraction of distinct tokens (type/token ratio — low = repetitive). */
  def distinctRatio(c: Column): Column = {
    val t = tokens(c)
    size(array_distinct(t)).cast("double") / size(t).cast("double")
  }

  /** Composite quality gate: long enough, not too repetitive, sane
    * stopword load. Thresholds arbitrary but fixed; emitted as 0/1 so
    * the oracle compares exactly.
    */
  def qualityFlag(c: Column): Column =
    (tokenCount(c) >= 20 &&
      distinctRatio(c) > lit(0.1) &&
      stopwordRatio(c) < lit(0.5)).cast("long")

  /** Deterministic marker-word language guess — an n-gram-style
    * heuristic reduced to exact counts so both engines agree bit-for-bit.
    */
  def langGuess(c: Column): Column = {
    val t = tokens(c)
    def cnt(w: String) = size(filter(t, x => x === w))
    when(cnt("the") >= 3, "en")
      .when(cnt("data") >= 3, "de")
      .when(cnt("table") >= 3, "es")
      .otherwise("und")
  }

  /** Document fingerprint: md5 over the sorted distinct token set —
    * word-order-insensitive content hash (bag-of-words canonical form).
    */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(c))), " ").cast("binary"))

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash.
    *
    * Built by zipping the token array against its own k-shifted slices —
    * NOT via `element_at(tokens, i)` inside a transform lambda, which
    * would re-evaluate the whole tokenization per element access
    * (O(len²) regex splits per row). Here the token expression is
    * evaluated a constant number of times per row.
    */
  def shingles(c: Column, n: Int): Column =
    array_distinct(positionalShingles(c, n))

  /** Positional (non-distinct) word n-grams — one per window, in
    * order. Repetition metrics need the duplicates [[shingles]] drops.
    */
  def positionalShingles(c: Column, n: Int): Column =
    positionalShinglesOfTokens(tokens(c), n)

  /** Same, over an already-tokenized array column. */
  def positionalShinglesOfTokens(t: Column, n: Int): Column = {
    val grams = (2 to n).foldLeft(t) { (acc, k) =>
      // zip_with pads the shorter (shifted) side with nulls; concat_ws
      // skips nulls, so tail entries become short grams — cut below
      zip_with(acc, slice(t, lit(k), size(t)), (a, b) => concat_ws(" ", a, b))
    }
    slice(grams, lit(1), greatest(size(t) - (n - 1), lit(0)))
  }
}
