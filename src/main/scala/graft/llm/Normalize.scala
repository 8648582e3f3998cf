package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text normalization — the first pass of every
  * pretraining pipeline (C4/CCNet-style cleanup, public recipes):
  * canonicalize the punctuation variants and whitespace noise that
  * would otherwise fragment dedup fingerprints and tokenizer
  * vocabularies.
  *
  * Steps (each a codegen'd expression; the chain stays inside one
  * whole-stage-codegen projection — no UDF, no shuffle, no join):
  *   1. map typographic variants to ASCII: curly single/double
  *      quotes → `'` / `"`, en/em dash → `-`, NBSP → space
  *      (single-char `translate`, cheaper than regex);
  *   2. control characters (U+0000–U+001F) → space;
  *   3. collapse whitespace runs (space/tab/LF/CR/FF) to one space
  *      and trim.
  *
  * Every step is expressible identically in ANSI SQL
  * (translate + regexp_replace), so normalized output is
  * oracle-checkable bit-for-bit. The character classes are spelled
  * explicitly ([ \t\n\r\f]) instead of `\s` because Java regex and
  * RE2 disagree on `\s` (U+000B membership) — the kind of
  * engine-dependence a 1000-executor rerun must not carry.
  */
object Normalize {

  // U+2018 U+2019 U+201C U+201D U+2013 U+2014 U+00A0
  private val fromChars = "‘’“”–— "
  private val toChars = "''\"\"-- "

  /** Normalized form of `text` (null-safe: null in, null out). */
  def normalize(text: Column): Column = {
    val ascii = translate(text, fromChars, toChars)
    val noCtrl = regexp_replace(ascii, "[\\x00-\\x1f]", " ")
    trim(regexp_replace(noCtrl, "[ \\t\\n\\r\\f]+", " "))
  }

  /** DuckDB fragment mirroring [[normalize]] over column `expr`.
    * The to-set's ASCII quotes are spelled via chr(39) to dodge SQL
    * quote-escaping; regex backslashes pass through DuckDB's plain
    * string literals to RE2 untouched.
    */
  def normalizeSql(expr: String): String =
    s"trim(regexp_replace(regexp_replace(translate($expr, '$fromChars', " +
      "chr(39)||chr(39)||'\"\"-- '), '[\\x00-\\x1f]', ' ', 'g'), " +
      "'[ \\t\\n\\r\\f]+', ' ', 'g'))"
}
