package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Title-code extraction — the reference's stage-2 enrichment
  * (ref: Python-pipeline/dataingestion2.py:33-64) re-expressed as pure,
  * codegen-friendly Column functions (no UDFs — every rule compiles into
  * whole-stage codegen; see SURVEY.md §2.8 F1–F7).
  *
  * Semantics preserved exactly:
  *  - F1 extractLastWord: replace '|' with ' ', split on whitespace, last
  *    token; empty/null input → "".
  *  - F3 length gate: blank unless length ∈ {3,4,5}.
  *  - F4 all-digits purge: blank when the token is digits only (e.g. "2025").
  *  - F5 multi-lowercase purge: blank when >1 lowercase chars.
  *  - F6 code prefix: first 2 chars if len==4 else first 3.
  *  - F7 resource code: last char, "" for empty.
  */
object TitleCode {

  /** F1 — last whitespace-separated token after '|'→' ' normalization. */
  def extractLastWord(title: Column): Column = {
    val norm = trim(translate(coalesce(title, lit("")), "|", " "))
    when(norm === "", lit("")).otherwise(element_at(split(norm, "\\s+"), -1))
  }

  /** F3+F4+F5 — conditional blanking rules applied to a candidate code. */
  def purgeInvalid(code: Column): Column = {
    val lowerCount = length(regexp_replace(code, "[^a-z]", ""))
    when(!length(code).isin(3, 4, 5), lit(""))
      .when(code.rlike("^[0-9]+$"), lit(""))
      .when(lowerCount > 1, lit(""))
      .otherwise(code)
  }

  /** F6 — show-code prefix: 2 chars when len==4, else 3. Blank stays blank. */
  def codePrefix(mainCode: Column): Column =
    when(mainCode === "", lit(""))
      .when(length(mainCode) === 4, substring(mainCode, 1, 2))
      .otherwise(substring(mainCode, 1, 3))

  /** F7 — resource code: last character ("" for empty input). */
  def lastChar(c: Column): Column =
    when(c === "", lit("")).otherwise(substring(c, -1, 1))

  /** Fused pipeline: title → validated main code (F1→F3/F4/F5). */
  def mainCode(title: Column): Column = purgeInvalid(extractLastWord(title))
}
