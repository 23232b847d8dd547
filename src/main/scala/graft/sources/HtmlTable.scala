package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** In-engine HTML-table extraction (SURVEY.md §2 row S1 — the parse
  * half of the reference's `fd.read_html(...)[0]` scrape step,
  * `/root/reference/dags/hockeyreference_dag.py:32-48`; the network
  * GET stays out of the engine, the landed HTML is data).
  *
  * Pure Catalyst expressions — `regexp_extract(_all)` + HOF
  * `transform` — so parsing is map-only, codegen'd, and runs at scan
  * parallelism over any number of landed pages: no driver-side HTML
  * library, no UDF. Semantics mirror `read_html`'s common case:
  * FIRST `<table>` only, one output row per `<tr>`, one cell per
  * `<th>`/`<td>` with inner tags stripped, entities decoded,
  * whitespace trimmed.
  */
object HtmlTable {

  /** Inner HTML of the first `<table>` in the document ('' if none). */
  def firstTable(html: Column): Column =
    regexp_extract(html, "(?is)<table[^>]*>(.*?)</table>", 1)

  /** Decode the entity set that matters for table cells. */
  private def unescape(c: Column): Column = {
    val steps: Seq[Column => Column] = Seq(
      x => regexp_replace(x, "&nbsp;", " "),
      x => regexp_replace(x, "&lt;", "<"),
      x => regexp_replace(x, "&gt;", ">"),
      x => regexp_replace(x, "&quot;", "\""),
      x => regexp_replace(x, "&#39;", "'"),
      x => regexp_replace(x, "&amp;", "&")) // last: don't double-decode
    steps.foldLeft(c)((acc, f) => f(acc))
  }

  /** One array<string> of cleaned cell texts per `<tr>` of the first
    * table: `explode(tableRows(html))` is the dataframe-shaped
    * equivalent of `read_html(page)[0]`. Header rows come out like
    * any other row (cells from `<th>`); callers drop them by shape
    * (e.g. a non-numeric key cell), exactly as the reference's
    * positional `df[0]` access relies on pandas doing. */
  def tableRows(html: Column): Column =
    transform(
      regexp_extract_all(firstTable(html), lit("(?is)<tr[^>]*>(.*?)</tr>"), lit(1)),
      row => transform(
        regexp_extract_all(row, lit("(?is)<t[hd][^>]*>(.*?)</t[hd]>"), lit(1)),
        cell => trim(unescape(regexp_replace(cell, "(?s)<[^>]*>", "")))))
}
