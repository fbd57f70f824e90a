package graft.ingest

/** Name sanitization (SURVEY.md §1.4) — the reference treats identifier
  * rewriting as a load-bearing transformation applied to every column and
  * table name at ingestion.
  *
  * Semantics reproduced from `helper_utils.py`:
  *  - `replace_in_string` (`helper_utils.py:27-36`): any character outside
  *    `[a-zA-Z0-9_]` → `_`, then ONE non-overlapping left-to-right pass
  *    collapsing `__` → `_`. The single pass is a documented quirk
  *    (SURVEY.md §7 risk 5): `a___b` → `a__b`, NOT `a_b`. Pinned in tests;
  *    do not "fix".
  *  - `get_file_name` (`helper_utils.py:52-66`): basename minus extension
  *    (only when the last '.' comes after the last '/'), then sanitized.
  *  - `get_file_type` (`helper_utils.py:68-80`): extension of the basename,
  *    or "".
  *  - `preprocess_file` column variant (`helper_utils.py:83-95`): strip,
  *    `' '`→`_`, `'-'`→`_`, then one `__`→`_` pass (note: does NOT touch
  *    other punctuation — a deliberately different, weaker rule than
  *    `replace_in_string`).
  */
object Sanitize {

  /** `replace_in_string`: full sanitization used by the Spark ingestion path. */
  def replaceInString(value: String): String =
    collapseOnce(value.replaceAll("[^a-zA-Z0-9_]", "_"))

  /** One non-overlapping left-to-right `__`→`_` pass (Python `str.replace`
    * == Java `String.replace` semantics — both single-pass, non-recursive).
    */
  private def collapseOnce(s: String): String = s.replace("__", "_")

  /** `get_file_name`: table name from a file path. */
  def fileName(filePath: String): String = {
    val lastSlash = filePath.lastIndexOf('/')
    val lastPeriod = filePath.lastIndexOf('.')
    val name =
      if (lastSlash < lastPeriod) filePath.substring(lastSlash + 1, lastPeriod)
      else filePath.substring(lastSlash + 1)
    replaceInString(name)
  }

  /** `get_file_type`: lowercase-preserving extension of the basename, or "". */
  def fileType(filePath: String): String = {
    val base = filePath.substring(filePath.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot >= 0) base.substring(dot + 1) else ""
  }

  /** `preprocess_file` header rule (pandas/MySQL path): strip + space/dash
    * to underscore + one collapse pass. Kept distinct from
    * [[replaceInString]] on purpose — the reference has two rules.
    */
  def preprocessHeader(col: String): String =
    collapseOnce(col.trim.replace(' ', '_').replace('-', '_'))
}
