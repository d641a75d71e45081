package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}

/** S4 — pandas-render CSV sink: writes a DataFrame exactly as
  * `DataFrame.to_csv(index=False)` renders it (the reference sinks
  * every stage this way — `scrape_cia.py:86-87`,
  * `preprocess_upload_neo4j.py:459-462`), so a user can export e.g.
  * `trade_partners.csv` byte-compatibly:
  *
  *  - doubles use Python `repr` semantics: the SHORTEST decimal that
  *    round-trips (`2021.0`, `107968280000.00002`), switching to
  *    scientific only below 1e-4 or at/above 1e16 (`3.8e-05`, `1e+16`)
  *    — NOT Java's `Double.toString` (which would emit `2.021E3`);
  *  - NaN / null render as the empty cell (pandas `na_rep=''`);
  *  - strings quote minimally (`csv.QUOTE_MINIMAL`): only when the
  *    value contains a comma, quote, CR or LF, with `"` doubled
  *    (`"Korea, South"`);
  *  - int/long columns render as plain integers (pandas int64);
  *  - rows separated by `\n`, trailing newline, header row first.
  *
  * Scale: `lines` is a per-row map (no shuffle) — at cluster scale
  * write it with the text sink, one part-file per partition; the
  * single-file writers below are for golden-diff-sized exports.
  */
object PandasCsv {

  /** Python `repr(float)`: probe precisions 0..16 for the shortest
    * `%.*e` form that round-trips, then format positionally for
    * exponents in [-4, 16) and scientifically outside. */
  def pyFloat(x: Double): String = {
    if (x.isNaN) return ""
    if (x == Double.PositiveInfinity) return "inf"
    if (x == Double.NegativeInfinity) return "-inf"
    if (x == 0.0) return if (1 / x < 0) "-0.0" else "0.0"
    var p = 0
    var probe = ""
    while ({
      probe = String.format(java.util.Locale.ROOT, s"%.${p}e", Double.box(x))
      probe.toDouble != x && p < 17
    }) p += 1
    val Array(mant, expStr) = probe.split("e")
    val e10 = expStr.toInt
    val digits = mant.replace("-", "").replace(".", "")
    val body =
      if (e10 >= 16 || e10 < -4) {
        val m = if (digits.length == 1) digits else digits.head + "." + digits.tail
        val sign = if (e10 < 0) "-" else "+"
        val ea = math.abs(e10)
        val es = if (ea < 10) s"0$ea" else ea.toString
        s"${m}e$sign$es"
      } else if (e10 >= digits.length - 1) {
        digits + "0" * (e10 - (digits.length - 1)) + ".0"
      } else if (e10 >= 0) {
        digits.take(e10 + 1) + "." + digits.drop(e10 + 1)
      } else {
        "0." + "0" * (-e10 - 1) + digits
      }
    if (x < 0) "-" + body else body
  }

  /** csv.QUOTE_MINIMAL */
  def quoteMinimal(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  def renderValue(v: Any): String = v match {
    case null => ""
    case d: Double => pyFloat(d)
    case f: Float => pyFloat(f.toDouble)
    case s: String => quoteMinimal(s)
    case b: java.lang.Boolean => if (b) "True" else "False"
    case n: java.lang.Number => n.toString // int/long/short/byte
    case other => quoteMinimal(other.toString)
  }

  def renderRow(row: Row): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < row.length) {
      if (i > 0) sb.append(',')
      sb.append(renderValue(if (row.isNullAt(i)) null else row.get(i)))
      i += 1
    }
    sb.toString
  }

  def headerLine(df: DataFrame): String =
    df.columns.map(quoteMinimal).mkString(",")

  /** Distributed render: one output line per row, no shuffle. */
  def lines(df: DataFrame): Dataset[String] =
    df.map(renderRow _)(Encoders.STRING)

  /** Single local file (golden-diff-sized exports): header + rows in
    * the DataFrame's current order, trailing newline. */
  def writeLocal(df: DataFrame, path: String): Unit = {
    val sb = new StringBuilder
    sb.append(headerLine(df)).append('\n')
    val it = df.toLocalIterator()
    while (it.hasNext) sb.append(renderRow(it.next())).append('\n')
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Render to one in-memory string (tests / small exports). */
  def renderAll(df: DataFrame): String = {
    val sb = new StringBuilder
    sb.append(headerLine(df)).append('\n')
    df.collect().foreach(r => sb.append(renderRow(r)).append('\n'))
    sb.toString
  }
}
