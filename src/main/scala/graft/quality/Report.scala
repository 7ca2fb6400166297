package graft.quality

import org.apache.spark.sql.DataFrame

/** Rendered data-quality report — the engine-side equivalent of the
  * reference's `edr report` HTML dashboard (elementary renders the
  * monitoring tables it maintains in the warehouse; the dbt profile
  * wires it at /root/reference/dbt/profiles.yml:14-24). The inputs
  * here are the same already-gated monitoring queries (`dq_summary`,
  * `dq_column_anomalies`, `dq_history_anomalies`, schema drift), each
  * one-row-per-check/column sized, so the driver-side render is
  * kilobyte work — the distributed part is the checks themselves.
  *
  * Zero dependencies: a self-contained HTML string (inline CSS, all
  * cell values escaped), written through the Hadoop filesystem so the
  * report can land next to the data it describes.
  */
object Report {

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }

  private def cell(v: Any): String = v match {
    case null => """<td class="null">null</td>"""
    case x    => s"<td>${esc(x.toString)}</td>"
  }

  /** One monitoring table → an HTML section. Rows are collected — every
    * report input is a per-check / per-column / per-run summary, already
    * aggregated by the distributed query that produced it.
    */
  def section(title: String, df: DataFrame, maxRows: Int = 1000): String = {
    val cols = df.columns
    val rows = df.limit(maxRows + 1).collect()
    val truncated = rows.length > maxRows
    val body = rows.take(maxRows).map { r =>
      // fail-marking is best-effort: a non-numeric `violations` column
      // in a user-supplied table renders unmarked, never crashes.
      // Numeric types compare directly; strings go through toDouble
      // (with separators stripped) so "2.0" or "1,204" still mark.
      val failing = cols.contains("violations") &&
        Option(r.getAs[Any]("violations")).exists {
          case n: Number => n.doubleValue() > 0
          case v => scala.util.Try(
            v.toString.trim.replaceAll("[,_ ]", "").toDouble > 0)
            .getOrElse(false)
        }
      val cls = if (failing) """ class="fail"""" else ""
      s"<tr$cls>" + cols.map(c => cell(r.getAs[Any](c))).mkString + "</tr>"
    }.mkString("\n")
    // plain concatenation, NOT an interpolated stripMargin template: a
    // cell value containing "\n  |..." (multi-line text with a
    // pipe-prefixed continuation) would have its margin stripped
    // INSIDE the data — stripMargin must never run over interpolated
    // content
    Seq(
      s"<section><h2>${esc(title)}</h2>",
      s"<table><thead><tr>${cols.map(c => s"<th>${esc(c)}</th>").mkString}</tr></thead>",
      s"<tbody>$body</tbody></table>",
      if (truncated) s"<p class=\"trunc\">first $maxRows rows shown</p>" else "",
      "</section>").mkString("\n")
  }

  /** Assemble named monitoring tables into one self-contained page. */
  def render(title: String, tables: Seq[(String, DataFrame)]): String = {
    val style =
      """body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}
        |th,td{border:1px solid #ccc;padding:4px 8px;text-align:left}
        |tr.fail{background:#fdd}td.null{color:#999;font-style:italic}
        |p.trunc{color:#666;font-size:smaller}""".stripMargin
    // same no-stripMargin-over-data rule as [[section]] (the style
    // template above is static, so ITS stripMargin is safe)
    Seq(
      "<!DOCTYPE html><html><head><meta charset=\"utf-8\">",
      s"<title>${esc(title)}</title><style>$style</style></head>",
      s"<body><h1>${esc(title)}</h1>",
      tables.map { case (t, df) => section(t, df) }.mkString("\n"),
      "</body></html>").mkString("\n")
  }

  /** Render and write to `path` (any Hadoop-visible filesystem). */
  def write(spark: org.apache.spark.sql.SparkSession, path: String,
      title: String, tables: Seq[(String, DataFrame)]): Unit = {
    val html = render(title, tables)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
