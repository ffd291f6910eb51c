package graft

import java.nio.file.{Files, Paths}

/** The reference's end product: a self-contained HTML report with the
  * dataset overview, target distribution, correlation matrix,
  * per-feature histograms, model metrics, and feature importances
  * (/root/reference/main.py:444-485, served by api.py:103-109).
  *
  * The report renders `Pipeline.VizData` + `Pipeline.Result` — all
  * pre-aggregated, chart-sized frames (≤ a few hundred rows), so the
  * collects here are report-sized by construction; the heavy lifting
  * stayed distributed in the pipeline. Charts are inline SVG — no
  * external assets, the file opens anywhere.
  */
object Report {

  private def esc(s: String): String = s.replace("&", "&amp;")
    .replace("<", "&lt;").replace(">", "&gt;")

  private def fmt(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
    else f"$d%.4f"

  /** Horizontal SVG bar chart from (label, value) pairs. */
  private def barChart(data: Seq[(String, Double)], width: Int = 640): String = {
    if (data.isEmpty) return "<p>(no data)</p>"
    val barH = 22
    val gap = 4
    val labelW = 160
    val maxV = math.max(data.map(_._2).max, 1e-12)
    val h = data.size * (barH + gap)
    val bars = data.zipWithIndex.map { case ((label, v), i) =>
      val y = i * (barH + gap)
      val w = math.max(1.0, (width - labelW - 80) * v / maxV)
      s"""<text x="${labelW - 6}" y="${y + barH - 6}" text-anchor="end" font-size="12">${esc(label.take(22))}</text>""" +
        s"""<rect x="$labelW" y="$y" width="${fmt(w)}" height="$barH" fill="#4878a8"/>""" +
        s"""<text x="${labelW + w.toInt + 4}" y="${y + barH - 6}" font-size="12">${fmt(v)}</text>"""
    }.mkString
    s"""<svg width="$width" height="$h" xmlns="http://www.w3.org/2000/svg">$bars</svg>"""
  }

  /** Correlation matrix as a colored HTML table. */
  private def corrTable(rows: Seq[(String, String, Double)]): String = {
    if (rows.isEmpty) return "<p>(fewer than 2 numeric columns)</p>"
    val cols = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    val lookup = rows.flatMap { case (a, b, c) => Seq((a, b) -> c, (b, a) -> c) }.toMap
    def cell(a: String, b: String): String = {
      if (a == b) """<td style="background:#ddd">1.00</td>"""
      else lookup.get((a, b)).map { c =>
        val hue = if (c >= 0) 210 else 10
        val light = 95 - math.min(45, math.abs(c) * 45).toInt
        f"""<td style="background:hsl($hue%d,70%%,$light%d%%)">$c%.2f</td>"""
      }.getOrElse("<td></td>")
    }
    val head = cols.map(c => s"<th>${esc(c.take(14))}</th>").mkString
    val body = cols.map(a =>
      s"<tr><th>${esc(a.take(14))}</th>" + cols.map(b => cell(a, b)).mkString + "</tr>").mkString
    s"""<table class="corr"><tr><th></th>$head</tr>$body</table>"""
  }

  /** First-rows preview as an HTML table — the reference's
    * `df.head().to_html()` (main.py:416). The frame arrives already
    * `limit(5)`-bounded from `Pipeline.vizData`, so the collect here
    * is 5 rows by construction. */
  private def previewTable(df: org.apache.spark.sql.DataFrame): String = {
    val cols = df.columns.toSeq
    val rows = df.collect().toSeq
    if (rows.isEmpty) return "<p>(empty dataset)</p>"
    val head = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val body = rows.map { r =>
      "<tr>" + cols.indices.map { i =>
        val v = if (r.isNullAt(i)) "null" else r.get(i).toString
        s"<td>${esc(v.take(40))}</td>"
      }.mkString + "</tr>"
    }.mkString
    s"""<table class="preview"><tr>$head</tr>$body</table>"""
  }

  /** The reference's "AI Insights" paragraph (main.py:430-442 feeds
    * rows/cols/target/metrics to an external LLM, main.py:38-63, and
    * asks for a 5-sentence summary). graft is zero-egress, so this is
    * a DETERMINISTIC template over the same numeric inputs plus the
    * two aggregates the reader would ask about next (strongest
    * correlation, top feature importance) — same report surface, no
    * network; a caller with an LLM endpoint can swap this string for
    * a generated one without touching the rest of the report. */
  def insights(nRows: Long, nCols: Long,
      corr: Seq[(String, String, Double)],
      result: Option[Pipeline.Result]): String = {
    val shape = s"The dataset has $nRows rows and $nCols columns."
    val corrS = corr.sortBy(c => -math.abs(c._3)).headOption.map { case (a, b, c) =>
      val dir = if (c >= 0) "positively" else "negatively"
      f"The strongest linear relationship is between $a and $b, $dir correlated at $c%.3f."
    }
    val modelS = result.toSeq.flatMap { res =>
      val headline = res.metrics.toSeq.sortBy(_._1).headOption
        .map { case (k, v) => f"$k = $v%.4f" }.getOrElse("no held-out metric")
      Seq(
        s"The task was detected as ${res.task} and the best of ${res.modelMetrics.size} " +
          s"candidate models was ${res.bestModel} ($headline on held-out data).",
        res.featureImportances.headOption.map { case (f, v) =>
          f"$f carried the largest share of the model's predictive signal (importance $v%.3f)."
        }.getOrElse("No feature importances were produced."),
        s"${res.featureCols.size} columns were used as model features after cleaning.")
    }
    (Seq(shape) ++ corrS.toSeq ++ modelS).mkString(" ")
  }

  /** Render the full report as an HTML string. */
  def render(viz: Pipeline.VizData, result: Option[Pipeline.Result],
      title: String = "graft report"): String = {
    val ov = viz.overview.head()
    val (nRows, nCols) = (ov.getLong(0), ov.getLong(1))

    val distCols = viz.targetDistribution.columns.toSeq
    val dist =
      if (distCols.contains("value"))
        viz.targetDistribution.collect().toSeq
          .map(r => r.getString(0) -> r.getLong(1).toDouble)
      else // histogram form (bucket, n)
        viz.targetDistribution.collect().toSeq
          .map(r => s"bucket ${r.getLong(0)}" -> r.getLong(1).toDouble)

    val corr = viz.corrMatrix.collect().toSeq
      .filter(!_.isNullAt(2)) // zero-variance pairs have no defined corr
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))

    val histSection = {
      // Driver-side collect is bounded by construction: VizData caps
      // histograms at 5 numeric columns × the fixed bin count (m8's
      // B), so this is O(columns·bins) rows — never O(data).
      val all = viz.histograms.collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      all.groupBy(_._1).toSeq.sortBy(_._1).map { case (c, rows) =>
        s"<h3>${esc(c)}</h3>" + barChart(
          rows.sortBy(_._2).map { case (_, b, n) => (s"b$b", n.toDouble) })
      }.mkString
    }

    val modelSection = result.map { res =>
      val metricRows = res.metrics.toSeq.sortBy(_._1)
        .map { case (k, v) => s"<tr><td>${esc(k)}</td><td>${fmt(v)}</td></tr>" }.mkString
      val perModel = res.modelMetrics.toSeq.sortBy(_._1).map { case (name, ms) =>
        s"<tr><td>${esc(name)}${if (name == res.bestModel) " ★" else ""}</td>" +
          s"<td>${ms.toSeq.sortBy(_._1).map { case (k, v) => s"${esc(k)}=${fmt(v)}" }.mkString(", ")}</td></tr>"
      }.mkString
      s"""<h2 id="metrics">Model metrics</h2>
         |<p>task: <b>${esc(res.task)}</b>, best model: <b>${esc(res.bestModel)}</b></p>
         |<table><tr><th>metric</th><th>value</th></tr>$metricRows</table>
         |<h3>All candidates</h3>
         |<table><tr><th>model</th><th>held-out metrics</th></tr>$perModel</table>
         |<h2 id="importances">Feature importances</h2>
         |${barChart(res.featureImportances.take(15).map { case (n, v) => (n, v) })}
         |""".stripMargin
    }.getOrElse("")

    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title>
       |<style>
       |body { font-family: sans-serif; margin: 2em auto; max-width: 860px; color: #222; }
       |table { border-collapse: collapse; } td, th { border: 1px solid #bbb; padding: 4px 8px; font-size: 13px; }
       |.corr td { text-align: center; min-width: 44px; }
       |h2 { border-bottom: 2px solid #4878a8; padding-bottom: 4px; }
       |</style></head><body>
       |<h1>${esc(title)}</h1>
       |<h2 id="overview">Dataset overview</h2>
       |<p>$nRows rows × $nCols columns</p>
       |<h2 id="insights">Insights</h2>
       |<p>${esc(insights(nRows, nCols, corr, result))}</p>
       |<h2 id="preview">Data preview</h2>
       |${previewTable(viz.preview)}
       |<h2 id="distribution">Target distribution</h2>
       |${barChart(dist)}
       |<h2 id="correlation">Correlation matrix</h2>
       |${corrTable(corr)}
       |<h2 id="histograms">Feature histograms</h2>
       |$histSection
       |$modelSection
       |</body></html>""".stripMargin
  }

  /** Render and write to `path`; returns the path. */
  def save(viz: Pipeline.VizData, result: Option[Pipeline.Result],
      path: String, title: String = "graft report"): String = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), render(viz, result, title))
    path
  }
}
