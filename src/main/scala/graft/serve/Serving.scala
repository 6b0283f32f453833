package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §3.3 — the serving layer behind the reference's browser viewer.
  *
  * Every browser interaction is a fresh point-lookup query over the
  * partitioned gold layer (index.html:149-156): date slider → partition
  * lookup (P8), layer checkboxes → IN-list (P7), missing layer → existence
  * guard (P10). The HTML assembly itself (S8) is a thin template write from
  * the manifest — presentation, not computation.
  */
object Serving {

  /** P7 — layer selection by name (query string `?layers=a,b`,
    * DataDownloader_V2.py:39-42). */
  def selectLayers(gold: DataFrame, layers: Seq[String]): DataFrame =
    gold.filter(col("band").isin(layers: _*))

  /** P8 + P7 — the viewer's per-interaction query: one date partition ×
    * selected layers. On a partitionBy(month, band) layout this prunes to
    * exactly the touched directories. */
  def lookup(gold: DataFrame, month: String, layers: Seq[String]): DataFrame =
    selectLayers(gold.filter(col("month") === lit(month).cast("date")), layers)

  /** P10 — existence guard: skip-and-warn on missing layer
    * (DataDownloader_V1.py:87-88, 100-102). */
  def existingLayers(gold: DataFrame, requested: Seq[String]): Seq[String] = {
    val present = gold.select("band").distinct()
      .collect().map(_.getString(0)).toSet
    requested.filter(present.contains)
  }

  /** F13 — query-string parse (serving edge, index.html:169-176). */
  def parseQuery(qs: String): Map[String, String] =
    qs.stripPrefix("?").split("&").filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap

  /** S8 — HTML map-page sink: date slider + layer checkboxes over the
    * manifest, one overlay image per (month, band) render artifact. A
    * template write, driven entirely by the manifest DataFrame. */
  def writeViewer(manifest: DataFrame, assetDir: String, outPath: String): Unit = {
    val months = manifest.select("month").distinct().orderBy("month")
      .collect().map(_.get(0).toString)
    val bands = manifest.select("band").distinct().orderBy("band")
      .collect().map(_.getString(0))
    val html =
      s"""<!DOCTYPE html>
         |<html><head><meta charset="utf-8"><title>graft viewer</title></head>
         |<body>
         |<input type="range" id="date" min="0" max="${months.length - 1}"
         |       value="${months.length - 1}">
         |<span id="datelabel"></span>
         |<div id="layers">
         |${bands.map(b => s"""<label><input type="checkbox" value="$b" checked>$b</label>""").mkString("\n")}
         |</div>
         |<div id="map"></div>
         |<script>
         |const months = [${months.map(m => s"'$m'").mkString(",")}];
         |const slider = document.getElementById('date');
         |function render() {
         |  const m = months[slider.value];
         |  document.getElementById('datelabel').textContent = m;
         |  const sel = [...document.querySelectorAll('#layers input:checked')]
         |    .map(c => c.value);
         |  document.getElementById('map').innerHTML = sel.map(b =>
         |    `<img src="$assetDir/month=$${m}/band=$${b}/overlay.png"
         |          onerror="this.style.display='none'" alt="$${b}">`).join('');
         |}
         |slider.addEventListener('input', render);
         |document.getElementById('layers').addEventListener('change', render);
         |render();
         |</script></body></html>
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), html)
  }
}
