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

  /** S8 — HTML map-page sink at capability parity with the reference
    * viewer (index.html:130-333): a Leaflet map over an OSM tile basemap,
    * one `L.imageOverlay` per selected (month, band) render artifact with
    * an opacity control, an optional inlined GeoJSON point layer with
    * per-feature property tooltips, and query-string-driven state
    * (`?layers=a,b&start_date=...`) so every interaction reloads as a
    * fresh serving query — the reference's exact interaction model. The
    * page is assembled from the manifest DataFrame; Leaflet loads from its
    * public CDN.
    *
    * `bounds` = ((south, west), (north, east)) image-overlay extent;
    * `geojson` = a FeatureCollection document to inline (e.g. the S7
    * fixture file's text). */
  def writeViewer(manifest: DataFrame, assetDir: String, outPath: String,
                  center: (Double, Double) = (28.6139, 77.209),
                  bounds: ((Double, Double), (Double, Double)) =
                    ((28.2, 76.85), (29.0, 77.65)),
                  overlayOpacity: Double = 0.7,
                  geojson: Option[String] = None): Unit = {
    val months = manifest.select("month").distinct().orderBy("month")
      .collect().map(_.get(0).toString)
    val bands = manifest.select("band").distinct().orderBy("band")
      .collect().map(_.getString(0))
    // the GeoJSON point layer behaves like any other layer: it gets a
    // checkbox (reference: 'Power Plants', index.html:140) and is on by
    // default
    val layerNames = bands ++ (if (geojson.isDefined) Seq("powerplants") else Nil)
    val ((s, w), (n, e)) = bounds
    // untrusted-content hygiene: the GeoJSON document is inlined as a JS
    // STRING literal (escaped, `<` as < so `</script>` can't break
    // out) and parsed with JSON.parse; feature property keys/values are
    // HTML-escaped before tooltip interpolation — feature data can render
    // text but never inject markup or script
    def jsStr(v: String): String = "\"" + v.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '<' => "\\u003c"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val geojsonBlock = geojson.map { gj =>
      s"""const escHtml = v => String(v).replace(/&/g, '&amp;')
         |  .replace(/</g, '&lt;').replace(/>/g, '&gt;').replace(/"/g, '&quot;');
         |const plantLayer = L.geoJSON(JSON.parse(${jsStr(gj)}), {
         |  pointToLayer: (f, ll) => L.circleMarker(ll, {radius: 6, color: '#c00'}),
         |  onEachFeature: (f, layer) => {
         |    const p = f.properties || {};
         |    const rows = Object.keys(p).map(k =>
         |      `<tr><th>$${escHtml(k)}</th><td>$${escHtml(p[k])}</td></tr>`).join('');
         |    layer.bindTooltip(`<table>$${rows}</table>`, {sticky: true});
         |  }
         |});
         |if (sel.includes('powerplants')) plantLayer.addTo(map);
         |""".stripMargin
    }.getOrElse("")
    val html =
      s"""<!DOCTYPE html>
         |<html><head><meta charset="utf-8"><title>graft viewer</title>
         |<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
         |<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
         |<style>#map{height:80vh} .controls{display:flex;gap:2rem;align-items:center}</style>
         |</head><body>
         |<div class="controls">
         |<div id="layers">
         |${layerNames.map(b => s"""<label><input type="checkbox" class="layer-checkbox" value="$b" checked>$b</label>""").mkString("\n")}
         |</div>
         |<label>date <input type="range" id="date" min="0" max="${months.length - 1}"
         |       value="${months.length - 1}"> <span id="datelabel"></span></label>
         |<label>opacity <input type="range" id="opacity" min="0" max="100"
         |       value="${(overlayOpacity * 100).round}"></label>
         |</div>
         |<div id="map"></div>
         |<script>
         |const months = [${months.map(m => s"'$m'").mkString(",")}];
         |// query-string state (?layers=a,b&start_date=...) -- same reload
         |// model as the reference; Serving.parseQuery is the server twin
         |const params = new URLSearchParams(window.location.search);
         |// absent param -> default all; PRESENT-but-empty -> genuinely none
         |// (''.split(',') is [''], so filter the empty token out)
         |const sel = params.has('layers')
         |  ? params.get('layers').split(',').filter(x => x)
         |  : '${layerNames.mkString(",")}'.split(',');
         |const startDate = params.get('start_date');
         |const slider = document.getElementById('date');
         |if (startDate && months.indexOf(startDate) >= 0)
         |  slider.value = months.indexOf(startDate);
         |document.getElementById('datelabel').textContent = months[slider.value];
         |document.querySelectorAll('.layer-checkbox').forEach(cb => {
         |  cb.checked = sel.includes(cb.value);
         |});
         |function reload() {
         |  const layers = [...document.querySelectorAll('.layer-checkbox:checked')]
         |    .map(c => c.value).join(',');
         |  const url = new URL(window.location.href);
         |  url.searchParams.set('layers', layers);
         |  url.searchParams.set('start_date', months[slider.value]);
         |  window.location.href = url.toString();
         |}
         |slider.addEventListener('change', reload);
         |document.getElementById('layers').addEventListener('change', reload);
         |
         |const map = L.map('map', {center: [${center._1}, ${center._2}], zoom: 10});
         |L.tileLayer('https://tile.openstreetmap.org/{z}/{x}/{y}.png', {
         |  maxZoom: 19,
         |  attribution: '&copy; <a href="https://www.openstreetmap.org/copyright">OpenStreetMap</a> contributors'
         |}).addTo(map);
         |const bounds = [[$s, $w], [$n, $e]];
         |const overlays = [];
         |const m = months[slider.value];
         |sel.filter(b => b !== 'powerplants').forEach(b => {
         |  const ov = L.imageOverlay(`$assetDir/month=$${m}/band=$${b}/overlay.png`,
         |    bounds, {opacity: ${overlayOpacity}});
         |  // P10 existence guard at the browser edge: missing artifact
         |  // -> drop the overlay instead of a broken image
         |  ov.on('error', () => map.removeLayer(ov));
         |  ov.addTo(map);
         |  overlays.push(ov);
         |});
         |document.getElementById('opacity').addEventListener('input', ev => {
         |  overlays.forEach(o => o.setOpacity(ev.target.value / 100));
         |});
         |$geojsonBlock
         |</script></body></html>
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), html)
  }
}
