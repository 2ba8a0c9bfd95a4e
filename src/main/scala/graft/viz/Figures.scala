package graft.viz

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Figure rendering — the reference's plot surface
  * (parser.go:1844-1997: newPlot/plotXY/plotLine/histogram/render/
  * setPlotDim) re-expressed without a plotting dependency: traces
  * accumulate on a [[Figure]] and `render` emits a deterministic,
  * self-contained SVG (optionally wrapped in HTML).
  *
  * Scale shape: a plot is inherently a driver-side artifact — the
  * reference also collects the column into process memory before
  * handing it to plotly. The distributed part of plotting at 100 TB
  * is the AGGREGATION that reduces the data to something plottable
  * (`Stats.histogram` / `Stats.decile` / `Stats.segment`, all
  * grouped-agg shaped); the collect here is capped ([[Plots.MaxPoints]])
  * with an error directing users to aggregate first.
  *
  * Validation matches the reference exactly: line type ∈
  * {line, markers} (parser.go:1867-1869), color ∈ {black, red, blue,
  * green, yellow} (parser.go:57), histogram norm ∈ {counts, percent,
  * density} (parser.go:1902), plot dims strictly inside (100, 2000)
  * (parser.go:1976-1994). Divergence (documented): `render("")` in
  * the reference opens a browser; headless here it builds the SVG and
  * discards it.
  */
sealed trait Trace

/** One scatter/line trace (parser.go:1862-1900). */
final case class ScatterTrace(xs: Array[Double], ys: Array[Double],
    mode: String, color: String) extends Trace

/** One histogram trace (parser.go:1902-1944); bins resolve at render
  * time from the data (Sturges) with `norm` ∈ counts/percent/density.
  */
final case class HistTrace(xs: Array[Double], color: String,
    norm: String) extends Trace

object Plots {
  val Colors: Set[String] = Set("black", "red", "blue", "green", "yellow")
  val Modes: Set[String] = Set("line", "markers")
  val Norms: Set[String] = Set("counts", "percent", "density")

  /** Driver-collect cap for plot data; beyond this, aggregate first
    * (Stats.histogram/decile/segment) — a raw scatter of more points
    * is unreadable anyway.
    */
  val MaxPoints: Int = 1 << 20

  private[viz] def requireIn(v: String, allowed: Set[String],
      what: String): String = {
    val s = v.toLowerCase(Locale.ROOT)
    if (!allowed.contains(s)) throw new IllegalArgumentException(
      s"$what must be one of ${allowed.toSeq.sorted.mkString(", ")}, got '$v'")
    s
  }

  /** Collect one or two numeric columns in `order` with the plot cap.
    * One pass: limit to MaxPoints+1 and error if the cap is hit, so a
    * runaway frame fails fast instead of OOMing the driver.
    */
  private[graft] def collectXY(df: DataFrame, x: Option[Column],
      y: Column, order: Seq[Column]): (Array[Double], Array[Double]) = {
    val base = df.select(
      (x.map(_.cast("double").as("__px")).toSeq :+
        y.cast("double").as("__py")) ++
        order.zipWithIndex.map { case (c, i) => c.as(s"__po$i") }: _*)
    val sorted = if (order.nonEmpty)
      base.orderBy(order.indices.map(i => col(s"__po$i")): _*) else base
    val rows = sorted.limit(MaxPoints + 1).collect()
    if (rows.length > MaxPoints) throw new IllegalArgumentException(
      s"plot data exceeds $MaxPoints points; aggregate first " +
        "(Stats.histogram / Stats.decile / Stats.segment)")
    val ys = rows.map(r => r.getDouble(if (x.isDefined) 1 else 0))
    val xs = x match {
      case Some(_) => rows.map(_.getDouble(0))
      case None => Array.tabulate(rows.length)(i => (i + 1).toDouble)
    }
    (xs, ys)
  }
}

/** A mutable figure builder (the reference keeps one package-global
  * `fig` set by newPlot; [[Fig]] mirrors that for the expression
  * language, but the builder itself is instance-scoped so library
  * users can hold several).
  */
final class Figure {
  import Plots._

  private var traces: List[Trace] = Nil
  private var width: Double = 1200.0 // parser.go:28-29 defaults
  private var height: Double = 1200.0

  def setDim(w: Double, h: Double): this.type = {
    // strictly inside (100, 2000), matching parser.go:1976-1989
    if (w <= 100 || w >= 2000) throw new IllegalArgumentException(
      s"plot width must be between 100 & 2000, got $w")
    if (h <= 100 || h >= 2000) throw new IllegalArgumentException(
      s"plot height must be between 100 & 2000, got $h")
    width = w; height = h; this
  }

  def plotXY(xs: Array[Double], ys: Array[Double], lineType: String,
      color: String): this.type = {
    if (xs.length != ys.length) throw new IllegalArgumentException(
      s"plotXY slices not same length: ${xs.length}, ${ys.length}")
    val m = requireIn(lineType, Modes, "line type")
    val c = requireIn(color, Colors, "color")
    traces = ScatterTrace(xs, ys, m, c) :: traces; this
  }

  /** y against 1..n (parser.go:1852-1860). */
  def plotLine(ys: Array[Double], lineType: String, color: String): this.type =
    plotXY(Array.tabulate(ys.length)(i => (i + 1).toDouble), ys,
      lineType, color)

  def histogram(xs: Array[Double], color: String, norm: String): this.type = {
    val c = requireIn(color, Colors, "color")
    val n = requireIn(norm, Norms, "histogram norm")
    traces = HistTrace(xs, c, n) :: traces; this
  }

  /** DataFrame bridges: capped ordered collect, then the array form. */
  def plotXY(df: DataFrame, x: Column, y: Column, lineType: String,
      color: String, order: Seq[Column] = Nil): this.type = {
    val (xs, ys) = collectXY(df, Some(x), y, order)
    plotXY(xs, ys, lineType, color)
  }
  def plotLine(df: DataFrame, y: Column, lineType: String,
      color: String, order: Seq[Column]): this.type = {
    val (_, ys) = collectXY(df, None, y, order)
    plotLine(ys, lineType, color)
  }
  def histogram(df: DataFrame, x: Column, color: String,
      norm: String): this.type = {
    val (_, xs) = collectXY(df, None, x, Nil)
    histogram(xs, color, norm)
  }

  def traceCount: Int = traces.length

  private def fmt(v: Double): String = "%.2f".formatLocal(Locale.ROOT, v)
  private def lbl(v: Double): String = "%.4g".formatLocal(Locale.ROOT, v)

  /** Nice tick positions: step 1/2/5 × 10^k covering [lo, hi]. */
  private def ticks(lo: Double, hi: Double): Seq[Double] = {
    val span = math.max(hi - lo, 1e-12)
    val raw = span / 5.0
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val step = (raw / mag) match {
      case r if r < 1.5 => mag
      case r if r < 3.5 => 2 * mag
      case r if r < 7.5 => 5 * mag
      case _ => 10 * mag
    }
    val first = math.ceil(lo / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ <= hi + 1e-9 * span).toSeq
  }

  /** Resolve histogram traces to bars (Sturges bins over [min,max]). */
  private def histBars(t: HistTrace): Seq[(Double, Double, Double)] = {
    if (t.xs.isEmpty) return Nil
    val (mn, mx) = (t.xs.min, t.xs.max)
    val nb = math.max(1,
      math.ceil(math.log(math.max(t.xs.length, 2)) / math.log(2)).toInt + 1)
    val w = if (mx > mn) (mx - mn) / nb else 1.0
    val counts = new Array[Long](nb)
    t.xs.foreach { v =>
      val b = math.min(nb - 1, math.max(0, ((v - mn) / w).toInt))
      counts(b) += 1
    }
    val n = t.xs.length.toDouble
    counts.toSeq.zipWithIndex.map { case (c, i) =>
      val h = t.norm match {
        case "percent" => 100.0 * c / n
        case "density" => c / (n * w)
        case _ => c.toDouble
      }
      (mn + i * w, w, h)
    }
  }

  /** Deterministic standalone SVG. */
  def renderSvg(title: String, xlab: String, ylab: String): String = {
    val ts = traces.reverse
    val bars = ts.collect { case h: HistTrace => (h, histBars(h)) }
    val scatterXs = ts.collect { case s: ScatterTrace => s.xs }.flatten
    val scatterYs = ts.collect { case s: ScatterTrace => s.ys }.flatten
    val allX = scatterXs ++ bars.flatMap(_._2.flatMap(b => Seq(b._1, b._1 + b._2)))
    val allY = (scatterYs ++ bars.flatMap(_._2.map(_._3))) ++
      (if (bars.nonEmpty) Seq(0.0) else Nil)
    val (x0, x1) = pad(rangeOf(allX))
    val (y0, y1) = pad(rangeOf(allY))
    val (ml, mr, mt, mb) = (70.0, 30.0, 50.0, 60.0)
    val (pw, ph) = (width - ml - mr, height - mt - mb)
    def sx(v: Double) = ml + (v - x0) / (x1 - x0) * pw
    def sy(v: Double) = mt + ph - (v - y0) / (y1 - y0) * ph

    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${width.toInt}" height="${height.toInt}" viewBox="0 0 ${width.toInt} ${height.toInt}">"""
    sb ++= s"""<rect width="${width.toInt}" height="${height.toInt}" fill="white"/>"""
    // axes
    sb ++= s"""<line x1="${fmt(ml)}" y1="${fmt(mt + ph)}" x2="${fmt(ml + pw)}" y2="${fmt(mt + ph)}" stroke="black"/>"""
    sb ++= s"""<line x1="${fmt(ml)}" y1="${fmt(mt)}" x2="${fmt(ml)}" y2="${fmt(mt + ph)}" stroke="black"/>"""
    ticks(x0, x1).foreach { t =>
      sb ++= s"""<line x1="${fmt(sx(t))}" y1="${fmt(mt + ph)}" x2="${fmt(sx(t))}" y2="${fmt(mt + ph + 5)}" stroke="black"/>"""
      sb ++= s"""<text x="${fmt(sx(t))}" y="${fmt(mt + ph + 20)}" font-size="12" text-anchor="middle">${lbl(t)}</text>"""
    }
    ticks(y0, y1).foreach { t =>
      sb ++= s"""<line x1="${fmt(ml - 5)}" y1="${fmt(sy(t))}" x2="${fmt(ml)}" y2="${fmt(sy(t))}" stroke="black"/>"""
      sb ++= s"""<text x="${fmt(ml - 8)}" y="${fmt(sy(t) + 4)}" font-size="12" text-anchor="end">${lbl(t)}</text>"""
    }
    // traces (insertion order)
    ts.foreach {
      case h: HistTrace =>
        histBars(h).foreach { case (bx, bw, bh) =>
          sb ++= s"""<rect x="${fmt(sx(bx))}" y="${fmt(sy(bh))}" width="${fmt(sx(bx + bw) - sx(bx))}" height="${fmt(sy(0) - sy(bh))}" fill="${h.color}" fill-opacity="0.7" stroke="white"/>"""
        }
      case s: ScatterTrace if s.mode == "markers" =>
        s.xs.indices.foreach { i =>
          sb ++= s"""<circle cx="${fmt(sx(s.xs(i)))}" cy="${fmt(sy(s.ys(i)))}" r="3" fill="${s.color}"/>"""
        }
      case s: ScatterTrace =>
        val pts = s.xs.indices
          .map(i => s"${fmt(sx(s.xs(i)))},${fmt(sy(s.ys(i)))}").mkString(" ")
        sb ++= s"""<polyline points="$pts" fill="none" stroke="${s.color}" stroke-width="1.5"/>"""
    }
    // labels
    if (title.nonEmpty) sb ++= s"""<text x="${fmt(width / 2)}" y="${fmt(mt - 20)}" font-size="16" text-anchor="middle">${esc(title)}</text>"""
    if (xlab.nonEmpty) sb ++= s"""<text x="${fmt(ml + pw / 2)}" y="${fmt(height - 15)}" font-size="13" text-anchor="middle">${esc(xlab)}</text>"""
    if (ylab.nonEmpty) sb ++= s"""<text x="20" y="${fmt(mt + ph / 2)}" font-size="13" text-anchor="middle" transform="rotate(-90 20 ${fmt(mt + ph / 2)})">${esc(ylab)}</text>"""
    sb ++= "</svg>"
    sb.toString
  }

  /** parser.go:1946-1974: empty fileName = "show" (a browser in the
    * reference; headless here the SVG is built and discarded).
    * `.html` wraps the SVG; anything else writes raw SVG.
    */
  def render(fileName: String, title: String, xlab: String,
      ylab: String): Unit = {
    val svg = renderSvg(title, xlab, ylab)
    if (fileName.isEmpty) return
    val out = if (fileName.toLowerCase(Locale.ROOT).endsWith(".html"))
      s"<!DOCTYPE html><html><head><title>${esc(title)}</title></head><body>$svg</body></html>"
    else svg
    val p = Paths.get(fileName)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, out.getBytes(StandardCharsets.UTF_8))
  }

  private def esc(s: String): String = s.replace("&", "&amp;")
    .replace("<", "&lt;").replace(">", "&gt;")
  private def rangeOf(vs: Seq[Double]): (Double, Double) =
    if (vs.isEmpty) (0.0, 1.0) else (vs.min, vs.max)
  private def pad(r: (Double, Double)): (Double, Double) = {
    val (lo, hi) = r
    if (hi > lo) { val p = (hi - lo) * 0.05; (lo - p, hi + p) }
    else (lo - 1.0, hi + 1.0)
  }
}

/** The expression language's figure state — one current figure, reset
  * by newPlot (mirrors the reference's package-global `fig`,
  * parser.go:38,1845-1850). Synchronized: formula compilation may run
  * from parallel test suites.
  */
object Fig {
  private var current: Figure = new Figure

  def newPlot(): Figure = synchronized { current = new Figure; current }
  def get: Figure = synchronized { current }
}
