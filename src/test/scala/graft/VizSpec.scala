package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.exprlang.Formula
import graft.viz.{Fig, Figure, Plots}

/** Figure rendering (reference parser.go:1844-1997): validation
  * semantics, SVG structure, histogram normalization, the capped
  * DataFrame collect, and the expression-language wiring.
  */
class VizSpec extends SparkSuite {

  private def svgOf(f: Figure): String = f.renderSvg("t", "x", "y")

  test("plotXY validates line type, color, and lengths (parser.go:1862-1880)") {
    val f = new Figure
    val e1 = intercept[IllegalArgumentException] {
      f.plotXY(Array(1.0), Array(1.0), "dots", "red") }
    assert(e1.getMessage.contains("line type"))
    val e2 = intercept[IllegalArgumentException] {
      f.plotXY(Array(1.0), Array(1.0), "line", "mauve") }
    assert(e2.getMessage.contains("color"))
    val e3 = intercept[IllegalArgumentException] {
      f.plotXY(Array(1.0, 2.0), Array(1.0), "line", "red") }
    assert(e3.getMessage.contains("not same length"))
    // case-insensitive like the reference's ToLower
    f.plotXY(Array(1.0), Array(1.0), "Line", "RED")
    assert(f.traceCount === 1)
  }

  test("setPlotDim bounds are strict (parser.go:1976-1989)") {
    val f = new Figure
    intercept[IllegalArgumentException] { f.setDim(100, 500) }
    intercept[IllegalArgumentException] { f.setDim(2000, 500) }
    intercept[IllegalArgumentException] { f.setDim(500, 99) }
    f.setDim(101, 1999)
    assert(svgOf(f).contains("width=\"101\""))
  }

  test("line mode emits one polyline; markers mode emits circles") {
    val line = new Figure().plotLine(Array(1.0, 4.0, 2.0), "line", "blue")
    val svg = svgOf(line)
    assert(svg.contains("<polyline") && svg.contains("stroke=\"blue\""))
    assert(!svg.contains("<circle"))
    val marks = new Figure().plotXY(Array(1.0, 2.0, 3.0),
      Array(1.0, 4.0, 2.0), "markers", "green")
    val svg2 = svgOf(marks)
    assert(svg2.sliding(7).count(_ == "<circle") === 3)
    assert(!svg2.contains("<polyline"))
  }

  test("histogram norms: counts, percent, density (parser.go:1902-1944)") {
    val xs = Array.tabulate(64)(i => (i % 8).toDouble)
    val norms = Seq("counts", "percent", "density")
    norms.foreach { n =>
      val svg = svgOf(new Figure().histogram(xs, "black", n))
      // bars render as rects with the trace color
      assert(svg.contains("<rect") && svg.contains("fill=\"black\""), n)
    }
    intercept[IllegalArgumentException] {
      new Figure().histogram(xs, "black", "logdensity") }
  }

  test("render writes svg and html files; empty filename is a no-op show") {
    val dir = Files.createTempDirectory("graft_viz")
    val f = new Figure().plotLine(Array(1.0, 2.0, 3.0), "line", "red")
    val svgPath = dir.resolve("fig.svg").toString
    val htmlPath = dir.resolve("fig.html").toString
    f.render(svgPath, "Title & co", "xx", "yy")
    f.render(htmlPath, "Title", "xx", "yy")
    f.render("", "show-mode", "", "")
    val svg = new String(Files.readAllBytes(Paths.get(svgPath)))
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
    assert(svg.contains("Title &amp; co")) // escaped
    assert(svg.contains(">xx<") && svg.contains(">yy<"))
    val html = new String(Files.readAllBytes(Paths.get(htmlPath)))
    assert(html.startsWith("<!DOCTYPE html>") && html.contains("<svg"))
  }

  test("DataFrame bridge collects in seq order, capped with a clear error") {
    import spark.implicits._
    // order matters for a line trace: rows arrive shuffled, seq fixes it
    val df = Seq((2L, 20.0), (0L, 5.0), (1L, 10.0)).toDF("__seq", "v")
      .repartition(3)
    val f = new Figure().plotLine(df, col("v"), "line", "red",
      Seq(col("__seq")))
    val svg = svgOf(f)
    // y = 5,10,20 ascending with x = 1,2,3: the polyline's y pixels
    // must be strictly decreasing (SVG y grows downward)
    val pts = "points=\"([^\"]+)\"".r.findFirstMatchIn(svg).get.group(1)
      .split(" ").map(_.split(",")(1).toDouble)
    assert(pts.length === 3 && pts(0) > pts(1) && pts(1) > pts(2))

    val big = spark.range(Plots.MaxPoints + 1L).select(
      col("id").cast("double").as("v"))
    val e = intercept[IllegalArgumentException] {
      new Figure().plotLine(big, col("v"), "line", "red", Nil) }
    assert(e.getMessage.contains("aggregate first"))
  }

  test("expression language: newPlot/plotXY/render end-to-end (parser.go:1844-1997)") {
    val dir = Files.createTempDirectory("graft_viz_expr")
    val out = dir.resolve("expr.svg").toString
    val pipe = corpusPipe
    Formula.addToPipe(pipe, "p1", "newPlot()", Some("__seq"))
    Formula.addToPipe(pipe, "p2", "plotXY(c, D, 'line', 'red')", Some("__seq"))
    Formula.addToPipe(pipe, "p3", "histogram(D, 'blue', 'counts')", Some("__seq"))
    assert(Fig.get.traceCount === 2)
    val r = Formula.addToPipe(pipe,
      "p4", s"render('$out', 'fig', 'c', 'D')", Some("__seq"))
    // the expression's own value is 1 (reference NewRaw([]any{1}))
    assert(col1(r, "p4") === Seq(1.0, 1.0))
    val svg = new String(Files.readAllBytes(Paths.get(out)))
    assert(svg.contains("<polyline") && svg.contains("<rect"))
    Fig.newPlot()
    assert(Fig.get.traceCount === 0)
  }

  test("plot argument with a nested S-function registers on the probe " +
      "pass (regression: plotXY(c, D/max(D)) was IndexOutOfBounds)") {
    val pipe = corpusPipe
    Formula.addToPipe(pipe, "p1", "newPlot()", Some("__seq"))
    val r = Formula.addToPipe(pipe,
      "p2", "plotXY(c, D / max(D), 'line', 'red') + mean(D)", Some("__seq"))
    assert(Fig.get.traceCount === 1)
    // 1 (plot value) + 6.5 — the trailing mean must read its own slot
    assert(col1(r, "p2") === Seq(7.5, 7.5))
    Fig.newPlot()
  }
}
