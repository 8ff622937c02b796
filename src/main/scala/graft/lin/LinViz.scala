package graft.lin

/** Minimal static rendering of an operation history as an HTML/SVG
  * timeline — the spirit of porcupine's failure visualization
  * (/root/reference/src/porcupine/visualization.go, which emits an
  * interactive page; this emits a self-contained static SVG sized for
  * debugging a single key's failed check).
  *
  * One horizontal bar per operation spanning [call, ret], one row per
  * concurrent lane (greedy interval coloring), labeled `op(value) -> out`;
  * the whole page is headed with the verdict. Pure string building — no
  * Spark types, usable from a driver debugging session:
  *
  * {{{
  *   val html = LinViz.render("k", history, Linearizability.checkKeyVerdict(history))
  *   java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/lin.html"), html.getBytes)
  * }}}
  */
object LinViz {

  private val opNames = Map(0 -> "get", 1 -> "put", 2 -> "append")

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  /** Render one key's history. Bars are laid into lanes greedily so
    * overlapping (concurrent) ops are vertically stacked. */
  def render(key: String, history: Seq[HistOp],
             verdict: Linearizability.Verdict): String = {
    val ops = history.sortBy(o => (o.call, o.ret))
    if (ops.isEmpty) return "<html><body>empty history</body></html>"
    val t0 = ops.map(_.call).min
    val t1 = math.max(ops.map(_.ret).max, t0 + 1)
    val width = 960.0
    def x(t: Long): Double = 40 + (t - t0).toDouble / (t1 - t0) * (width - 80)
    // greedy lane assignment: first lane whose last op returned before this call
    val laneEnd = scala.collection.mutable.ArrayBuffer.empty[Long]
    val laneOf = ops.map { o =>
      val free = laneEnd.indexWhere(_ < o.call)
      val lane = if (free >= 0) free else { laneEnd.append(Long.MinValue); laneEnd.length - 1 }
      laneEnd(lane) = o.ret
      lane
    }
    val rowH = 28
    val height = 60 + laneEnd.length * rowH
    val color = verdict match {
      case Linearizability.Linearizable => "#2e7d32"
      case Linearizability.NotLinearizable => "#c62828"
      case Linearizability.Unknown => "#f9a825"
    }
    val bars = ops.zip(laneOf).map { case (o, lane) =>
      val y = 50 + lane * rowH
      val label = s"${opNames.getOrElse(o.op, "?")}(${o.value})" +
        (if (o.op == 0) s" -> “${o.output}”" else "")
      s"""<rect x="${x(o.call)}" y="$y" width="${math.max(2.0, x(o.ret) - x(o.call))}" height="${rowH - 8}"
         |  rx="3" fill="#90caf9" stroke="#1565c0"/>
         |<text x="${x(o.call) + 3}" y="${y + 14}" font-size="11" font-family="monospace">${esc(label)}</text>"""
        .stripMargin
    }.mkString("\n")
    s"""<!DOCTYPE html><html><body>
       |<h3 style="font-family:monospace">key=${esc(key)} — <span style="color:$color">$verdict</span>
       |  (${ops.length} ops)</h3>
       |<svg width="$width" height="$height" xmlns="http://www.w3.org/2000/svg">
       |<line x1="40" y1="40" x2="${width - 40}" y2="40" stroke="#999"/>
       |<text x="40" y="30" font-size="11" font-family="monospace">t=$t0</text>
       |<text x="${width - 80}" y="30" font-size="11" font-family="monospace">t=$t1</text>
       |$bars
       |</svg></body></html>""".stripMargin
  }
}
