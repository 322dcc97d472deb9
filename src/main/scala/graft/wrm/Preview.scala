package graft.wrm

import org.apache.spark.sql.DataFrame

/** Markdown head-preview of a DataFrame — the F10 surface: the reference
  * attaches `validated_df.head().to_markdown()` to its asset metadata
  * (wrm_pipeline/assets/stations/processed_all.py:249,
  * enhanced_all.py:151). This is the Spark analog in the same
  * pipe-table dialect pandas emits: an index column, `:---` left
  * alignment for strings, `---:` right alignment for numerics, one
  * separator row.
  *
  * Presentation-only by design: a bounded `limit(n)` collect of already-
  * computed rows (the reference previews 5), so it is driver-safe at any
  * corpus scale and has no oracle surface — format is pinned by
  * `PreviewSpec`.
  */
object Preview {

  private val numericTypes: Set[String] =
    Set("ByteType", "ShortType", "IntegerType", "LongType", "FloatType",
      "DoubleType") // DecimalType matched by prefix below

  /** Pandas-dialect cell rendering: timestamps as `yyyy-MM-dd HH:mm:ss`
    * (fraction kept only when nonzero), collections/structs bracketed and
    * comma-joined — never the JVM `WrappedArray(...)` repr.
    */
  private def cell(v: Any): String = v match {
    case null => ""
    case ts: java.sql.Timestamp =>
      val s = ts.toString
      if (s.endsWith(".0")) s.dropRight(2) else s
    case s: scala.collection.Seq[_] => // Spark rows hold mutable.ArraySeq
      s.map(cell).mkString("[", ", ", "]")
    case a: Array[_] => a.iterator.map(cell).mkString("[", ", ", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => s"${cell(k)}: ${cell(x)}" }
        .sorted.mkString("{", ", ", "}")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(cell).mkString("(", ", ", ")")
    case other => String.valueOf(other)
  }

  def toMarkdown(df: DataFrame, n: Int = 5): String = {
    require(n >= 1, s"preview needs n >= 1, got $n")
    val schema = df.schema
    val rightAligned: Seq[Boolean] = schema.fields.toSeq.map { f =>
      val t = f.dataType.toString
      numericTypes.contains(t) || t.startsWith("DecimalType")
    }
    val rows = df.limit(n).collect()
    val header = "" +: schema.fieldNames.toSeq
    val body = rows.zipWithIndex.map { case (r, i) =>
      i.toString +: schema.fieldNames.indices.map { j =>
        if (r.isNullAt(j)) "" else cell(r.get(j))
      }
    }.toSeq
    // column widths: max of header/cell lengths, floor 3 so the separator
    // dashes always render as a valid markdown table
    val widths = header.indices.map { j =>
      (header(j).length +: body.map(_(j).length)).max.max(3)
    }
    val aligns = true +: rightAligned // index column is numeric
    def pad(s: String, w: Int, right: Boolean): String =
      if (right) " " * (w - s.length) + s else s + " " * (w - s.length)
    def row(cells: Seq[String]): String =
      cells.lazyZip(widths).lazyZip(aligns)
        .map((c, w, a) => pad(c, w, a)).mkString("| ", " | ", " |")
    val sep = widths.lazyZip(aligns).map { (w, a) =>
      if (a) "-" * (w + 1) + ":" else ":" + "-" * (w + 1)
    }.mkString("|", "|", "|")
    (row(header) +: sep +: body.map(row)).mkString("\n")
  }
}
