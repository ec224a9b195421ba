package graft.tools

import org.apache.spark.sql.DataFrame

/** Helpers shared by the scale-stress harnesses (ScaleStress /
  * RelationalStress) so their evidence extraction can't drift apart.
  */
object StressUtil {

  /** Extract the join/exchange skeleton from an executed plan. Strips
    * the tree-drawing prefix and the whole-stage-codegen `*(N)` tag
    * BEFORE truncating at the first paren — otherwise a codegen-wrapped
    * node like `*(5) SortMergeJoin …` collapses to a bare `*`, which
    * both destroys the artifact's evidentiary value and lets the
    * BroadcastNestedLoopJoin assertion pass vacuously.
    */
  def joinLines(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.toString.linesIterator
      .map(_.replaceAll("""^[\s:+-]*""", "")
        .replaceFirst("""^\*\(\d+\)\s*""", ""))
      .filter(l => l.contains("Join") || l.contains("Cartesian") ||
        l.contains("Exchange"))
      .map(_.takeWhile(_ != '(').trim).toSeq.distinct

  /** Minimal JSON scalar encoding for the artifact payloads (strings,
    * 3-decimal Locale.ROOT doubles, everything else via toString).
    */
  def jsonScalar(v: Any): String = v match {
    case s: String => "\"" + s.replace("\"", "\\\"") + "\""
    case d: Double =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    case other => other.toString
  }
}
