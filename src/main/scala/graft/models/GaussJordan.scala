package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** No-pivot Gauss–Jordan elimination of a row-major `rows`×`cols` augmented
  * system carried as a flat array<double> column — the Spark twin of
  * ModelQueries.gaussJordanSql. Each elimination step is ONE Project with a
  * `transform` over the array (pure Catalyst expressions inside whole-stage
  * codegen — no UDF), chained by column name so the expression tree stays
  * linear in the step count rather than exponential.
  *
  * The update is the exact formula of the DuckDB recursive-CTE version
  * (divide-then-multiply: `v - m[r][s] * (m[s][c] / m[s][s])`), so both
  * engines execute an identical float-op sequence and agree bit-for-bit on
  * identical inputs. No pivoting: every caller solves an SPD system (normal
  * equations / posterior precision matrices) whose pivots stay positive.
  */
object GaussJordan {

  /** Eliminate in place on array column `c` (length rows*cols, row-major,
    * `cols - rows` augmented right-hand columns). After the call, column j
    * of row r (for j > rows) holds the solution of system column j.
    */
  def eliminate(df: DataFrame, c: String, rows: Int, cols: Int): DataFrame =
    (1 to rows).foldLeft(df) { (d, s) =>
      val piv = s"$c[${(s - 1) * cols + (s - 1)}]"
      d.withColumn(c, expr(
        s"""transform($c, (v, li) -> CASE
           |  WHEN li div $cols = ${s - 1} THEN v / $piv
           |  ELSE v - $c[(li div $cols) * $cols + ${s - 1}] * ($c[${(s - 1) * cols} + li % $cols] / $piv)
           |END)""".stripMargin))
    }

  /** DuckDB recursive-CTE twin with `rhs` augmented right-hand columns:
    * expects `{pre}mats(event_type, m)` where m is a p×(p+rhs) row-major
    * list; emits `{pre}beta(event_type, b1..b{rhs})`, each bj the j-th
    * solution column as a p-list. Generalizes ModelQueries.gaussJordanSql
    * (which is the rhs=1 case with the single column named b).
    */
  def sqlAug(p: Int, rhs: Int, pre: String = ""): String = {
    val cols = p + rhs
    val bs = (1 to rhs).map(j =>
      s"list_transform(range(1, ${p + 1}), r -> m[(r - 1) * $cols + ${p + j}]) AS b$j").mkString(",\n           ")
    s"""${pre}gj AS (
       |  SELECT event_type, 0 AS step, m FROM ${pre}mats
       |  UNION ALL
       |  SELECT event_type, stepn,
       |    list_transform(m, (v, li) ->
       |      CASE WHEN ((li - 1) // $cols + 1) = stepn THEN v / m[(stepn - 1) * $cols + stepn]
       |           ELSE v - m[((li - 1) // $cols) * $cols + stepn]
       |                   * (m[(stepn - 1) * $cols + ((li - 1) % $cols + 1)] / m[(stepn - 1) * $cols + stepn])
       |      END)
       |  FROM (SELECT event_type, step + 1 AS stepn, m FROM ${pre}gj WHERE step < $p)),
       |${pre}beta AS (SELECT event_type, $bs
       |         FROM ${pre}gj WHERE step = $p)""".stripMargin
  }
}
