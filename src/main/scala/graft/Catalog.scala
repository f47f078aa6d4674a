package graft

/** Registry dump for the generated README operator catalog (round-13
  * verdict item 6): one TSV row per registry query —
  *
  *   name \t entry-point object \t oracle kind
  *
  * where oracle kind is `duckdb` (a row in `SparkEntry.oracleSql` — the
  * full hash gate) or `rows-only` (the driver's weaker check for
  * non-SQL-expressible ops). Pure JVM — constructing the maps runs no
  * Spark. `tools/gen_catalog.py` merges this with the CORRECTNESS
  * artifacts and rewrites the README block; `tools/run_round.sh` fails on
  * drift, so the catalog can never go stale the way hand-maintained
  * coverage prose does.
  */
object Catalog {
  def main(args: Array[String]): Unit = {
    val origins = SparkEntry.queryOrigins
    val oracles = SparkEntry.oracleSql.keySet
    SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      val kind = if (oracles(q)) "duckdb" else "rows-only"
      println(s"$q\t${origins(q)}\t$kind")
    }
  }
}
