package graft.ops

import graft.Tables
import graft.functions.Aggregators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-backed EXACT heavy hitters — the two-pass scheme production
  * engines use when "top frequent items" must be exact but the domain is
  * too wide to hash-aggregate in memory:
  *
  *   pass 1: one aggregate pass builds a mergeable Misra-Gries sketch
  *     (functions/Aggregators.misraGries) whose candidate set provably
  *     contains every item with frequency > n/(capacity+1). With
  *     `Capacity + 1 >= ThresholdK` that is a superset of the heavy set
  *     {freq * K > n}. The shuffle carries one <= Capacity-entry map per
  *     map partition — constant bytes regardless of corpus size.
  *   pass 2: the <= Capacity candidates broadcast back as an `isin` gate;
  *     only matching tokens are exactly recounted (map-side partial agg on
  *     a 256-way key space) and thresholded against the exact total from
  *     pass 1.
  *
  * The sketch's counting error never reaches the output — it only decides
  * WHICH tokens get an exact recount — so the result is bit-identical to a
  * full GROUP BY ... HAVING, at two scans and O(Capacity) shuffle bytes
  * instead of a corpus-wide token shuffle. The reference's engine exposes
  * grouped counting (function/sum AggregationFunction, Table.java agg
  * surface); this is the scale path for its "frequent values" use over an
  * unbounded domain.
  *
  * Driver reads: ONE 1-row sketch read (the documented bounded-model-read
  * pattern, like BPE/classifier).
  */
object Sketches {

  /** Heavy = tokens with count * ThresholdK > total tokens (i.e. > 0.5%). */
  val ThresholdK = 200
  val Capacity = 256
  require(Capacity + 1 >= ThresholdK, "MG guarantee needs capacity+1 >= K")

  def heavyHitters(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val toks = docs.select(explode(Text.tokens(col("text"))).as("token"))
    val sk = toks.as[String].select(Aggregators.misraGries(Capacity).toColumn).head()
    toks.where(col("token").isin(sk.candidates: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .where(col("n") * lit(ThresholdK.toLong) > lit(sk.n))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> ((s, d) => heavyHitters(s, Tables.documents(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest(str_split(${Text.normSql}, ' ')) AS token
         |              FROM documents),
         |tot AS (SELECT count(*) AS n FROM toks)
         |SELECT token, count(*) AS n FROM toks GROUP BY 1
         |HAVING count(*) * $ThresholdK > (SELECT n FROM tot)""".stripMargin)
}
