package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: point-in-interval joins without the
  * cross-product.
  *
  * A naive `points JOIN ranges ON p BETWEEN start AND end` has no
  * equi-key, so Spark plans BroadcastNestedLoopJoin — O(|points|·|ranges|)
  * comparisons, unusable at scale. Binning manufactures an equi-key: every
  * interval is exploded to the bins it overlaps, every point maps to its
  * one bin, the join runs as a plain shuffled/broadcast HASH join on the
  * bin id, and the exact BETWEEN predicate filters within bins.
  *
  * Cost model: intervals of span ≤ binWidth explode into ≤ 2 bins, so the
  * join input grows by at most 2× while the comparison count drops from
  * |P|·|R| to the true candidate count. Pick binWidth ≈ the typical
  * interval span; skewed bins fall to AQE's skew-join splitting.
  */
object RangeJoin {

  /** Bin id of a scalar value (works for negative values: floor division). */
  private def binOf(c: Column, binWidth: Double): Column =
    floor(c / lit(binWidth)).cast("long")

  /** Join `points` to `ranges` on `pointCol BETWEEN startCol AND endCol`
    * (inclusive both ends) via bin equi-keys. Column names must be
    * disjoint between the two inputs. Intervals may span any number of
    * bins (sequence explodes them all); null or inverted intervals drop
    * out (sequence of an empty range emits nothing).
    */
  def pointInRange(
      points: DataFrame, ranges: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = ranges
      .withColumn("_bin",
        explode(sequence(binOf(col(startCol), binWidth), binOf(col(endCol), binWidth))))
    points
      .withColumn("_bin", binOf(col(pointCol), binWidth))
      .join(binned, Seq("_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }
}
