package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join for hot keys (100 TB survival kit, SURVEY.md
  * §7.4/6). When one join key holds a disproportionate share of the fact
  * side (one giant opco, one viral document), a plain shuffle join puts
  * that key's entire volume on a single reducer. Salting splits each hot
  * key into `salts` sub-keys: the fact side gets a deterministic salt
  * from a stable hash of a tiebreak column; the dimension side is
  * replicated `salts` times (explode of a literal range — dimension-sized,
  * cheap).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) covers sort-merge cases at runtime; explicit salting remains
  * the tool for aggregate-into-join pipelines and for engines/settings
  * where AQE can't split (e.g. bucketed tables, broadcast-ineligible
  * dimensions).
  */
object SkewJoin {

  /** Deterministic salt in [0, salts) from a stable tiebreak column
    * (xxhash64 — engine-internal only, never crosses the oracle). */
  def salt(tiebreak: Column, salts: Int): Column =
    pmod(xxhash64(tiebreak), lit(salts.toLong)).cast("int")

  /** Inner equi-join of `fact` (big, possibly skewed on `key`) with
    * `dim` (small-ish but not broadcastable) — salted `salts` ways.
    * `tiebreak` must be a fact column with per-row variety (any unique
    * or near-unique id). */
  def saltedInnerJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      tiebreak: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn("_salt", salt(col(tiebreak), salts))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Adaptive skew-safe inner equi-join on `key` for SELF-join pair
    * generation (both sides derive from the same relation, e.g. d4's
    * blocked near-dup candidates). One cheap pruned aggregate finds
    * keys holding more than `hotThreshold` a-side rows (the driver sees
    * at most |a| / hotThreshold of them — bounded by construction):
    *
    *  - no hot keys → the plain single-exchange join, plan unchanged;
    *  - hot keys → split: cold keys join as before; hot keys join
    *    salted, with the a side split `salts` ways by a stable hash of
    *    `tiebreak` and the b side replicated per salt, so each pair
    *    still meets EXACTLY once (in cell salt(a.tiebreak)) and the
    *    hot key's m² pair work spreads over `salts` reducers instead
    *    of straggling on one.
    *
    * The union of the two branches is row-identical to the plain join
    * (SkewSelfJoinSpec). Null keys never match an inner equi-join, so
    * the hot/cold partition dropping them changes nothing. */
  def skewSafeEquiJoin(
      a: DataFrame, b: DataFrame, key: String, tiebreak: String,
      hotThreshold: Long, salts: Int): DataFrame = {
    require(hotThreshold > 0)
    skewSafeEquiJoin(a, b, key, tiebreak, detectHotKeys(a, key, hotThreshold), salts)
  }

  /** The detection half of [[skewSafeEquiJoin]]: keys holding more than
    * `hotThreshold` rows. Runs a real (pruned, aggregate-only) job at
    * call time — callers constructing the same plan repeatedly should
    * cache the result (see `DedupQueries.d4`). */
  def detectHotKeys(a: DataFrame, key: String, hotThreshold: Long): Seq[Any] = {
    require(hotThreshold > 0)
    a.groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > hotThreshold)
      .select(col(key)).collect().map(_.get(0)).toSeq
  }

  /** [[skewSafeEquiJoin]] with pre-detected hot keys (no job at plan
    * construction). */
  def skewSafeEquiJoin(
      a: DataFrame, b: DataFrame, key: String, tiebreak: String,
      hotKeys: Seq[Any], salts: Int): DataFrame = {
    require(salts > 0)
    if (hotKeys.isEmpty) {
      a.join(b.hint("shuffle_hash"), Seq(key))
    } else {
      val aCold = a.filter(!col(key).isin(hotKeys: _*))
      val bCold = b.filter(!col(key).isin(hotKeys: _*))
      val aHot = a.filter(col(key).isin(hotKeys: _*))
        .withColumn("_salt", salt(col(tiebreak), salts))
      val bHot = b.filter(col(key).isin(hotKeys: _*))
        .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
      aCold.join(bCold.hint("shuffle_hash"), Seq(key))
        .unionByName(
          aHot.join(bHot.hint("shuffle_hash"), Seq(key, "_salt")).drop("_salt"))
    }
  }
}
