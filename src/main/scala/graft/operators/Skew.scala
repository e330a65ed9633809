package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale shuffles.
  *
  * AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles most
  * cases at runtime; these helpers cover the two patterns AQE cannot:
  * a single hot GROUP BY key overwhelming one reducer, and a hot join
  * key on the build side.
  */
object Skew {

  /** Two-phase ("salted") aggregation: groupBy (key, salt) first so a
    * hot key fans out over `saltBuckets` reducers, then re-aggregate by
    * key. Correct for any algebraic aggregate expressed as (partial,
    * merge) pairs — here the common count/sum family.
    *
    * At 100 TB: a power-law key (one user = 10% of events) turns a
    * plain groupBy into one straggler task; salting bounds any task at
    * ~hot_key_rows / saltBuckets. */
  def saltedSumCount(df: DataFrame, key: Column, valueCol: Column,
                     saltBuckets: Int = 16): DataFrame = {
    val salted = df.select(
      key.as("k"),
      valueCol.as("v"),
      (pmod(spark_partition_id() + monotonically_increasing_id(),
            lit(saltBuckets))).as("salt"))
    salted
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("total"))
  }

  /** Two-phase ("salted") windowed running sum for a SKEWED window
    * partition key — the pattern SCALING.md's q63 note calls for when
    * one mega-domain would serialize through a single window
    * partition (AQE cannot split a window partition the way it splits
    * a skewed join).
    *
    * `salt` must be monotone non-decreasing in `order` within each
    * key (e.g. a time bucket of the ordering timestamp): phase 1
    * computes the running sum INSIDE each (key, salt) slice — the hot
    * key's rows fan out over its salt slices instead of one reducer —
    * and phase 2 adds the per-slice offsets (a window over the tiny
    * (key, salt) totals). Row-for-row identical to the plain
    * unbounded-preceding running sum when (key, order) is unique,
    * at hot_key_rows / |salts| per task instead of hot_key_rows. */
  def saltedCumSum(df: DataFrame, key: Column, order: Column,
                   value: Column, salt: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(key.as("k"), order.as("o"), value.as("v"),
                         salt.as("s"))
    val wLocal = Window.partitionBy(col("k"), col("s")).orderBy(col("o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("local_cum", sum(col("v")).over(wLocal))
    // per-slice totals are |keys| x |salts| rows — the phase-2 window
    // is over a table orders of magnitude below the data
    val wOff = Window.partitionBy(col("k")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("k"), col("s"))
      .agg(sum(col("v")).as("st"))
      .withColumn("off", coalesce(sum(col("st")).over(wOff), lit(0)))
      .select(col("k"), col("s"), col("off"))
    local.join(offsets, Seq("k", "s"))
      .withColumn("cum", col("local_cum") + col("off"))
      .select(col("k"), col("o"), col("v"), col("cum"))
  }

  /** Broadcast-salted join for a skewed fact-side key: replicate each
    * build-side row `saltBuckets` times with a salt column, salt the
    * probe side randomly, and join on (key, salt). Use when the build
    * side is small enough to replicate but the probe side's hot key
    * would overwhelm one shuffle partition. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, saltBuckets: Int = 8): DataFrame = {
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(factKey), monotonically_increasing_id()),
           lit(saltBuckets)).cast("int"))
    saltedFact.join(broadcast(saltedDim),
      saltedFact(factKey) === saltedDim(dimKey) &&
        saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
