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
