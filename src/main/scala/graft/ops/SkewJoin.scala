package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys: when one join key holds a disproportionate
  * share of the fact side, a plain shuffle join puts that key's entire
  * volume on one task. Salting splits the hot key across `salts`
  * partitions by appending a random salt on the fact side and replicating
  * the dimension side once per salt value.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins at
  * runtime; explicit salting remains the tool for aggregations over skewed
  * keys and for joins AQE cannot split. */
object SkewJoin {

  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFacts = facts.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val saltedDims = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFacts.join(saltedDims, Seq(key, "__salt")).drop("__salt")
  }

  /** Skewed groupBy-count: two-phase — pre-aggregate on (key, salt), then
    * final aggregate on key. Generalizes to any associative aggregate. */
  def saltedCount(facts: DataFrame, key: String, salts: Int): DataFrame =
    facts.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("count"))
}
