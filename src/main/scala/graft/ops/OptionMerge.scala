package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.SyncExprs

/** A4: `mergeSelectedOptions` (products.js:194-223) as a relational
  * explode → union → re-aggregate. Keys present on either side
  * survive (full-outer union semantics); per (color, variant):
  * stock sums, uniqueNumbers concatenates (duplicates KEPT — the
  * reference uses array concat, not a set: products.js:208-212),
  * price takes the min, discount follows price.
  *
  * NOTE the reference semantic quirk preserved here (SURVEY §7.4#2):
  * merging is an ACCUMULATE — re-syncing the same items doubles
  * stock. MergeWriter exposes a Replace mode for idempotent syncs.
  */
object OptionMerge {

  /** Merge two option-array tables keyed by `keyCols`; both inputs
    * need (keyCols..., selectedOptions). Output has the same shape.
    * One shuffle on (key, color, variant); map-side partial combine
    * applies to the sums. */
  def merge(existing: DataFrame, incoming: DataFrame, keyCols: Seq[String]): DataFrame = {
    val key = keyCols.map(col)
    def exploded(df: DataFrame) = df
      .select(key :+ explode(col("selectedOptions")).as("o"): _*)
      .select(key ++ Seq(
        col("o.color").as("color"), col("o.variant").as("variant"),
        col("o.stock").as("stock"), col("o.price").as("price"),
        col("o.uniqueNumbers").as("uniqueNumbers")): _*)

    exploded(existing).unionByName(exploded(incoming))
      .groupBy(key :+ col("color") :+ col("variant"): _*)
      .agg(
        sum(col("stock")).cast("int").as("stock"),
        sort_array(flatten(collect_list(col("uniqueNumbers")))).as("uniqueNumbers"),
        min(col("price")).as("price"))
      .groupBy(key: _*)
      .agg(sort_array(collect_list(struct(
        SyncExprs.surrogateId(key ++ Seq(col("color"), col("variant")): _*).as("_id"),
        col("color"), col("variant"), col("stock"),
        col("price"), col("price").as("discount"),
        col("uniqueNumbers")))).as("selectedOptions"))
  }
}
