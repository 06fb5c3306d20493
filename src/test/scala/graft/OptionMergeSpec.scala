package graft

import org.apache.spark.sql.functions._
import graft.ops.OptionMerge

/** A4: explode/union/re-agg merge — stock sums, serials concatenate
  * with duplicates kept, price takes min, keys on either side
  * survive. */
class OptionMergeSpec extends SparkSpec {
  import spark.implicits._

  private def optsDf(rows: Seq[(String, String, String, Int, Long, Seq[String])]) =
    rows.toDF("k", "color", "variant", "stock", "price", "uniqueNumbers")
      .groupBy(col("k"))
      .agg(collect_list(struct(col("color"), col("variant"), col("stock"),
        col("price"), col("price").as("discount"), col("uniqueNumbers")))
        .as("selectedOptions"))

  test("merge: sum/concat/min per (color, variant); either-side keys survive") {
    val existing = optsDf(Seq(
      ("k1", "Black", "128GB", 2, 240L, Seq("X1", "X2")),
      ("k1", "Red", "64GB", 1, 100L, Seq("R1")),
      ("k2", "Blue", "64GB", 5, 300L, Seq("B1"))))
    val incoming = optsDf(Seq(
      ("k1", "Black", "128GB", 3, 220L, Seq("X2", "Y1")),
      ("k1", "Gold", "256GB", 1, 999L, Seq("G1"))))

    val out = OptionMerge.merge(existing, incoming, Seq("k"))
      .select(col("k"), explode(col("selectedOptions")).as("o"))
      .select(col("k"), col("o.color"), col("o.variant"), col("o.stock"),
        col("o.price"), col("o.discount"), col("o.uniqueNumbers"))
      .as[(String, String, String, Int, Long, Long, Seq[String])]
      .collect().map(r => (r._1, r._2) -> r).toMap

    val black = out(("k1", "Black"))
    assert(black._4 == 5)                       // 2 + 3
    assert(black._5 == 220L && black._6 == 220L) // min, discount follows
    assert(black._7 == Seq("X1", "X2", "X2", "Y1")) // duplicates KEPT, sorted
    assert(out(("k1", "Red"))._4 == 1)          // existing-only survives
    assert(out(("k1", "Gold"))._4 == 1)         // incoming-only survives
    assert(out(("k2", "Blue"))._4 == 5)         // untouched key survives
  }

  test("merge is idempotent on an empty incoming side") {
    val existing = optsDf(Seq(("k1", "Black", "128GB", 2, 240L, Seq("X1"))))
    val empty = optsDf(Seq.empty)
    val out = OptionMerge.merge(existing, empty, Seq("k"))
      .select(explode(col("selectedOptions")).as("o"))
      .select(col("o.stock")).as[Int].collect()
    assert(out.toSeq == Seq(2))
  }
}
