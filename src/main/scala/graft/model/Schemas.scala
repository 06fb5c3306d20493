package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the five sync-domain entities.
  *
  * The reference keeps these implicit (untyped MongoDB documents,
  * fields inferred from accesses — SURVEY.md §1.2 cites
  * products.js per field); making them explicit `StructType`s /
  * case classes is a strict improvement, not a semantic change.
  * ObjectIds become deterministic string surrogates (SURVEY §7.4#4).
  */
object Schemas {

  /** Vendor item fact — reference: products.js:61-66,115-118,136-147,
    * 169,185-187 (nested two levels: item.product_variation.product). */
  val vendorItem: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("status", StringType),
    StructField("esn", StringType),
    StructField("hex_id", StringType),
    StructField("total_price_paid", LongType),
    StructField("product_variation", StructType(Seq(
      StructField("sku", StringType),
      StructField("grade", StringType),
      StructField("product", StructType(Seq(
        StructField("manufacturer", StringType),
        StructField("model", StringType),
        StructField("color", StringType),
        StructField("capacity", StringType)))))))))

  /** The vendor API envelope `{data: [...]}` — products.js:236-240. */
  val vendorItemEnvelope: StructType =
    StructType(Seq(StructField("data", ArrayType(vendorItem))))

  /** Admin catalog dimension — products.js:29-31,131,151-155. */
  val adminProduct: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("name", StringType),
    StructField("specifications", StructType(Seq(
      StructField("storage", StringType))))))

  /** Credentials / fan-out dimension — products.js:234-235,365,372-377. */
  val vendorApi: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("vendorId", StringType),
    StructField("appId", StringType),
    StructField("appSecret", StringType),
    StructField("database", StringType)))

  /** Sink record option element — products.js:172-190. */
  val selectedOption: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("color", StringType),
    StructField("variant", StringType),
    StructField("stock", IntegerType),
    StructField("price", LongType),
    StructField("discount", LongType),
    StructField("uniqueNumbers", ArrayType(StringType))))

  /** Sink table keyed by (vendorId, product, condition) —
    * products.js:285-298. */
  val vendorProduct: StructType = StructType(Seq(
    StructField("vendorId", StringType),
    StructField("product", StringType),
    StructField("condition", StringType),
    StructField("database", StringType),
    StructField("selectedOptions", ArrayType(selectedOption)),
    StructField("createdAt", TimestampType),
    StructField("updatedAt", TimestampType)))

  /** The reference's hard-coded condition ObjectId
    * (products.js:230,294) becomes a config constant. */
  val FixedCondition = "cond-fixed"

  /** Default sink database discriminator — products.js:296,373. */
  val WholecellDb = "wholecell"
}

/** Typed API-boundary views (Dataset[T] where type safety helps;
  * the relational core stays DataFrame + StructType). */
case class VendorApi(
    _id: String, vendorId: String, appId: String, appSecret: String,
    database: Option[String])

case class SelectedOption(
    _id: String, color: String, variant: String, stock: Int,
    price: Long, discount: Long, uniqueNumbers: Seq[String])

case class VendorSummary(
    vendorId: String, database: String, status: String,
    totalFetched: Long, validProducts: Long, skippedProducts: Long,
    newVendorProducts: Long, updatedVendorProducts: Long,
    totalStockProcessed: Long, totalOperations: Long,
    error: Option[String])
