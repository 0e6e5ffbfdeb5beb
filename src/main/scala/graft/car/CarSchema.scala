package graft.car

import org.apache.spark.sql.types._

/** The reference's single-table data model (ref: backend/config.py:8-23;
  * per-column Chinese docs in backend/table.ipynb). Storage upgrade:
  * Parquet columnar instead of Hive delimited TEXTFILE
  * (ref: backend/utils.py:44-47) — semantics-preserving, scan-prunable.
  */
object CarSchema {

  /** Spark StructType for `car_data` (SURVEY.md §1.2). */
  val schema: StructType = StructType(Seq(
    StructField("car_brand", StringType),
    StructField("city", StringType),
    StructField("car_model", StringType),
    StructField("manufacturer_suggested_price", DecimalType(10, 2)),
    StructField("engine_horsepower", IntegerType),
    StructField("num_doors", IntegerType),
    StructField("min_reference_price", DecimalType(10, 2)),
    StructField("car_type", StringType),
    StructField("manufacture_year", IntegerType),
    StructField("fuel_capacity", DecimalType(5, 2)),
    StructField("popularity", IntegerType),
    StructField("discount_percentage", DecimalType(5, 2)),
    StructField("historical_price", MapType(StringType, IntegerType)),
    StructField("city_license_plates", MapType(StringType, IntegerType))))

  /** DB → API field rename (ref: backend/app.py:15-26 FIELD_MAPPING). */
  val fieldMapping: Seq[(String, String)] = Seq(
    "car_brand" -> "brand",
    "car_model" -> "model",
    "manufacturer_suggested_price" -> "guide_price",
    "engine_horsepower" -> "horsepower",
    "num_doors" -> "doors",
    "min_reference_price" -> "min_price",
    "popularity" -> "attention",
    "discount_percentage" -> "discount",
    "car_type" -> "car_type")

  /** API → DB rename for ingestion (ref: backend/app.py:29). */
  val reverseMapping: Seq[(String, String)] = fieldMapping.map(_.swap)
}
