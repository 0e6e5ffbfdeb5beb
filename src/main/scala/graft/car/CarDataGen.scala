package graft.car

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B17 — synthetic car-data generator (ref: backend/func.py:49-155),
  * distributed: one `spark.range(n)` and pure column expressions — no
  * driver-side row loop (the reference builds every row in Python), so
  * generating 10^10 rows is just more partitions.
  *
  * Invariants preserved (ScalaCheck'd in CarDataGenSpec):
  *  - brand-consistent models (ref :83-84);
  *  - 0.8×MSRP ≤ min_reference_price ≤ MSRP (ref :103-105);
  *  - horsepower ∈ [80,500] (:115), doors ∈ {2,4,5} (:117),
  *    year ∈ [2010,2025] (:119), popularity ∈ [1,1000] (:121);
  *  - historical_price: 3-7 "YYYY-MM" keys walking back from 2025-01
  *    (:126-133); city_license_plates: 2-5 cities, counts ∈
  *    [1000,100000] (:134-141).
  */
object CarDataGen {

  val brandModels: Seq[(String, Seq[String])] = Seq(
    "奥迪" -> Seq("A4L", "A6L", "Q5L"),
    "宝马" -> Seq("3系", "5系", "X3"),
    "奔驰" -> Seq("C级", "E级", "GLC"),
    "丰田" -> Seq("卡罗拉", "凯美瑞", "RAV4"),
    "比亚迪" -> Seq("汉", "唐", "秦PLUS"))

  val cities: Seq[String] =
    Seq("北京", "上海", "广州", "深圳", "杭州", "成都", "武汉", "西安")

  val carTypes: Seq[String] = Seq("轿车", "SUV", "MPV", "跑车", "皮卡", "新能源")

  def generate(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val base = spark.range(n)
    // deterministic per-row pseudo-randomness: xxhash64(id, salt) → [0,1)
    def u(salt: Int) =
      (pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(1000000L)).cast("double")
        / 1000000.0)
    def pick(salt: Int, k: Int) =
      pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(k.toLong)).cast("int")

    val brandArr = array(brandModels.map(b => lit(b._1)): _*)
    val modelArr = array(brandModels.map(b => array(b._2.map(lit(_)): _*)): _*)
    val msrp = (lit(80000.0) + u(1) * 520000.0)

    base
      .withColumn("brand_idx", pick(0, brandModels.size))
      .withColumn("car_brand", element_at(brandArr, col("brand_idx") + 1))
      // brand-consistent model: chosen from THAT brand's model list
      .withColumn("car_model",
        element_at(element_at(modelArr, col("brand_idx") + 1), pick(2, 3) + 1))
      .withColumn("city", element_at(array(cities.map(lit(_)): _*), pick(3, cities.size) + 1))
      .withColumn("manufacturer_suggested_price", msrp.cast("decimal(10,2)"))
      .withColumn("engine_horsepower", (lit(80) + pick(4, 421)).cast("int"))
      .withColumn("num_doors", element_at(array(lit(2), lit(4), lit(5)), pick(5, 3) + 1))
      .withColumn("min_reference_price",
        (msrp * (lit(0.8) + u(6) * 0.2)).cast("decimal(10,2)"))
      .withColumn("car_type", element_at(array(carTypes.map(lit(_)): _*), pick(7, carTypes.size) + 1))
      .withColumn("manufacture_year", (lit(2010) + pick(8, 16)).cast("int"))
      .withColumn("fuel_capacity", (lit(30.0) + u(9) * 70.0).cast("decimal(5,2)"))
      .withColumn("popularity", (lit(1) + pick(10, 1000)).cast("int"))
      .withColumn("discount_percentage", (u(11) * 30.0).cast("decimal(5,2)"))
      // 3-7 months of price history, keys "YYYY-MM" walking back from 2025-01
      .withColumn("historical_price",
        map_from_arrays(
          transform(sequence(lit(0), pick(12, 5) + 2),
            i => date_format(add_months(lit("2025-01-01").cast("date"), -i), "yyyy-MM")),
          transform(sequence(lit(0), pick(12, 5) + 2),
            i => (pmod(xxhash64(col("id"), i, lit(13)), lit(400000L)) + 100000L).cast("int"))))
      // 2-5 cities (contiguous rotation through the pool keeps keys unique)
      .withColumn("city_license_plates",
        map_from_arrays(
          transform(sequence(lit(0), pick(14, 4) + 1),
            i => element_at(array(cities.map(lit(_)): _*),
              pmod(pick(15, cities.size) + i, lit(cities.size)).cast("int") + 1)),
          transform(sequence(lit(0), pick(14, 4) + 1),
            i => (pmod(xxhash64(col("id"), i, lit(16)), lit(99001L)) + 1000L).cast("int"))))
      .select(CarSchema.schema.fieldNames.toIndexedSeq.map(col): _*)
  }
}
