package graft.car

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The reference's 4-row golden fixture MOCK_CAR_DATA
  * (ref: backend/test_app.py:24-81), typed to CarSchema. */
object CarFixture {

  final case class CarRow(
      car_brand: String,
      city: String,
      car_model: String,
      manufacturer_suggested_price: Double,
      engine_horsepower: Int,
      num_doors: Int,
      min_reference_price: Double,
      car_type: String,
      manufacture_year: Int,
      fuel_capacity: Double,
      popularity: Int,
      discount_percentage: Double,
      historical_price: Map[String, Int],
      city_license_plates: Map[String, Int])

  val rows: Seq[CarRow] = Seq(
    CarRow("Brand1", null, "Model1", 85000.00, 150, 4, 80000.00, "Sedan", 2020,
      50.0, 75, 5.0,
      Map("2023-01" -> 90000, "2023-02" -> 88000),
      Map("CityA" -> 50, "CityB" -> 25)),
    CarRow("Brand1", null, "Model2", 250000.00, 250, 5, 220000.00, "SUV", 2021,
      60.0, 90, 3.5,
      Map("2023-01" -> 240000, "2023-02" -> 235000),
      Map("CityA" -> 30, "CityC" -> 40)),
    CarRow("Brand2", null, "Model1", 380000.00, 300, 2, 350000.00, "Sports", 2022,
      70.0, 85, 2.0,
      Map("2023-01" -> 370000, "2023-02" -> 365000),
      Map("CityB" -> 60, "CityC" -> 20)),
    CarRow("Brand3", null, "Model1", 600000.00, 400, 2, 550000.00, "Luxury", 2023,
      80.0, 95, 1.5,
      Map("2023-01" -> 590000, "2023-02" -> 585000),
      Map("CityA" -> 10, "CityD" -> 30)))

  /** Typed to the canonical schema (decimals cast per CarSchema). */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val raw = rows.toDF()
    CarSchema.schema.fields.foldLeft(raw) { (d, f) =>
      d.withColumn(f.name, col(f.name).cast(f.dataType))
    }.select(CarSchema.schema.fieldNames.map(col): _*)
  }
}
