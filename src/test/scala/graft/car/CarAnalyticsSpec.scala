package graft.car

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Golden tests replicating the reference's endpoint assertions
  * (ref: backend/test_app.py:121-247) on the 4-row MOCK_CAR_DATA fixture. */
class CarAnalyticsSpec extends AnyFunSuite with SparkSpec {

  private lazy val cars = CarFixture.df(spark)

  test("B7 distinct brands (ref test_app.py:121)") {
    val got = CarAnalytics.brands(cars).collect().map(_.getString(0)).toSeq
    assert(got == Seq("Brand1", "Brand2", "Brand3"))
  }

  test("B8 Brand1 has two models (ref test_app.py:130-132)") {
    val got = CarAnalytics.brandModels(cars, "Brand1").collect()
    assert(got.length == 2)
    assert(got.map(_.getString(1)).toSet == Set("Model1", "Model2"))
  }

  test("B4+B10 city ranking desc = A90 B85 C60 D30 (ref test_app.py:164-172)") {
    val got = CarAnalytics.cityRankings(cars, "registrations").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("CityA", 90L), ("CityB", 85L), ("CityC", 60L), ("CityD", 30L)))
  }

  test("B11 recommendations brand+price-range → 2 rows (ref test_app.py:181-184)") {
    val got = CarAnalytics.recommendations(
      cars, brand = Some("Brand1"),
      minPrice = Some(80000.0), maxPrice = Some(250000.0)).collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[String]("model")).toSet == Set("Model1", "Model2"))
    // sorted by attention desc: Model2 (90) first
    assert(got.head.getAs[String]("model") == "Model2")
  }

  test("B12 overview: total 265, brand counts, top car (ref test_app.py:193-195)") {
    val o = CarAnalytics.marketOverview(cars).collect().head
    assert(o.getAs[Long]("total_registrations") == 265L)
    assert(math.abs(o.getAs[Double]("avg_attention") - 86.25) < 1e-9)
    assert(o.getAs[String]("top_car") == "Brand3 Model1 (关注度: 95)")
    val pb = CarAnalytics.popularBrands(cars).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pb == Map("Brand1" -> 2L, "Brand2" -> 1L, "Brand3" -> 1L))
  }

  test("B5 trend years 2020-2023 (ref test_app.py:206-207)") {
    val got = CarAnalytics.marketTrends(cars).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("2020", "2021", "2022", "2023"))
    // 2020 row: registrations 75, attention 75, avg 85000
    val r2020 = got.head
    assert(r2020.getAs[Long]("registrations") == 75L)
    assert(r2020.getAs[Long]("attention") == 75L)
    assert(math.abs(r2020.getAs[Double]("avg_price") - 85000.0) < 1e-6)
  }

  test("B13 metric projection validates and projects") {
    val got = CarAnalytics.trendMetric(cars, "attention").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("2020", 75L), ("2021", 90L), ("2022", 85L), ("2023", 95L)))
    intercept[IllegalArgumentException] {
      CarAnalytics.trendMetric(cars, "bogus")
    }
  }

  test("B14 histogram [1,0,1,1,1] with avg attention 75/0/90/85/95 (ref test_app.py:229-236)") {
    val got = CarAnalytics.priceDistribution(spark, cars).collect()
    assert(got.map(_.getAs[Long]("count")).toSeq == Seq(1L, 0L, 1L, 1L, 1L))
    assert(got.map(_.getAs[Double]("avg_attention")).toSeq ==
      Seq(75.0, 0.0, 90.0, 85.0, 95.0))
    assert(got.map(_.getAs[String]("range")).toSeq ==
      Seq("0万-10万", "10万-20万", "20万-30万", "30万-50万", "50万以上"))
  }

  test("B6 preferences sum to 1 ± 1e-4 (ref test_app.py:245-247)") {
    val got = CarAnalytics.consumerPreferences(cars).collect()
    val total = got.map(_.getAs[Double]("preference")).sum
    assert(math.abs(total - 1.0) < 1e-4)
  }

  test("B6 recode 新能源 → 电动汽车 before grouping (ref app.py:149-151)") {
    import spark.implicits._
    val withEv = cars.withColumn("car_type",
      when(col("car_brand") === "Brand3", "新能源").otherwise(col("car_type")))
    val types = CarAnalytics.consumerPreferences(withEv)
      .collect().map(_.getString(0)).toSet
    assert(types.contains("电动汽车") && !types.contains("新能源"))
  }

  test("B9 point lookup drops id and returns one row (ref app.py:297-307)") {
    val got = CarAnalytics.modelDetails(cars, "Brand1_Model1")
    assert(!got.columns.contains("id"))
    val rows = got.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("model") == "Model1")
    assert(CarAnalytics.modelDetails(cars, "Nope_Nope").collect().isEmpty)
  }

  test("B1+B2 fetchCarData renames and builds history_prices structs") {
    val got = CarAnalytics.fetchCarData(cars)
      .filter(col("id") === "Brand1_Model1").collect().head
    assert(got.getAs[Int]("attention") == 75)
    val hist = got.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("history_prices")
    assert(hist.map(h => (h.getString(0), h.getInt(1))).toSet ==
      Set(("2023-01", 90000), ("2023-02", 88000)))
  }

  test("B15 non-type dimension returns the literal fallback (ref app.py:472-481)") {
    val got = CarAnalytics.preferencesByDimension(spark, cars, "horsepower").collect()
    assert(got.length == 3)
    assert(got.map(_.getString(0)).toSet ==
      Set("100-150马力", "150-200马力", "200+马力"))
  }
}
