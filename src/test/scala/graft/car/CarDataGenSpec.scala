package graft.car

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Generator-invariant checks (ref: backend/func.py:49-155; invariants
  * listed in FIXTURES.md §A). Exhaustive over a 300-row deterministic
  * sample — stronger than spot properties at this size. */
class CarDataGenSpec extends AnyFunSuite with SparkSpec {

  private lazy val rows = CarDataGen.generate(spark, 300, seed = 7L).collect()
  private lazy val modelsByBrand = CarDataGen.brandModels.toMap

  test("generator is deterministic for a fixed seed") {
    val again = CarDataGen.generate(spark, 300, seed = 7L).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("0.8×MSRP ≤ min_reference_price ≤ MSRP (ref func.py:103-105)") {
    rows.foreach { r =>
      val msrp = r.getAs[java.math.BigDecimal]("manufacturer_suggested_price").doubleValue()
      val minRef = r.getAs[java.math.BigDecimal]("min_reference_price").doubleValue()
      assert(minRef >= 0.8 * msrp - 0.01 && minRef <= msrp + 0.01)
    }
  }

  test("brand-consistent models (ref func.py:83-84)") {
    rows.foreach { r =>
      val brand = r.getAs[String]("car_brand")
      val model = r.getAs[String]("car_model")
      assert(modelsByBrand(brand).contains(model))
    }
  }

  test("scalar ranges: hp [80,500], doors {2,4,5}, year [2010,2025], popularity [1,1000]") {
    rows.foreach { r =>
      val hp = r.getAs[Int]("engine_horsepower")
      assert(hp >= 80 && hp <= 500)
      assert(Set(2, 4, 5).contains(r.getAs[Int]("num_doors")))
      val y = r.getAs[Int]("manufacture_year")
      assert(y >= 2010 && y <= 2025)
      val p = r.getAs[Int]("popularity")
      assert(p >= 1 && p <= 1000)
    }
  }

  test("historical_price: 3-7 entries, YYYY-MM keys back from 2025-01 (ref func.py:126-133)") {
    val keyPat = "\\d{4}-\\d{2}".r
    rows.foreach { r =>
      val m = r.getAs[Map[String, Int]]("historical_price")
      assert(m.size >= 3 && m.size <= 7)
      m.keys.foreach(k => assert(keyPat.matches(k)))
      assert(m.keys.max == "2025-01") // newest month is the anchor
    }
  }

  test("city_license_plates: 2-5 cities, counts in [1000,100000] (ref func.py:134-141)") {
    rows.foreach { r =>
      val m = r.getAs[Map[String, Int]]("city_license_plates")
      assert(m.size >= 2 && m.size <= 5)
      m.values.foreach(v => assert(v >= 1000 && v <= 100000))
      m.keys.foreach(k => assert(CarDataGen.cities.contains(k)))
    }
  }

  test("generated frame conforms to CarSchema") {
    assert(CarDataGen.generate(spark, 10).schema.fieldNames.toSeq ==
      CarSchema.schema.fieldNames.toSeq)
  }
}
