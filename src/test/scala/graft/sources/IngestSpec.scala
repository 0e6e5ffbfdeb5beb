package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.car.{CarDataGen, CarSchema}

class IngestSpec extends AnyFunSuite with SparkSpec {

  test("A5/A6 parquet round trip: overwrite then append") {
    val dir = Files.createTempDirectory("graft-ingest").toString + "/car_data"
    val gen = CarDataGen.generate(spark, 50)
    Ingest.createTable(gen, dir)
    assert(spark.read.parquet(dir).count() == 50)
    Ingest.appendRows(CarDataGen.generate(spark, 25, seed = 9L), dir)
    assert(spark.read.parquet(dir).count() == 75)
  }

  test("B16 CSV ingestion renames API fields to DB fields and appends") {
    val tmp = Files.createTempDirectory("graft-csv")
    val csv = tmp.resolve("upload.csv")
    Files.writeString(csv,
      """brand,model,guide_price,horsepower,doors,min_price,car_type,attention,discount
        |奥迪,A4L,300000.00,190,4,280000.00,轿车,500,5.5
        |宝马,3系,350000.00,197,4,320000.00,轿车,800,3.0
        |""".stripMargin)
    val table = tmp.resolve("table").toString
    val n = Ingest.ingestCsv(spark, csv.toString, table)
    assert(n == 2)
    val back = spark.read.parquet(table)
    assert(back.schema.fieldNames.toSeq == CarSchema.schema.fieldNames.toSeq)
    val audi = back.filter(back("car_brand") === "奥迪").collect().head
    assert(audi.getAs[Int]("popularity") == 500) // attention → popularity
    assert(audi.getAs[java.math.BigDecimal]("manufacturer_suggested_price")
      .doubleValue() == 300000.0)
  }

  test("B18 bulk random insert enforces the 10k cap (ref app.py:263)") {
    val dir = Files.createTempDirectory("graft-bulk").toString + "/t"
    assert(Ingest.bulkRandomInsert(spark, dir, 100) == 100L)
    assert(spark.read.parquet(dir).count() == 100)
    intercept[IllegalArgumentException] {
      Ingest.bulkRandomInsert(spark, dir, 10001)
    }
    intercept[IllegalArgumentException] {
      Ingest.bulkRandomInsert(spark, dir, 0)
    }
  }

  test("B16 empty upload is rejected (ref app.py:200-202)") {
    val tmp = Files.createTempDirectory("graft-csv2")
    val csv = tmp.resolve("empty.csv")
    Files.writeString(csv, "brand,model\n")
    intercept[IllegalArgumentException] {
      Ingest.ingestCsv(spark, csv.toString, tmp.resolve("t").toString)
    }
  }
}
