package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.car.CarSchema

/** Sources & sinks (SURVEY.md §2 A5/A6/B16).
  *
  * The reference's write path is a hand-built mega `INSERT INTO … VALUES`
  * over Thrift with string-interpolated literals (ref: backend/utils.py:
  * 61-125 — SQL-injectable, unbatched); here the literal-formatting layer
  * disappears entirely: rows are DataFrames, sinks are Parquet writes.
  * A5 CREATE TABLE ≈ overwrite write; A6 INSERT ≈ append write.
  */
object Ingest {

  /** A5 — (re)create the car_data table (ref: backend/utils.py:15-58). */
  def createTable(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** A6 — append rows (ref: backend/utils.py:61-125). */
  def appendRows(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** A5, catalog tier — CREATE-or-replace a MANAGED table in the session
    * catalog (`spark.sql.warehouse.dir`-backed), the engine-side shape of
    * the reference's Hive `DROP TABLE IF EXISTS` + `CREATE TABLE` DDL
    * (ref: backend/utils.py:32-50): the table gets a catalog identity —
    * schema, stats, name resolution via `spark.table` — not just a path.
    * On a cluster with a Hive metastore the SAME call persists there;
    * nothing here is local-mode-specific. */
  def createCatalogTable(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)

  /** A6, catalog tier — INSERT INTO the managed table
    * (ref: backend/utils.py:61-125). */
  def appendCatalogTable(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).format("parquet").saveAsTable(table)

  /** A1, catalog tier — name-resolved scan of a managed table. */
  def readCatalogTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** A5/A6, ORC tier — the same create/append sinks in ORC, the storage
    * format Hive warehouses default to (the reference's tables live in
    * Hive, ref: backend/utils.py:32-50; a `STORED AS ORC` DDL there and
    * these writes produce interchangeable files). ORC support is built
    * into spark-sql — no extra dependency — and carries the same
    * min/max stripe statistics parquet footers give us, so predicate
    * pushdown receipts hold unchanged. Parquet stays the default
    * everywhere; this tier exists so a warehouse already standardized
    * on ORC can adopt the engine without a rewrite pass. */
  def createTableOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def appendRowsOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** A5, catalog + ORC — CREATE-or-replace a managed ORC table, the
    * closest engine-side shape to Hive's `CREATE TABLE … STORED AS
    * ORC`. */
  def createCatalogTableOrc(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("orc").saveAsTable(table)

  /** B18 — bulk random insert with the reference's 10k cap
    * (ref: backend/app.py:252-279, cap at :263 — the only scale limit the
    * reference states anywhere). */
  def bulkRandomInsert(spark: SparkSession, path: String, n: Int, seed: Long = 42L): Long = {
    require(n > 0 && n <= 10000, s"rows must be in (0, 10000], got $n")
    graft.car.CarDataGen.generate(spark, n.toLong, seed).transform { df =>
      appendRows(df, path); df
    }
    n.toLong
  }

  /** The shared B16 ingestion spine: empty-upload rejection BEFORE any
    * write (ref backend/app.py:200-202; isEmpty is a limit-1 probe, not
    * a full scan), API→DB field rename (REVERSE_MAPPING, ref :208-226),
    * null-fill + cast + reorder to the car schema, append, and the row
    * count riding on the write job via observe() — the whole pipeline
    * runs exactly once, not once per count. */
  private def alignAppendCount(raw: org.apache.spark.sql.DataFrame, tablePath: String): Long = {
    if (raw.isEmpty)
      throw new IllegalArgumentException("上传的文件中没有数据") // ref :200-202
    val renamed = CarSchema.reverseMapping.foldLeft(raw) {
      case (df, (api, db)) =>
        if (df.columns.contains(api)) df.withColumnRenamed(api, db) else df
    }
    val aligned = CarSchema.schema.fields.foldLeft(renamed) { (df, f) =>
      if (df.columns.contains(f.name)) df.withColumn(f.name, col(f.name).cast(f.dataType))
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(CarSchema.schema.fieldNames.toIndexedSeq.map(col): _*)
    val obs = org.apache.spark.sql.Observation()
    appendRows(aligned.observe(obs, count(lit(1)).as("n")), tablePath)
    obs.get("n").asInstanceOf[Long]
  }

  /** B16 — tabular-file ingestion (ref: backend/app.py:174-249), CSV
    * flavor: schema-on-read + the shared [[alignAppendCount]] spine.
    * Returns the ingested row count (ref replies with it, :235-238). */
  def ingestCsv(spark: SparkSession, csvPath: String, tablePath: String): Long =
    alignAppendCount(
      spark.read.option("header", "true").option("inferSchema", "true").csv(csvPath),
      tablePath)

  /** B16 companion — JSON-lines ingestion, same spine. */
  def ingestJsonLines(spark: SparkSession, jsonPath: String, tablePath: String): Long =
    alignAppendCount(spark.read.json(jsonPath), tablePath)

  /** B16, NATIVE Excel flavor — the reference's actual upload format
    * (`pd.read_excel`, ref backend/app.py:198), read with the
    * dependency-free [[ExcelIngest]] parser (an .xlsx is ZIP + XML; the
    * JDK has both). First row = header, like pandas. The parse is a
    * bounded driver-side read of ONE uploaded file — the same budget
    * class as the reference's web-tier pandas read; distributed ingest
    * stays on CSV/JSON/parquet. All cells arrive as strings and the
    * shared spine's per-column cast applies the car schema types. */
  def ingestExcel(spark: SparkSession, xlsxPath: String, tablePath: String): Long = {
    val rows = ExcelIngest.readRows(xlsxPath)
    if (rows.isEmpty)
      throw new IllegalArgumentException("上传的文件中没有数据") // ref :200-202
    val header = rows.head.map(h => if (h == null) "" else h.trim)
    val width = header.length
    val data = rows.tail.map { r =>
      org.apache.spark.sql.Row.fromSeq(
        (0 until width).map(i => if (i < r.length) r(i) else null))
    }
    val schema = org.apache.spark.sql.types.StructType(
      header.toIndexedSeq.map(h =>
        org.apache.spark.sql.types.StructField(
          h, org.apache.spark.sql.types.StringType, nullable = true)))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(data.toIndexedSeq, math.max(1, data.size / 5000)),
      schema)
    alignAppendCount(raw, tablePath)
  }

  /** JDBC source passthrough — the reference reads its car table over a
    * Hive Thrift connection (ref: backend/utils.py:142, config.py:1-6);
    * `spark.read.jdbc` is the engine-side equivalent for any warehouse
    * that speaks JDBC. Single-connection read: the whole table comes
    * through one partition — fine for dimension tables, wrong for facts
    * (use [[readJdbcPartitioned]]). */
  def readJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned JDBC read: `numPartitions` parallel connections, each
    * scanning a [lower, upper) stride of `partitionColumn` — the shape
    * that survives a big source table, since every executor pulls its
    * own slice instead of one connection bottlenecking the cluster. */
  def readJdbcPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound, numPartitions, props)
}
