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

  /** B16 — tabular-file ingestion (ref: backend/app.py:174-249). The
    * reference reads Excel via pandas; Excel connectors are out of scope
    * offline, so the semantics — schema-on-read + API→DB field rename +
    * passthrough of unmapped fields + append — are carried by CSV.
    * Returns the ingested row count (ref replies with it, :235-238). */
  def ingestCsv(spark: SparkSession, csvPath: String, tablePath: String): Long = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(csvPath)
    // empty-upload rejection must happen BEFORE any write (ref :200-202);
    // isEmpty is a limit-1 probe, not a full scan.
    if (raw.isEmpty)
      throw new IllegalArgumentException("上传的文件中没有数据") // ref :200-202
    val renamed = CarSchema.reverseMapping.foldLeft(raw) {
      case (df, (api, db)) =>
        if (df.columns.contains(api)) df.withColumnRenamed(api, db) else df
    }
    // align to schema: add missing columns as nulls, cast, order
    val aligned = CarSchema.schema.fields.foldLeft(renamed) { (df, f) =>
      if (df.columns.contains(f.name)) df.withColumn(f.name, col(f.name).cast(f.dataType))
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(CarSchema.schema.fieldNames.toIndexedSeq.map(col): _*)
    // the returned count rides on the write job via observe() — the
    // read-rename-cast pipeline runs exactly once, not once per count
    val obs = org.apache.spark.sql.Observation()
    appendRows(aligned.observe(obs, count(lit(1)).as("n")), tablePath)
    obs.get("n").asInstanceOf[Long]
  }

  /** B16 companion — JSON-lines ingestion with the same semantics as
    * [[ingestCsv]]: schema-on-read, API→DB field rename, null-fill +
    * cast to the car schema, append, count via observe() (one job).
    * JSON is the other tabular drop format a real upload endpoint
    * accepts; the rename/align/append spine is shared. */
  def ingestJsonLines(spark: SparkSession, jsonPath: String, tablePath: String): Long = {
    val raw = spark.read.json(jsonPath)
    if (raw.isEmpty)
      throw new IllegalArgumentException("上传的文件中没有数据") // ref backend/app.py:200-202
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
