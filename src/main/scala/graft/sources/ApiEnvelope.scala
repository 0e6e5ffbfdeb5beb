package graft.sources

import org.apache.spark.sql.DataFrame

/** The reference's read-API response envelope
  * (ref: backend/utils.py:166 success, :169 error):
  * `{"status":"success","data":[...],"message":"成功从表 '<t>' 读取 <n> 行数据"}`.
  *
  * This is the EDGE of the engine (SURVEY §2 A4 row materialization):
  * the bounded collect happens here and only here — everything upstream
  * stays a lazy plan. `limit` caps the materialized rows the same way
  * any sane API tier would; the message reports the materialized count,
  * matching the reference's len(results).
  */
object ApiEnvelope {

  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Success envelope: rows serialize via Spark's own JSON encoder (one
    * object per row, schema-faithful types), bounded by `limit`. */
  def read(df: DataFrame, tableName: String, limit: Int = 10000): String = {
    val rows = df.limit(limit).toJSON.collect() // A4 edge: the one collect
    s"""{"status":"success","data":[${rows.mkString(",")}],""" +
      s""""message":${q(s"成功从表 '$tableName' 读取 ${rows.length} 行数据")}}"""
  }

  /** Error envelope (ref utils.py:169). */
  def error(e: Throwable): String =
    s"""{"status":"error","message":${q(s"读取数据失败: ${e.getMessage}")}}"""
}
