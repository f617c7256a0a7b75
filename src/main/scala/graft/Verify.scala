package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); Spark 4 only reads it as
      // long. Queries order by event_id, never by raw ts, so this is safe.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (comma-separated name prefixes); the driver
    // never sets it, so its runs always dump the full query set
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
      // a set-but-empty variable means "no filter", not "select nothing" —
      // an empty dump would read as a catastrophic regression downstream
      .filter(_.nonEmpty)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // fail LOUD: an error marker makes the driver report `err` for this
        // query instead of silently omitting the row (round-2 post-mortem)
        System.err.println(s"[verify] $name failed: $e")
        e.printStackTrace()
        Files.writeString(Paths.get(s"$outDir/$name.error"),
          s"${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the deliberate rows-only residue: one line per query on WHY no SQL
    // oracle exists (approximate candidate-set semantics) — so the
    // artifact itself distinguishes "not oracled yet" from "by design"
    val notes = SparkEntry.all.values.collect {
      case qq if qq.rowsOnlyNote.isDefined =>
        s"${q(qq.name)}: ${q(qq.rowsOnlyNote.get)}"
    }
    Files.writeString(Paths.get(s"$outDir/rows_only_by_design.json"),
      notes.mkString("{", ",", "}"))
    spark.stop()
  }
}
