package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Cross-JVM gate hook: SPARK_GRAFT_MASTER=local-cluster[2,8,4096] runs
    // the same dump through real executor processes (separate JVMs, real
    // serialization of CollectAligned/LcaAggregate buffers, real broadcast
    // transport) instead of the in-process local[] backend.
    // Same empty-string hardening as Main.resolveMaster: the shell
    // SPARK_GRAFT_MASTER="" unset-for-one-command idiom must fall through
    // to the default instead of reaching SparkSession.master("").
    val master = sys.env.get("SPARK_GRAFT_MASTER").map(_.trim)
      .filter(_.nonEmpty).getOrElse(s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
    val builder = if (master.startsWith("local-cluster")) {
      // Executors are forked by the standalone Worker from SPARK_HOME and
      // don't inherit this JVM's classpath; hand them ours (graft classes +
      // the same /opt/spark jars — duplicates of the assembly are benign).
      builder0
        .config("spark.executor.extraClassPath",
          sys.props.getOrElse("java.class.path", ""))
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3g"))
    } else builder0
    val spark = SessionTuning(builder)
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
    // single source of the probabilistic-recall contract: the checker
    // (tools/check_oracle.py) reads THIS dump — a lane can only enter the
    // relaxed LSH path by being marked in the registry (Q.lshRecall)
    val policies = SparkEntry.all.values.collect {
      case qq if qq.lshRecall.isDefined =>
        val p = qq.lshRecall.get
        s"${q(qq.name)}: {${q("keys")}: [${p.keys.map(q).mkString(",")}], " +
          s"${q("sim_col")}: ${q(p.simCol)}, " +
          s"${q("miss_ceiling")}: ${p.missCeiling}, " +
          s"${q("recall_floor")}: ${p.recallFloor}}"
    }
    Files.writeString(Paths.get(s"$outDir/lsh_recall_policy.json"),
      policies.mkString("{", ",", "}"))
    spark.stop()
  }
}
