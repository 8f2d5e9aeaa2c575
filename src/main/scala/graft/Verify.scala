package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional "only=a,b,c" third arg: dump just those queries (fast
    // iteration on one oracle); oracle_sql.json is filtered to match so
    // check_oracle.py compares exactly what was dumped
    val only = args.lift(2).filter(_.startsWith("only="))
      .map(_.stripPrefix("only=").split(",").toSet)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
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
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Local-gate accelerator (ops.Dedup.preludeSetup Scaladoc): ordered
    // temp-table definitions + exact-text rewrites that let
    // check_oracle.py run the MinHash chain once per scale instead of
    // once per consuming oracle. The driver ignores this file.
    val setup = ops.Dedup.preludeSetup
      .map { case (n, sql) => s"[${q(n)}, ${q(sql)}]" }.mkString("[", ",", "]")
    val rw = ops.Dedup.preludeRewrites
      .map { case (f, t) => s"[${q(f)}, ${q(t)}]" }.mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/oracle_prelude.json"),
      s"""{"setup": $setup, "rewrites": $rw}""")
    spark.stop()
  }
}
