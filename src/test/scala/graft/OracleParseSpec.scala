package graft

import scala.sys.process._

/** Registry hygiene gate: every registered oracle SQL must parse AND
  * bind in DuckDB against the real table schemas — catching typos and
  * dialect slips at test time instead of driver time (the round-2
  * ml_hash_split red row was a type artifact the full compare catches;
  * this gate catches the parse/bind class at build time). Shells out to
  * the same DuckDB the driver harness uses; cancels (not fails) where
  * python3+duckdb isn't installed so the suite stays portable.
  */
class OracleParseSpec extends SparkSpec {

  test("every registered oracle SQL parses and binds in DuckDB (--parse-only gate)") {
    val probe = Process(Seq("python3", "-c", "import duckdb"))
      .!(ProcessLogger(_ => ()))
    assume(probe == 0, "python3 + duckdb not available in this environment")

    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${graft.core.Json.quote(k)}: ${graft.core.Json.quote(v)}" }
      .mkString("{", ", ", "}")
    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(tmp, json)

    val checkPy = new java.io.File("tools/check.py").getAbsolutePath
    val out = new StringBuilder
    val rc = Process(Seq("python3", checkPy, "--parse-only",
        "/root/testdata/sf0.001", tmp.toString))
      .!(ProcessLogger(l => { out.append(l).append('\n'); () }))
    assert(rc === 0, s"oracle SQL failed DuckDB parse/bind:\n$out")
    assert(out.toString.contains("/ 0 fail"), out.toString)
  }
}
