package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Json

/** The shared harness JSON escaper: every artifact line the driver
  * parses (Verify's oracle_sql.json, Bench's metric lines, ScaleStress
  * steps) goes through this — an invalid escape silently zeroes a
  * round, so the contract is pinned with a real JSON parser
  * (jackson, already on the Spark classpath).
  */
class JsonUtilSpec extends AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def roundTrip(s: String): String =
    mapper.readValue(Json.quote(s), classOf[String])

  test("escape round-trips every hostile shape through a JSON parser") {
    val cases = Seq(
      """plain text""",
      "quote\" backslash\\ both\\\"",
      "newline\n cr\r tab\t",
      "\u0000\u0001\u001f bare control chars",
      "unicode passes through: café 日本語",
      "sql like SELECT 'a\tb' FROM t WHERE x = \"y\"",
      "")
    cases.foreach(s => assert(roundTrip(s) == s, s"round-trip of ${s.length} chars"))
  }

  test("escaped output never contains raw control characters") {
    val hostile = (0 until 32).map(_.toChar).mkString + "\"\\"
    val out = Json.escape(hostile)
    assert(out.forall(c => c >= ' '), "control char leaked unescaped")
    assert(roundTrip(hostile) == hostile)
  }

  test("bench load guard: floor exceeded => suspect; at/under floor or dead query => not") {
    // the automated form of BASELINE.md's "trust only runs where
    // t1_project_rename <= 1.4 s" rule
    assert(Bench.loadSuspect(Some(1.41), 1.4))
    assert(!Bench.loadSuspect(Some(1.4), 1.4))   // at the floor: clean
    assert(!Bench.loadSuspect(Some(0.9), 1.4))
    // a guard query that failed every pass is a BROKEN bench (total=-1
    // already marks it), not a loaded one
    assert(!Bench.loadSuspect(None, 1.4))
    assert(Bench.LoadGuardQuery == "t1_project_rename")
  }

  test("a map of quoted pairs parses as a JSON object (Verify's shape)") {
    val m = Map("q1\ttab" -> "SELECT \"x\"\nFROM t", "q2" -> "plain")
    val json = m.map { case (k, v) => s"${Json.quote(k)}: ${Json.quote(v)}" }
      .mkString("{", ",", "}")
    val parsed = mapper.readTree(json)
    assert(parsed.get("q1\ttab").asText() == "SELECT \"x\"\nFROM t")
    assert(parsed.get("q2").asText() == "plain")
  }
}
