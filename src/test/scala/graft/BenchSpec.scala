package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit evidence for the Bench prior-artifact parser (ADVICE r7): the
  * cross-round swing baseline must survive a malformed value, parse the
  * full JSON double surface, and refuse a prior measured at a different
  * scale. Pure JVM — no SparkSession. */
class BenchSpec extends AnyFunSuite {

  private val sf01 = "/root/testdata/sf0.1"
  private def art(sf: String, queries: String) =
    s"""{"metric":"total","value":9.9,"unit":"sec","sf":"$sf","queries":{$queries},"median":{"q1":0.6}}"""

  test("parsePrior reads timings, drops -1 failure markers") {
    val m = Bench.parsePrior(art(sf01, "\"q1\":0.5,\"q2\":2.25,\"q3\":-1.0"), sf01)
    assert(m === Map("q1" -> 0.5, "q2" -> 2.25))
  }

  test("parsePrior accepts negative-exponent doubles") {
    val m = Bench.parsePrior(art(sf01, "\"fast\":1.5E-3,\"q1\":0.5"), sf01)
    assert(m === Map("fast" -> 0.0015, "q1" -> 0.5))
  }

  test("parsePrior: one malformed value drops that entry, not the map") {
    val m = Bench.parsePrior(art(sf01, "\"bad\":1..2,\"q1\":0.5,\"q2\":2.0"), sf01)
    assert(m.get("q1").contains(0.5) && m.get("q2").contains(2.0))
    assert(!m.contains("bad"))
  }

  test("parsePrior refuses a prior artifact from a different scale") {
    val m = Bench.parsePrior(art("/root/testdata/sf0.001", "\"q1\":0.5"), sf01)
    assert(m.isEmpty)
  }

  test("parsePrior keeps a pre-contract artifact with no sf field") {
    val noSf = """{"metric":"total","value":9.9,"queries":{"q1":0.5}}"""
    assert(Bench.parsePrior(noSf, sf01) === Map("q1" -> 0.5))
    assert(Bench.parsePrior("not json at all", sf01).isEmpty)
  }
}
