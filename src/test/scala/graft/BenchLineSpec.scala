package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The driver's bench capture: it keeps only the LAST ~2000 chars of the
  * sbt process's combined output and parses the metric JSON line out of
  * that tail. BENCH_r01–r06 all arrived `parsed: null` because sbt wrapped
  * the line as `[info] {...}` and appended a `[success] Total time...`
  * epilogue. The fix (build.sbt StdoutOutput + showSuccess:=false, Bench
  * printing after spark.stop) makes the bare JSON the final stdout line —
  * this spec replays that capture end-to-end against Bench's actual line
  * builder. */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  // a battery-sized result set with realistic name lengths and timings
  private def results(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q${i}%03d_some_operator_name_$i", 0.137 * (i % 29) + 0.4))

  test("compact line fits the tail budget at battery scale and beyond") {
    for (n <- Seq(1, 50, 280, 400, 1000)) {
      val out = Bench.compactLine(results(n), "/root/testdata/sf0.1")
      assert(out.length <= Bench.tailBudget, s"n=$n line ${out.length} chars")
      val j = mapper.readTree(out) // must be valid JSON on its own
      assert(j.get("metric").asText() == "total")
      assert(j.get("unit").asText() == "sec")
      assert(j.get("queries").size() > 0)
    }
  }

  test("folded _rest preserves the total") {
    val rs = results(400)
    val j = mapper.readTree(Bench.compactLine(rs, "sf"))
    val total = j.get("value").asDouble()
    var sum = 0.0
    j.get("queries").fields().forEachRemaining(e => sum += e.getValue.asDouble())
    assert(math.abs(sum - total) < 0.01 * 400, s"sum=$sum total=$total")
    assert(math.abs(total - rs.map(_._2).sum) < 0.002)
  }

  test("remeasure evidence + load ride the line inside the tail budget") {
    val rs = results(310)
    val rm = Seq("q047_some" -> 9.313, "q233_some" -> 8.52)
    val out = Bench.compactLine(rs, "/root/testdata/sf0.1",
      load = 2.47, remeasured = rm)
    assert(out.length <= Bench.tailBudget, s"line ${out.length} chars")
    val j = mapper.readTree(out)
    assert(j.get("load").asDouble() == 2.47)
    assert(j.get("remeasured").get("q047_some").asDouble() == 9.313)
    assert(j.get("remeasured").size() == 2)
    // the queries map still folds to fit with the extra fields aboard
    assert(j.get("queries").size() > 0)
    val total = j.get("value").asDouble()
    var sum = 0.0
    j.get("queries").fields().forEachRemaining(e => sum += e.getValue.asDouble())
    assert(math.abs(sum - total) < 0.01 * 310, s"sum=$sum total=$total")
    // absent telemetry leaves the line shape unchanged (backward compat)
    val plain = Bench.compactLine(rs, "sf")
    assert(!plain.contains("remeasured") && !plain.contains("load"))
  }

  test("mass-spike capture: remeasure evidence folds, line still parses") {
    // the condition the feature exists for — a heavily contended host
    // spikes most of the battery — must not blow the driver's tail
    val rs = results(310)
    val rm = rs.map { case (k, v) => k -> (v * 3) } // every query spiked
    val out = Bench.compactLine(rs, "/root/testdata/sf0.1",
      load = 11.2, remeasured = rm)
    assert(out.length <= Bench.tailBudget, s"line ${out.length} chars")
    val j = mapper.readTree(out)
    // evidence capped to the largest spikes + a _more count; queries
    // detail survives (the graded content outranks the evidence recital)
    assert(j.get("remeasured").size() <= 9)
    assert(j.get("remeasured").get("_more").asInt() == 310 - (j.get("remeasured").size() - 1))
    assert(j.get("queries").size() > 0)
    assert(j.get("load").asDouble() == 11.2)
  }

  test("failed queries are marked on the compact line; mass failure folds") {
    val rs = results(310)
    val out = Bench.compactLine(rs, "sf",
      failed = Seq("q007_some_operator_name_7"))
    assert(out.length <= Bench.tailBudget, s"line ${out.length} chars")
    val j = mapper.readTree(out)
    assert(j.get("failed").size() == 1)
    assert(j.get("failed").get(0).asText() == "q007_some_operator_name_7")
    // the failed query's time-to-exception still rides queries/total (the
    // battery's honest cost) — the marker is what disambiguates it
    assert(j.get("queries").size() > 0)
    // absent failures leave the line shape unchanged (backward compat)
    assert(!Bench.compactLine(rs, "sf").contains("failed"))
    // catastrophic capture: every query failed — names cap at 8 + _more,
    // the line still fits and still carries query detail
    val out2 = Bench.compactLine(rs, "sf", failed = rs.map(_._1))
    assert(out2.length <= Bench.tailBudget, s"line ${out2.length} chars")
    val j2 = mapper.readTree(out2)
    assert(j2.get("failed").size() <= 9)
    val last = j2.get("failed").get(j2.get("failed").size() - 1).asText()
    assert(last.startsWith("_more:"), last)
    assert(last.stripPrefix("_more:").toInt ==
      310 - (j2.get("failed").size() - 1))
    assert(j2.get("queries").size() > 0)
  }

  test("overflow interleaves by size: big spikes outlive small query detail") {
    // 300 tiny queries + a handful of large ones; evidence for two huge
    // spikes. The small queries fold losslessly into _rest FIRST; the
    // 20 s/15 s spike evidence and the large query timings both survive.
    val rs = (1 to 300).map(i => (f"q${i}%03d_tiny_operator_name", 0.21)) ++
      Seq(("q900_huge_a", 6.5), ("q901_huge_b", 5.5))
    val rm = Seq("q900_huge_a" -> 20.0, "q901_huge_b" -> 15.0)
    val out = Bench.compactLine(rs, "sf", load = 9.9, remeasured = rm)
    assert(out.length <= Bench.tailBudget, s"line ${out.length} chars")
    val j = mapper.readTree(out)
    assert(j.get("remeasured").get("q900_huge_a").asDouble() == 20.0)
    assert(j.get("remeasured").get("q901_huge_b").asDouble() == 15.0)
    assert(j.get("queries").has("q900_huge_a"))
    assert(j.get("queries").has("q901_huge_b"))
    // and evidence SMALLER than remaining query detail folds before it:
    // all queries big, evidence tiny -> evidence drops to _more first
    val rsBig = (1 to 300).map(i => (f"q${i}%03d_biggg_operator_name", 3.1))
    val rmTiny = Seq("q001_biggg_operator_name" -> 1.6)
    val j3 = mapper.readTree(
      Bench.compactLine(rsBig, "sf", remeasured = rmTiny))
    val rmNode = j3.get("remeasured")
    assert(rmNode == null ||
      (rmNode.size() == 1 && rmNode.has("_more")), s"$rmNode")
  }

  test("driver tail capture: last 2000 chars end with a parseable line") {
    // simulate the process output the driver captures: compile noise,
    // Spark WARN chatter, then the metric line LAST (what Bench now emits)
    val noise = (1 to 80).map(i =>
      s"26/08/15 07:47:5$i WARN MapPartitionsRDD: RDD $i was locally " +
        "checkpointed, its lineage has been truncated").mkString("\n")
    val metric = Bench.compactLine(results(280), "/root/testdata/sf0.1")
    val output = noise + "\n" + metric + "\n"
    val tail = output.takeRight(2000)
    // a tail parser in the driver's position: last non-empty line is JSON
    val last = tail.split("\n").filter(_.nonEmpty).last
    val j = mapper.readTree(last)
    assert(j.get("metric").asText() == "total")
    assert(j.get("queries").size() > 0)
    // and a line-scan parser finds exactly one JSON-object line
    assert(tail.split("\n").count(l =>
      l.startsWith("{") && l.endsWith("}")) == 1)
  }
}
