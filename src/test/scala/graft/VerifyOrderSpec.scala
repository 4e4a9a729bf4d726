package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.probes.{AnalyticProbes, EngineProbes, ExtensionProbes, ParityProbes, PipelineProbes}

/** Pins the Verify dump's truncation contract (round 13 — the r12 gate
  * artifact came back empty because the dump outgrew the driver window):
  * the catalog order must grade the §2 parity surface first and push the
  * multi-second streaming probes last, and it must be a permutation of
  * the query map so nothing is silently dropped.
  */
class VerifyOrderSpec extends AnyFunSuite {

  test("orderedQueryNames is a permutation of the query catalog") {
    val ordered = SparkEntry.orderedQueryNames
    assert(ordered.distinct.size == ordered.size, "duplicate names in the dump order")
    assert(ordered.toSet == SparkEntry.queries.keySet,
      "dump order must cover the catalog exactly")
    assert(SparkEntry.oracleSql.keySet.subsetOf(ordered.toSet),
      "every oracle key must be a catalog query")
  }

  test("parity/analytic/engine probes precede extension/pipeline; streaming probes run last") {
    val ordered = SparkEntry.orderedQueryNames
    val pos = ordered.zipWithIndex.toMap
    val cheap = (ParityProbes.all ++ AnalyticProbes.all ++ EngineProbes.all).map(_.name)
      .filterNot(_.contains("streaming"))
    val heavy = (ExtensionProbes.all ++ PipelineProbes.all).map(_.name)
      .filterNot(_.contains("streaming"))
    val streaming = ordered.filter(_.contains("streaming"))
    assert(cheap.map(pos).max < heavy.map(pos).min,
      "the §2 parity/engine surface must dump before the extension/pipeline catalog")
    if (streaming.nonEmpty) {
      val nonStreamingMax = ordered.filterNot(_.contains("streaming")).map(pos).max
      assert(streaming.map(pos).min > nonStreamingMax,
        "streaming probes (multi-second trigger waits) must dump last")
    }
  }
}
