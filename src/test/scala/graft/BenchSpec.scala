package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench wiring invariants — pure map/list consistency, no Spark
  * session. A floor keyed on a misspelled query name would silently
  * never check anything (the breach rule only consults
  * `floorMap.contains`), so the tripwire itself needs a tripwire.
  */
class BenchSpec extends AnyFunSuite {

  test("headline names are unique and all resolve to SparkEntry queries") {
    val dup = Bench.headline.groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }
    assert(dup.isEmpty, s"duplicate headline entries: $dup")
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names without a query: $missing")
  }

  test("every sf0.1 floor keys a headline query, positively") {
    val orphans = Bench.floors.keySet -- Bench.headline.toSet
    assert(orphans.isEmpty, s"floors keyed on non-headline names: $orphans")
    val nonPos = Bench.floors.collect { case (k, v) if v <= 0 => k }
    assert(nonPos.isEmpty, s"non-positive floors: $nonPos")
    // the protocol pins a floor for EVERY headline query after each
    // round's clean run — a gap means a query escaped the tripwire
    val unpinned = Bench.headline.toSet -- Bench.floors.keySet
    assert(unpinned.isEmpty, s"headline queries without an sf0.1 floor: $unpinned")
  }

  test("every sf1 floor keys a headline query, positively") {
    val orphans = Bench.floorsSf1.keySet -- Bench.headline.toSet
    assert(orphans.isEmpty, s"sf1 floors keyed on non-headline names: $orphans")
    val nonPos = Bench.floorsSf1.collect { case (k, v) if v <= 0 => k }
    assert(nonPos.isEmpty, s"non-positive sf1 floors: $nonPos")
    assert(Bench.floorsSf1.size >= 10,
      "the sf1 tripwire covers the top-10 headline queries")
  }

  test("the streaming floor pin is positive when present") {
    assert(Bench.curationSinkFloorSec.forall(_ > 0))
  }

  test("stage floors key real StageClock stages, positively and completely") {
    // the stage names curationBatch actually bills — a floor keyed on a
    // renamed stage would silently never check anything (same failure
    // class as a misspelled query floor), and a stage WITHOUT a floor
    // is a place a regression can hide inside a flat total
    val stages = Set("gate", "band", "winnow", "assign", "cell", "write")
    val orphans = Bench.curationStageFloorsSec.keySet -- stages
    assert(orphans.isEmpty, s"stage floors keyed on unknown stages: $orphans")
    val unpinned = stages -- Bench.curationStageFloorsSec.keySet
    assert(unpinned.isEmpty, s"stages without a floor: $unpinned")
    val nonPos = Bench.curationStageFloorsSec.collect { case (k, v) if v <= 0 => k }
    assert(nonPos.isEmpty, s"non-positive stage floors: $nonPos")
  }

  test("quietWindow scales the steal guard to the query's own duration") {
    // sub-second queries keep the original absolute <50 semantics
    assert(Bench.quietWindow(0.3, 49) && !Bench.quietWindow(0.3, 50))
    // minute-long sf1 queries are judged per second — an absolute bound
    // made the sf1 tripwire unfireable (round-14 review finding)
    assert(Bench.quietWindow(80.0, 3999) && !Bench.quietWindow(80.0, 4001))
    // the clean-regime reading (~31 ticks/s) passes; contended (80+/s) fails
    assert(Bench.quietWindow(60.0, 1860) && !Bench.quietWindow(60.0, 4800))
  }
}
