package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalatest.funsuite.AnyFunSuite

import graft.sync.SlicePlanner

/** Property-form of the reference's interval contract (utils.py:29-38,
  * test_utils.py:20-26 — whose happy-path asserts were dead code, SURVEY
  * §0.2; these are the living version). Runs under sbt's native ScalaCheck
  * framework support. */
object SlicePlannerProps extends Properties("SlicePlanner") {

  private val ranges = for {
    start <- Gen.chooseNum(-100000L, 100000L)
    span  <- Gen.chooseNum(0L, 50000L)
    n     <- Gen.chooseNum(1L, 10000L)
  } yield (start, start + span, n)

  property("intervals tile [start,end]: contiguous, inclusive, n-bounded") =
    Prop.forAll(ranges) { case (start, end, n) =>
      val iv = SlicePlanner.intervals(start, end, n)
      val headOk = iv.head._1 == start && iv.last._2 == end
      val boundsOk = iv.forall { case (lo, hi) => lo <= hi && hi - lo + 1 <= n }
      val contiguous = iv.sliding(2).forall {
        case Vector((_, hi1), (lo2, _)) => lo2 == hi1 + 1
        case _                          => true
      }
      val fullWidth = iv.dropRight(1).forall { case (lo, hi) => hi - lo + 1 == n }
      headOk && boundsOk && contiguous && fullWidth
    }

  property("start > end rejected") = Prop.forAll(Gen.chooseNum(1L, 1000L)) { d =>
    Prop.throws(classOf[IllegalArgumentException])(
      SlicePlanner.intervals(d, d - 1, 10))
  }
}

class SlicePlannerSpec extends AnyFunSuite {

  test("intervals matches the reference's documented example") {
    assert(SlicePlanner.intervals(1, 10, 5) == Vector((1L, 5L), (6L, 10L)))
    assert(SlicePlanner.intervals(0, 0, 3) == Vector((0L, 0L)))
  }

  test("invalid args rejected (reference ValueError, test_utils.py:23-26)") {
    assertThrows[IllegalArgumentException](SlicePlanner.intervals(5, 4, 2))
    assertThrows[IllegalArgumentException](SlicePlanner.intervals(0, 10, 0))
  }

  test("sliceLength reproduces the reference arithmetic and clamps") {
    assert(SlicePlanner.sliceLength(0L, 1000000L, 100L, 10L) == 100000L)
    assert(SlicePlanner.sliceLength(0L, 10L, 1000000L, 10L) == 1L)
    assert(SlicePlanner.sliceLength(5L, 5L, 0L) == 1L)
  }

  test("numSlices = ceil(rows/target), >= 1") {
    assert(SlicePlanner.numSlices(0L) == 1)
    assert(SlicePlanner.numSlices(10000000L) == 1)
    assert(SlicePlanner.numSlices(10000001L) == 2)
    assert(SlicePlanner.numSlices(25L, 10L) == 3)
  }
}
