package graft.ccm

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based tests (ScalaCheck) for the deterministic primitives — no
  * Spark session needed; these pin the pure arithmetic the whole oracle
  * story rests on.
  */
object PropertySpec extends Properties("graft.ccm primitives") {

  private val P = DetHash.P

  property("rankHash stays in [0, P) and is deterministic") = forAll(
    Gen.chooseNum(0L, Int.MaxValue.toLong),
    Gen.chooseNum(-1000L, 1000L),
    Gen.chooseNum(-100000L, 100000L),
    Gen.chooseNum(0L, 1000L)
  ) { (idx, sample, key, seed) =>
    val h = DetHash.rankHash(idx, sample, key, seed)
    h >= 0 && h < P && h == DetHash.rankHash(idx, sample, key, seed)
  }

  property("rankHash (hash, idx) sort keys are unique within a cell") = forAll(
    Gen.chooseNum(1L, 1000L),
    Gen.chooseNum(0L, 100L)
  ) { (sample, seed) =>
    // (idx+1)*a mod P is injective for idx < P; squaring folds h with P-h,
    // so the pipeline orders by the FULL (hash, idx) key — which must be
    // unique for the rank split to be a true permutation
    val n = 500
    val keys = (0 until n).map(i => (DetHash.rankHash(i.toLong, sample, 7L, seed), i))
    keys.distinct.length == n
  }

  property("polyHash in range and sensitive to single-char edits") = forAll(
    Gen.alphaNumStr.suchThat(_.nonEmpty)
  ) { s =>
    val h = DetHash.polyHash(s)
    val mutated = s"${(s.head + 1).toChar}${s.tail}"
    h >= 0 && h < P && DetHash.polyHash(mutated) != h
  }

  property("libSizeLadder sorted, bounded, reference start/step") = forAll(
    Gen.chooseNum(1, 5000)
  ) { max =>
    val ladder = CcmSpec.libSizeLadder(max)
    val base = ladder.nonEmpty && ladder == ladder.sorted && ladder.last <= max
    if (max < 10) base && ladder == Seq(max)
    else {
      val step = math.max(2, max / 20)
      base && ladder.head == math.max(max / 10, 5) &&
      ladder.sliding(2).forall(p => p.length < 2 || p(1) - p(0) == step)
    }
  }

  property("olsSlope finite; convergent follows slope and count") = forAll(
    Gen.listOfN(8, Gen.zip(Gen.chooseNum(1, 500), Gen.chooseNum(-1.0, 1.0)))
  ) { pts =>
    val slope = CcmLocal.olsSlope(pts)
    !slope.isNaN && CcmLocal.convergent(pts) == (pts.length >= 3 && slope > 0.001)
  }

}
