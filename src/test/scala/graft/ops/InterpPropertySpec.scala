package graft.ops

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the interpolation kernel (SURVEY §5:
  * "property-based tests that gates hold on all outputs").
  */
object InterpPropertySpec extends Properties("Interp") {

  private val samplesGen: Gen[(Array[Double], Array[Double])] = for {
    n <- Gen.choose(2, 50)
    gaps <- Gen.listOfN(n, Gen.choose(0.1, 100.0))
    ys <- Gen.listOfN(n, Gen.choose(-1000.0, 1000.0))
  } yield {
    val xs = gaps.scanLeft(0.0)(_ + _).tail.toArray
    (xs, ys.toArray)
  }

  private val xGen = Gen.choose(-500.0, 5500.0)

  property("linear stays within [min, max] of bracketing values inside range") =
    Prop.forAll(samplesGen, xGen) { case ((xs, ys), x0) =>
      val x = math.max(xs.head, math.min(xs.last, x0)) // clamp into range
      val v = Interp.linear(xs, ys, x)
      val i = Interp.intervalIndex(xs, x)
      val lo = math.min(ys(i), ys(i + 1)); val hi = math.max(ys(i), ys(i + 1))
      v >= lo - 1e-9 && v <= hi + 1e-9
    }

  property("nearest always returns an actual sample value") =
    Prop.forAll(samplesGen, xGen) { case ((xs, ys), x) =>
      ys.contains(Interp.nearest(xs, ys, x))
    }

  property("both methods are exact at the sample points") =
    Prop.forAll(samplesGen) { case (xs, ys) =>
      xs.indices.forall { i =>
        math.abs(Interp.linear(xs, ys, xs(i)) - ys(i)) < 1e-9 &&
          Interp.nearest(xs, ys, xs(i)) == ys(i)
      }
    }

  property("intervalIndex brackets every in-range point") =
    Prop.forAll(samplesGen, xGen) { case ((xs, ys), x0) =>
      val x = math.max(xs.head, math.min(xs.last, x0))
      val i = Interp.intervalIndex(xs, x)
      i >= 0 && i <= xs.length - 2 &&
        (xs(i) <= x || i == 0) && (x <= xs(i + 1) || i == xs.length - 2)
    }

  property("linear reproduces affine functions everywhere (incl. extrapolation)") =
    Prop.forAll(samplesGen, xGen, Gen.choose(-5.0, 5.0), Gen.choose(-100.0, 100.0)) {
      case ((xs, _), x, a, b) =>
        val ys = xs.map(v => a * v + b)
        math.abs(Interp.linear(xs, ys, x) - (a * x + b)) <
          1e-6 * (1.0 + math.abs(a * x + b))
    }
}
