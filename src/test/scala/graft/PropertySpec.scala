package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.4) for the pure kernels that
  * back declared queries — the pieces whose edge cases a fixed fixture
  * can't sweep. Driven with plain ScalaCheck (no scalatest bridge in the
  * offline dependency cache).
  */
class PropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val pixelArrays: Gen[Array[Byte]] =
    Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  test("decodeStub: every pixel lands in [0,1]; length preserved") {
    check(Prop.forAll(pixelArrays) { bytes =>
      val px = ops.Multimodal.decodeStub(bytes)
      px.length == bytes.length && px.forall(v => v >= 0.0f && v <= 1.0f)
    })
  }

  test("resizePool: fixed output size; pooled means stay within input range") {
    check(Prop.forAll(pixelArrays, Gen.choose(1, 32)) { (bytes, buckets) =>
      val px = ops.Multimodal.decodeStub(bytes)
      val pooled = ops.Multimodal.resizePool(px, buckets)
      val lo = px.min.toDouble; val hi = px.max.toDouble
      pooled.length == buckets &&
        pooled.filter(_ != 0.0).forall(v => v >= lo - 1e-9 && v <= hi + 1e-9)
    })
  }

  test("resizePool: constant input pools to the constant") {
    check(Prop.forAll(Gen.choose(1, 500), Gen.choose(1, 16)) { (n, buckets) =>
      val px = Array.fill(n)(0.5f)
      ops.Multimodal.resizePool(px, buckets)
        .filter(_ != 0.0).forall(v => math.abs(v - 0.5) < 1e-9)
    })
  }

  test("mapPartitions scorer: predictions are valid labels") {
    import TestSpark._
    val labels = Tables.t(spark, sf, "embeddings")
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    val preds = ops.InferMapPartitions.scoreMapPartitions(spark, sf)
      .select("pred").distinct().collect().map(_.getInt(0)).toSet
    assert(preds.subsetOf(labels))
  }
}
