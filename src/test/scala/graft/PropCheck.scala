package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check driver (scalatestplus-scalacheck is
  * not in the offline cache; raw scalacheck Gen sampling is). */
object PropCheck {
  def forAllG[A](gen: Gen[A], n: Int = 50)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    var produced = 0
    while (i < n * 4 && produced < n) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      i += 1
    }
    assert(produced > 0, "generator produced no samples")
  }

  def forAllG2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 50)(f: (A, B) => Unit): Unit =
    forAllG(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }
}
