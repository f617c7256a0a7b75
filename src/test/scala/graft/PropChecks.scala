package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal property-check bridge (the scalatestplus artifact is not on the
  * offline classpath): samples a generator deterministically N times. */
trait PropChecks {
  val propRuns = 100

  def forAll[A](g: Gen[A])(f: A => Unit): Unit = {
    var i = 0
    while (i < propRuns) {
      g.apply(Gen.Parameters.default, Seed(i.toLong)) match {
        case Some(a) =>
          try f(a)
          catch {
            case e: Throwable =>
              throw new AssertionError(s"property failed for input: $a", e)
          }
        case None => ()
      }
      i += 1
    }
  }

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb)) { case (a, b) => f(a, b) }

  def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc)) { case (a, b, c) => f(a, b, c) }

  def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f
}
