package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic sampling from ScalaCheck generators (the scalatestplus
  * bridge is not in the offline cache, so suites drive Gen directly).
  */
object GenHelper {
  def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] = {
    val p = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.apply(p, s))
      .collect { case Some(a) => a }
      .take(n)
      .toSeq
  }
}
