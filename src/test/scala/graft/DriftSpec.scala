package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._

/** Invariants for the drift/diversity/entropy/zipf telemetry wave
  * (queries.DriftQueries). The DuckDB oracle proves engine equality;
  * these pin the MATH — information-theoretic bounds that hold for
  * any corpus, so a formula regression fails even if both engines
  * regress together. */
class DriftSpec extends AnyFunSuite {

  private def run(name: String) =
    graft.queries.Registry.queries(name)(spark, sfTiny).collect()

  test("PSI of a hash split is near zero (the split is unbiased by construction)") {
    val terms = run("q_psi_drift").map(_.getAs[Double]("psi_term"))
    assert(terms.nonEmpty)
    val total = terms.sum
    // a uniform random split of the same corpus has PSI -> 0; the md5
    // split is exactly that. 0.25 is the standard "major shift" bar;
    // the split should sit far inside it.
    assert(math.abs(total) < 0.1, s"PSI $total for an unbiased split")
  }

  test("diversity indices respect their information-theoretic bounds") {
    run("q_diversity").foreach { r =>
      val nLangs = r.getAs[Long]("n_langs")
      val simpson = r.getAs[Double]("simpson")
      val entropy = r.getAs[Double]("entropy")
      assert(simpson >= 0.0 && simpson <= 1.0)
      assert(entropy >= -1e-6, s"negative entropy $entropy")
      // Shannon entropy over k categories is at most ln k (+ rounding slack)
      assert(entropy <= math.log(nLangs.toDouble) + 1e-3,
        s"entropy $entropy exceeds ln($nLangs)")
    }
  }

  test("per-doc entropy is bounded by ln(n_tokens) and zero iff single-token docs") {
    run("q_entropy_filter").foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val e = r.getAs[Double]("entropy")
      assert(e >= -1e-6 && e <= math.log(n.toDouble) + 1e-3,
        s"doc entropy $e outside [0, ln($n)]")
    }
  }

  test("zipf fit: token frequencies decay (negative slope)") {
    val r = run("q_zipf")
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_terms") > 10)
    assert(r(0).getAs[Double]("slope") < 0.0)
  }
}
