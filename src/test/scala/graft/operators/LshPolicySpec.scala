package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Single-source contract for the relaxed LSH-recall oracle policy (r18
  * honesty flag: the policy table existed in two checkers and could drift).
  * The table now lives ONLY in the registry ([[Q.lshRecall]]); Verify dumps
  * it as lsh_recall_policy.json and tools/check_oracle.py reads the dump.
  * This spec pins WHICH lanes may use it and that each policy is consistent
  * with its lane's own analytic banding curve — a new lane cannot slip into
  * the relaxed path without failing here. */
class LshPolicySpec extends AnyFunSuite {

  private val marked = graft.SparkEntry.all.collect {
    case (name, q) if q.lshRecall.isDefined => name -> q.lshRecall.get
  }

  test("exactly the two MinHash-LSH lanes carry a relaxed recall contract") {
    assert(marked.keySet == Set("t06_minhash_lsh", "t40_minhash_planned"),
      s"relaxed-contract lanes changed: ${marked.keySet} — adding one is a " +
        "deliberate act; justify the banding curve here first")
  }

  test("every policy is sane and every marked lane still has an exact " +
    "oracle tried first") {
    for ((name, p) <- marked) {
      assert(p.keys.nonEmpty && p.simCol.nonEmpty, name)
      assert(p.missCeiling > 0 && p.missCeiling < 1, name)
      assert(p.recallFloor >= 0.9 && p.recallFloor < 1,
        s"$name: a floor below 0.9 would stop catching broken pipelines")
      // relaxed is a FALLBACK: the lane must still carry the exact oracle
      assert(graft.SparkEntry.all(name).oracle.isDefined, name)
    }
  }

  test("each miss ceiling sits where its own banding curve makes a miss " +
    "non-probabilistic") {
    // t06 runs fixed 16 bands x 4 rows: above the ceiling a pair's
    // candidate probability is so high that a miss means broken hashing
    val p06 = marked("t06_minhash_lsh")
    assert(Dedup.LshPlan(16, 4).candidateProb(p06.missCeiling) >= 0.999,
      "t06 ceiling must clear the 16x4 curve")
    // ...and below it misses are genuinely expected: at 0.66 the same
    // curve still misses ~3.5% of pairs (the r19 ADVICE flake band)
    assert(Dedup.LshPlan(16, 4).candidateProb(0.66) < 0.97)
    // t40's plan is lshPlan(0.5, 0.99, 256) = 35x3; the steeper 3-row
    // curve makes a miss at its ceiling contradictory
    val p40 = marked("t40_minhash_planned")
    val plan40 = Dedup.lshPlan(0.5, 0.99, 256)
    assert(plan40 == Dedup.LshPlan(35, 3))
    assert(plan40.candidateProb(p40.missCeiling) >= 0.999,
      "t40 ceiling must clear the planned curve")
    // floors: t06 catches pipeline breakage, t40 pins its own plan target
    assert(p40.recallFloor == 0.99 && p06.recallFloor <= p40.recallFloor)
  }
}
