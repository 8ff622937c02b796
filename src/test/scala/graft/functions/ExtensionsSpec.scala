package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.SparkTestSession

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects SQL functions at session build time") {
    val shared = SparkTestSession.spark // pin the shared context first
    // extensions bind at session build; clear the session slots so
    // getOrCreate builds a NEW session (same context) with our extensions
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val r = spark.sql(
        """SELECT graft_fnv32('abc') AS h,
                  graft_minhash_tokens(array('a','b','c','d')) AS sig,
                  graft_minhash_sig(array('a b c', 'b c d')) AS sig2,
                  graft_simhash_tokens(array('a','b','c','d')) AS sh,
                  graft_fingerprint_tokens(array('a','b','c','d','e','f','g')) AS fp""")
        .collect()(0)
      assert(r.getInt(0) == Fnv32.hash("abc"))
      assert(r.getSeq[Long](1) ==
        graft.dedup.Dedup.minhashSig(graft.dedup.Dedup.shingles(Seq("a", "b", "c", "d"))).toSeq)
      assert(r.getSeq[Long](2) ==
        graft.dedup.Dedup.minhashSig(Set("a b c", "b c d")).toSeq)
      assert(r.getLong(3) == graft.dedup.Dedup.simhash(Seq("a", "b", "c", "d")))
      assert(r.getSeq[Long](4) ==
        graft.dedup.Dedup.fingerprintsScalar(Seq("a", "b", "c", "d", "e", "f", "g"), 5, 4).toSeq)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
