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
      val r2 = spark.sql(
        """SELECT graft_shingle_hashes(array('a','b','c','d')) AS sh,
                  graft_sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS c,
                  graft_gram_stats(array('a','b','a','b')) AS gs,
                  graft_sq8_stats(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT))) AS sq""")
        .collect()(0)
      assert(r2.getSeq[Long](0) ==
        graft.dedup.Dedup.shingles(Seq("a", "b", "c", "d"))
          .map(graft.dedup.Dedup.fnv64).toSeq.sorted)
      assert(r2.getInt(1) == 2)
      // grams of (a b a b): bigrams [ab, ba, ab] -> max mult 2, n 3;
      // trigrams [aba, bab] -> n 2, distinct 2
      assert(r2.getSeq[Long](2) == Seq(2L, 3L, 2L, 2L))
      assert(r2.getSeq[Double](3)(0) == 2.0 / 127.0)
      // a null ELEMENT nulls the whole sq8 result (pinned degenerate contract)
      assert(spark.sql(
        "SELECT graft_sq8_stats(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)))")
        .collect()(0).isNullAt(0))
      // an empty vector defines scale 0, mse 0, max_err 0 (pinned contract)
      assert(spark.sql(
        "SELECT graft_sq8_stats(CAST(array() AS ARRAY<FLOAT>))")
        .collect()(0).getSeq[Double](0) == Seq(0.0, 0.0, 0.0))
      // wrong arity is a clean analysis error, not IndexOutOfBoundsException
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT graft_sorted_intersect_count(array(1L))").collect()
      }
      assert(e.getMessage.contains("graft_sorted_intersect_count"))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
