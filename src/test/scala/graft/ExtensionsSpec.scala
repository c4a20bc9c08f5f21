package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make the native functions SQL-addressable in a
  * session configured only via spark.sql.extensions (no Sessions.local).
  */
class ExtensionsSpec extends AnyFunSuite {
  test("graft_top_k aggregates in pure SQL: best-k pairs, ranked") {
    val s = TestSpark.spark
    val r = s.sql(
      """SELECT g, graft_top_k(sim, id, 2) top FROM VALUES
           (1, 0.9d, 10L), (1, 0.7d, 11L), (1, 0.9d, 9L), (2, 0.1d, 20L)
           AS t(g, sim, id)
         GROUP BY g ORDER BY g""")
      .collect()
    val g1 = r(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g1.map(x => (x.getDouble(0), x.getLong(1))) == Seq((0.9, 9L), (0.9, 10L)))
    val g2 = r(1).getSeq[org.apache.spark.sql.Row](1)
    assert(g2.map(x => (x.getDouble(0), x.getLong(1))) == Seq((0.1, 20L)))
  }

  test("spark.sql.extensions=graft.GraftExtensions injects graft_cosine/graft_jaccard") {
    val prev = Some(TestSpark.spark) // shared context stays up
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val r = s2
        .sql("SELECT graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) c, " +
          "graft_jaccard(array('a','b'), array('b','c')) j")
        .head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-12)
      // the full text/similarity battery is SQL-addressable too
      val t = s2.sql(
        """SELECT graft_ngrams('a b a b', 2) ng,
                  graft_char_bigram_counts('aab') cbc,
                  graft_shingles('a b a b', 2) sh,
                  graft_simhash(array('x','y'), 16) simh,
                  graft_minhash(array('x','y'), 4) mh,
                  graft_lsh_buckets(array(0.5f, -0.25f), 2, 3) lb""").head()
      assert(t.getSeq[String](0) == Seq("a b", "b a", "a b"))
      assert(t.getMap[String, Long](1) == Map("aa" -> 1L, "ab" -> 1L))
      assert(t.getSeq[String](2).toSet == Set("a b", "b a"))
      assert(t.getLong(3) >= 0 && t.getLong(3) < (1L << 16))
      assert(t.getSeq[Long](4).size == 4)
      assert(t.getSeq[Long](5).size == 2 && t.getSeq[Long](5).forall(b => b >= 0 && b < 8))
      val m = s2.sql(
        """SELECT graft_image_dims(unhex('89504E470D0A1A0A0000000D49484452' ||
                                         '00000280' || '000001E0')).width,
                  graft_wav_info(cast('junk' AS BINARY))""").head()
      assert(m.getInt(0) == 640 && m.isNullAt(1))
      val n = s2.sql(
        """SELECT graft_strip_accents('Caf' || chr(233) || ' Z' || chr(252) || 'rich'),
                  graft_normalize('Cafe' || decode(unhex('CC81'), 'UTF-8'), 'NFC')""").head()
      assert(n.getString(0) == "Cafe Zurich")
      assert(n.getString(1) == "Café")
      val w = s2.sql("SELECT graft_jaro_winkler('martha', 'marhta') j").head()
      assert(math.abs(w.getDouble(0) - 0.9611111111111111) < 1e-12)
      // round-12 positional family
      val pg = s2.sql(
        """SELECT graft_masked_variants('ab') mv,
                  graft_token_chunks('a b c d e', 2) tc,
                  graft_max_multiplicity(array('x','y','x')) mm,
                  graft_char_entropy('aabb') ce""").head()
      assert(pg.getSeq[String](0) == Seq("\u0001b", "a\u0001"))
      assert(pg.getSeq[String](1) == Seq("a b", "c d", "e"))
      assert(pg.getInt(2) == 2)
      assert(math.abs(pg.getDouble(3) - 1.0) < 1e-12) // two equiprobable chars = 1 bit
      // non-literal size arguments are rejected with a clear message
      val ex = intercept[Exception] {
        s2.sql("SELECT graft_minhash(array('x'), cast(rand()*4 AS INT))").head()
      }
      assert(ex.getMessage.contains("literal"))
    } finally {
      SparkSession.setDefaultSession(prev.get)
      SparkSession.setActiveSession(prev.get)
    }
  }
}
