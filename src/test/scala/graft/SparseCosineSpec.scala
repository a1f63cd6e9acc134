package graft

import graft.ext.TextAnalysis

/** TextAnalysis.sparseCosinePairs — exact integer membership + the
  * hand-computed weight algebra on planted corpora. Terms are word
  * 3-shingles (the jaccard family's term space).
  */
class SparseCosineSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], centi: Int = 30,
                    maxDf: Long = 100L) =
    TextAnalysis.sparseCosinePairs(docs.toDF("doc_id", "text"),
      "text", "doc_id", minCosCenti = centi, maxDf = maxDf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap

  test("identical docs reach cosine 1.0; disjoint docs never pair") {
    val got = pairs(Seq((1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta")))
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == 1.0)
  }

  test("hand-computed weights: one shared + one unique shingle each ≈ 0.3077") {
    // d1 = "a b c d" → shingles {"a b c", "b c d"}; d2 = "a b c e" →
    // {"a b c", "b c e"}. N-independent rarity points (round 10):
    // shared (df=2) = round(1e5/3) = 33333, unique (df=1) = 50000;
    // norms = 33333² + 50000² = 3,611,088,889 each; dot = 33333² →
    // cos = 0.30768805… (the pre-r10 N-carrying weights gave exactly
    // 4/13 — same similarity, different rounding); the df=1 shingles
    // never join but their weight must reach the norms
    val got = pairs(Seq((1L, "a b c d"), (2L, "a b c e")))
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == 0.307688)
    // the exact integer threshold: 0.3077 < 0.31 → centi=31 excludes it
    assert(pairs(Seq((1L, "a b c d"), (2L, "a b c e")), centi = 31).isEmpty)
  }

  test("stop-listing is semantic: a hub shingle above maxDf neither pairs nor weighs") {
    // each doc: the shared prefix shingle "hub one two" (df=5) + two
    // unique suffix shingles (df=1). maxDf=4 stop-lists the hub → no
    // pairs at any threshold; admitted (maxDf=5), every pair scores
    // cos = 16667²/(16667² + 2·50000²) = 0.05263357…
    val hub = (1L to 5L).map(i => (i, s"hub one two uniqa$i uniqb$i"))
    assert(pairs(hub, centi = 5, maxDf = 4).isEmpty)
    val admitted = pairs(hub, centi = 5, maxDf = 5)
    assert(admitted.size == 10 && admitted.values.forall(_ == 0.052634))
  }

  test("overflow guard is LOUD: a norm² past the exact regime raises, never NULL-drops") {
    // past normSqBound the DECIMAL(38,0) products could overflow to
    // NULL and silently drop pair membership vs the HUGEINT oracle —
    // the guard must raise instead. Tripped here with a tiny bound so
    // the test doesn't need an astronomically weighted corpus; the
    // production default (1e15) is the Cauchy-Schwarz-derived regime.
    val df = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextAnalysis.sparseCosinePairs(df, "text", "doc_id",
        normSqBound = new java.math.BigDecimal("1000")).collect()
    }
    assert(e.getMessage.contains("DECIMAL(38,0)") ||
      Option(e.getCause).exists(_.getMessage.contains("DECIMAL(38,0)")))
    // and a bound that would itself re-open the overflow is rejected
    intercept[IllegalArgumentException] {
      TextAnalysis.sparseCosinePairs(df, "text", "doc_id",
        normSqBound = new java.math.BigDecimal("10000000000000000"))
    }
  }

  test("short docs (< shingleN tokens) carry their whole text as one shingle") {
    // the kernel's short-doc rule: "a b" IS a term, so the two short
    // clones pair at cos 1.0 — and never cross-pair with the long docs
    // (no shared shingle)
    val got = pairs(Seq((1L, "a b"), (2L, "a b"), (3L, "a b c d"),
      (4L, "a b c d")))
    assert(got.keySet == Set((1L, 2L), (3L, 4L)))
    assert(got.values.forall(_ == 1.0))
  }
}
