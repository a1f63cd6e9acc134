package graft

/** DuckDB oracle twins for SparkEntry.queries (driver contract).
  *
  * TOKENIZATION: the analysis-family twins use [[wsToks]]/[[wsToksCased]]
  * — the exact DuckDB mirror of the engine's pinned tokenizer
  * ([[graft.ext.Tok]]): whitespace-charset trim + split on the explicit
  * class `[ \t\n\x0B\f\r]+`. Parity holds on ANY whitespace shape
  * (gated on the tab/CRLF/double-space fixture of
  * tools/make_ws_fixture.py), not just the single-spaced generated
  * corpus. Only the reassembly twins (ns_block_dedup, ns_chunk_docs)
  * and the array-surface test (t_array_funcs) keep the exact
  * single-space `string_split` — matching the engine rule there, where
  * spacing is content (both engines keep internal AND trailing empty
  * fields, so `split(t, " ")` = `string_split(t, ' ')` on any input).
  *
  * Dialect notes (parity decisions, validated against DuckDB 1.0):
  *  - events.ts has shipped as both ns- and µs-precision parquet;
  *    Tables.events adapts to either and always exposes µs-truncated
  *    `ts_us` + long-nanos `ts`, matching DuckDB's native µs read
  *    (for ns files DuckDB truncates to µs = Spark's floor(ns/1000)).
  *  - float sums are avoided or exact (integer-valued doubles, int
  *    ratios); cosine uses CAST(... AS DOUBLE[]) which is bit-identical
  *    to Spark's double fold, plus round(.,6) on output.
  *  - count()/len() results are cast so both engines emit the same
  *    physical type (BIGINT vs INT).
  */
object OracleSql {

  private val stopwordsIn =
    "('the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it')"

  /** DuckDB mirror of [[graft.ext.Tok]] — the pinned analysis-family
    * tokenizer. The trim charset is spelled out because DuckDB's
    * one-arg trim strips only spaces, and the split class is explicit
    * because RE2 `\s` excludes \x0B while Java's includes it.
    */
  private val wsTrimChars =
    "(' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))"
  private def wsToks(e: String): String =
    s"regexp_split_to_array(trim(lower($e), $wsTrimChars), '[ \\t\\n\\x0B\\f\\r]+')"
  private def wsToksCased(e: String): String =
    s"regexp_split_to_array(trim($e, $wsTrimChars), '[ \\t\\n\\x0B\\f\\r]+')"

  /** Rank-ordered BPE replace chain over the space-separated character
    * form — generated from the same [[graft.ext.PinnedBpe]] constant
    * the Spark query evaluates, so both engines apply the identical
    * merge table with identical left-to-right non-overlapping
    * replace() semantics.
    */
  private def bpeChainSql(wordExpr: String): String =
    graft.ext.PinnedBpe.merges.foldLeft(
      s"' ' || regexp_replace($wordExpr, '(.)', '\\1 ', 'g')") {
      case (acc, (l, r)) => s"replace($acc, ' $l $r ', ' $l$r ')"
    }

  /** Quality-feature + score CTEs over documents (f / scored) — the
    * DuckDB mirror of `TextAnalysis.qualityScore`; shared by
    * ns_text_quality and ns_quality_filter so the formula stays in
    * lockstep.
    */
  private def qualityCtes: String =
    s"""f AS (
        SELECT doc_id,
          len(${wsToks("text")}) AS n_words,
          CAST(length(text) - (len(${wsToks("text")}) - 1) AS DOUBLE)
            / len(${wsToks("text")}) AS avg_word_len,
          CAST(len(regexp_extract_all(text, '[\\.,;:!\\?]')) AS DOUBLE) / length(text) AS punct_ratio,
          CAST(len(list_filter(${wsToks("text")}, w -> w IN $stopwordsIn)) AS DOUBLE)
            / len(${wsToks("text")}) AS stopword_ratio
        FROM documents),
      scored AS (
        SELECT doc_id, n_words, avg_word_len, stopword_ratio,
          (CASE WHEN n_words BETWEEN 10 AND 10000 THEN 4 ELSE 0 END
           + CASE WHEN stopword_ratio > 0.05 THEN 3 ELSE 0 END
           + CASE WHEN punct_ratio < 0.2 THEN 2 ELSE 0 END
           + CASE WHEN avg_word_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END) / 10.0 AS quality_score
        FROM f)"""

  /** Exact-BIGINT quality-model CTEs (qf / qm / qs) — the DuckDB
    * mirror of `TextAnalysis.qualityModel`: integer-division
    * micro-ratio features, pinned integer weights, one BIGINT linear
    * chain. Shared by ns_quality_model and ns_quality_by_source.
    */
  private def qualityModelCtes: String =
    s"""qf AS (
        SELECT doc_id AS doc,
          CAST(len(${wsToks("text")}) AS BIGINT) AS n_words,
          greatest(CAST(length(text) AS BIGINT), 1) AS n_chars,
          CAST(len(list_filter(${wsToks("text")}, w -> w IN $stopwordsIn)) AS BIGINT) AS stop,
          CAST(len(regexp_extract_all(text, '[\\.,;:!\\?]')) AS BIGINT) AS punct,
          CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit
        FROM documents),
      qm AS (
        SELECT doc, n_words,
          stop * 1000000 // n_words AS stop_m,
          punct * 1000000 // n_chars AS punct_m,
          digit * 1000000 // n_chars AS digit_m
        FROM qf),
      qs AS (
        SELECT doc, n_words, stop_m, punct_m, digit_m,
          CAST(800 * least(n_words, 1000) + 2 * stop_m - punct_m - digit_m
               AS BIGINT) AS score_micro
        FROM qm)"""

  /** Winnowing CTE chain (k=3, w=4) through `sel` (rk = 1 rows are the
    * selected fingerprints) — shared by ns_winnow_fingerprints and
    * ns_winnow_matches so the positional re-implementation stays in
    * lockstep.
    */
  private def winnowCtes: String =
    s"""toksa AS (SELECT doc_id, ${wsToks("text")} AS t FROM documents),
      tk AS (SELECT doc_id, unnest(t) AS wd,
               generate_subscripts(t, 1) AS pos FROM toksa),
      cv AS (SELECT doc_id, pos,
               CAST(ascii(substring(wd, 1, 1)) AS BIGINT) * 131
                 + CAST(length(wd) AS BIGINT) AS ci
             FROM tk),
      g0 AS (SELECT doc_id, pos AS i,
               (1 * ci + 2 * lead(ci, 1) OVER dw
                  + 3 * lead(ci, 2) OVER dw) AS s,
               lead(ci, 2) OVER dw AS ok
             FROM cv WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
      g AS (SELECT doc_id, i, s % 1000003 AS h FROM g0 WHERE ok IS NOT NULL),
      m AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
      starts AS (SELECT g.doc_id, g.i AS ws
                 FROM g JOIN m ON m.doc_id = g.doc_id
                 WHERE g.i <= m.ng - 3),
      cand AS (SELECT s.doc_id, s.ws, g.i, g.h
               FROM starts s JOIN g ON g.doc_id = s.doc_id
                AND g.i BETWEEN s.ws AND s.ws + 3),
      sel AS (SELECT doc_id, ws, i, h,
                row_number() OVER (PARTITION BY doc_id, ws
                                   ORDER BY h ASC, i DESC) AS rk
              FROM cand)"""

  /** Shared n-gram jaccard CTE chain over `src` rows (doc_id, text):
    * tokens → 3-gram shingles (whole-text fallback under 3 words) →
    * sizes + pairwise intersections. `pruned = true` mirrors
    * TextDedup.ngramJaccardPairs' default document-frequency cap
    * (maxPostings = 5000) so the oracle and the engine stay equal on
    * corpora where a boilerplate shingle exceeds the cap — not only at
    * test scale where the cap is a no-op. `pruned = false` is the full
    * shingle universe, which is what minhashVerifiedPairs verifies
    * against.
    */
  /** Word-trigram shingle CTEs over `src` (toks / sh0 / sh): sh =
    * distinct (doc_id, shingle), with short docs collapsing to one
    * whole-text shingle — mirrors `TextDedup.docShingles`.
    */
  private def shingleCtes(src: String): String =
    s"""toksa AS (
        SELECT doc_id, ${wsToks("text")} AS toka FROM $src),
      toks AS (
        SELECT doc_id, unnest(toka) AS w,
               generate_subscripts(toka, 1) AS pos
        FROM toksa),
      sh0 AS (
        SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos)
               || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS sh
        FROM toks),
      sh AS (
        SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL
        UNION
        SELECT doc_id, array_to_string(toka, ' ') FROM toksa
        WHERE len(toka) < 3)"""

  private def jaccardCtes(src: String, pruned: Boolean): String = {
    val shSrc = if (pruned) "shp" else "sh"
    shingleCtes(src) + "," +
      (if (pruned) """
      shp AS (
        SELECT doc_id, sh FROM sh
        WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 5000)),"""
      else "") +
      s"""
      sizes AS (SELECT doc_id, count(*) AS nsh FROM $shSrc GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM $shSrc a JOIN $shSrc b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2)"""
  }

  /** BM25 CTE chain over documents for a fixed query-term set —
    * scoring formulas injected VERBATIM from [[graft.ext.Bm25]] so both
    * engines parse the identical expression tree (the rational-idf
    * form; see Bm25's scaladoc for why log-idf can never hash-match).
    * Produces `bm(doc, score_pts, n_terms)`. DuckDB `sum(BIGINT)` is
    * HUGEINT — cast back to BIGINT.
    */
  private def bm25Ctes(termsIn: String, k1: Double = 1.2,
                       b: Double = 0.75): String =
    s"""bmbase AS (
        SELECT doc_id AS doc,
               CAST(len(${wsToks("text")}) AS BIGINT) AS dl
        FROM documents),
      bmstats AS (
        SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
        FROM bmbase),
      bmtoks AS (
        SELECT doc_id AS doc,
               unnest(${wsToks("text")}) AS term
        FROM documents),
      bmtf AS (
        SELECT t.doc, b.dl, t.term, count(*) AS tf
        FROM bmtoks t JOIN bmbase b ON b.doc = t.doc
        WHERE t.term IN $termsIn GROUP BY 1, 2, 3),
      bmdf AS (SELECT term, count(*) AS dfq FROM bmtf GROUP BY 1),
      bmpts AS (
        SELECT doc, ${graft.ext.Bm25.pointsSql(k1, b)} AS pts
        FROM (SELECT bmtf.*, bmdf.dfq, n_docs,
                     ${graft.ext.Bm25.avgdlSql} AS avgdl
              FROM bmtf JOIN bmdf USING (term) CROSS JOIN bmstats)),
      bm AS (
        SELECT doc, CAST(sum(pts) AS BIGINT) AS score_pts,
               count(*) AS n_terms
        FROM bmpts GROUP BY 1)"""

  private val bm25TermsIn = "('spark','vector','dup')"

  /** Exact scaled-integer per-label embedding means — shared by the
    * explode-form and UDAF-form centroid queries (bit-equal contract).
    */
  private val embedCentroidsSql: String =
    """SELECT label, CAST(pos - 1 AS INT) AS dim, count(*) AS n,
        round(CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
              / (count(*) * 1000000.0), 6) AS centroid
      FROM (SELECT label, unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings)
      GROUP BY 1, 2 ORDER BY label, dim"""

  /** Morton interleave of the low `bits` bits of x/y as explicit
    * shift-mask-or terms — the SQL mirror of `op.Scale.zValue` (exact
    * integer arithmetic on both engines).
    */
  private def zvalueSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  /** Cross-corpus jaccard (new batch = doc_id % 10 = 0 vs the rest),
    * over the corpus-df-pruned shingle universe — the same pruning
    * rule TextDedup.crossNearDups applies (cap 5000 on the CORPUS side,
    * removed from both sides). Keep in lockstep with the Scala op.
    */
  /** Exact all-pairs jaccard at the verified threshold — shared by
    * `ns_dedup_minhash_verified` (one-shot LSH + exact verify) and
    * `ns_minhash_incremental` (the same matcher over the folded band
    * table), so incremental convergence is enforced by hash.
    */
  /** `ns_dedup_minhash` — the round-15 promotion: the seeded PORTABLE
    * MinHash-LSH estimate pairs recomputed end-to-end (shingle codes,
    * 16-permutation signature, r=2 band buckets, the 1000-cap
    * candidate self-join, component-match estimate) with the exact
    * integer arithmetic of `TextDedup.minhashLshPortable` — constants
    * generated from the same (j-seeded) formulas, so the two engines
    * can never drift on a hand-copied literal. Division by 16 is
    * exact in IEEE doubles, so est_jaccard hash-matches bit-for-bit.
    */
  /** CTEs recomputing the PORTABLE hyperplane-LSH signature
    * (`VectorSearch.lshBucketPortableExpr`) for every embeddings row:
    * components quantized to exact BIGINTs (`floor(double(x)·1024)` —
    * float→double widening and a power-of-two multiply are exact), and
    * bit j of the `nbits`-bit signature set iff the exact integer dot
    * with the seeded Rademacher plane is ≥ 0. Plane entry for 1-based
    * dim i: parity of `(i·(2j+3)·65537 + (j+1)·514229) mod 1000003` —
    * the formulas are shared with the Spark expression, not the
    * constants, so the engines cannot drift on a hand-copied literal.
    * Yields `buck(vec_id, bf)`.
    */
  private def annSigCtes(nbits: Int): String =
    s"""quant AS (
        SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024) AS BIGINT) AS qi
        FROM embeddings),
      bitsj AS (SELECT CAST(unnest(generate_series(0, ${nbits - 1})) AS BIGINT) AS j),
      sig AS (
        SELECT vec_id, j,
          CASE WHEN SUM(qi * (CASE WHEN ((i * ((2*j+3)*65537)
                     + (j+1)*514229) % 1000003) % 2 = 0
                   THEN 1 ELSE -1 END)) >= 0
               THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END AS bitval
        FROM quant CROSS JOIN bitsj GROUP BY vec_id, j),
      buck AS (SELECT vec_id, CAST(SUM(bitval) AS BIGINT) AS bf
               FROM sig GROUP BY vec_id)"""

  /** `ns_ann_lsh` — the round-15 promotion: single-table portable
    * hyperplane LSH (bits=3), Hamming-≤2 multi-probe, bit-portable
    * DOUBLE[] cosine, rank on (rounded sim, vec_id). The probe
    * neighborhood explode on the Spark side is equivalent to the
    * direct `bit_count(xor) <= 2` predicate here.
    */
  private def annLshPortableSql: String =
    s"""WITH ${annSigCtes(3)},
      cand AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id
        FROM buck c JOIN buck q
          ON q.vec_id < 5 AND c.vec_id <> q.vec_id
          AND bit_count(xor(c.bf, q.bf)) <= 2),
      scored AS (
        SELECT cand.query_id, cand.vec_id,
          round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                       CAST(eq.embedding AS DOUBLE[])), 6) AS sim
        FROM cand
        JOIN embeddings e ON e.vec_id = cand.vec_id
        JOIN embeddings eq ON eq.vec_id = cand.query_id),
      ranked AS (
        SELECT query_id, vec_id, sim,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id, sim FROM ranked
      WHERE rank <= 10 ORDER BY query_id, rank"""

  /** `ns_ann_multitable` — 6 tables × 4 bits sliced from one 24-bit
    * portable signature; candidate iff ANY table collides at
    * Hamming ≤ 1 (the Spark side's per-table key explode + probe).
    */
  private def annMultitablePortableSql: String =
    s"""WITH ${annSigCtes(24)},
      tb AS (
        SELECT vec_id, t, (bf >> (t * 4)) & 15 AS bk
        FROM buck CROSS JOIN
          (SELECT CAST(unnest(generate_series(0, 5)) AS BIGINT) AS t)),
      cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
        FROM tb q JOIN tb c ON c.t = q.t
          AND bit_count(xor(c.bk, q.bk)) <= 1
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
      scored AS (
        SELECT cand.query_id, cand.vec_id,
          round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                       CAST(eq.embedding AS DOUBLE[])), 6) AS sim
        FROM cand
        JOIN embeddings e ON e.vec_id = cand.vec_id
        JOIN embeddings eq ON eq.vec_id = cand.query_id),
      ranked AS (
        SELECT query_id, vec_id, sim,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id, sim FROM ranked
      WHERE rank <= 10 ORDER BY query_id, rank"""

  /** `ns_embed_neardup_lsh` — candidate pairs (a < b) colliding at
    * Hamming ≤ 1 in ≥ 1 of the 6 portable tables, verified with the
    * bit-portable cosine at the UNROUNDED threshold (the Spark side
    * filters on the exact cosine, then rounds for display — same
    * here).
    */
  private def embedNearDupLshPortableSql: String =
    s"""WITH ${annSigCtes(24)},
      tb AS (
        SELECT vec_id, t, (bf >> (t * 4)) & 15 AS bk
        FROM buck CROSS JOIN
          (SELECT CAST(unnest(generate_series(0, 5)) AS BIGINT) AS t)),
      cpairs AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM tb a JOIN tb b ON a.t = b.t AND a.vec_id < b.vec_id
          AND bit_count(xor(a.bk, b.bk)) <= 1)
      SELECT id_a, id_b,
        round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                     CAST(eb.embedding AS DOUBLE[])), 6) AS cosine_r
      FROM cpairs
      JOIN embeddings ea ON ea.vec_id = id_a
      JOIN embeddings eb ON eb.vec_id = id_b
      WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                   CAST(eb.embedding AS DOUBLE[])) > 0.35
      ORDER BY id_a, id_b"""

  /** `ns_ann_lsh_incremental` — the persisted-LSH promotion (r15):
    * the stored state is built with the portable family, so the twin
    * recomputes the 8×4-bit signature, drops the retracted ids
    * (vec_id % 9 = 0 — retraction ≡ fresh fold over survivors, the
    * IncrementalLshSpec-pinned identity), probes per-table slices at
    * Hamming ≤ 2 (the depth-2 query-side probe) and ranks with the
    * bit-portable cosine. Queries come from the CORPUS table (not the
    * state), so a retracted id can still query — it just can't be
    * returned.
    */
  private def annLshIncrementalPortableSql: String =
    s"""WITH ${annSigCtes(32)},
      tb AS (
        SELECT vec_id, t, (bf >> (t * 4)) & 15 AS bk
        FROM buck CROSS JOIN
          (SELECT CAST(unnest(generate_series(0, 7)) AS BIGINT) AS t)),
      cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
        FROM tb q JOIN tb c ON c.t = q.t
          AND bit_count(xor(c.bk, q.bk)) <= 2
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
          AND c.vec_id % 9 <> 0),
      scored AS (
        SELECT cand.query_id, cand.vec_id,
          round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                       CAST(eq.embedding AS DOUBLE[])), 6) AS sim
        FROM cand
        JOIN embeddings e ON e.vec_id = cand.vec_id
        JOIN embeddings eq ON eq.vec_id = cand.query_id),
      ranked AS (
        SELECT query_id, vec_id, sim,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id, sim FROM ranked
      WHERE rank <= 10 ORDER BY query_id, rank"""

  private def minhashPortableSql: String =
    s"""WITH toksa AS (
        SELECT doc_id, ${wsToks("text")} AS toka FROM documents),
      tok AS (
        SELECT doc_id, unnest(toka) AS t,
               generate_subscripts(toka, 1) AS pos
        FROM toksa),
      codes AS (
        SELECT doc_id, pos,
          CAST(ascii(substring(t, 1, 1)) * 131 + length(t) AS BIGINT)
            % 1000003 AS c
        FROM tok),
      win AS (
        SELECT doc_id, c,
          lead(c) OVER (PARTITION BY doc_id ORDER BY pos) AS c2,
          lead(c, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS c3
        FROM codes),
      ndoc AS (SELECT doc_id, len(toka) AS n FROM toksa),
      sh3 AS (
        SELECT DISTINCT w.doc_id,
          ((c * 131071 + c2) % 1000003 * 131071 + c3) % 1000003 AS s
        FROM win w JOIN ndoc USING (doc_id)
        WHERE n >= 3 AND c3 IS NOT NULL),
      shshort AS (
        SELECT doc_id,
          CASE WHEN n = 1 THEN cmin
               ELSE (cmin * 131071 + cmax) % 1000003 END AS s
        FROM (
          SELECT c.doc_id, n,
            min(c) FILTER (WHERE pos = 1) AS cmin,
            min(c) FILTER (WHERE pos = 2) AS cmax
          FROM codes c JOIN ndoc USING (doc_id)
          WHERE n < 3 GROUP BY c.doc_id, n)),
      shc AS (SELECT doc_id, s FROM sh3
              UNION SELECT doc_id, s FROM shshort),
      mins AS (SELECT doc_id,
        min((s * 196611 + 0) % 1000003) AS m0,
        min((s * 327685 + 427799) % 1000003) AS m1,
        min((s * 458759 + 855598) % 1000003) AS m2,
        min((s * 589833 + 283394) % 1000003) AS m3,
        min((s * 720907 + 711193) % 1000003) AS m4,
        min((s * 851981 + 138989) % 1000003) AS m5,
        min((s * 983055 + 566788) % 1000003) AS m6,
        min((s * 114126 + 994587) % 1000003) AS m7,
        min((s * 245200 + 422383) % 1000003) AS m8,
        min((s * 376274 + 850182) % 1000003) AS m9,
        min((s * 507348 + 277978) % 1000003) AS m10,
        min((s * 638422 + 705777) % 1000003) AS m11,
        min((s * 769496 + 133573) % 1000003) AS m12,
        min((s * 900570 + 561372) % 1000003) AS m13,
        min((s * 31641 + 989171) % 1000003) AS m14,
        min((s * 162715 + 416967) % 1000003) AS m15
        FROM shc GROUP BY doc_id),
      bandrows AS (
      SELECT doc_id, 0 AS band, (m0 * 131071 + m1) % 1000003 AS bucket FROM mins
      UNION ALL SELECT doc_id, 1 AS band, (m2 * 131071 + m3) % 1000003 AS bucket FROM mins
      UNION ALL SELECT doc_id, 2 AS band, (m4 * 131071 + m5) % 1000003 AS bucket FROM mins
      UNION ALL SELECT doc_id, 3 AS band, (m6 * 131071 + m7) % 1000003 AS bucket FROM mins
      UNION ALL SELECT doc_id, 4 AS band, (m8 * 131071 + m9) % 1000003 AS bucket FROM mins
      UNION ALL SELECT doc_id, 5 AS band, (m10 * 131071 + m11) % 1000003 AS bucket FROM mins
      UNION ALL SELECT doc_id, 6 AS band, (m12 * 131071 + m13) % 1000003 AS bucket FROM mins
      UNION ALL SELECT doc_id, 7 AS band, (m14 * 131071 + m15) % 1000003 AS bucket FROM mins),
      ok AS (SELECT band, bucket FROM bandrows
             GROUP BY band, bucket HAVING count(*) <= 1000),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bandrows a
        JOIN ok USING (band, bucket)
        JOIN bandrows b ON a.band = b.band AND a.bucket = b.bucket
          AND a.doc_id < b.doc_id)
      SELECT id_a, id_b,
        ((CASE WHEN x.m0 = y.m0 THEN 1 ELSE 0 END) + (CASE WHEN x.m1 = y.m1 THEN 1 ELSE 0 END) + (CASE WHEN x.m2 = y.m2 THEN 1 ELSE 0 END) + (CASE WHEN x.m3 = y.m3 THEN 1 ELSE 0 END) + (CASE WHEN x.m4 = y.m4 THEN 1 ELSE 0 END) + (CASE WHEN x.m5 = y.m5 THEN 1 ELSE 0 END) + (CASE WHEN x.m6 = y.m6 THEN 1 ELSE 0 END) + (CASE WHEN x.m7 = y.m7 THEN 1 ELSE 0 END) + (CASE WHEN x.m8 = y.m8 THEN 1 ELSE 0 END) + (CASE WHEN x.m9 = y.m9 THEN 1 ELSE 0 END) + (CASE WHEN x.m10 = y.m10 THEN 1 ELSE 0 END) + (CASE WHEN x.m11 = y.m11 THEN 1 ELSE 0 END) + (CASE WHEN x.m12 = y.m12 THEN 1 ELSE 0 END) + (CASE WHEN x.m13 = y.m13 THEN 1 ELSE 0 END) + (CASE WHEN x.m14 = y.m14 THEN 1 ELSE 0 END) + (CASE WHEN x.m15 = y.m15 THEN 1 ELSE 0 END)) / 16.0 AS est_jaccard
      FROM cand
      JOIN mins x ON x.doc_id = id_a
      JOIN mins y ON y.doc_id = id_b
      WHERE ((CASE WHEN x.m0 = y.m0 THEN 1 ELSE 0 END) + (CASE WHEN x.m1 = y.m1 THEN 1 ELSE 0 END) + (CASE WHEN x.m2 = y.m2 THEN 1 ELSE 0 END) + (CASE WHEN x.m3 = y.m3 THEN 1 ELSE 0 END) + (CASE WHEN x.m4 = y.m4 THEN 1 ELSE 0 END) + (CASE WHEN x.m5 = y.m5 THEN 1 ELSE 0 END) + (CASE WHEN x.m6 = y.m6 THEN 1 ELSE 0 END) + (CASE WHEN x.m7 = y.m7 THEN 1 ELSE 0 END) + (CASE WHEN x.m8 = y.m8 THEN 1 ELSE 0 END) + (CASE WHEN x.m9 = y.m9 THEN 1 ELSE 0 END) + (CASE WHEN x.m10 = y.m10 THEN 1 ELSE 0 END) + (CASE WHEN x.m11 = y.m11 THEN 1 ELSE 0 END) + (CASE WHEN x.m12 = y.m12 THEN 1 ELSE 0 END) + (CASE WHEN x.m13 = y.m13 THEN 1 ELSE 0 END) + (CASE WHEN x.m14 = y.m14 THEN 1 ELSE 0 END) + (CASE WHEN x.m15 = y.m15 THEN 1 ELSE 0 END)) / 16.0 >= 0.1
      ORDER BY id_a, id_b"""

  private def minhashVerifiedSql: String =
    s"""WITH ${jaccardCtes("documents", pruned = false)}
      SELECT id_a, id_b,
        round(CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter), 6) AS jaccard_r
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter) >= 0.5
      ORDER BY id_a, id_b"""

  /** Shared DSIR CTE prefix: recompute the hashed unigram+bigram
    * buckets (portable token codes, 131071 bigram pairing, Knuth mix
    * mod 1000003 mod 4096 — identical arithmetic to
    * `Dsir.gramBuckets`), the raw/target model, the milli-nat λ table
    * (ln calls spelled in the Spark expression's exact order over
    * exact-integer arguments, quantized once on ≤ 4096 rows), and the
    * BIGINT per-doc scores.
    */
  private def dsirCtes(src: String = "documents"): String =
    s"""WITH toksa AS (
      SELECT doc_id, lang, ${wsToks("text")} AS toka FROM $src),
    toks AS (
      SELECT doc_id, lang, unnest(toka) AS t,
             generate_subscripts(toka, 1) AS pos
      FROM toksa),
    codes AS (
      SELECT doc_id, lang, pos,
        CAST(ascii(substring(t, 1, 1)) * 131 + length(t) AS BIGINT) AS c
      FROM toks),
    pairs AS (
      SELECT doc_id, lang, c,
        lead(c) OVER (PARTITION BY doc_id ORDER BY pos) AS c2
      FROM codes),
    grams AS (
      SELECT doc_id, lang,
        (c * 2654435761) % 1000003 % 4096 AS bucket FROM codes
      UNION ALL
      SELECT doc_id, lang,
        (((c * 131071 + c2) % 1000003) * 2654435761) % 1000003 % 4096
          AS bucket
      FROM pairs WHERE c2 IS NOT NULL),
    model AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_raw,
        CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_target
      FROM grams GROUP BY bucket),
    tot AS (
      SELECT CAST(sum(n_raw) AS BIGINT) AS tr,
        CAST(sum(n_target) AS BIGINT) AS tt FROM model),
    lam AS (
      SELECT bucket,
        CAST(round(1000 * (ln(n_target + 1) - ln(tt + 4096)
          - ln(n_raw + 1) + ln(tr + 4096))) AS BIGINT) AS lam
      FROM model CROSS JOIN tot),
    docb AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c
      FROM grams GROUP BY 1, 2),
    w AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS gram_n,
        CAST(sum(c * lam) AS BIGINT) AS score_mn
      FROM docb JOIN lam USING (bucket) GROUP BY doc_id)"""

  /** Shared portable-simhash CTE prefix: recompute the 32-bit
    * signature bit-by-bit from the same token-code arithmetic as
    * `TextDedup.portableSimhashSig` (every operation exists with
    * identical semantics in DuckDB).
    */
  private def simhashBitsCte: String =
    s"""toksa AS (
        SELECT doc_id, ${wsToks("text")} AS toka FROM documents),
      tok AS (SELECT doc_id, unnest(toka) AS t FROM toksa),
      codes AS (
        SELECT doc_id,
               CAST(ascii(substring(t, 1, 1)) * 131 + length(t) AS BIGINT) AS c
        FROM tok),
      bits AS (
        SELECT doc_id, j,
               CASE WHEN SUM(CASE WHEN (c * ((2 * j + 3) * 65537)) % 1000003 % 2 = 1
                                  THEN 1 ELSE -1 END) > 0
                    THEN 1 ELSE 0 END AS bit
        FROM codes CROSS JOIN (SELECT CAST(range AS BIGINT) AS j FROM range(0, 32)) js
        GROUP BY doc_id, j)"""

  /** Twin of TextDedup.simhashPairsPortable — ALL pairwise hammings
    * (the engine's pigeonhole enumeration is exact w.r.t. the bound,
    * so the direct O(n²·32) form here — fine at oracle scale — yields
    * the identical pair set). Shared by `ns_dedup_simhash_portable`
    * (one-shot) and `ns_simhash_incremental` (the same matcher over
    * the folded signature table) — incremental convergence by hash.
    */
  private def simhashPortableSql: String =
    s"""WITH $simhashBitsCte,
      ham AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
        FROM bits a JOIN bits b ON a.j = b.j AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
      FROM ham WHERE hamming <= 3 ORDER BY id_a, id_b"""

  /** Asymmetric probe-vs-corpus form on doc_id % 5 — shared by
    * `ns_simhash_guard` (batch sign both sides) and
    * `ns_simhash_inc_probe` (corpus side from stored signatures).
    */
  private def simhashGuardSql: String =
    s"""WITH $simhashBitsCte,
      ham AS (
        SELECT a.doc_id AS doc_id, b.doc_id AS corpus_id,
               SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
        FROM bits a JOIN bits b
          ON a.j = b.j AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
        GROUP BY 1, 2)
      SELECT doc_id, corpus_id, CAST(hamming AS BIGINT) AS hamming
      FROM ham WHERE hamming <= 3 ORDER BY doc_id, corpus_id"""

  private def crossDedupSql: String =
    s"""WITH ${shingleCtes("documents")},
      sh_new AS (SELECT doc_id, sh FROM sh WHERE doc_id % 10 = 0),
      sh_old AS (SELECT doc_id, sh FROM sh WHERE doc_id % 10 <> 0),
      overcap AS (SELECT sh FROM sh_old GROUP BY sh HAVING count(*) > 5000),
      pn AS (SELECT doc_id, sh FROM sh_new
             WHERE sh NOT IN (SELECT sh FROM overcap)),
      po AS (SELECT doc_id, sh FROM sh_old
             WHERE sh NOT IN (SELECT sh FROM overcap)),
      na AS (SELECT doc_id, count(*) AS n FROM pn GROUP BY 1),
      nb AS (SELECT doc_id, count(*) AS n FROM po GROUP BY 1),
      inter AS (
        SELECT pn.doc_id AS id_new, po.doc_id AS id_old, count(*) AS inter
        FROM pn JOIN po ON pn.sh = po.sh GROUP BY 1, 2)
      SELECT id_new, id_old,
        round(CAST(inter AS DOUBLE) / (na.n + nb.n - inter), 6) AS jaccard_r
      FROM inter JOIN na ON na.doc_id = id_new JOIN nb ON nb.doc_id = id_old
      WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.12
      ORDER BY id_new, id_old"""

  private def decontaminateSql: String =
    s"""WITH ${shingleCtes("documents")},
      bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 17 = 0),
      corp AS (SELECT doc_id, sh FROM sh WHERE doc_id % 17 <> 0)
      SELECT doc_id, count(*) AS n_hits
      FROM corp JOIN bench USING (sh)
      GROUP BY 1 ORDER BY doc_id"""

  /** Unrolled integer-arithmetic PageRank (Graph.pageRank's fixed-point
    * semantics, damping 85/100, scale 1e12) over the symmetrization of
    * the directed edge list `e0Sql` produces: each power iteration is
    * one join+aggregate CTE pair. Sums of BIGINT are HUGEINT in DuckDB,
    * so every rank is cast back to BIGINT to match Spark's long column.
    */
  private def pagerankSql(iters: Int, e0Sql: String): String = {
    val head =
      s"""WITH e0 AS ($e0Sql),
      e AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
      nodes AS (SELECT DISTINCT a AS node FROM e),
      p AS (SELECT count(*) AS n FROM nodes),
      deg AS (SELECT a, count(*) AS deg FROM e GROUP BY 1),
      r0 AS (SELECT node, 1000000000000 // n AS pr FROM nodes CROSS JOIN p)"""
    val steps = (1 to iters).map { i =>
      s""",
      c$i AS (SELECT e.b AS node, SUM(r.pr // d.deg) AS s
              FROM e JOIN deg d ON e.a = d.a
              JOIN r${i - 1} r ON r.node = e.a GROUP BY 1),
      r$i AS (SELECT nd.node,
                CAST((1000000000000 // n) * 15 // 100
                     + coalesce(c.s, 0) * 85 // 100 AS BIGINT) AS pr
              FROM nodes nd CROSS JOIN p
              LEFT JOIN c$i c ON c.node = nd.node)"""
    }.mkString
    head + steps + s"\n      SELECT node, pr FROM r$iters ORDER BY node"
  }

  /** Unrolled personalized-PageRank twin of
    * `Graph.personalizedPageRank` over the co-order pair graph: the
    * pagerankSql recurrence with the teleport term restricted to the
    * mod-25 seed set (seed rows get `(scale // ns) * 15 // 100`,
    * non-seeds 0 — the exact integer-division order of the engine's
    * `(init * (100 - d)) / 100`). Graph CTEs are MATERIALIZED — `e` is
    * referenced from every unrolled step and DuckDB would otherwise
    * re-derive the lineitem pair self-join per reference.
    */
  private def pprSql(iters: Int): String = {
    val head =
      s"""WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      ep AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      e0 AS MATERIALIZED (SELECT x, y FROM ep GROUP BY x, y HAVING count(*) >= 2),
      e AS MATERIALIZED (
        SELECT x AS a, y AS b FROM e0 UNION ALL SELECT y, x FROM e0),
      nodes AS MATERIALIZED (SELECT DISTINCT a AS node FROM e),
      seeds AS MATERIALIZED (SELECT node FROM nodes WHERE node % 25 = 0),
      ps AS (SELECT count(*) AS ns FROM seeds),
      deg AS MATERIALIZED (SELECT a, count(*) AS deg FROM e GROUP BY 1),
      r0 AS (SELECT nd.node,
               CASE WHEN sd.node IS NOT NULL
                    THEN 1000000000000 // ns ELSE 0 END AS pr
             FROM nodes nd CROSS JOIN ps
             LEFT JOIN seeds sd ON sd.node = nd.node)"""
    val steps = (1 to iters).map { i =>
      s""",
      c$i AS (SELECT e.b AS node, SUM(r.pr // d.deg) AS s
              FROM e JOIN deg d ON e.a = d.a
              JOIN r${i - 1} r ON r.node = e.a GROUP BY 1),
      r$i AS (SELECT nd.node,
                CAST(CASE WHEN sd.node IS NOT NULL
                          THEN (1000000000000 // ns) * 15 // 100
                          ELSE 0 END
                     + coalesce(c.s, 0) * 85 // 100 AS BIGINT) AS pr
              FROM nodes nd CROSS JOIN ps
              LEFT JOIN seeds sd ON sd.node = nd.node
              LEFT JOIN c$i c ON c.node = nd.node)"""
    }.mkString
    head + steps +
      s"\n      SELECT node AS part, pr AS ppr FROM r$iters ORDER BY part"
  }

  /** Unrolled synchronous-peeling twin of `Graph.kCore` over the
    * co-order pair graph (the t_triangles edge CTE). Like pagerankSql
    * the iteration is UNROLLED to a fixed depth: `rounds` must be ≥
    * the peel's rounds-to-convergence (observed ≤ 5 at every SF for
    * k=2; 8 leaves margin) — extra rounds are fixed-point no-ops, so
    * both engines land on the same unique k-core. `converged` is the
    * literal TRUE: if the engine ever exits unconverged its FALSE flag
    * mismatches loudly instead of shipping a silent superset.
    */
  private def kcoreSql(k: Int, rounds: Int): String = {
    val head =
      s"""WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      ep AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      r0 AS MATERIALIZED (SELECT x, y FROM ep GROUP BY x, y HAVING count(*) >= 2)"""
    // each round references the previous THREE times (degree scan ×2 +
    // the filter base) — without MATERIALIZED DuckDB inlines CTEs and
    // the plan grows 3^rounds
    val steps = (1 to rounds).map { i =>
      s""",
      d$i AS (SELECT node, count(*) AS deg FROM (
                SELECT x AS node FROM r${i - 1}
                UNION ALL SELECT y FROM r${i - 1}) GROUP BY 1),
      k$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $k),
      r$i AS MATERIALIZED (SELECT x, y FROM r${i - 1}
              WHERE x IN (SELECT node FROM k$i)
                AND y IN (SELECT node FROM k$i))"""
    }.mkString
    head + steps +
      s"""
      SELECT node AS part, CAST(count(*) AS BIGINT) AS core_deg,
             TRUE AS converged
      FROM (SELECT x AS node FROM r$rounds
            UNION ALL SELECT y FROM r$rounds)
      GROUP BY node ORDER BY part"""
  }

  /** TPC-H-Q1 pricing-summary text, shared VERBATIM between the Spark
    * SQL surface (`sql_pricing_summary` runs it over a temp view) and
    * the DuckDB oracle (over the parquet table) — the same parse tree
    * on both engines. Money sums: round to a fixed scale → DECIMAL sum
    * (exact, associative) → one cast to double; the average is one
    * double division of exact operands.
    */
  def pricingSummarySql(table: String): String =
    s"""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
      COUNT(*) AS count_order
    FROM $table
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** Unrolled greedy MMR twin of `VectorSearch.mmrRerank` (shortlist
    * 12 per probe query, kSel picks, λ = 0.5): step 1 is the pure-rel
    * argmax (empty-set max-sim pinned to 0.0 exactly as the kernel
    * does); each later step recomputes every remaining candidate's
    * max cosine to the selected set through a correlated subquery and
    * picks the mmr argmax with the same (mmr DESC, vec_id) tie rule.
    * Like pagerankSql, the iteration is UNROLLED — an independent SQL
    * implementation of the same greedy recurrence, not a port of the
    * kernel. All cosines are DuckDB DOUBLE[] folds (bit-identical to
    * the CosineSim chain); λ literals are CAST to DOUBLE so no
    * DECIMAL arithmetic sneaks in.
    */
  private def mmrSql(kSel: Int): String = {
    val head =
      """WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 5),
      cand AS (
        SELECT query_id, vec_id, sim AS rel, cv FROM (
          SELECT q.query_id, e.vec_id,
                 round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS sim,
                 CAST(e.embedding AS DOUBLE[]) AS cv,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) DESC,
                            e.vec_id) AS rk
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id <> q.query_id)
        WHERE rk <= 12),
      sel1 AS (
        SELECT query_id, vec_id, rel, cv,
               CAST(0.5 AS DOUBLE) * rel - CAST(0.5 AS DOUBLE) * CAST(0.0 AS DOUBLE) AS mmr
        FROM (
          SELECT cand.*, row_number() OVER (PARTITION BY query_id
                   ORDER BY rel DESC, vec_id) AS rk
          FROM cand)
        WHERE rk = 1),
      all1 AS (SELECT query_id, vec_id, rel, cv, mmr, 1 AS pos FROM sel1)"""
    val steps = (2 to kSel).map { t =>
      s""",
      sc$t AS (
        SELECT c.query_id, c.vec_id, c.rel, c.cv,
               CAST(0.5 AS DOUBLE) * c.rel - CAST(0.5 AS DOUBLE) * (
                 SELECT max(list_cosine_similarity(c.cv, s.cv))
                 FROM all${t - 1} s WHERE s.query_id = c.query_id) AS mmr
        FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM all${t - 1} s
                          WHERE s.query_id = c.query_id
                            AND s.vec_id = c.vec_id)),
      sel$t AS (
        SELECT query_id, vec_id, rel, cv, mmr FROM (
          SELECT sc$t.*, row_number() OVER (PARTITION BY query_id
                   ORDER BY mmr DESC, vec_id) AS rk
          FROM sc$t)
        WHERE rk = 1),
      all$t AS (
        SELECT * FROM all${t - 1}
        UNION ALL
        SELECT query_id, vec_id, rel, cv, mmr, $t AS pos FROM sel$t)"""
    }.mkString
    head + steps +
      s"""
      SELECT query_id, CAST(pos AS INT) AS pos, vec_id, round(mmr, 6) AS mmr
      FROM all$kSel ORDER BY query_id, pos"""
  }

  /** TPC-H-Q5 local-supplier-volume text, shared VERBATIM between the
    * Spark SQL surface (`sql_local_volume` over temp views) and the
    * DuckDB oracle (over the parquet tables) — a 6-way snowflake join
    * (fact × 2 mid tables × 3 dims) with the region/date selection
    * the optimizer should push below the joins. Money follows the
    * parity discipline: round per item, DECIMAL sum, one double cast.
    */
  def localVolumeSql(customer: String, orders: String, lineitem: String,
                     supplier: String, nation: String,
                     region: String): String =
    s"""SELECT n_name,
      CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM $customer c
    JOIN $orders o ON c.c_custkey = o.o_custkey
    JOIN $lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN $supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN $nation n ON s.s_nationkey = n.n_nationkey
    JOIN $region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name"""

  /** TPC-H-Q18 large-volume-orders text, shared VERBATIM between
    * engines — an IN-subquery over a grouped HAVING that both planners
    * must decorrelate into a (semi-)join against the aggregated fact
    * table, then a top-k. Quantity sums are exact DECIMAL.
    */
  def largeOrdersSql(customer: String, orders: String,
                     lineitem: String): String =
    s"""SELECT c.c_custkey, c.c_name, o.o_orderkey,
      CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM $customer c
    JOIN $orders o ON c.c_custkey = o.o_custkey
    JOIN $lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM $lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100"""

  /** TPC-H-Q4 shape: priority counts of orders in a quarter having at
    * least one line shipped after the order date — the correlated
    * EXISTS both planners decorrelate into a left semi-join that scans
    * lineitem once. Same SQL text on both engines.
    */
  def waitingOrdersSql(orders: String, lineitem: String): String =
    s"""SELECT o_orderpriority, COUNT(*) AS order_count
    FROM $orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM $lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  /** TPC-H-Q21 shape (suppliers who kept multi-supplier orders
    * waiting), adapted to this schema: "late" = shipped > 60 days
    * after the order date (no receipt/commit dates here). The nested
    * EXISTS + NOT EXISTS over the same lineitem is the decorrelation
    * workout: Catalyst rewrites them into a semi- and an anti-join on
    * the order key. Same text both engines; `INTERVAL 60 DAY` parses
    * identically in Spark and DuckDB.
    */
  def lateSuppliersSql(orders: String, lineitem: String,
                       supplier: String): String =
    s"""SELECT s_name, COUNT(*) AS numwait
    FROM $supplier s
    JOIN $lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN $orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM $lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM $lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20"""

  /** TPC-H-Q16 shape: distinct-supplier counts per (brand, size) with
    * a NOT IN anti-subquery excluding negative-balance suppliers —
    * the null-aware anti-join path (s_suppkey is non-null here, so
    * both engines agree; the shape still exercises the rewrite).
    */
  def brandSuppliersSql(part: String, lineitem: String,
                        supplier: String): String =
    s"""SELECT p_brand, p_size,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM $part p
    JOIN $lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 5, 9, 13)
      AND l.l_suppkey NOT IN
        (SELECT s_suppkey FROM $supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size"""

  /** TPC-H-Q13 shape: how many customers placed 0, 1, 2, … orders —
    * the LEFT-join-with-join-condition-predicate workout (the priority
    * filter must live IN the join condition, not the WHERE, or
    * zero-order customers vanish), followed by an aggregation over an
    * aggregation. Same SQL text on both engines.
    */
  def orderDistSql(customer: String, orders: String): String =
    s"""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          FROM $customer c LEFT JOIN $orders o
            ON c.c_custkey = o.o_custkey
            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  /** TPC-H-Q22 shape: customers above the average balance with no
    * URGENT order (the literal never-ordered predicate is empty at
    * the small test SFs — this keeps the identical scalar-subquery +
    * NOT-EXISTS + aggregate shape with rows at every scale),
    * aggregated by a country-code surrogate. The
    * above-average threshold is the EXACT cross-multiplied form
    * `bal · n > Σbal` in DECIMAL — `avg(double)` is reduction-order
    * dependent, and a one-ulp threshold drift flips row membership
    * between engines. Same SQL text on both engines.
    */
  def idleCustomersSql(customer: String, orders: String): String =
    s"""SELECT cntry, CAST(count(*) AS BIGINT) AS numcust,
      CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (SELECT CAST(c_custkey % 7 AS INT) AS cntry, c_acctbal, c_custkey
          FROM $customer
          WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
                (SELECT count(*) FROM $customer WHERE c_acctbal > 0.0) >
                (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
                 FROM $customer WHERE c_acctbal > 0.0)) c
    WHERE NOT EXISTS (SELECT 1 FROM $orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY cntry
    ORDER BY cntry"""

  /** TPC-H-Q7 shape: bilateral trade volume between two nations by
    * ship year — the two-role nation join (supplier's nation vs
    * customer's nation) with the symmetric pair predicate, revenue
    * decimal-exact. Same SQL text on both engines.
    */
  def nationTradeSql(supplier: String, lineitem: String, orders: String,
                     customer: String, nation: String): String =
    s"""SELECT supp_nation, cust_nation, l_year,
      CAST(sum(CAST(round(volume, 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      CAST(count(*) AS BIGINT) AS n_lines
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l.l_shipdate) AS INT) AS l_year,
        l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM $supplier s
      JOIN $lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN $orders o ON o.o_orderkey = l.l_orderkey
      JOIN $customer c ON c.c_custkey = o.o_custkey
      JOIN $nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN $nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  /** TPC-H-Q3 shape: shipping-priority revenue — segment-filtered
    * customer × date-banded orders × post-cutoff lineitem, top-10
    * orders by decimal-exact revenue with pinned tiebreaks. Same SQL
    * text on both engines.
    */
  def shippingPrioritySql(customer: String, orders: String,
                          lineitem: String): String =
    s"""SELECT l.l_orderkey,
      CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      o.o_orderdate, o.o_orderpriority
    FROM $customer c
    JOIN $orders o ON c.c_custkey = o.o_custkey
    JOIN $lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10"""

  /** TPC-H-Q12 shape (adapted: this schema has no l_shipmode, so the
    * dimension is the priority class and the measure is lateness):
    * per class, line counts and late-line counts via FILTER-clause
    * conditional aggregation — one pass, no self-join. Same SQL text
    * on both engines.
    */
  def latenessByPrioritySql(orders: String, lineitem: String): String =
    s"""SELECT prio_class,
      CAST(count(*) AS BIGINT) AS n_lines,
      CAST(count(*) FILTER (WHERE late) AS BIGINT) AS n_late
    FROM (SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 'high' ELSE 'low' END AS prio_class,
            l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
          FROM $orders o JOIN $lineitem l ON l.l_orderkey = o.o_orderkey) t
    GROUP BY prio_class
    ORDER BY prio_class"""

  /** TPC-H-Q10 shape: returned-item revenue per customer, top 20 —
    * the classic 4-way star join + decimal-exact revenue ranking with
    * a pinned c_custkey tiebreak so the LIMIT cut is deterministic.
    * Same SQL text on both engines.
    */
  def returnedRevenueSql(customer: String, orders: String,
                         lineitem: String, nation: String): String =
    s"""SELECT c.c_custkey, c.c_name,
      CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      c.c_acctbal, n.n_name
    FROM $customer c
    JOIN $orders o ON o.o_custkey = c.c_custkey
    JOIN $lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN $nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20"""

  /** The from-scratch one-shot curation twin — shared VERBATIM by
    * ns_curation_pipeline and ns_incremental_curation (the incremental
    * fold's convergence contract makes them the same question).
    */
  /** One-shot SemDeDup dominance over sign cells — shared by the
    * batch query and its incremental-fold twin (the convergence gate).
    */
  /** Exact-k deterministic hash-order sample — shared by the one-shot
    * `ns_sample_exact_k` and the folded `ns_sample_incremental`
    * (bottom-k is mergeable).
    */
  private lazy val sampleExactKOneShotSql: String =
    """SELECT doc_id, lang FROM (
        SELECT doc_id, lang, row_number() OVER (
          PARTITION BY lang
          ORDER BY ((doc_id % 1000000007) * 2654435761) % 1000000007, doc_id) AS rk
        FROM documents) WHERE rk <= 40 ORDER BY doc_id"""

  /** Fixed-grid exact quantile profile — shared by the one-shot
    * `ns_quantile_grid` and the folded `ns_quantile_incremental`
    * (associative cell counts).
    */
  private lazy val quantileGridOneShotSql: String =
    s"""WITH cells AS (
        SELECT source,
          (CAST(n_chars AS BIGINT) - (((n_chars % 64) + 64) % 64)) // 64 AS cell,
          CAST(count(*) AS BIGINT) AS cell_n
        FROM documents GROUP BY 1, 2),
      cum AS (
        SELECT source, cell, cell_n,
          sum(cell_n) OVER (PARTITION BY source ORDER BY cell) AS cum,
          sum(cell_n) OVER (PARTITION BY source) AS n
        FROM cells)
      SELECT source, CAST(max(n) AS BIGINT) AS n,
        CAST(min(CASE WHEN cum * 100 >= n * 50 THEN cell * 64 END) AS BIGINT) AS p50_lo,
        CAST(min(CASE WHEN cum * 100 >= n * 90 THEN cell * 64 END) AS BIGINT) AS p90_lo,
        CAST(min(CASE WHEN cum * 100 >= n * 95 THEN cell * 64 END) AS BIGINT) AS p95_lo,
        CAST(min(CASE WHEN cum * 100 >= n * 99 THEN cell * 64 END) AS BIGINT) AS p99_lo
      FROM cum GROUP BY source ORDER BY source"""

  /** Per-source corpus profile — shared by the one-shot
    * `ns_source_stats` and the folded `ns_stats_incremental`
    * (associative integer sums; avg derived from the sums).
    */
  private lazy val sourceStatsOneShotSql: String =
    s"""SELECT source, count(*) AS n_docs,
        CAST(sum(len(${wsToksCased("text")})) AS BIGINT) AS n_tokens,
        CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
        round(CAST(sum(len(${wsToksCased("text")})) AS DOUBLE) / count(*), 6) AS avg_tokens
      FROM documents GROUP BY 1 ORDER BY source"""

  /** Explicit-cell CMS estimate-vs-true audit — shared by the one-shot
    * `ns_cms_counts` and the folded `ns_cms_incremental` (cells are
    * associative, so fold ≡ rebuild bit-for-bit).
    */
  private lazy val cmsOneShotSql: String =
    s"""WITH toks AS (
        SELECT unnest(${wsToks("text")}) AS t FROM documents),
      codes AS (
        SELECT t, CAST(ascii(substring(t, 1, 1)) * 131 + length(t) AS BIGINT) AS c
        FROM toks),
      ds AS (SELECT CAST(range AS BIGINT) AS d FROM range(0, 4)),
      cells AS (
        SELECT d, (c * ((2 * d + 3) * 65537)) % 1000003 % 64 AS b,
          CAST(count(*) AS BIGINT) AS cell_n
        FROM codes CROSS JOIN ds GROUP BY 1, 2),
      top AS (
        SELECT t AS term, CAST(count(*) AS BIGINT) AS true_n, min(c) AS c
        FROM codes GROUP BY t ORDER BY true_n DESC, term LIMIT 50),
      est AS (
        SELECT term, true_n, min(cell_n) AS est_n
        FROM top CROSS JOIN ds
        JOIN cells ON cells.d = ds.d
          AND cells.b = (top.c * ((2 * ds.d + 3) * 65537)) % 1000003 % 64
        GROUP BY 1, 2)
      SELECT term, true_n, CAST(est_n AS BIGINT) AS est_n,
        CAST(est_n - true_n AS BIGINT) AS over_n
      FROM est ORDER BY term"""

  /** Transitive-closure component labeling over the exact-jaccard pair
    * graph — shared by the one-shot `ns_dedup_clusters` and the folded
    * `ns_cc_incremental` (convergence-by-hash, the fold-family
    * contract).
    */
  private def clustersSql(base: String = "documents",
                          baseCte: String = ""): String =
    s"""WITH RECURSIVE $baseCte${jaccardCtes(base, pruned = true)},
      pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter) >= 0.12),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT a AS node, b AS r FROM edges
        UNION
        SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a),
      lbl AS (SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node)
      SELECT node AS doc_id, cluster FROM lbl ORDER BY doc_id"""

  private lazy val clustersOneShotSql: String = clustersSql()

  /** Decremental-CC convergence: labels after retracting every ninth
    * doc == one-shot clustering over the never-retracted corpus.
    */
  private lazy val ccRetractSql: String = clustersSql("base",
    "base AS (SELECT * FROM documents WHERE doc_id % 9 <> 0), ")

  private def semDedupSql(base: String = "embeddings"): String =
    s"""WITH b AS (
        SELECT vec_id,
          CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
             + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
             + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
             + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS BIGINT) AS cell,
          CAST(embedding AS DOUBLE[]) AS v
        FROM $base),
      dropped AS (
        SELECT DISTINCT a.vec_id FROM b a JOIN b c
          ON a.cell = c.cell AND c.vec_id < a.vec_id
        WHERE list_cosine_similarity(a.v, c.v) > 0.45)
      SELECT vec_id, cell FROM b
      WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
      ORDER BY vec_id"""

  /** The shared curation CTE chain (quality gate → normalized exact
    * dedup → pruned exact-jaccard near-dup losers). `curationOneShotSql`
    * selects the survivor rows; `nightlyPipelineSql` re-aggregates the
    * survivor set into the per-source profile (the composite fold's
    * stats probe).
    */
  private def curationCtes(base: String = "documents"): String =
    s"""f AS (
        SELECT doc_id, text,
          len(${wsToks("text")}) AS n_words,
          CAST(length(text) - (len(${wsToks("text")}) - 1) AS DOUBLE)
            / len(${wsToks("text")}) AS avg_word_len,
          CAST(len(regexp_extract_all(text, '[\\.,;:!\\?]')) AS DOUBLE) / length(text) AS punct_ratio,
          CAST(len(list_filter(${wsToks("text")}, w -> w IN $stopwordsIn)) AS DOUBLE)
            / len(${wsToks("text")}) AS stopword_ratio
        FROM $base),
      scored AS (
        SELECT doc_id, text, n_words,
          (CASE WHEN n_words BETWEEN 10 AND 10000 THEN 4 ELSE 0 END
           + CASE WHEN stopword_ratio > 0.05 THEN 3 ELSE 0 END
           + CASE WHEN punct_ratio < 0.2 THEN 2 ELSE 0 END
           + CASE WHEN avg_word_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END) / 10.0 AS quality_score
        FROM f),
      kept AS (SELECT * FROM scored WHERE quality_score >= 0.7),
      hashed AS (
        SELECT *,
          CASE WHEN text IS NULL OR trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N} \\t\\n\\f\\r\\x0B]', '', 'g'), '[ \\t\\n\\f\\r\\x0B]+', ' ', 'g')) = ''
               THEN 'empty-' || CAST(doc_id AS VARCHAR)
               ELSE md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N} \\t\\n\\f\\r\\x0B]', '', 'g'), '[ \\t\\n\\f\\r\\x0B]+', ' ', 'g')))
          END AS th
        FROM kept),
      deduped AS (
        SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY th ORDER BY doc_id) AS rn FROM hashed)
        WHERE rn = 1),
      ${jaccardCtes("deduped", pruned = true)},
      losers AS (
        SELECT DISTINCT id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter) >= 0.3)"""

  /** Frequency-ranked vocabulary — shared by the one-shot `ns_vocab`
    * and the folded `ns_vocab_incremental` (associative count deltas;
    * ranking derived at probe time).
    */
  private lazy val vocabOneShotSql: String =
    s"""WITH c AS (
        SELECT token, count(*) AS n FROM (
          SELECT unnest(${wsToks("text")}) AS token
          FROM documents)
        GROUP BY 1 HAVING count(*) >= 2)
      SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS vocab_id
      FROM c ORDER BY vocab_id"""

  /** Exact TF-IDF term stats — shared by the one-shot `ns_tfidf` and
    * the folded `ns_tfidf_incremental` (the BM25 posting table is the
    * tf matrix; df is its per-term posting count).
    */
  private lazy val tfidfOneShotSql: String =
    s"""WITH toks AS (
        SELECT doc_id, unnest(${wsToks("text")}) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df
      FROM tf JOIN dfreq USING (term)
      ORDER BY doc_id, term"""

  private lazy val semDedupOneShotSql: String = semDedupSql()

  /** SemDedup retraction convergence: one-shot over the corpus minus
    * every seventh vector (the registered query's retract set).
    */
  private lazy val semDedupRetractSql: String = {
    val body = semDedupSql("base")
    // splice the filtered base CTE into the existing WITH chain
    body.replaceFirst("WITH b AS \\(",
      "WITH base AS (SELECT * FROM embeddings WHERE vec_id % 7 <> 0), b AS (")
  }

  private lazy val curationOneShotSql: String =
    s"""WITH ${curationCtes()}
      SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, quality_score
      FROM deduped d
      WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id_b = d.doc_id)
      ORDER BY doc_id"""

  /** Retraction convergence: the one-shot curation over the corpus
    * MINUS the retracted id set (every fifth id — the registered
    * query retracts the same set from folded state). Same CTE chain,
    * filtered base.
    */
  private lazy val retractOneShotSql: String =
    s"""WITH base AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
      ${curationCtes("base")}
      SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, quality_score
      FROM deduped d
      WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id_b = d.doc_id)
      ORDER BY doc_id"""

  /** The composite nightly fold's stats probe: the per-source profile
    * over exactly the docs curation ADMITS (the composite derives
    * n_chars from length(text), hence the explicit length() here rather
    * than the table's n_chars column).
    */
  private def nightlyProfileSql(base: String = "documents"): String =
    s"""${curationCtes(base)},
      surv AS (
        SELECT doc_id FROM deduped d
        WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id_b = d.doc_id))
      SELECT source, count(*) AS n_docs,
        CAST(sum(len(${wsToksCased("text")})) AS BIGINT) AS n_tokens,
        CAST(sum(length(text)) AS BIGINT) AS n_chars_total,
        round(CAST(sum(len(${wsToksCased("text")})) AS DOUBLE) / count(*), 6) AS avg_tokens
      FROM $base JOIN surv USING (doc_id)
      GROUP BY 1 ORDER BY source"""

  private lazy val nightlyPipelineSql: String =
    s"WITH ${nightlyProfileSql()}"

  /** retractNightly convergence: the composite's stats probe after the
    * every-fifth-id retraction == the profile over the admitted set of
    * the never-retracted corpus.
    */
  private lazy val nightlyRetractSql: String =
    s"""WITH base AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
      ${nightlyProfileSql("base")}"""

  val all: Map[String, String] = Map(
    "sql_waiting_orders" -> waitingOrdersSql("orders", "lineitem"),
    "sql_nation_trade" -> nationTradeSql("supplier", "lineitem", "orders",
      "customer", "nation"),
    "sql_shipping_priority" -> shippingPrioritySql("customer", "orders",
      "lineitem"),
    "sql_lateness_by_priority" -> latenessByPrioritySql("orders", "lineitem"),
    "sql_returned_revenue" -> returnedRevenueSql("customer", "orders",
      "lineitem", "nation"),
    "sql_order_dist" -> orderDistSql("customer", "orders"),
    "sql_idle_customers" -> idleCustomersSql("customer", "orders"),
    "sql_late_suppliers" -> lateSuppliersSql("orders", "lineitem", "supplier"),
    "sql_brand_suppliers" -> brandSuppliersSql("part", "lineitem", "supplier"),
    "sql_pricing_summary" -> pricingSummarySql("lineitem"),
    "sql_local_volume" -> localVolumeSql("customer", "orders", "lineitem",
      "supplier", "nation", "region"),
    "sql_large_orders" -> largeOrdersSql("customer", "orders", "lineitem"),
    "t_pagerank" -> pagerankSql(3,
      """SELECT CAST(s_suppkey AS BIGINT) AS a,
               CAST(s_nationkey AS BIGINT) + 2000000000 AS b
        FROM supplier"""),

    // user ↔ active-day bipartite graph: the day key is the epoch-day
    // integer division both engines compute identically (events ts is
    // positive, so µs vs ns truncation cannot move the day)
    "t_pagerank_events" -> pagerankSql(4,
      """SELECT DISTINCT user_id AS a,
               epoch_us(ts) // 86400000000 + 2000000000 AS b
        FROM events"""),

    // the same decimal-exact moment sums and the same double expression
    // tree as Stats.corrStats — bit-identical, unlike corr()/regr_*()
    // whose double accumulators are reduction-order dependent
    "t_corr_stats" ->
      """WITH m AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, n,
        round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr,
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept
      FROM m ORDER BY l_returnflag""",

    "t_moving_avg" ->
      """SELECT user_id, event_id, ts AS event_ts,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS roll_sum,
        COUNT(*) OVER w AS roll_n,
        round(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS roll_avg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id""",

    "t_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
      FROM orders ORDER BY o_orderkey""",

    "t_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM orders GROUP BY 1 ORDER BY bucket""",

    "t_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                              (o_orderstatus, o_orderpriority))
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    // DuckDB needs the 'g' flag for Spark's replace-all default;
    // length/instr return BIGINT there (cast to Spark's INT)
    "t_string_funcs" ->
      """SELECT c_custkey,
        CAST(length(c_name) AS INT) AS name_len,
        upper(c_name) AS name_upper,
        substring(c_name, 1, 8) AS name_prefix,
        lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
        regexp_replace(c_name, '[aeiou]', '_', 'g') AS name_devoweled,
        reverse(c_name) AS name_rev,
        CAST(instr(c_name, 'a') AS INT) AS first_a,
        concat_ws('|', c_name, c_mktsegment) AS joined
      FROM customer ORDER BY c_custkey""",

    // Spark dayofweek is 1-based Sunday, DuckDB 0-based (+1 below);
    // Spark year/month/... return INT, DuckDB BIGINT (casts below)
    "t_datetime_funcs" ->
      """SELECT o_orderkey,
        CAST(o_orderdate AS DATE) AS od,
        CAST(year(o_orderdate) AS INT) AS yr,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(day(o_orderdate) AS INT) AS dom,
        CAST(quarter(o_orderdate) AS INT) AS qtr,
        CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        CAST(o_orderdate AS DATE) + 30 AS plus30,
        CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
          AS days_since
      FROM orders ORDER BY o_orderkey""",

    // only the bit-exact subset (no exp/ln/pow: libm ulp differences
    // across engines make them un-hashable, like float sums)
    "t_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        abs(l_discount - 0.05) AS disc_dev,
        CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
        CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        round(l_extendedprice / 7.0, 2) AS price_r2,
        sqrt(l_quantity) AS qty_sqrt,
        l_orderkey % 97 AS key_mod,
        l_orderkey & 255 AS key_and,
        CAST(l_linenumber << 3 AS INT) AS ln_shl
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    // FILTER/ORDER-BY-in-aggregate are DuckDB's forms of Spark's
    // count_if / sort_array∘collect_list; empty string_agg is NULL in
    // DuckDB but '' in Spark's concat_ws (coalesce normalizes)
    "t_agg_funcs" ->
      """SELECT o_orderpriority,
        count(*) AS n,
        count(DISTINCT o_custkey) AS n_customers,
        count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        CAST(sum(CASE WHEN o_totalprice > 150000
                      THEN CAST(o_totalprice AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS big_total,
        bool_and(o_totalprice > 0) AS all_positive,
        bool_or(o_totalprice > 400000) AS any_huge,
        max_by(o_totalprice, o_orderkey) AS latest_price,
        coalesce(string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
                   FILTER (WHERE o_orderkey % 500 = 0), '') AS sample_keys
      FROM orders GROUP BY 1 ORDER BY o_orderpriority""",

    // DuckDB list idioms for Spark's array functions: len is BIGINT,
    // slices are 1-based inclusive, [-1] is the tail element
    "t_array_funcs" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
                    FROM documents)
      SELECT doc_id,
        CAST(len(toks) AS INT) AS n_toks,
        list_contains(toks, 'the') AS has_the,
        CAST(len(list_distinct(toks)) AS INT) AS n_types,
        toks[1] AS first_tok,
        toks[-1] AS last_tok,
        array_to_string(toks[1:5], ' ') AS head5,
        array_to_string(list_sort(list_distinct(toks))[1:3], ' ') AS sorted3
      FROM t ORDER BY doc_id""",

    "t_null_funcs" ->
      """SELECT c_custkey,
        nullif(c_mktsegment, 'BUILDING') AS seg_nb,
        coalesce(nullif(c_mktsegment, 'BUILDING'), 'REDACTED') AS seg_filled,
        greatest(c_acctbal, 0.0) AS bal_floor,
        least(c_acctbal, 1000.0) AS bal_cap,
        CASE WHEN c_acctbal < 0 THEN 'neg'
             WHEN c_acctbal < 1000 THEN 'low'
             ELSE 'high' END AS bal_band
      FROM customer ORDER BY c_custkey""",

    "t_running_total" ->
      """SELECT user_id, event_id, ts AS event_ts,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
      ORDER BY user_id, event_id""",

    // identical moment sums and double expression tree as Stats.zscores
    "t_zscore" ->
      """WITH m AS (
        SELECT event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        FROM events GROUP BY 1)
      SELECT event_id, e.event_type, value,
        round((value - sx / n) / sqrt((n * sxx - sx * sx) / (n * (n - 1))), 6) AS z
      FROM events e JOIN m USING (event_type)
      ORDER BY event_id""",

    // clamp thresholds rounded to 6 dp on BOTH engines so the rare
    // clamped rows carry the identical pinned value
    "t_winsorize" ->
      """WITH thr AS (
        SELECT event_type,
          round(quantile_cont(value, 0.05), 6) AS plo,
          round(quantile_cont(value, 0.95), 6) AS phi
        FROM events GROUP BY 1)
      SELECT event_id, e.event_type, value,
        least(greatest(value, plo), phi) AS value_w
      FROM events e JOIN thr USING (event_type)
      ORDER BY event_id""",

    "t_star_join" ->
      """SELECT p.p_brand, n.n_name, count(*) AS n_items,
        CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2 ORDER BY p_brand, n_name""",

    // salted join: the salt only reshapes the shuffle — the result is
    // the plain join, which is exactly what the oracle runs
    "t_salted_join" ->
      """SELECT s_name, count(*) AS n_items,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1 ORDER BY s_name""",

    // bucketed join: bucketing changes the physical layout, never the
    // result — the oracle is the same join straight off the raw files
    "t_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1 ORDER BY o_orderpriority""",

    // reaggregation: the engine merges daily partials; the oracle
    // aggregates monthly directly from raw — merge must equal direct
    "t_reaggregate" ->
      """WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
          sum(CAST(value AS DECIMAL(18,2))) AS sum_value
        FROM events GROUP BY 1, 2)
      SELECT CAST(date_trunc('month', day) AS DATE) AS month, event_type,
        CAST(sum(n) AS BIGINT) AS n_events, count(*) AS n_days,
        CAST(sum(sum_value) AS DOUBLE) AS total_value
      FROM daily GROUP BY 1, 2 ORDER BY month, event_type""",

    // median + MAD: exact interpolated percentiles in both engines;
    // deviations are double arithmetic over identical inputs, rounded
    // to 6 dp after the bit-parity expression
    "t_mad" ->
      """WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1),
      dev AS (
        SELECT e.event_type, med, abs(value - med) AS adev
        FROM events e JOIN med USING (event_type))
      SELECT event_type, round(any_value(med), 6) AS median_value,
        round(quantile_cont(adev, 0.5), 6) AS mad,
        count(*) AS n
      FROM dev GROUP BY 1 ORDER BY event_type""",

    "t_outer_join" ->
      """WITH c AS (
        SELECT user_id, count(*) AS n_clicks FROM events
        WHERE event_type = 'click' GROUP BY 1),
      p AS (
        SELECT user_id, count(*) AS n_purchases FROM events
        WHERE event_type = 'purchase' GROUP BY 1)
      SELECT COALESCE(c.user_id, p.user_id) AS user_id,
        COALESCE(n_clicks, 0) AS n_clicks,
        COALESCE(n_purchases, 0) AS n_purchases
      FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
      ORDER BY user_id""",

    // unpivot = the UNION ALL of one row per measure (engine-portable
    // spelling of UNPIVOT); decimal sums, cast to double at the end
    "t_unpivot" ->
      """WITH w AS (
        SELECT l_returnflag,
          sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty,
          sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2))) AS price,
          sum(CAST(round(l_discount, 2) AS DECIMAL(18,2))) AS disc
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, measure, CAST(total AS DOUBLE) AS total FROM (
        SELECT l_returnflag, 'disc' AS measure, disc AS total FROM w
        UNION ALL SELECT l_returnflag, 'price', price FROM w
        UNION ALL SELECT l_returnflag, 'qty', qty FROM w)
      ORDER BY l_returnflag, measure""",

    // schema-drift union: the old snapshot's missing column null-fills
    "t_union_evolve" ->
      """WITH v1 AS (
        SELECT event_id, event_type, CAST(NULL AS DECIMAL(18,2)) AS value2
        FROM events WHERE event_id % 2 = 0),
      v2 AS (
        SELECT event_id, event_type, CAST(value AS DECIMAL(18,2)) AS value2
        FROM events WHERE event_id % 2 <> 0)
      SELECT event_type, count(*) AS n_rows,
        count(value2) AS n_with_value,
        CAST(sum(value2) AS DOUBLE) AS total_value
      FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
      GROUP BY 1 ORDER BY event_type""",

    // SCD2 gaps-and-islands: same lag/run-sum/aggregate/lead chain as
    // the engine, over the identical (user_id, ts) total order
    "t_scd2" ->
      """WITH s AS (
        SELECT user_id, event_type, ts,
          CASE WHEN lag(event_type) OVER w IS NULL
                 OR lag(event_type) OVER w <> event_type
               THEN 1 ELSE 0 END AS chg
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      r AS (
        SELECT user_id, event_type, ts,
          sum(chg) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS run
        FROM s),
      i AS (
        SELECT user_id, min(event_type) AS event_type,
          min(ts) AS valid_from, count(*) AS n_snapshots
        FROM r GROUP BY user_id, run)
      SELECT user_id, event_type, valid_from,
        lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
          AS valid_to,
        n_snapshots,
        lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
          IS NULL AS is_current
      FROM i ORDER BY user_id, valid_from""",

    "t_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""",

    "t_lag_lead" ->
      """SELECT user_id, event_id, ts AS event_ts,
        epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
        lead(event_id) OVER w AS next_event_id
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",

    "t_zorder" ->
      s"""WITH z AS (SELECT (${zvalueSql("(l_partkey % 1024)", "(l_suppkey % 1024)", 10)}) AS zv
        FROM lineitem)
      SELECT zv >> 12 AS zbucket, count(*) AS n, min(zv) AS zmin, max(zv) AS zmax
      FROM z GROUP BY 1 ORDER BY 1""",

    "t_range_window" ->
      """SELECT user_id, event_id,
        CAST(sum(CAST(round(value * CAST(100.0 AS DOUBLE)) AS BIGINT)) OVER w AS BIGINT) AS trail_10m_cents,
        CAST(count(*) OVER w AS BIGINT) AS trail_10m_n
      FROM events WHERE user_id % 16 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id""",

    "t_window_funcs" ->
      """SELECT user_id, event_id,
        CAST(dense_rank() OVER wv AS INT) AS val_dense_rank,
        CAST(rank() OVER wv AS INT) AS val_rank,
        first_value(event_id) OVER wo AS first_event_id,
        last_value(event_id) OVER wf AS last_event_id,
        nth_value(event_id, 2) OVER wf AS second_event_id,
        cume_dist() OVER wo AS user_cume_dist
      FROM events WHERE user_id % 16 = 0
      WINDOW
        wo AS (PARTITION BY user_id ORDER BY ts, event_id),
        wf AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        wv AS (PARTITION BY event_type ORDER BY value NULLS FIRST)
      ORDER BY user_id, event_id""",

    // the same scaled-integer exact mean as VectorSearch.labelCentroids
    "ns_embed_centroids" -> embedCentroidsSql,

    // identical oracle by design: the UDAF form must be bit-equal to
    // the explode form (same micro-point rounding, same division)
    "ns_embed_centroids_agg" -> embedCentroidsSql,

    // same exact centroid CTE as ns_embed_centroids; the argmax orders
    // by (-sim, label) — identical tie semantics to Spark's
    // min(struct(-sim, label)) aggregate
    "ns_nearest_centroid" ->
      """WITH exploded AS (
        SELECT label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings),
      cent AS (
        SELECT label, pos,
          round(CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
                / (count(*) * 1000000.0), 6) AS centroid
        FROM exploded GROUP BY 1, 2),
      cvecs AS (
        SELECT label AS pred_label, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY 1),
      scored AS (
        SELECT e.vec_id, c.pred_label,
          round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) AS sim
        FROM embeddings e CROSS JOIN cvecs c)
      SELECT vec_id, pred_label, sim FROM scored
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY -sim, pred_label) = 1
      ORDER BY vec_id""",

    // same (v / maxabs) * 127 double tree as VectorSearch.quantizeInt8;
    // round() is half-away-from-zero in both engines
    "ns_embed_quantize" ->
      """WITH m AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        FROM embeddings),
      exploded AS (
        SELECT vec_id, maxabs, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS pos
        FROM m)
      SELECT vec_id, CAST(pos - 1 AS INT) AS dim,
        CASE WHEN maxabs = 0 THEN CAST(0 AS TINYINT)
             ELSE CAST(round(CAST(v AS DOUBLE) / maxabs * 127.0) AS TINYINT)
        END AS q,
        round(maxabs / 127.0, 6) AS qscale
      FROM exploded ORDER BY vec_id, dim""",

    "ns_source_stats" -> sourceStatsOneShotSql,

    // the incrementally-folded profile shares the one-shot SQL
    // VERBATIM: per-(batch, source) integer deltas re-sum to the
    // exact corpus totals, and the avg derives from those sums at
    // probe time — fold ≡ rebuild bit-for-bit
    "ns_stats_incremental" -> sourceStatsOneShotSql,

    // time travel over the fold's versioned deltas: the as-of-batch-2
    // profile vs the final profile, both recomputed here from the
    // documents table with the same thirds cut the query folds at
    // (integer // matches Spark's Long division)
    "ns_stats_asof" ->
      s"""WITH a AS (
        SELECT source, count(*) AS n_docs_asof,
          CAST(sum(len(${wsToksCased("text")})) AS BIGINT) AS n_tokens_asof
        FROM documents
        WHERE doc_id <= (SELECT (2 * max(doc_id)) // 3 FROM documents)
        GROUP BY 1),
      n AS (
        SELECT source, count(*) AS n_docs_now,
          CAST(sum(len(${wsToksCased("text")})) AS BIGINT) AS n_tokens_now
        FROM documents GROUP BY 1)
      SELECT n.source,
        CAST(coalesce(a.n_docs_asof, 0) AS BIGINT) AS n_docs_asof,
        CAST(coalesce(a.n_tokens_asof, 0) AS BIGINT) AS n_tokens_asof,
        n.n_docs_now, n.n_tokens_now,
        n.n_docs_now - CAST(coalesce(a.n_docs_asof, 0) AS BIGINT) AS docs_delta
      FROM n LEFT JOIN a USING (source) ORDER BY source""",

    "ns_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      nc AS (SELECT doc_id, toks,
               greatest(CAST(ceil(len(toks) / 24.0) AS BIGINT), 1) AS n_chunks
             FROM t),
      c AS (SELECT doc_id, toks, unnest(generate_series(0, n_chunks - 1)) AS cid
            FROM nc),
      ch AS (SELECT doc_id, CAST(cid AS INT) AS chunk_id,
               array_to_string(toks[CAST(cid * 24 + 1 AS INT) : CAST(cid * 24 + 32 AS INT)], ' ') AS chunk
             FROM c)
      SELECT doc_id, chunk_id, chunk,
        CAST(len(string_split(chunk, ' ')) AS INT) AS n_chunk_tokens
      FROM ch ORDER BY doc_id, chunk_id""",

    "ns_vocab" -> vocabOneShotSql,

    // the folded vocab probe reads the CMS fold's per-(term, batch)
    // audit deltas — associative count sums re-ranked at probe time —
    // so it shares the one-shot SQL VERBATIM: fold ≡ rebuild by hash
    "ns_vocab_incremental" -> vocabOneShotSql,

    // the same Knuth-multiplicative permutation as Sampling.sampleExactK
    "ns_sample_exact_k" -> sampleExactKOneShotSql,

    // the incrementally-folded bottom-k sample shares the one-shot
    // SQL VERBATIM: k smallest of a union ≡ k smallest of per-part
    // bottom-k's, so the folded O(strata·k) state IS the one-shot
    // sample — enforced by hash
    "ns_sample_incremental" -> sampleExactKOneShotSql,

    "ns_bigrams" ->
      s"""WITH toks AS (
        SELECT doc_id, unnest(${wsToks("text")}) AS w,
               generate_subscripts(${wsToks("text")}, 1) AS pos
        FROM documents),
      bg AS (
        SELECT w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
        FROM toks)
      SELECT bigram, count(*) AS n FROM bg WHERE bigram IS NOT NULL
      GROUP BY 1 ORDER BY n DESC, bigram LIMIT 30""",

    "ns_quality_model" ->
      s"""WITH $qualityModelCtes
      SELECT doc AS doc_id, n_words, stop_m, punct_m, digit_m, score_micro,
        CAST(score_micro >= 400000 AS INTEGER) AS keep
      FROM qs ORDER BY doc_id""",

    "ns_quality_by_source" ->
      s"""WITH $qualityModelCtes,
      qsrc AS (
        SELECT q.doc, q.score_micro, d.source
        FROM qs q JOIN documents d ON d.doc_id = q.doc),
      qr AS (
        SELECT doc, source, score_micro,
          row_number() OVER (PARTITION BY source
                             ORDER BY score_micro DESC, doc) AS rk,
          count(*) OVER (PARTITION BY source) AS n
        FROM qsrc)
      SELECT doc AS doc_id, source, score_micro FROM qr
      WHERE rk * 1000 <= 600 * n ORDER BY doc_id""",

    // lift score: the IDENTICAL expression tree as the Spark side —
    // (double(n_pair) * double(n_tok)) / (double(c1) * double(c2)),
    // two correctly-rounded multiplies + one divide over exact
    // BIGINT-derived doubles. LEFT-associative in both parsers.
    "ns_collocations" ->
      s"""WITH toksa AS (
        SELECT doc_id, ${wsToks("text")} AS t FROM documents),
      tk AS (
        SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS pos
        FROM toksa),
      bg AS (
        SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tk),
      pc AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair FROM bg
        WHERE w2 IS NOT NULL GROUP BY 1, 2 HAVING count(*) >= 5),
      uc AS (SELECT w AS wu, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM tk)
      SELECT w1, w2, n_pair, c1, c2,
        CAST(n_pair AS DOUBLE) * CAST(n_tok AS DOUBLE)
          / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)) AS lift
      FROM (SELECT p.w1, p.w2, p.n_pair, a.c AS c1, b.c AS c2, n_tok
            FROM pc p JOIN uc a ON a.wu = p.w1 JOIN uc b ON b.wu = p.w2
            CROSS JOIN tot)
      ORDER BY lift DESC, w1, w2 LIMIT 30""",

    // source-level shingle universes mirror shingleCtes (distinct
    // trigram shingles + whole-text collapse for short docs), keyed by
    // source instead of doc
    "ns_source_overlap" ->
      s"""WITH toksa AS (
        SELECT source, doc_id, ${wsToks("text")} AS t FROM documents),
      tk AS (
        SELECT source, doc_id, unnest(t) AS w,
               generate_subscripts(t, 1) AS pos
        FROM toksa),
      sh0 AS (
        SELECT source, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos)
               || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS sh
        FROM tk),
      sh AS (
        SELECT DISTINCT source, sh FROM sh0 WHERE sh IS NOT NULL
        UNION
        SELECT DISTINCT source, array_to_string(t, ' ') FROM toksa
        WHERE len(t) < 3),
      sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
      inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        GROUP BY 1, 2)
      SELECT i.src_a, i.src_b, i.n_common, sa.nsh AS n_a, sb.nsh AS n_b,
        CAST(i.n_common AS DOUBLE)
          / CAST(sa.nsh + sb.nsh - i.n_common AS DOUBLE) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.source = i.src_a
      JOIN sizes sb ON sb.source = i.src_b
      ORDER BY src_a, src_b""",

    // POSITIONAL re-implementation of winnowing (k=3, w=4): gram
    // hashes via lead(), every window start joined to its w hashes,
    // rightmost-min by (h ASC, i DESC) row_number — an independent
    // formulation of the same selection recurrence as the array kernel
    "ns_winnow_fingerprints" ->
      s"""WITH $winnowCtes
      SELECT DISTINCT doc_id, i AS pos, h AS fp FROM sel WHERE rk = 1
      ORDER BY doc_id, pos""",

    // matching half: distinct (doc, fp), boilerplate-capped posting
    // lists, pairwise shared-fingerprint counts
    "ns_winnow_matches" ->
      s"""WITH $winnowCtes,
      fps AS (SELECT DISTINCT doc_id, h AS fp FROM sel WHERE rk = 1),
      pf AS (SELECT fp FROM fps GROUP BY fp
             HAVING count(*) BETWEEN 2 AND 1000),
      pr AS (SELECT f.doc_id, f.fp FROM fps f JOIN pf USING (fp)),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(count(*) AS BIGINT) AS n_shared
                FROM pr a JOIN pr b
                  ON a.fp = b.fp AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b, n_shared FROM pairs WHERE n_shared >= 3
      ORDER BY id_a, id_b""",

    // the incrementally-FOLDED fingerprint table must converge to the
    // one-shot matcher: SAME oracle as ns_winnow_matches (the
    // curation/bm25 convergence-by-hash contract — fingerprinting is
    // per-doc, so fold-in-batches ≡ one-shot exactly)
    "ns_winnow_incremental" ->
      s"""WITH $winnowCtes,
      fps AS (SELECT DISTINCT doc_id, h AS fp FROM sel WHERE rk = 1),
      pf AS (SELECT fp FROM fps GROUP BY fp
             HAVING count(*) BETWEEN 2 AND 1000),
      pr AS (SELECT f.doc_id, f.fp FROM fps f JOIN pf USING (fp)),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(count(*) AS BIGINT) AS n_shared
                FROM pr a JOIN pr b
                  ON a.fp = b.fp AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b, n_shared FROM pairs WHERE n_shared >= 3
      ORDER BY id_a, id_b""",

    // incremental half: fps split at doc_id 400, new side probes corpus
    "ns_winnow_cross" ->
      s"""WITH $winnowCtes,
      fps AS (SELECT DISTINCT doc_id, h AS fp FROM sel WHERE rk = 1),
      nw AS (SELECT doc_id AS new_doc, fp FROM fps WHERE doc_id >= 400),
      cp AS (SELECT doc_id AS corpus_doc, fp FROM fps WHERE doc_id < 400),
      pairs AS (SELECT nw.new_doc, cp.corpus_doc,
                  CAST(count(*) AS BIGINT) AS n_shared
                FROM cp JOIN nw USING (fp) GROUP BY 1, 2)
      SELECT new_doc, corpus_doc, n_shared FROM pairs WHERE n_shared >= 3
      ORDER BY new_doc, corpus_doc""",

    // exact rational diversity: 1e6 − Σc(c−1)·1e6 // (n(n−1)), NULL
    // when no token pair exists — the same integer chain as the engine
    "ns_simpson_diversity" ->
      s"""WITH tc AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT doc_id, unnest(${wsToks("text")}) AS token FROM documents)
        GROUP BY 1, 2),
      agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                CAST(sum(c * (c - 1)) AS BIGINT) AS rep
              FROM tc GROUP BY 1)
      SELECT doc_id, n_tokens,
        CASE WHEN n_tokens >= 2
             THEN 1000000 - rep * 1000000 // (n_tokens * (n_tokens - 1))
             ELSE NULL END AS diversity_m
      FROM agg ORDER BY doc_id""",

    // weight chain: exact BIGINT token totals → floor(sqrt) back to
    // BIGINT (so the cross-group sum is associative integer math) →
    // integer proration → hash-ordered window prefix fill
    "ns_token_mix" ->
      s"""WITH d AS (
        SELECT doc_id, lang,
               CAST(len(${wsToksCased("text")}) AS BIGINT) AS n_tokens
        FROM documents),
      t AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tg
            FROM d GROUP BY 1),
      w AS (SELECT lang,
              CAST(floor(sqrt(CAST(tg AS DOUBLE))) AS BIGINT) AS wg
            FROM t),
      ws AS (SELECT CAST(sum(wg) AS BIGINT) AS wsum FROM w),
      sh AS (SELECT lang,
               CASE WHEN wsum > 0 THEN 20000 * wg // wsum ELSE 0 END AS share
             FROM w CROSS JOIN ws),
      c AS (
        SELECT d.lang, d.doc_id, d.n_tokens, sh.share,
          CAST(sum(d.n_tokens) OVER (PARTITION BY d.lang
            ORDER BY ((d.doc_id % 1000000007) * 2654435761) % 1000, d.doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM d JOIN sh ON sh.lang = d.lang)
      SELECT lang, doc_id, n_tokens, cum_tokens, share FROM c
      WHERE cum_tokens <= share ORDER BY lang, doc_id""",

    // cut chain: exact-BIGINT division → sqrt → ×1000.0 → floor, the
    // identical correctly-rounded double expression as the Spark side;
    // keep decision is the shared bucket1000 arithmetic
    "ns_temperature_mix" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
                    FROM documents GROUP BY 1),
      m AS (SELECT min(n) AS nmin FROM c),
      r AS (SELECT lang,
              CAST(floor(sqrt(CAST(nmin AS DOUBLE) / CAST(n AS DOUBLE))
                   * 1000.0) AS BIGINT) AS rate_permille
            FROM c CROSS JOIN m),
      k AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
            FROM documents d JOIN r ON d.lang = r.lang
            WHERE ((d.doc_id % 1000000007) * 2654435761) % 1000
                  < r.rate_permille
            GROUP BY 1)
      SELECT r.lang, r.rate_permille, k.n_kept
      FROM r JOIN k ON k.lang = r.lang ORDER BY r.lang""",

    "ns_ttr" ->
      s"""WITH tc AS (
        SELECT doc_id, token, count(*) AS cnt FROM (
          SELECT doc_id, unnest(${wsToks("text")}) AS token
          FROM documents)
        GROUP BY 1, 2)
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens, count(*) AS n_types,
        CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        round(CAST(count(*) AS DOUBLE) / sum(cnt), 6) AS ttr
      FROM tc GROUP BY doc_id ORDER BY doc_id""",

    "s1_ingest_dialects" ->
      """SELECT * FROM (VALUES
        ('ChIJxxxx', 'Z Moorhouse', 'Z Moorhouse', CAST(-43.5366 AS DOUBLE), CAST(172.63 AS DOUBLE), '238 Moorhouse Avenue, Christchurch', 'Christchurch', '', '', 'NZ'),
        ('bp-001', 'BP', 'BP Connect Moorhouse', CAST(-43.5386 AS DOUBLE), CAST(172.6284 AS DOUBLE), '123 Moorhouse Ave', 'Christchurch', 'Canterbury', '8011', 'NZ'),
        ('mob-001', 'Mobil', 'Mobil Redwood', CAST(-43.4792 AS DOUBLE), CAST(172.6089 AS DOUBLE), '286 Main North Rd', 'Christchurch', 'Canterbury', '8051', 'NZ')
      ) AS t(location_id, brand_name, location_name, latitude, longitude, address_line1, city, state_province, postal_code, country) ORDER BY location_id""",

    "s4_t2_json_decode" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_value FROM events ORDER BY event_id",

    "s5_projection_scan" ->
      "SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_keys, min(l_orderkey) AS min_key, max(l_orderkey) AS max_key FROM lineitem",

    "s6_point_lookup" ->
      "SELECT * FROM customer WHERE c_custkey = 42",

    "s10_literal_source" ->
      """SELECT * FROM (VALUES
        ('Unleaded 91', CAST(2.79 AS DOUBLE), CAST(279 AS BIGINT), CAST(0 AS BIGINT)),
        ('Unleaded 95', CAST(2.98 AS DOUBLE), CAST(298 AS BIGINT), CAST(1 AS BIGINT)),
        ('Unleaded 98', CAST(3.11 AS DOUBLE), CAST(311 AS BIGINT), CAST(2 AS BIGINT)),
        ('Diesel', CAST(2.10 AS DOUBLE), CAST(210 AS BIGINT), CAST(3 AS BIGINT))
      ) AS t(fuel_type, base_price, base_cents, ft_idx) ORDER BY ft_idx""",

    "t1_project_rename" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_no,
        CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS location_id,
        l_returnflag AS brand_name, l_linestatus AS location_name,
        l_quantity AS latitude, l_extendedprice AS longitude,
        CAST(l_partkey AS VARCHAR) AS address_line1,
        CAST(l_shipdate AS DATE) AS ship_date
      FROM lineitem ORDER BY order_key, line_no""",

    "t3_literal_defaults" ->
      "SELECT c_custkey, coalesce(c_mktsegment, 'UNKNOWN') AS segment, '' AS state_province, 'NZ' AS country FROM customer ORDER BY c_custkey",

    "t4_city_from_address" ->
      """SELECT c_custkey, address,
        CASE WHEN contains(address, ',') THEN trim(string_split(address, ',')[-1]) ELSE '' END AS city
      FROM (SELECT c_custkey,
              c_name || CASE WHEN c_custkey % 3 = 0 THEN '' ELSE ', ' || c_mktsegment END AS address
            FROM customer) ORDER BY c_custkey""",

    "t5_anti_join" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey) ORDER BY o_orderkey",

    "t6_first_seen_dedup" ->
      """SELECT user_id, event_id, event_type, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn FROM events
      ) WHERE rn = 1 ORDER BY user_id""",

    "t7_group_count" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2",

    "t8_cross_join" ->
      "SELECT n_nationkey, r_regionkey, n_name, r_name FROM nation CROSS JOIN region ORDER BY n_nationkey, r_regionkey",

    "t9_price_formula" ->
      """WITH ft(fuel_type, base_cents, ft_idx) AS (VALUES
        ('Unleaded 91', 279, 0), ('Unleaded 95', 298, 1), ('Unleaded 98', 311, 2), ('Diesel', 210, 3))
      SELECT s_suppkey AS location_id, fuel_type,
        (base_cents - 37 + (s_suppkey * 2654435761 + ft_idx * 7919) % 61) / 100.0 AS price,
        DATE '2024-06-01' AS date
      FROM supplier CROSS JOIN ft ORDER BY location_id, fuel_type""",

    "t10_last_write_wins" ->
      """SELECT user_id, event_type, CAST(ts AS DATE) AS day, value, event_id FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type, CAST(ts AS DATE) ORDER BY event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1 ORDER BY user_id, event_type, day""",

    "t11_date_events" ->
      """SELECT event_id, ts AS event_ts, CAST(ts AS DATE) AS event_date,
        CAST(date_trunc('month', ts) AS DATE) AS event_month,
        CAST(hour(ts) AS INT) AS event_hour, CAST(year(ts) AS INT) AS event_year
      FROM events ORDER BY event_id""",

    "t_window_hourly" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "t11_date_lineitem" ->
      "SELECT CAST(year(l_shipdate) AS INT) AS ship_year, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1",

    "sql_revenue_topk" ->
      """SELECT c.c_custkey, c.c_name,
        CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY c.c_custkey, c.c_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 10""",

    "sql_correlated" ->
      """SELECT n.n_nationkey, n.n_name,
        (SELECT COUNT(*) FROM supplier s2
         WHERE s2.s_nationkey = n.n_nationkey) AS n_suppliers
      FROM nation n
      WHERE EXISTS (SELECT 1 FROM supplier s1
                    WHERE s1.s_nationkey = n.n_nationkey)
      ORDER BY n.n_nationkey""",

    "t_set_ops" ->
      """WITH oc AS (SELECT o_custkey AS k FROM orders),
      bb AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0)
      SELECT k, 'intersect' AS op FROM (SELECT k FROM oc INTERSECT SELECT k FROM bb)
      UNION ALL
      SELECT k, 'except' AS op FROM (SELECT k FROM oc EXCEPT SELECT k FROM bb)
      ORDER BY op, k""",

    "t_sessionize" ->
      """WITH g AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(ts) OVER w IS NULL THEN 0
               WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1
               ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (
        SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM g)
      SELECT user_id, CAST(session_seq AS INT) AS session_seq,
        count(*) AS n_events,
        min(ts) AS session_start, max(ts) AS session_end,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM s GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq""",

    // independent implementation check: DuckDB's NATIVE ASOF LEFT JOIN
    // vs our union+window formulation
    "t_asof_join" ->
      """WITH p AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
      c0 AS (
        SELECT user_id, event_id AS click_id, ts AS click_ts, value AS click_value
        FROM events WHERE event_type = 'click'),
      c AS (
        SELECT user_id, click_id, click_ts, click_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, click_ts ORDER BY click_id DESC) AS rn
          FROM c0) WHERE rn = 1)
      SELECT p.user_id, p.event_id, p.ts AS purchase_ts, c.click_ts,
        c.click_id AS asof_click_id, c.click_value AS asof_click_value
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
      ORDER BY p.user_id, p.event_id""",

    // the range predicate stated directly — DuckDB's IEJoin is an
    // independent implementation of the chunked equi-join's semantics
    "t_range_join" ->
      """WITH e AS (
        SELECT user_id, event_id AS error_id, epoch_us(ts) AS t
        FROM events WHERE event_type = 'error'),
      p AS (
        SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pt
        FROM events WHERE event_type = 'purchase')
      SELECT e.user_id, e.error_id, p.purchase_id, e.t - p.pt AS delta_us
      FROM e JOIN p ON e.user_id = p.user_id
        AND e.t BETWEEN p.pt - 1800000000 AND p.pt + 1800000000
      ORDER BY e.user_id, error_id, purchase_id""",

    "t_retention_cohort" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      f AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1)
      SELECT cohort, CAST(date_diff('day', cohort, day) AS INT) AS offset_days,
        count(*) AS n_users
      FROM d JOIN f USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // strict ordering (> not >=): a tie does not advance the funnel —
    // the Spark side implements the same rule
    "t_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
      v AS (SELECT user_id, min(ts) AS view_ts FROM events
            WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(e.ts) AS click_ts FROM events e
            JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1),
      p AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM events e
            JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1)
      SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
        CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
                  WHEN c.click_ts IS NOT NULL THEN 2
                  WHEN v.view_ts IS NOT NULL THEN 1
                  ELSE 0 END AS INT) AS stage
      FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
             LEFT JOIN p USING (user_id)
      ORDER BY u.user_id""",

    // Spark `percentile` and DuckDB `quantile_cont` both define the
    // p-quantile by linear interpolation at rank p*(n-1)
    "t_percentiles" ->
      """SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        round(quantile_cont(l_quantity, 0.99), 6) AS p99_qty,
        round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
        round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
        round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price,
        count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1""",

    "t_cube" ->
      """SELECT event_type, CAST(year(ts) AS INT) AS event_year,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY CUBE (event_type, CAST(year(ts) AS INT))
      ORDER BY event_type NULLS FIRST, event_year NULLS FIRST""",

    "t_topk_per_group" ->
      """SELECT o_orderpriority, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice
      FROM (SELECT *, row_number() OVER (
              PARTITION BY o_orderpriority
              ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders)
      WHERE rk <= 3 ORDER BY o_orderpriority, rk""",

    // one window cumsum IS the packing spec; the Spark side reaches the
    // same numbers through the distributed two-pass prefix sum
    "ns_seq_pack" ->
      s"""WITH t AS (
        SELECT doc_id, CAST(len(${wsToksCased("text")}) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS cb
        FROM t)
      SELECT doc_id, n_tokens, cb // 2048 AS bin,
        cb - (cb // 2048) * 2048 AS bin_offset
      FROM c ORDER BY doc_id""",

    "ns_bpe_tokens" ->
      s"""WITH w AS (
        SELECT doc_id, unnest(${wsToks("text")}) AS w FROM documents),
      e AS (
        SELECT doc_id,
          CAST(len(string_split(trim(${bpeChainSql("w")}), ' ')) AS BIGINT) AS nb
        FROM w WHERE w <> '')
      SELECT doc_id, count(*) AS n_words,
        CAST(sum(nb) AS BIGINT) AS n_bpe_tokens
      FROM e GROUP BY 1 ORDER BY doc_id""",

    "ns_seq_pack_bpe" ->
      s"""WITH w AS (
        SELECT doc_id, unnest(${wsToks("text")}) AS w FROM documents),
      e AS (
        SELECT doc_id,
          CAST(len(string_split(trim(${bpeChainSql("w")}), ' ')) AS BIGINT) AS nb
        FROM w WHERE w <> ''),
      t AS (SELECT doc_id, CAST(sum(nb) AS BIGINT) AS n_tokens
            FROM e GROUP BY 1),
      c AS (
        SELECT doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS cb
        FROM t)
      SELECT doc_id, n_tokens, cb // 2048 AS bin,
        cb - (cb // 2048) * 2048 AS bin_offset
      FROM c ORDER BY doc_id""",

    "ns_block_dedup" ->
      """WITH src AS (
        SELECT doc_id,
          'site nav home products pricing docs blog careers about contact legal privacy terms cookies help search ' || text AS text
        FROM documents),
      toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS p
        FROM src),
      blk AS (
        SELECT doc_id, CAST((p - 1) // 8 AS INT) AS pos,
               string_agg(w, ' ' ORDER BY p) AS block
        FROM toks GROUP BY 1, 2),
      keep AS (
        SELECT doc_id, pos, block FROM (
          SELECT *, row_number() OVER (PARTITION BY block ORDER BY doc_id, pos) AS rn
          FROM blk) WHERE rn = 1),
      agg AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(block, ' ' ORDER BY pos) AS clean
        FROM keep GROUP BY 1),
      tot AS (SELECT doc_id, count(*) AS n_blocks FROM blk GROUP BY 1)
      SELECT t.doc_id, coalesce(a.clean, '') AS clean, t.n_blocks,
        coalesce(a.n_kept, 0) AS n_kept
      FROM tot t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""",

    // suffix-array-style repeated-substring detection, stated with
    // window arithmetic: positional 8-token windows -> per-window
    // occurrence count + global first occurrence (row_number over
    // (doc, pos)) -> gaps-and-islands merge of marked positions into
    // maximal spans. Planted construction mirrors the Spark query
    // verbatim (pads + SubstringFixture.passage).
    "ns_substring_dedup" ->
      s"""WITH src AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0
               THEN repeat('pad ', CAST(doc_id % 5 AS INT))
                    || '${SubstringFixture.passage} ' || text
               ELSE text END AS text
        FROM documents),
      t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM src),
      occ AS (
        SELECT doc_id, CAST(g AS INT) AS pos,
               array_to_string(toks[CAST(g + 1 AS INT):CAST(g + 8 AS INT)], ' ') AS sh
        FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 8)) AS g
              FROM t WHERE len(toks) >= 8)),
      d AS (
        SELECT doc_id, pos FROM (
          SELECT doc_id, pos,
                 count(*) OVER (PARTITION BY sh) AS n,
                 row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rn
          FROM occ) WHERE n >= 2 AND rn > 1),
      r AS (
        SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM d)
      SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
        CAST(max(pos) - min(pos) + 8 AS INT) AS span_tokens
      FROM r GROUP BY doc_id, grp
      ORDER BY doc_id, span_start""",

    "ns_dup_ngram_fraction" ->
      s"""WITH ${shingleCtes("documents")},
      dfc AS (SELECT sh AS s, count(*) AS dfc FROM sh GROUP BY 1)
      SELECT doc_id, count(*) AS n_shingles,
        CAST(sum(CASE WHEN dfc >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        round(CAST(sum(CASE WHEN dfc >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_frac
      FROM sh JOIN dfc ON sh.sh = dfc.s
      GROUP BY doc_id ORDER BY doc_id""",

    "ns_tfidf" -> tfidfOneShotSql,

    // the folded BM25 posting table IS the tf matrix and df is its
    // per-term posting count, so the probe shares the one-shot SQL
    // VERBATIM — fold ≡ rebuild by hash
    "ns_tfidf_incremental" -> tfidfOneShotSql,

    "ns_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
      WHERE ((doc_id % 1000000007) * 2654435761) % 1000 <
        (CASE lang WHEN 'en' THEN 300 WHEN 'zh' THEN 800 ELSE 1000 END)
      ORDER BY doc_id""",

    "ns_drift_report" ->
      s"""WITH pb AS (
        SELECT lang, count(*) AS n_docs_before,
               CAST(sum(len(${wsToksCased("text")})) AS BIGINT) AS n_tokens_before
        FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
      pa AS (
        SELECT lang, count(*) AS n_docs_after,
               CAST(sum(len(${wsToksCased("text")})) AS BIGINT) AS n_tokens_after
        FROM documents WHERE doc_id % 2 = 1 GROUP BY lang)
      SELECT coalesce(pb.lang, pa.lang) AS lang,
        coalesce(n_docs_before, 0) AS n_docs_before,
        coalesce(n_tokens_before, 0) AS n_tokens_before,
        coalesce(n_docs_after, 0) AS n_docs_after,
        coalesce(n_tokens_after, 0) AS n_tokens_after,
        coalesce(n_docs_after, 0) - coalesce(n_docs_before, 0) AS docs_delta,
        round(CAST(coalesce(n_docs_after, 0) - coalesce(n_docs_before, 0) AS DOUBLE)
              / nullif(coalesce(n_docs_before, 0), 0), 6) AS docs_rel
      FROM pb FULL OUTER JOIN pa ON pb.lang = pa.lang
      ORDER BY lang""",

    "ns_grouped_bootstrap" ->
      """WITH per AS (
        SELECT CAST(substring(source, 4) AS BIGINT) AS grp,
               CAST(sum(n_chars) AS BIGINT) AS s, count(*) AS n
        FROM documents GROUP BY 1),
      reps AS (
        SELECT grp, s, n, unnest(generate_series(1, 20)) AS rep FROM per),
      b AS (
        SELECT rep, s, n,
          ((((grp % 1000000007) * (rep + 1) + rep * 7919) % 1000000007)
            * 2654435761) % 1000 AS bkt
        FROM reps),
      m AS (
        SELECT rep, s, n,
          CASE WHEN bkt < 368 THEN 0 WHEN bkt < 736 THEN 1
               WHEN bkt < 920 THEN 2 WHEN bkt < 981 THEN 3
               WHEN bkt < 996 THEN 4 ELSE 5 END AS mult
        FROM b)
      SELECT CAST(rep AS BIGINT) AS rep,
        CAST(sum(mult) AS BIGINT) AS g_eff,
        CAST(sum(mult * n) AS BIGINT) AS n_eff,
        round(CAST(sum(mult * s) AS DOUBLE) / sum(mult * n), 6) AS mean_metric
      FROM m GROUP BY 1 ORDER BY rep""",

    "ns_source_cap" ->
      """SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
          row_number() OVER (PARTITION BY source
                             ORDER BY n_chars DESC NULLS LAST, doc_id) AS rn
        FROM documents) WHERE rn <= 10
      ORDER BY doc_id""",

    "ns_jackknife" ->
      """WITH per AS (
        SELECT (((l_orderkey % 1000000007) * 2654435761) % 1000) % 10 AS grp,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_g,
               count(*) AS n_g
        FROM lineitem GROUP BY 1),
      tot AS (
        SELECT CAST(sum(s_g) AS BIGINT) AS s,
               CAST(sum(n_g) AS BIGINT) AS n FROM per),
      loo AS (
        SELECT grp, n_g, s_g,
               ((s - s_g) * 1000000) // (n - n_g) AS loo_mean_micro
        FROM per, tot),
      sq AS (
        SELECT CAST(sum(loo_mean_micro) AS BIGINT) AS sx,
               CAST(sum(loo_mean_micro * loo_mean_micro) AS BIGINT) AS sxx,
               count(*) AS g FROM loo)
      SELECT grp, n_g, s_g, loo_mean_micro,
        round(sqrt((CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / g)
                   * (g - 1) / g) / 1000000.0, 6) AS jk_se
      FROM loo, sq ORDER BY grp""",

    "ns_bootstrap" ->
      """WITH reps AS (
        SELECT doc_id, n_chars, unnest(generate_series(1, 20)) AS rep
        FROM documents),
      b AS (
        SELECT rep, n_chars,
          ((((doc_id % 1000000007) * (rep + 1) + rep * 7919) % 1000000007)
            * 2654435761) % 1000 AS bkt
        FROM reps),
      m AS (
        SELECT rep, n_chars,
          CASE WHEN bkt < 368 THEN 0 WHEN bkt < 736 THEN 1
               WHEN bkt < 920 THEN 2 WHEN bkt < 981 THEN 3
               WHEN bkt < 996 THEN 4 ELSE 5 END AS mult
        FROM b)
      SELECT CAST(rep AS BIGINT) AS rep,
        CAST(sum(mult) AS BIGINT) AS n_eff,
        round(CAST(sum(mult * n_chars) AS DOUBLE) / sum(mult), 6) AS mean_metric
      FROM m GROUP BY rep ORDER BY rep""",

    "ns_weighted_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
      WHERE ((doc_id % 1000000007) * 2654435761) % 1000 <
        CAST(round(least(CAST(1.0 AS DOUBLE), CAST(n_chars AS DOUBLE) / CAST(400.0 AS DOUBLE))
          * CAST(1000.0 AS DOUBLE)) AS BIGINT)
      ORDER BY doc_id""",

    "ns_train_split" ->
      """SELECT doc_id, lang,
        CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 50 THEN 'test'
             WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 100 THEN 'val'
             ELSE 'train' END AS split
      FROM documents ORDER BY doc_id""",

    "ns_shuffle_order" ->
      """SELECT doc_id, source,
        row_number() OVER (ORDER BY
          ((doc_id % 1000000007) * 2654435761) % 1000000007, doc_id)
          AS shuffle_pos
      FROM documents ORDER BY doc_id""",

    "ns_row_numbers" ->
      """SELECT doc_id, lang,
        row_number() OVER (ORDER BY doc_id) AS row_id
      FROM documents ORDER BY doc_id""",

    "ns_corpus_mix" ->
      """SELECT doc_id, lang, CAST(copy AS BIGINT) AS copy FROM (
        SELECT doc_id, lang,
          unnest(generate_series(1, CASE lang WHEN 'de' THEN 3 WHEN 'zh' THEN 0 ELSE 1 END)) AS copy
        FROM documents)
      ORDER BY doc_id, copy""",

    "t_pivot" ->
      """SELECT user_id,
        count(*) FILTER (event_type = 'click') AS click,
        count(*) FILTER (event_type = 'error') AS error,
        count(*) FILTER (event_type = 'purchase') AS purchase,
        count(*) FILTER (event_type = 'signup') AS signup,
        count(*) FILTER (event_type = 'view') AS view
      FROM events GROUP BY user_id ORDER BY user_id""",

    "t_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "t12_full_address" ->
      """SELECT c_custkey,
        concat_ws(', ', c_name, c_mktsegment, '', 'NZ') ||
          CASE WHEN postal_code IS NOT NULL AND postal_code <> '' THEN ' ' || postal_code ELSE '' END AS full_address,
        postal_code
      FROM (SELECT c_custkey, c_name, c_mktsegment,
              CASE WHEN c_custkey % 5 = 0 THEN '' ELSE lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') END AS postal_code
            FROM customer) ORDER BY c_custkey""",

    "t13_row_to_json" ->
      "SELECT c_custkey, to_json(struct_pack(c_custkey := c_custkey, c_name := c_name, c_mktsegment := c_mktsegment)) AS js FROM customer ORDER BY c_custkey",

    "pipeline_collection" ->
      """WITH stations AS (
        SELECT 'st-' || json_extract_string(props, '$.k') || '-' || CAST(user_id % 50 AS VARCHAR) AS location_id,
               event_type AS brand_name, event_id,
               event_type || ', zone ' || CAST(user_id % 7 AS VARCHAR) AS address_line1
        FROM events),
      st2 AS (SELECT *, CASE WHEN contains(address_line1, ',') THEN trim(string_split(address_line1, ',')[-1]) ELSE '' END AS city FROM stations),
      batch AS (SELECT * FROM st2 WHERE event_id % 2 = 1),
      existing AS (SELECT * FROM st2 WHERE event_id % 2 = 0),
      deduped AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY location_id ORDER BY event_id) AS rn FROM batch) WHERE rn = 1),
      fresh AS (SELECT * FROM deduped d WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.location_id = d.location_id))
      SELECT brand_name, count(*) AS n_stations, count(DISTINCT city) AS n_cities FROM fresh GROUP BY brand_name ORDER BY brand_name""",

    "pipeline_backfill" ->
      """WITH ft(fuel_type, base_cents, ft_idx) AS (VALUES
        ('Unleaded 91', 279, 0), ('Unleaded 95', 298, 1), ('Unleaded 98', 311, 2), ('Diesel', 210, 3)),
      d AS (SELECT CAST(unnest(generate_series(DATE '2024-06-01', DATE '2024-06-03', INTERVAL 1 DAY)) AS DATE) AS date)
      SELECT s_suppkey AS location_id, fuel_type,
        (base_cents - 37 + (s_suppkey * 2654435761 + ft_idx * 7919) % 61) / 100.0 AS price,
        date
      FROM supplier CROSS JOIN ft CROSS JOIN d
      ORDER BY location_id, fuel_type, date""",

    // Twin of TextDedup.simhashPairsPortable: recompute the portable
    // 32-bit simhash bit-by-bit from the same token-code arithmetic,
    // then ALL pairwise hammings (the engine's pigeonhole enumeration
    // is exact w.r.t. the bound, so the direct O(n²·32) form here —
    // fine at oracle scale — yields the identical pair set).
    "ns_dedup_simhash_portable" -> simhashPortableSql,
    // the incrementally-FOLDED signature table must converge to the
    // one-shot pigeonhole matcher: SAME oracle (the minhash/winnow/bm25
    // convergence-by-hash contract — signatures are per-doc pure, so
    // fold-in-batches ≡ one-shot exactly)
    "ns_simhash_incremental" -> simhashPortableSql,

    // Twin of TextDedup.simhashCrossPortable (the streaming guard's
    // batch form): same signature bits, asymmetric probe-vs-corpus
    // pairing on doc_id % 5.
    "ns_simhash_guard" -> simhashGuardSql,
    // ingest probe against the folded signature table: the corpus side
    // is served from STORED signatures, which are per-doc pure — so the
    // probe's pair set is the guard's pair set exactly, and the same
    // SQL twin enforces it by hash
    "ns_simhash_inc_probe" -> simhashGuardSql,

    "ns_dedup_exact" ->
      """WITH doubled AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000000000, text FROM documents)
      SELECT doc_id, text_hash FROM (
        SELECT doc_id, md5(text) AS text_hash,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM doubled) WHERE rn = 1 ORDER BY doc_id""",

    "ns_dedup_exact_norm" ->
      """WITH stacked AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000000000, upper(text) FROM documents),
      normed AS (
        SELECT doc_id,
          trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N} \t\n\f\r\x0B]', '', 'g'), '[ \t\n\f\r\x0B]+', ' ', 'g')) AS norm
        FROM stacked),
      hashed AS (
        SELECT doc_id,
          CASE WHEN norm IS NULL OR norm = '' THEN 'empty-' || CAST(doc_id AS VARCHAR) ELSE md5(norm) END AS text_hash
        FROM normed)
      SELECT doc_id, text_hash FROM (
        SELECT doc_id, text_hash, row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn
        FROM hashed) WHERE rn = 1 ORDER BY doc_id""",

    // the bloom sketch is pure routing — the admitted set is exactly
    // the normalized anti-join, so the twin carries no bloom at all
    "ns_bloom_dedup" ->
      """WITH normed AS (
        SELECT doc_id,
          trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N} \t\n\f\r\x0B]', '', 'g'), '[ \t\n\f\r\x0B]+', ' ', 'g')) AS norm
        FROM documents),
      corpus AS (SELECT norm FROM normed WHERE doc_id % 5 <> 0 AND norm <> '' AND norm IS NOT NULL),
      newb AS (
        SELECT doc_id, norm FROM normed WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 1000000000000 AS doc_id, norm FROM normed
        WHERE doc_id % 5 <> 0 AND doc_id % 3 = 0)
      SELECT doc_id FROM newb n
      WHERE n.norm IS NULL OR n.norm = ''
         OR NOT EXISTS (SELECT 1 FROM corpus c WHERE c.norm = n.norm)
      ORDER BY doc_id""",

    "ns_split_leakage" ->
      s"""WITH ${jaccardCtes("documents", pruned = true)},
      spl AS (
        SELECT doc_id,
          CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 50 THEN 'test'
               WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 100 THEN 'val'
               ELSE 'train' END AS split
        FROM documents)
      SELECT id_a, id_b, pa.split AS split_a, pb.split AS split_b,
        round(CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter), 6) AS jaccard_r
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      JOIN spl pa ON pa.doc_id = id_a
      JOIN spl pb ON pb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter) >= 0.12
        AND pa.split <> pb.split
      ORDER BY id_a, id_b""",

    "ns_dedup_ngram_jaccard" ->
      s"""WITH ${jaccardCtes("documents", pruned = true)}
      SELECT id_a, id_b,
        round(CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter), 6) AS jaccard_r
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter) >= 0.12
      ORDER BY id_a, id_b""",

    // PPJoin prefix filtering is lossless, so the oracle is the plain
    // UNPRUNED all-pairs jaccard with the same integer permille rule —
    // an independent brute-force twin of the engine's candidate scheme
    "ns_ppjoin" ->
      s"""WITH ${jaccardCtes("documents", pruned = false)}
      SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
        CAST(sa.nsh AS BIGINT) AS na, CAST(sb.nsh AS BIGINT) AS nb,
        round(CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter), 6) AS jaccard_r
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE inter * 1000 >= 500 * (sa.nsh + sb.nsh - inter)
      ORDER BY id_a, id_b""",

    "ns_containment" ->
      s"""WITH ${jaccardCtes("documents", pruned = true)}
      SELECT id_a, id_b, inter, sa.nsh AS na, sb.nsh AS nb,
        round(CAST(inter AS DOUBLE) / sa.nsh, 6) AS cont_a,
        round(CAST(inter AS DOUBLE) / sb.nsh, 6) AS cont_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / sa.nsh >= 0.4
         OR CAST(inter AS DOUBLE) / sb.nsh >= 0.4
      ORDER BY id_a, id_b""",

    "ns_bm25_topk" ->
      s"""WITH ${bm25Ctes(bm25TermsIn)}
      SELECT CAST(rank AS INT) AS rank, doc AS doc_id, score_pts, n_terms
      FROM (SELECT doc, score_pts, n_terms,
              row_number() OVER (ORDER BY score_pts DESC, doc) AS rank
            FROM bm)
      WHERE rank <= 20 ORDER BY rank""",

    // the incrementally-folded index must converge to the one-shot
    // retrieval: SAME oracle as ns_bm25_topk — the hash gate IS the
    // convergence proof (the curation-fold contract, now on the
    // retrieval artifact)
    "ns_bm25_incremental" ->
      s"""WITH ${bm25Ctes(bm25TermsIn)}
      SELECT CAST(rank AS INT) AS rank, doc AS doc_id, score_pts, n_terms
      FROM (SELECT doc, score_pts, n_terms,
              row_number() OVER (ORDER BY score_pts DESC, doc) AS rank
            FROM bm)
      WHERE rank <= 20 ORDER BY rank""",

    "ns_bm25_route" ->
      s"""WITH rbase AS (
        SELECT doc_id AS doc,
               CAST(len(${wsToks("text")}) AS BIGINT) AS dl
        FROM documents),
      rstats AS (
        SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
        FROM rbase),
      rtoks AS (
        SELECT doc_id AS doc, unnest(${wsToks("text")}) AS term
        FROM documents),
      rtf AS (
        SELECT t.doc, b.dl, t.term, count(*) AS tf
        FROM rtoks t JOIN rbase b ON b.doc = t.doc
        WHERE t.term IN ('join','merge','hash','scan','filter','sort',
                         'vector','stream','batch')
        GROUP BY 1, 2, 3),
      rdf AS (SELECT term, count(*) AS dfq FROM rtf GROUP BY 1),
      rterm AS (
        SELECT * FROM (VALUES
          ('joins','join'), ('joins','merge'), ('joins','hash'),
          ('scans','scan'), ('scans','filter'), ('scans','sort'),
          ('vectors','vector'), ('vectors','stream'), ('vectors','batch'))
          v(route, term)),
      rpts AS (
        SELECT doc, term, ${graft.ext.Bm25.pointsSql(1.2, 0.75)} AS pts
        FROM (SELECT rtf.*, rdf.dfq, n_docs,
                     ${graft.ext.Bm25.avgdlSql} AS avgdl
              FROM rtf JOIN rdf USING (term) CROSS JOIN rstats)),
      routed AS (
        SELECT p.doc, r.route, CAST(sum(pts) AS BIGINT) AS score_pts,
               count(*) AS n_terms
        FROM rpts p JOIN rterm r USING (term) GROUP BY 1, 2)
      SELECT doc AS doc_id, route, score_pts, n_terms FROM (
        SELECT doc, route, score_pts, n_terms,
          row_number() OVER (PARTITION BY doc
                             ORDER BY score_pts DESC, route) AS rn
        FROM routed) WHERE rn = 1
      ORDER BY doc_id""",

    "ns_hybrid_rrf" ->
      s"""WITH ${bm25Ctes(bm25TermsIn)},
      bmtop AS (
        SELECT doc, CAST(row_number() OVER (ORDER BY score_pts DESC, doc) AS INT) AS r_txt
        FROM bm QUALIFY r_txt <= 50),
      vq AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 7),
      vscored AS (
        SELECT e.vec_id AS doc,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), vq.qv), 6) AS sim
        FROM embeddings e CROSS JOIN vq WHERE e.vec_id <> 7),
      vtop AS (
        SELECT doc, CAST(row_number() OVER (ORDER BY sim DESC, doc) AS INT) AS r_vec
        FROM vscored QUALIFY r_vec <= 50)
      SELECT coalesce(b.doc, v.doc) AS doc_id, b.r_txt, v.r_vec,
        coalesce(${graft.ext.Bm25.rrfPtsSql("b.r_txt")}, 0)
          + coalesce(${graft.ext.Bm25.rrfPtsSql("v.r_vec")}, 0) AS rrf_pts
      FROM bmtop b FULL OUTER JOIN vtop v ON b.doc = v.doc
      ORDER BY rrf_pts DESC, doc_id LIMIT 10""",

    "ns_lm_score" ->
      s"""WITH lmt AS (
        SELECT doc_id, unnest(${wsToks("text")}) AS w,
               generate_subscripts(${wsToks("text")}, 1) AS pos
        FROM documents),
      bg AS (
        SELECT doc_id, w AS w1,
               lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM lmt QUALIFY w2 IS NOT NULL),
      c2t AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
      c1t AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
      p AS (SELECT w1, w2, ${graft.ext.TextAnalysis.lmPointsSql} AS p_pts
            FROM c2t JOIN c1t USING (w1)),
      d AS (SELECT doc_id, CAST(sum(p_pts) AS BIGINT) AS lm_pts,
                   count(*) AS n_bigrams
            FROM bg JOIN p USING (w1, w2) GROUP BY 1)
      SELECT doc_id, n_bigrams, lm_pts,
        round(CAST(lm_pts AS DOUBLE) / n_bigrams, 6) AS avg_p_micro
      FROM d ORDER BY doc_id""",

    // explicit-cell CMS: the same portable token-code + multiplier
    // family arithmetic, cells and mins recomputed exactly
    "ns_cms_counts" -> cmsOneShotSql,

    // the incrementally-folded CMS shares the one-shot SQL VERBATIM:
    // cells and true counts fold by plain integer addition
    // (associative), so the folded estimate path is BIT-equal to the
    // rebuild — the hash gate is the proof
    "ns_cms_incremental" -> cmsOneShotSql,

    // real-image decode round-trip: the Spark side ENCODES a genuine
    // PNG per doc at formula dims and header-DECODES it back through
    // javax.imageio; the oracle predicts the dims from the formula
    // alone — a decode bug (or the stub sneaking back onto the path)
    // hash-mismatches immediately. RGB PNG → 3 channels, still image
    // → duration 0.
    "ns_multimodal_features" ->
      """SELECT doc_id,
        CAST(((doc_id % 16) + 16) % 16 + 1 AS INT) AS width,
        CAST(((doc_id % 9) + 9) % 9 + 1 AS INT) AS height,
        3 AS channels, CAST(0 AS BIGINT) AS duration_ms
      FROM documents ORDER BY doc_id""",

    // the audio face of the same round-trip: a REAL RIFF/WAVE blob per
    // doc at formula sample count / channels, header-decoded back; the
    // oracle predicts duration_ms = floor(nSamples·1000 / 8000) from
    // the formula alone (byte rate cancels the channel count). Audio →
    // width/height 0.
    "ns_multimodal_audio" ->
      """SELECT doc_id,
        0 AS width, 0 AS height,
        CAST(((doc_id % 2) + 2) % 2 + 1 AS INT) AS channels,
        CAST(((((doc_id % 5000) + 5000) % 5000 + 1000) * 1000) // 8000
             AS BIGINT) AS duration_ms
      FROM documents ORDER BY doc_id""",

    // the video face: real ISO-BMFF boxes at formula duration/dims,
    // box-walk decoded back; container headers carry no channel
    // layout -> channels 0 by contract
    "ns_multimodal_video" ->
      """SELECT doc_id,
        CAST(((doc_id % 1920) + 1920) % 1920 + 1 AS INT) AS width,
        CAST(((doc_id % 1080) + 1080) % 1080 + 1 AS INT) AS height,
        0 AS channels,
        CAST((((doc_id * 37) % 600000) + 600000) % 600000 AS BIGINT)
          AS duration_ms
      FROM documents ORDER BY doc_id""",

    // the Matroska/webm face: real EBML elements at formula
    // duration/dims (1 ms ticks × default TimestampScale, so
    // duration_ms round-trips exactly), element-walk decoded back;
    // container headers carry no channel layout -> channels 0
    "ns_multimodal_webm" ->
      """SELECT doc_id,
        CAST(((doc_id % 1920) + 1920) % 1920 + 1 AS INT) AS width,
        CAST(((doc_id % 1080) + 1080) % 1080 + 1 AS INT) AS height,
        0 AS channels,
        CAST((((doc_id * 53) % 600000) + 600000) % 600000 AS BIGINT)
          AS duration_ms
      FROM documents ORDER BY doc_id""",

    // the Ogg face: real pages (Opus id header on even ids, Vorbis on
    // odd), duration read back from the end-of-stream granule — both
    // codec granule conventions round-trip exactly (Vorbis 8 kHz:
    // ms*8 ticks; Opus 48 kHz + pre-skip: ms*48+312 ticks)
    "ns_multimodal_ogg" ->
      """SELECT doc_id,
        0 AS width, 0 AS height,
        CAST(((doc_id % 2) + 2) % 2 + 1 AS INT) AS channels,
        CAST((((doc_id * 29) % 600000) + 600000) % 600000 AS BIGINT)
          AS duration_ms
      FROM documents ORDER BY doc_id""",

    // FLAC STREAMINFO: duration = samples*1000 div rate, both sides
    // recomputed from the planted id formulas (// is DuckDB integer
    // division, matching the Spark side's long division)
    "ns_multimodal_flac" ->
      """SELECT doc_id,
        0 AS width, 0 AS height,
        CAST(((doc_id % 2) + 2) % 2 + 1 AS INT) AS channels,
        CAST(((((doc_id * 997) % 10000000) + 10000000) % 10000000) * 1000
          // (CASE ((doc_id % 4) + 4) % 4
              WHEN 0 THEN 8000 WHEN 1 THEN 16000
              WHEN 2 THEN 44100 ELSE 48000 END) AS BIGINT) AS duration_ms
      FROM documents ORDER BY doc_id""",

    // MP3: duration = frames*spf*1000 div rate, frames and rate both
    // recomputed from the planted id formulas; spf is 1152 on the
    // MPEG-1 rates and 576 on the MPEG-2 rate (id%4 = 3)
    "ns_multimodal_mp3" ->
      """SELECT doc_id,
        0 AS width, 0 AS height,
        CAST(((doc_id % 2) + 2) % 2 + 1 AS INT) AS channels,
        CAST((((doc_id * 31) % 100000) + 100000) % 100000
          * (CASE WHEN ((doc_id % 4) + 4) % 4 = 3 THEN 576 ELSE 1152 END)
          * 1000
          // (CASE ((doc_id % 4) + 4) % 4
              WHEN 0 THEN 44100 WHEN 1 THEN 48000
              WHEN 2 THEN 32000 ELSE 22050 END) AS BIGINT) AS duration_ms
      FROM documents ORDER BY doc_id""",

    // the spectral embedder's peak bin under a planted pure sine:
    // physics says the Goertzel argmax IS the planted bin — the
    // oracle predicts it from the id formula alone
    "ns_multimodal_audio_embed" ->
      """SELECT doc_id,
        CAST(((doc_id % 16) + 16) % 16 AS INT) AS peak_bin
      FROM documents ORDER BY doc_id""",

    // the same physics through the COMPRESSED path: FLAC frames
    // (verbatim/fixed/LPC by id) decode to the identical planted sine,
    // so the Goertzel argmax is still the id-formula bin
    "ns_multimodal_flac_embed" ->
      """SELECT doc_id,
        CAST(((doc_id % 16) + 16) % 16 AS INT) AS peak_bin
      FROM documents ORDER BY doc_id""",

    // the same physics through the G.711 telephony path: A-law /
    // mu-law companded bytes (by id parity) expand to the planted
    // sine, so the Goertzel argmax is still the id-formula bin
    "ns_multimodal_g711_embed" ->
      """SELECT doc_id,
        CAST(((doc_id % 16) + 16) % 16 AS INT) AS peak_bin
      FROM documents ORDER BY doc_id""",

    // and through the 4-bit adaptive path: IMA ADPCM blocks decode to
    // the planted sine within ~19 dB, leaving the argmax on the bin
    "ns_multimodal_adpcm_embed" ->
      """SELECT doc_id,
        CAST(((doc_id % 16) + 16) % 16 AS INT) AS peak_bin
      FROM documents ORDER BY doc_id""",

    // and through the Ogg container: laced packets reassemble to the
    // native FLAC stream, so the argmax is still the id-formula bin
    "ns_multimodal_oggflac_embed" ->
      """SELECT doc_id,
        CAST(((doc_id % 16) + 16) % 16 AS INT) AS peak_bin
      FROM documents ORDER BY doc_id""",

    // the image embedder's peak contrast block under a planted
    // bright-block PNG: geometry says the centered-block-luma argmax
    // IS the planted grid index — predicted from the id formula alone
    "ns_multimodal_image_embed" ->
      """SELECT doc_id,
        CAST(((doc_id % 9) + 9) % 9 AS INT) AS peak_block
      FROM documents ORDER BY doc_id""",

    // fixed-grid exact quantiles: same floor-division cells (DuckDB's
    // % follows the dividend sign, so pmod is spelled out), the same
    // integer coverage test 100·cum >= n·q — HUGEINT window sums cast
    // back to BIGINT
    "ns_quantile_grid" -> quantileGridOneShotSql,

    // the incrementally-folded grid profile shares the one-shot SQL
    // VERBATIM: cell counts are associative, so the folded quantile
    // path is bit-equal to the rebuild
    "ns_quantile_incremental" -> quantileGridOneShotSql,

    // HLL error-bound audit: the oracle recomputes the EXACT distinct
    // count and asserts the engine-side verdict is uniformly TRUE — a
    // Spark HLL estimate straying past the 3·rsd envelope flips
    // within_bound and fails the hash, pinning sketch drift without
    // demanding sketch bit-parity across engines
    "ns_sketch_error" ->
      """SELECT event_type,
        CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_distinct,
        TRUE AS within_bound
      FROM events GROUP BY event_type ORDER BY event_type""",

    // feature hashing: same portable code, same Knuth-multiplier mix
    "ns_feature_hash" ->
      s"""WITH toks AS (
        SELECT doc_id, unnest(${wsToks("text")}) AS t FROM documents),
      codes AS (
        SELECT doc_id,
          CAST(ascii(substring(t, 1, 1)) * 131 + length(t) AS BIGINT) AS c
        FROM toks)
      SELECT doc_id, (c * 2654435761) % 1000003 % 64 AS bucket,
        CAST(count(*) AS BIGINT) AS n
      FROM codes GROUP BY 1, 2 ORDER BY doc_id, bucket""",

    // DSIR model: hashed unigram+bigram multinomials, raw vs target
    // (lang = 'en') — portable codes, identical Knuth bucketing
    "ns_dsir_model" ->
      s"""${dsirCtes()}
      SELECT bucket, n_raw, n_target FROM model ORDER BY bucket""",

    // the incrementally-folded DSIR model shares the one-shot SQL
    // VERBATIM: bucket counts are associative, so fold ≡ rebuild
    // bit-for-bit — the hash match IS the convergence proof
    "ns_dsir_incremental" ->
      s"""${dsirCtes()}
      SELECT bucket, n_raw, n_target FROM model ORDER BY bucket""",

    // and so does scoring against the maintained model (λ derives
    // from identical integer counts) — this run compacts mid-fold,
    // putting the DeltaCompact watermark path under the same oracle
    "ns_dsir_inc_weights" ->
      s"""${dsirCtes()}
      SELECT doc_id, gram_n, score_mn FROM w ORDER BY doc_id""",

    // retraction converges to the rebuild-without-the-deleted-slice:
    // the oracle recomputes the model over the never-retracted corpus
    "ns_dsir_retract" ->
      s"""${dsirCtes("(SELECT * FROM documents WHERE doc_id % 10 <> 3) d")}
      SELECT bucket, n_raw, n_target FROM model ORDER BY bucket""",

    // DSIR weights: BIGINT milli-nat scores — the λ table's ln calls
    // are spelled in the identical order as the Spark expression, and
    // everything per-doc is exact integer arithmetic
    "ns_dsir_weights" ->
      s"""${dsirCtes()}
      SELECT doc_id, gram_n, score_mn FROM w ORDER BY doc_id""",

    // DSIR selection: identical deterministic top-k ranking
    // (score desc, doc_id) replayed by the oracle
    "ns_dsir_select" ->
      s"""${dsirCtes()},
      sel AS (
        SELECT doc_id, gram_n, score_mn FROM w
        ORDER BY score_mn DESC, doc_id LIMIT 100)
      SELECT doc_id, gram_n, score_mn FROM sel ORDER BY doc_id""",

    // sparse tf-idf cosine pairs: identical mille-point weights, the
    // same integer threshold test in HUGEINT (dot²·10⁴ ≥ 30²·na²·nb²),
    // and the same one-cast-per-operand double for the reported cosine
    "ns_sparse_cosine" ->
      s"""WITH toksa AS (
        SELECT doc_id, ${wsToks("text")} AS toka FROM documents),
      toks AS (
        SELECT doc_id, unnest(toka) AS w,
               generate_subscripts(toka, 1) AS pos
        FROM toksa),
      sh0 AS (
        SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos)
               || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS term
        FROM toks),
      shortd AS ( -- the kernel's whole-doc shingle for docs < 3 tokens
        SELECT doc_id, array_to_string(toka, ' ') AS term
        FROM toksa WHERE len(toka) < 3),
      terms AS (SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, term FROM sh0 WHERE term IS NOT NULL
        UNION ALL SELECT doc_id, term FROM shortd)),
      dfreq AS (SELECT term, count(*) AS df FROM terms GROUP BY 1
                HAVING count(*) <= 100),
      w AS MATERIALIZED (
        SELECT terms.doc_id AS doc, terms.term, dfreq.df,
          ${graft.ext.Bm25.idfMillePtsSql} AS w
        FROM terms JOIN dfreq USING (term)),
      n2 AS (SELECT doc, sum(CAST(w AS HUGEINT) * w) AS n2
             FROM w GROUP BY 1),
      dots AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b,
          sum(CAST(a.w AS HUGEINT) * b.w) AS dot
        FROM (SELECT * FROM w WHERE df >= 2) a
        JOIN (SELECT * FROM w WHERE df >= 2) b
          ON a.term = b.term AND a.doc < b.doc
        GROUP BY 1, 2)
      SELECT doc_a, doc_b,
        round(CAST(dot AS DOUBLE) /
              sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)), 6) AS cos_r
      FROM dots
      JOIN n2 na ON na.doc = dots.doc_a
      JOIN n2 nb ON nb.doc = dots.doc_b
      WHERE dot * dot * 10000 >= 900 * na.n2 * nb.n2
      ORDER BY doc_a, doc_b""",

    "ns_keywords" ->
      s"""WITH ktf AS (
        SELECT doc_id AS doc, term, count(*) AS tf FROM (
          SELECT doc_id, unnest(${wsToks("text")}) AS term
          FROM documents)
        GROUP BY 1, 2),
      kdf AS (SELECT term, count(*) AS df FROM ktf GROUP BY 1),
      kn AS (SELECT count(*) AS n_docs FROM documents),
      kscored AS (
        SELECT doc, term, tf, df,
          tf * ${graft.ext.Bm25.keywordIdfPtsSql} AS score_pts
        FROM ktf JOIN kdf USING (term) CROSS JOIN kn)
      SELECT doc AS doc_id,
        CAST(row_number() OVER (PARTITION BY doc ORDER BY score_pts DESC, term) AS INT) AS rk,
        term, tf, df, score_pts
      FROM kscored QUALIFY rk <= 3 ORDER BY doc_id, rk""",

    "ns_cross_dedup" -> crossDedupSql,
    "ns_decontaminate" -> decontaminateSql,
    // identical semantics, different physical plan (shuffle-hash instead
    // of broadcast) — the oracle is shared by construction
    "ns_decontaminate_xl" -> decontaminateSql,

    "ns_token_budget" ->
      s"""WITH t AS (
        SELECT doc_id, CAST(len(${wsToksCased("text")}) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS cum_before
        FROM t)
      SELECT doc_id, n_tokens, cum_before FROM c
      WHERE cum_before < 50000 ORDER BY doc_id""",

    "ns_contamination_by_source" ->
      s"""WITH ${shingleCtes("documents")},
      bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 17 = 0),
      corp AS (SELECT doc_id, sh FROM sh WHERE doc_id % 17 <> 0),
      hit AS (SELECT DISTINCT doc_id FROM corp JOIN bench USING (sh))
      SELECT source, count(*) AS n_docs,
        CAST(sum(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        round(CAST(sum(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS contaminated_frac
      FROM (SELECT doc_id, source FROM documents WHERE doc_id % 17 <> 0) d
      LEFT JOIN hit USING (doc_id)
      GROUP BY 1 ORDER BY source""",

    // corpus health report: the clusters closure + the contamination
    // match + plain corpus aggregates, assembled into one row
    "ns_corpus_report" ->
      s"""WITH RECURSIVE ${jaccardCtes("documents", pruned = true)},
      pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter) >= 0.12),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT a AS node, b AS r FROM edges
        UNION
        SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a),
      lbl AS (SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node),
      bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 17 = 0),
      hit AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (sh)
              WHERE s.doc_id % 17 <> 0),
      base AS (
        SELECT count(*) AS n_docs,
          count(DISTINCT source) AS n_sources,
          count(DISTINCT lang) AS n_langs,
          CAST(sum(len(${wsToksCased("text")})) AS BIGINT) AS n_tokens,
          count(*) - count(DISTINCT text) AS n_exact_dup_docs
        FROM documents),
      nd AS (SELECT count(*) AS n_near_dup_docs,
               count(DISTINCT cluster) AS n_near_dup_clusters FROM lbl),
      cont AS (SELECT count(*) AS n_contaminated FROM hit)
      SELECT * FROM base CROSS JOIN nd CROSS JOIN cont""",

    "ns_scrub" ->
      """SELECT doc_id,
        regexp_replace(
          regexp_replace(
            regexp_replace(
              text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or https://ex.ample/p/' || CAST(doc_id AS VARCHAR)
                   || ' ref 900' || CAST(doc_id + 1000000 AS VARCHAR),
              '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
            'https?://[^ \t\n]+', '<URL>', 'g'),
          '[0-9]{7,}', '<NUM>', 'g') AS clean
      FROM documents ORDER BY doc_id""",

    // the page shell wrapped around every fourth doc must extract back
    // to the prose; the regex chain is the identical RE2-subset pattern
    // text the Spark kernel runs (TextAnalysis.htmlToText)
    "ns_html_clean" ->
      """WITH wrapped AS (
        SELECT doc_id,
          CASE WHEN doc_id % 4 = 0 THEN
            '<html><head><title>t</title><style>body { color: red }</style><script type="text/javascript">var x = 1 < 2;</script></head><body><h1>Header</h1><p>'
            || text ||
            '</p><!-- navigation' || chr(10) || 'footer --><div>links &amp;&amp; more&nbsp;here &lt;tags&gt; stay &quot;quoted&#39;</div></body></html>'
          ELSE text END AS text
        FROM documents),
      untagged AS (
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
            '(?s)<!--.*?-->', ' ', 'g'),
            '<[^>]+>', ' ', 'g') AS t
        FROM wrapped),
      decoded AS (
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
            '&nbsp;', ' ', 'g'),
            '&lt;', '<', 'g'),
            '&gt;', '>', 'g'),
            '&quot;', '"', 'g'),
            '&#39;', chr(39), 'g'),
            '&amp;', '&', 'g') AS t
        FROM untagged)
      SELECT doc_id,
        trim(regexp_replace(t, '[ \t\n\f\r\x0B]+', ' ', 'g')) AS clean
      FROM decoded ORDER BY doc_id""",

    // C4 boilerplate-line strip: same synthetic page shell as the
    // engine (masthead / cookie banner / subscribe plea / unique ref),
    // df counted over DISTINCT (doc, line), the integer permille
    // threshold rule, reassembly by position — string_agg skips the
    // NULLed boilerplate lines exactly as collect_list does
    "ns_boilerplate_lines" ->
      """WITH pages AS (
        SELECT doc_id,
          'SOURCE ' || source || ' NETWORK DAILY' || chr(10) || text ||
          CASE WHEN doc_id % 3 = 0
            THEN chr(10) || 'We use cookies to improve your experience.'
            ELSE '' END ||
          CASE WHEN doc_id % 2 = 0
            THEN chr(10) || 'Subscribe to our newsletter today!'
            ELSE '' END ||
          chr(10) || 'ref ' || CAST(doc_id AS VARCHAR) AS page
        FROM documents),
      ls AS (SELECT doc_id, string_split(page, chr(10)) AS arr FROM pages),
      lines AS (
        SELECT doc_id, unnest(arr) AS line,
               generate_subscripts(arr, 1) AS pos FROM ls),
      n AS (SELECT count(*) AS n_docs FROM documents),
      dfl AS (
        SELECT line, count(*) AS n_line_docs
        FROM (SELECT DISTINCT doc_id, line FROM lines) GROUP BY line),
      freq AS (
        SELECT dfl.line FROM dfl, n
        WHERE dfl.n_line_docs * 1000 >= n.n_docs * 30),
      flagged AS (
        SELECT li.doc_id, li.pos, li.line, f.line IS NOT NULL AS bp
        FROM lines li LEFT JOIN freq f ON li.line = f.line)
      SELECT doc_id,
        coalesce(string_agg(CASE WHEN NOT bp THEN line END, chr(10)
                            ORDER BY pos), '') AS clean,
        CAST(sum(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
      FROM flagged GROUP BY doc_id ORDER BY doc_id""",

    // positional phrase search: postings of the three phrase terms
    // tagged with slot offsets; an occurrence = a (doc, start) cell
    // covering all three distinct slots (1-based positions here vs the
    // engine's 0-based — a constant shift that cancels in the counts)
    "ns_phrase_search" ->
      s"""WITH t AS (SELECT doc_id, ${wsToks("text")} AS toks FROM documents),
      p AS (
        SELECT doc_id, unnest(toks) AS tok,
               generate_subscripts(toks, 1) AS pos FROM t),
      sl AS (
        SELECT doc_id, pos - 0 AS start, 0 AS slot FROM p WHERE tok = 'slow'
        UNION ALL
        SELECT doc_id, pos - 1, 1 FROM p WHERE tok = 'hash'
        UNION ALL
        SELECT doc_id, pos - 2, 2 FROM p WHERE tok = 'batch'),
      occ AS (
        SELECT doc_id, start FROM sl
        GROUP BY doc_id, start HAVING count(DISTINCT slot) = 3)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
      FROM occ GROUP BY doc_id ORDER BY doc_id""",

    // last-click attribution: purchases joined to same-user clicks in a
    // 24h band (nanos arithmetic via epoch_us*1000 = the engine's long
    // ts), winner = latest click ts with largest-id tiebreak
    "t_attribution" ->
      """WITH c AS (
        SELECT user_id, event_id, epoch_us(ts)*1000 AS tns
        FROM events WHERE event_type = 'click'),
      p AS (
        SELECT user_id, event_id, epoch_us(ts)*1000 AS tns
        FROM events WHERE event_type = 'purchase'),
      j AS (
        SELECT p.user_id, p.event_id AS conv_event_id, p.tns AS conv_ts,
               c.event_id AS touch_event_id, c.tns AS touch_ts
        FROM p JOIN c ON c.user_id = p.user_id AND c.tns <= p.tns
          AND p.tns - c.tns <= 86400000000000)
      SELECT user_id, conv_event_id, conv_ts, touch_event_id, touch_ts,
             n_touches
      FROM (
        SELECT j.*, CAST(count(*) OVER (PARTITION BY conv_event_id) AS BIGINT) AS n_touches,
          row_number() OVER (PARTITION BY conv_event_id
                             ORDER BY touch_ts DESC, touch_event_id DESC) AS rn
        FROM j)
      WHERE rn = 1 ORDER BY conv_event_id""",

    // data-quality audit: row rules as conditional sums, referential
    // orphans as NOT EXISTS, duplicate keys as sum(n-1)
    "t_dq_audit" ->
      """WITH rows_r AS (
        SELECT 'null_priority' AS rule,
          CAST(count(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'nonpositive_price',
          CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) FROM orders
        UNION ALL
        SELECT 'date_out_of_range',
          CAST(count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1990-01-01'
            OR o_orderdate >= TIMESTAMP '2030-01-01') AS BIGINT) FROM orders
        UNION ALL
        SELECT 'unknown_status',
          CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orphan_custkey',
          CAST(count(*) AS BIGINT) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'dup_orderkey',
          CAST(coalesce(sum(n - 1), 0) AS BIGINT)
        FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1))
      SELECT rule, n_violations FROM rows_r ORDER BY rule""",

    // hourly resample + forward fill: latest cents-exact observation per
    // (user, hour) via rn=1 (engine: max(struct)), per-user hour grid via
    // generate_series, ffill via IGNORE NULLS window
    "t_resample_ffill" ->
      """WITH e AS (
        SELECT user_id, epoch_us(ts)*1000 AS tns, event_id,
          (epoch_us(ts)*1000) // 3600000000000 AS hr,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events),
      ph AS (
        SELECT user_id, hr, cents AS obs_cents FROM (
          SELECT e.*, row_number() OVER (PARTITION BY user_id, hr
            ORDER BY tns DESC, event_id DESC) AS rn FROM e)
        WHERE rn = 1),
      grid AS (
        SELECT user_id, unnest(generate_series(min(hr), max(hr))) AS hr
        FROM e GROUP BY user_id)
      SELECT g.user_id,
        make_timestamp(g.hr * 3600000000) AS hour_ts,
        CAST(last_value(ph.obs_cents IGNORE NULLS) OVER (
          PARTITION BY g.user_id ORDER BY g.hr
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cents,
        CASE WHEN ph.obs_cents IS NOT NULL THEN 'obs' ELSE 'ffill' END AS src
      FROM grid g LEFT JOIN ph ON ph.user_id = g.user_id AND ph.hr = g.hr
      ORDER BY g.user_id, hour_ts""",

    // per-user time-weighted average: cents-exact values, ms-truncated
    // inter-event durations, DECIMAL-exact product sum, one double
    // division at the end
    "t_twap" ->
      """WITH e AS (
        SELECT user_id, event_id, epoch_us(ts)*1000 AS tns,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events),
      w AS (
        SELECT user_id, cents, tns,
          lead(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS nxt
        FROM e),
      a AS (
        SELECT user_id,
          CAST(count(*) + 1 AS BIGINT) AS n_events,
          CAST(sum((nxt - tns) // 1000000) AS BIGINT) AS span_ms,
          sum(cents * ((nxt - tns) // 1000000)) AS num
        FROM w WHERE nxt IS NOT NULL GROUP BY user_id)
      SELECT user_id, n_events, span_ms,
        round(CAST(num AS DOUBLE) / CAST(span_ms AS DOUBLE), 6) AS twap_cents
      FROM a WHERE span_ms > 0 ORDER BY user_id""",

    // blocked-levenshtein entity resolution: distinct names, first-token
    // blocks (rank-capped at 1000 to mirror the engine's maxBlock
    // contract), length-difference prefilter, classic Levenshtein ≤ 3
    "ns_fuzzy_join" ->
      """WITH n AS (
        SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_rows,
               string_split(p_name, ' ')[1] AS blk
        FROM part GROUP BY p_name),
      c AS (SELECT n.*, row_number() OVER (PARTITION BY blk ORDER BY name) AS rk FROM n)
      SELECT a.name AS name_a, b.name AS name_b,
        CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
        a.n_rows AS n_a, b.n_rows AS n_b
      FROM c a JOIN c b ON a.blk = b.blk AND a.name < b.name
      WHERE a.rk <= 1000 AND b.rk <= 1000
        AND abs(length(a.name) - length(b.name)) <= 3
        AND levenshtein(a.name, b.name) <= 3
      ORDER BY name_a, name_b""",

    // sorted-neighborhood linkage: the window-8 rank band over the
    // global name order (row_number + band join — DuckDB plans an
    // IEJoin), then the same length prefilter + Levenshtein ≤ 3
    "ns_snm_pairs" ->
      """WITH names AS (
        SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_rows
        FROM part GROUP BY 1),
      r AS (SELECT name, n_rows, row_number() OVER (ORDER BY name) AS rn
            FROM names),
      cand AS (
        SELECT a.name AS name_a, b.name AS name_b,
               a.n_rows AS n_a, b.n_rows AS n_b
        FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 8)
      SELECT name_a, name_b,
        CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist, n_a, n_b
      FROM cand
      WHERE abs(length(name_a) - length(name_b)) <= 3
        AND levenshtein(name_a, name_b) <= 3
      ORDER BY name_a, name_b""",

    // fuzzy canonicalization: components of the ≤3-distance pair graph
    // by recursive transitive closure (the independent twin of the
    // engine's star contraction), representative = argmax(n_rows, ties:
    // min name), singletons canonicalize to themselves
    "ns_fuzzy_canon" ->
      """WITH RECURSIVE n AS (
        SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_rows,
               string_split(p_name, ' ')[1] AS blk
        FROM part GROUP BY p_name),
      c AS (SELECT n.*, row_number() OVER (PARTITION BY blk ORDER BY name) AS rk FROM n),
      prs AS (
        SELECT a.name AS na, b.name AS nb
        FROM c a JOIN c b ON a.blk = b.blk AND a.name < b.name
        WHERE a.rk <= 1000 AND b.rk <= 1000
          AND abs(length(a.name) - length(b.name)) <= 3
          AND levenshtein(a.name, b.name) <= 3),
      edges AS (SELECT na AS a, nb AS b FROM prs UNION SELECT nb, na FROM prs),
      reach AS (
        SELECT a AS node, b AS r FROM edges
        UNION
        SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a),
      lbl AS (SELECT node, least(node, min(r)) AS label FROM reach GROUP BY node),
      alln AS (
        SELECT n.name, n.n_rows, coalesce(lbl.label, n.name) AS label
        FROM n LEFT JOIN lbl ON lbl.node = n.name),
      reps AS (
        SELECT label, name AS canonical FROM (
          SELECT label, name, row_number() OVER (
            PARTITION BY label ORDER BY n_rows DESC, name) AS rn
          FROM alln) WHERE rn = 1)
      SELECT alln.name, reps.canonical, alln.n_rows
      FROM alln JOIN reps ON reps.label = alln.label
      ORDER BY name""",

    // market-basket triangles: co-ordered part pairs at support ≥ 2,
    // closed by triple join on the a<b orientation (the engine closes
    // the identical triangle set via degree orientation), each triangle
    // credited to all three corners
    "t_triangles" ->
      """WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e0 AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      e AS (SELECT x, y FROM e0 GROUP BY x, y HAVING count(*) >= 2),
      tri AS (
        SELECT e1.x AS a, e1.y AS b, e2.y AS c
        FROM e e1 JOIN e e2 ON e1.y = e2.x
        JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
      corners AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      SELECT node AS part, CAST(count(*) AS BIGINT) AS n_triangles
      FROM corners GROUP BY node ORDER BY part""",

    "t_kcore" -> kcoreSql(k = 2, rounds = 8),
    "t_ppr" -> pprSql(3),

    // multi-source BFS over the co-order graph: the recursive closure
    // carries (node, depth) pairs out to the depth bound and min(d)
    // over them IS the hop distance — an independent formulation of
    // the same canonical BFS layers the engine's frontier loop emits.
    // The edge CTEs are MATERIALIZED per the kCore lesson (sym is
    // referenced from inside the recursion).
    "t_reachability" ->
      """WITH RECURSIVE op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      ep AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      e AS MATERIALIZED (SELECT x, y FROM ep GROUP BY x, y HAVING count(*) >= 2),
      sym AS MATERIALIZED (
        SELECT x AS a, y AS b FROM e UNION ALL SELECT y, x FROM e),
      seeds AS (SELECT DISTINCT a AS node FROM sym WHERE a % 25 = 0),
      walk AS (
        SELECT node, 0 AS d FROM seeds
        UNION
        SELECT s.b, w.d + 1 FROM walk w JOIN sym s ON s.a = w.node
        WHERE w.d < 4)
      SELECT node AS part, CAST(min(d) AS INT) AS dist
      FROM walk GROUP BY node ORDER BY part""",

    // CDC apply: the engine's max(struct(ver, op, cents, event_id))
    // argmax expressed as the identical DESC-chain row_number — 'U' >
    // 'D' at equal version in both engines' binary string order
    "t_cdc_apply" ->
      """WITH e AS (
        SELECT user_id, event_id, epoch_us(ts)*1000 AS tns,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL),
      snap AS (
        SELECT user_id, cents, event_id FROM (
          SELECT e.*, row_number() OVER (PARTITION BY user_id
            ORDER BY tns DESC, event_id DESC) AS rn
          FROM e WHERE event_id % 2 = 0) WHERE rn = 1),
      ch AS (
        SELECT user_id, tns AS ver,
          CASE WHEN event_id % 7 = 0 THEN 'D' ELSE 'U' END AS op,
          cents, event_id
        FROM e WHERE event_id % 2 = 1),
      win AS (
        SELECT user_id, op, cents, event_id FROM (
          SELECT ch.*, row_number() OVER (PARTITION BY user_id
            ORDER BY ver DESC, op DESC, cents DESC, event_id DESC) AS rn
          FROM ch) WHERE rn = 1)
      SELECT coalesce(win.user_id, snap.user_id) AS user_id,
        CASE WHEN win.user_id IS NOT NULL THEN win.cents
             ELSE snap.cents END AS cents,
        CASE WHEN win.user_id IS NOT NULL THEN win.event_id
             ELSE snap.event_id END AS event_id
      FROM snap FULL JOIN win ON win.user_id = snap.user_id
      WHERE win.op IS NULL OR win.op <> 'D'
      ORDER BY user_id""",

    // lag-1 autocorrelation: lead pairs per user + the t_corr_stats
    // moment/expression tree verbatim
    "t_autocorr" ->
      """WITH p AS (
        SELECT event_type, value AS x,
          lead(value) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS y
        FROM events WHERE value IS NOT NULL),
      m AS (
        SELECT event_type, count(*) AS n,
          CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
          CAST(sum(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
          CAST(sum(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
          CAST(sum(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS syy
        FROM p WHERE y IS NOT NULL GROUP BY 1)
      SELECT event_type, n,
        round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr,
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept
      FROM m ORDER BY event_type""",

    // exact grouped mode: (n DESC, cents ASC) argmax ≡ the engine's
    // max(struct(n, −cents))
    "t_mode" ->
      """WITH c AS (
        SELECT event_type,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
          CAST(count(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
      SELECT event_type, cents AS mode_cents, n FROM (
        SELECT c.*, row_number() OVER (PARTITION BY event_type
          ORDER BY n DESC, cents ASC) AS rn FROM c)
      WHERE rn = 1 ORDER BY event_type""",

    // exact weighted median: cents-ordered cumulative weights; the
    // default RANGE frame folds ties identically in both engines
    "t_weighted_median" ->
      """WITH li AS (
        SELECT l_returnflag AS flag,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
          CAST(round(l_quantity * 100) AS BIGINT) AS w
        FROM lineitem),
      c AS (
        SELECT flag, cents, w,
          sum(w) OVER (PARTITION BY flag ORDER BY cents) AS cum,
          sum(w) OVER (PARTITION BY flag) AS total
        FROM li)
      SELECT flag, CAST(min(cents) AS BIGINT) AS wmedian_cents,
        CAST(max(total) AS BIGINT) AS total_w
      FROM c WHERE cum * 2 >= total
      GROUP BY flag ORDER BY flag""",

    // Benford first-digit audit: arithmetic digit extraction (integer
    // string length as the portable log10), exact ppm shares
    "t_benford" ->
      """WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_totalprice > 0),
      d AS (
        SELECT cents // CAST(power(10, length(CAST(cents AS VARCHAR)) - 1)
                           AS BIGINT) AS digit
        FROM c)
      SELECT digit, CAST(count(*) AS BIGINT) AS n,
        CAST(count(*) * 1000000 // (SELECT count(*) FROM c) AS BIGINT) AS ppm
      FROM d GROUP BY digit ORDER BY digit""",

    // interval-union coverage: the same sweep expressed with the same
    // window frames (hwm = ROWS ... 1 PRECEDING; island cumsum = the
    // default RANGE frame both engines share)
    "t_interval_coverage" ->
      """WITH e AS (
        SELECT user_id, epoch_us(ts)*1000 AS s,
               epoch_us(ts)*1000 + 600000000000 AS f
        FROM events),
      m AS (
        SELECT user_id, s, f,
          max(f) OVER (PARTITION BY user_id ORDER BY s, f
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS hwm
        FROM e),
      fl AS (
        SELECT user_id, s, f,
          CASE WHEN hwm IS NULL OR s > hwm THEN 1 ELSE 0 END AS nw
        FROM m),
      isl0 AS (
        SELECT user_id, s, f,
          sum(nw) OVER (PARTITION BY user_id ORDER BY s, f) AS island
        FROM fl),
      isl AS (
        SELECT user_id, island, min(s) AS i_start, max(f) AS i_end,
          count(*) AS n_spans
        FROM isl0 GROUP BY 1, 2),
      g AS (
        SELECT user_id, i_start, i_end, n_spans,
          i_start - lag(i_end) OVER (PARTITION BY user_id
                                     ORDER BY i_start) AS gap
        FROM isl)
      SELECT user_id,
        CAST(sum(i_end - i_start) AS BIGINT) AS covered,
        CAST(count(*) AS BIGINT) AS n_islands,
        CAST(sum(n_spans) AS BIGINT) AS n_spans,
        CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap
      FROM g GROUP BY user_id ORDER BY user_id""",

    // hour-of-day seasonality: exact ppm share within each event type
    "t_seasonality" ->
      """WITH c AS (
        SELECT CAST(hour(ts) AS INT) AS hr, event_type,
          CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2)
      SELECT event_type, hr, n,
        CAST(n * 1000000 //
             CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
             AS BIGINT) AS share_ppm
      FROM c ORDER BY event_type, hr""",

    // first-order Markov transitions: adjacent pairs under the same
    // (ts, event_id) per-user total order; floor-division ppm on both
    // engines (// on positive BIGINTs ≡ Spark's div)
    "t_event_transitions" ->
      """WITH s AS (
        SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS to_type
        FROM events),
      c AS (
        SELECT event_type AS from_type, to_type,
          CAST(count(*) AS BIGINT) AS n
        FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        CAST(n * 1000000 //
             CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
             AS BIGINT) AS p_ppm
      FROM c ORDER BY from_type, to_type""",

    // integer-exact 3σ outliers: the divisions-cleared test
    // (v·n − S)² > 9·(n·Q − S²) — DuckDB's BIGINT sums promote to
    // HUGEINT, so both sides of the comparison are exact here just as
    // the engine's DECIMAL(38,0) chain is
    "t_outlier_events" ->
      """WITH e AS (
        SELECT user_id, event_id,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL),
      st AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
          sum(cents) AS s, sum(cents * cents) AS q
        FROM e GROUP BY user_id)
      SELECT e.user_id, e.event_id, e.cents, st.n
      FROM e JOIN st ON st.user_id = e.user_id
      WHERE st.n >= 2
        AND (e.cents * st.n - st.s) * (e.cents * st.n - st.s)
            > 9 * (st.n * st.q - st.s * st.s)
      ORDER BY e.user_id, e.event_id""",

    // RFM segmentation: rank-quartile scores over the per-user
    // recency/frequency/monetary profile; the cut rule 4−((rk−1)·4÷n)
    // is pinned integer math (ntile's remainder distribution differs
    // across engines), ranks tiebreak on user_id
    "t_rfm" ->
      """WITH e AS (
        SELECT user_id, epoch_us(ts)*1000 AS tns,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL),
      per AS (
        SELECT user_id, max(tns) AS last_ts, CAST(count(*) AS BIGINT) AS f,
          CAST(sum(cents) AS BIGINT) AS m_cents
        FROM e GROUP BY user_id),
      g AS (SELECT max(last_ts) AS g_ts, CAST(count(*) AS BIGINT) AS n
            FROM per),
      b AS (SELECT p.*, g.g_ts - p.last_ts AS rec_ns, g.n
            FROM per p CROSS JOIN g),
      r AS (SELECT b.*,
        row_number() OVER (ORDER BY rec_ns, user_id) AS rk_r,
        row_number() OVER (ORDER BY f DESC, user_id) AS rk_f,
        row_number() OVER (ORDER BY m_cents DESC, user_id) AS rk_m
        FROM b)
      SELECT user_id, rec_ns, f, m_cents,
        CAST(4 - (rk_r - 1) * 4 // n AS INT) AS r_score,
        CAST(4 - (rk_f - 1) * 4 // n AS INT) AS f_score,
        CAST(4 - (rk_m - 1) * 4 // n AS INT) AS m_score,
        concat(CAST(4 - (rk_r - 1) * 4 // n AS VARCHAR),
               CAST(4 - (rk_f - 1) * 4 // n AS VARCHAR),
               CAST(4 - (rk_m - 1) * 4 // n AS VARCHAR)) AS segment
      FROM r ORDER BY user_id""",

    // first-5-event-type paths per user, counted across users
    "t_top_paths" ->
      """WITH r AS (
        SELECT user_id, event_type,
          row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS rn
        FROM events),
      p AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= 5 GROUP BY user_id)
      SELECT path, CAST(count(*) AS BIGINT) AS n_users
      FROM p GROUP BY path ORDER BY n_users DESC, path""",

    "ns_repetition" ->
      s"""WITH ${shingleCtes("documents")},
      nd AS (SELECT doc_id, count(*) AS n_distinct FROM sh GROUP BY 1),
      t AS (SELECT doc_id, greatest(len(${wsToks("text")}) - 2, 1) AS n_ngrams FROM documents)
      SELECT t.doc_id, t.n_ngrams, nd.n_distinct,
        round(CAST(t.n_ngrams - nd.n_distinct AS DOUBLE) / t.n_ngrams, 6) AS rep_ratio
      FROM t JOIN nd ON t.doc_id = nd.doc_id
      ORDER BY t.doc_id""",

    // exact all-pairs jaccard at the verified threshold — the Spark side
    // reaches the same set through LSH candidates + exact verify (recall
    // ~0.9999 at j>=0.5 with r=2/b=32 banding; equality verified
    // empirically at the test scale factors)
    "ns_dedup_minhash" -> minhashPortableSql,
    "ns_ann_lsh" -> annLshPortableSql,
    "ns_ann_lsh_incremental" -> annLshIncrementalPortableSql,
    "ns_ann_multitable" -> annMultitablePortableSql,
    "ns_embed_neardup_lsh" -> embedNearDupLshPortableSql,
    "ns_dedup_minhash_verified" -> minhashVerifiedSql,
    // the incrementally-FOLDED band-bucket table must converge to the
    // one-shot verified matcher: SAME oracle (the winnow/bm25
    // convergence-by-hash contract — band ids are per-doc pure, so
    // fold-in-batches ≡ one-shot exactly)
    "ns_minhash_incremental" -> minhashVerifiedSql,
    // ingest probe against the folded band index: exact full-universe
    // cross jaccard between the batch (every 10th id) and the folded
    // corpus at the verified threshold — same recall argument as the
    // all-pairs form, restricted to cross pairs
    "ns_minhash_inc_probe" ->
      s"""WITH ${jaccardCtes("documents", pruned = false)},
      prs AS (
        SELECT id_a, id_b,
          round(CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter), 6) AS jaccard_r
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter) >= 0.5)
      SELECT CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS id_new,
        CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS id_old,
        jaccard_r
      FROM prs
      WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)
      ORDER BY id_new, id_old""",

    // connected components by transitive closure (recursive CTE) — an
    // independent implementation of the Spark side's iterative min-label
    // propagation over the same pair graph
    "ns_dedup_clusters" -> clustersOneShotSql,

    // the incrementally-folded component labeling shares the one-shot
    // closure SQL VERBATIM — the hash gate IS the proof that folding
    // the pair graph batch-by-batch (ext.IncrementalClusters) lands on
    // the same labels as contracting all edges at once
    "ns_cc_incremental" -> clustersOneShotSql,
    "ns_cc_retract" -> ccRetractSql,

    // same transitive closure as ns_dedup_clusters, then the keep-
    // longest survivor rule stated as a rank over (n_chars desc, id)
    "ns_dedup_survivors" ->
      s"""WITH RECURSIVE ${jaccardCtes("documents", pruned = true)},
      prs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter) >= 0.12),
      edges AS (SELECT id_a AS a, id_b AS b FROM prs UNION SELECT id_b, id_a FROM prs),
      reach AS (
        SELECT a AS node, b AS r FROM edges
        UNION
        SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a),
      lbl AS (SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node)
      SELECT cluster, survivor, n_chars, n_members FROM (
        SELECT lbl.cluster, d.doc_id AS survivor, d.n_chars,
          count(*) OVER (PARTITION BY lbl.cluster) AS n_members,
          row_number() OVER (PARTITION BY lbl.cluster
                             ORDER BY d.n_chars DESC, d.doc_id) AS rn
        FROM lbl JOIN documents d ON d.doc_id = lbl.node)
      WHERE rn = 1 ORDER BY cluster""",

    "ns_pct_rank" ->
      """SELECT doc_id, lang, n_chars,
        round(percent_rank() OVER (PARTITION BY lang
                                   ORDER BY n_chars, doc_id), 6) AS pr
      FROM documents ORDER BY doc_id""",

    "ns_embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine_r
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 200
        AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) > 0.45
      ORDER BY id_a, id_b""",

    // sign-cell quantizer + within-cell dominance drop: both engines
    // compute the identical cells and the bit-identical double cosine,
    // so the survivor set is exact (the Spark side's maxCell guard
    // never engages at test scales)
    "ns_semdedup" -> semDedupOneShotSql,

    // the incrementally-folded SemDeDup state shares the one-shot SQL
    // VERBATIM — the hash gate IS the convergence proof (the
    // ns_incremental_curation pattern at embedding level)
    "ns_semdedup_incremental" -> semDedupOneShotSql,
    "ns_semdedup_retract" -> semDedupRetractSql,

    // the embedding-side composite nightly: admission face semi-joined
    // through the maintained IVF + PQ tables — hash-matching the
    // one-shot SemDedup SQL proves admission AND that no admitted
    // vector is missing from either ANN artifact (the retract form
    // over the never-retracted corpus)
    "ns_nightly_embed" -> semDedupOneShotSql,
    "ns_nightly_embed_retract" -> semDedupRetractSql,

    "ns_mmr_rerank" -> mmrSql(5),

    "ns_topk_similarity" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, e.vec_id,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS sim
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, vec_id, sim,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM scored)
      SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""",

    // hard negatives: ns_topk_similarity's shape with the wrong-label
    // filter before ranking
    "ns_hard_negatives" ->
      """WITH q AS (
        SELECT vec_id AS query_id, label AS query_label,
               CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, q.query_label, e.vec_id, e.label AS neg_label,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS sim
        FROM embeddings e CROSS JOIN q
        WHERE e.label <> q.query_label),
      ranked AS (
        SELECT query_id, query_label, vec_id, neg_label, sim,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM scored)
      SELECT query_id, query_label, rank, vec_id, neg_label, sim
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",

    "ns_text_tokens" ->
      s"""SELECT token, count(*) AS n FROM (
        SELECT unnest(${wsToks("text")}) AS token FROM documents
      ) GROUP BY token ORDER BY n DESC, token LIMIT 20""",

    "ns_token_stats" ->
      s"""SELECT doc_id,
        CAST(len(${wsToksCased("text")}) AS BIGINT) AS n_tokens,
        CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]')) AS BIGINT) AS n_subwords
      FROM documents ORDER BY doc_id""",

    // power-of-two length buckets via exact bit arithmetic (binary
    // string length of n-1 — never double log2, whose rounding at exact
    // powers is engine-dependent)
    "ns_length_buckets" ->
      s"""WITH t AS (
        SELECT CAST(len(${wsToksCased("text")}) AS BIGINT) AS n FROM documents),
      b AS (
        SELECT n, CASE WHEN n <= 1 THEN 1
          ELSE CAST(1 AS BIGINT) << length(printf('%b', n - 1)) END AS bucket_len
        FROM t)
      SELECT bucket_len, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n) AS BIGINT) AS total_tokens,
        CAST(sum(bucket_len - n) AS BIGINT) AS total_padding,
        CAST((sum(bucket_len - n) * 1000000) // (sum(bucket_len - n) + sum(n)) AS BIGINT) AS waste_ratio
      FROM b GROUP BY bucket_len ORDER BY bucket_len""",

    "ns_text_quality" ->
      s"""WITH $qualityCtes
      SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, avg_word_len,
        stopword_ratio, quality_score
      FROM scored ORDER BY doc_id""",

    "ns_quality_filter" ->
      s"""WITH $qualityCtes,
      thr AS (SELECT quantile_cont(quality_score, 0.5) AS t FROM scored)
      SELECT doc_id, quality_score FROM scored, thr
      WHERE quality_score >= t ORDER BY doc_id""",

    "ns_fingerprint" ->
      s"""SELECT doc_id, CAST(SUM(CAST(pos AS BIGINT) * (ascii(substring(w, 1, 1)) * 131 + length(w))) % 1000003 AS BIGINT) AS fp
      FROM (SELECT doc_id, unnest(${wsToks("text")}) AS w,
                   generate_subscripts(${wsToks("text")}, 1) AS pos
            FROM documents)
      GROUP BY doc_id ORDER BY doc_id""",

    "ns_curation_pipeline" -> curationOneShotSql,

    // the incremental fold's convergence contract: after the last
    // batch, survivors == the from-scratch one-shot curation — so the
    // oracle IS the one-shot SQL, shared verbatim
    "ns_incremental_curation" -> curationOneShotSql,
    "ns_nightly_pipeline" -> nightlyPipelineSql,
    "ns_nightly_retract" -> nightlyRetractSql,

    // retraction (right-to-be-forgotten): fold everything, retract
    // every fifth id from STATE, and the survivors must hash-match the
    // from-scratch curation over the never-retracted corpus — exact
    // promotion, tombstone resurrection, and promoted-suppresses all
    // inside the gate
    "ns_retract_curation" -> retractOneShotSql,
    // the indexed face retracts through the maintained posting/df
    // tables; same retract set, same rebuild-without-X oracle
    "ns_retract_indexed" -> retractOneShotSql,

    // the probe form folds the SAME final batch into a pre-built
    // batch-1 state, so its survivors answer the identical question
    "ns_incremental_probe" -> curationOneShotSql,

    // the indexed probe maintains a stored shingle-posting table and
    // must STILL converge to the one-shot rebuild — stored-index
    // drift from the text-derived shingles would hash-mismatch here
    "ns_incremental_probe_indexed" -> curationOneShotSql,


    // argmax over per-language marker-hit ratios; tie semantics mirror
    // Spark's greatest(struct(score, lang)): highest score, then highest
    // lang string. Scores are small-integer ratios -> bit-exact doubles.
    "ns_lang_id" ->
      s"""WITH w AS (
        SELECT doc_id, lang, ${wsToks("text")} AS words FROM documents),
      scores AS (
        SELECT doc_id, lang, 'en' AS cand,
          CAST(len(list_filter(words, t -> t IN $stopwordsIn)) AS DOUBLE) / len(words) AS score FROM w
        UNION ALL
        SELECT doc_id, lang, 'de',
          CAST(len(list_filter(words, t -> t IN ('der','die','das','und','oder','von','zu','ist','sind','für','auf','mit','als','bei','ein','eine'))) AS DOUBLE) / len(words) FROM w
        UNION ALL
        SELECT doc_id, lang, 'es',
          CAST(len(list_filter(words, t -> t IN ('el','la','los','las','y','o','de','a','en','es','son','para','con','como','por','un','una'))) AS DOUBLE) / len(words) FROM w
        UNION ALL
        SELECT doc_id, lang, 'fr',
          CAST(len(list_filter(words, t -> t IN ('le','la','les','et','ou','de','à','en','est','sont','pour','avec','comme','par','un','une'))) AS DOUBLE) / len(words) FROM w),
      best AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand DESC) AS rn
        FROM scores)
      SELECT doc_id, lang,
        CASE WHEN score > 0 THEN cand ELSE 'und' END AS predicted_lang,
        score AS lang_score
      FROM best WHERE rn = 1 ORDER BY doc_id""",

    "ns_multimodal_join" ->
      """SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label, CAST(len(e.embedding) AS INT) AS dim
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id ORDER BY d.doc_id""")
}
