package graft.queries

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline gate queries over the `documents` and
  * `embeddings` tables: deduplication, text analysis, and similarity
  * search. SQL-expressible operators carry DuckDB oracles (double-math
  * formulations so both engines round identically); LSH/MinHash/SimHash
  * approximations are rows-only with exact-recall ScalaTest specs. */
object PipelineQueries {

  private def documents(s: SparkSession, dir: String): DataFrame =
    graft.core.Tables.load(s, dir, "documents")

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    graft.core.Tables.load(s, dir, "embeddings")

  private val stopwords = Seq("the", "a")

  private val langMarkers = Map(
    "en" -> Seq("the", "a", "data"),
    "de" -> Seq("table", "row", "join"),
    "zh" -> Seq("spark", "query", "stream"))

  val defs: Seq[GateQuery] = Seq(

    GateQuery("q50_dedup_exact",
      """SELECT md5(text) AS fp, count(*) AS n_docs, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin) { (s, dir) =>
      Dedup.exactGroups(documents(s, dir), "doc_id", "text").orderBy("fp")
    },

    GateQuery("q51_token_stats",
      """SELECT doc_id,
        |  len(string_split_regex(text, '\s+')) AS n_tokens,
        |  len(list_distinct(string_split_regex(text, '\s+'))) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      documents(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        size(array_distinct(TextAnalysis.tokens(col("text")))).as("n_distinct"))
        .orderBy("doc_id")
    },

    GateQuery("q52_quality_score",
      """SELECT doc_id, round(
        |  0.25 * least(len(string_split_regex(text,'\s+')) / 100.0, 1.0) +
        |  0.25 * (len(list_distinct(string_split_regex(text,'\s+'))) * 1.0
        |          / len(string_split_regex(text,'\s+'))) +
        |  0.25 * (1.0 - len(list_filter(string_split_regex(text,'\s+'),
        |                    x -> x IN ('the','a'))) * 1.0
        |          / len(string_split_regex(text,'\s+'))) +
        |  0.25 * (1.0 - (length(text) -
        |      length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) * 1.0
        |          / length(text)), 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      documents(s, dir).select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text"), stopwords), 6).as("quality"))
        .orderBy("doc_id")
    },

    GateQuery("q53_langid_stopword",
      // argmax(score, lang): ties go to the lexicographically largest lang
      """WITH s AS (SELECT doc_id,
        |  len(list_intersect(list_distinct(string_split_regex(text,'\s+')),
        |      ['the','a','data'])) AS s_en,
        |  len(list_intersect(list_distinct(string_split_regex(text,'\s+')),
        |      ['table','row','join'])) AS s_de,
        |  len(list_intersect(list_distinct(string_split_regex(text,'\s+')),
        |      ['spark','query','stream'])) AS s_zh
        |FROM documents)
        |SELECT doc_id, CASE
        |  WHEN s_zh >= s_en AND s_zh >= s_de THEN 'zh'
        |  WHEN s_en >= s_de THEN 'en'
        |  ELSE 'de' END AS pred_lang
        |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      documents(s, dir).select(col("doc_id"),
        TextAnalysis.stopwordLangId(col("text"), langMarkers).as("pred_lang"))
        .orderBy("doc_id")
    },

    GateQuery("q54_jaccard_pairs",
      // blocking key (lang, source) bounds the quadratic pair set — the
      // standard dedup-blocking tradeoff, exact within each block
      """WITH t AS (SELECT doc_id, lang || '/' || source AS blk,
        |  list_distinct(string_split_regex(text, '\s+')) AS ws FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.ws, b.ws)) * 1.0
        |        / len(list_distinct(list_concat(a.ws, b.ws))), 6) AS jaccard
        |FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.ws, b.ws)) * 1.0
        |      / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val docs = documents(s, dir)
        .withColumn("blk", concat_ws("/", col("lang"), col("source")))
      Dedup.blockedJaccardPairs(docs, "doc_id", "text", "blk", 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b")
    },

    GateQuery("q55_cosine_topk",
      """WITH e AS (SELECT vec_id, embedding,
        |  sqrt((SELECT SUM(x::DOUBLE * x::DOUBLE)
        |        FROM (SELECT unnest(embedding) AS x))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 20),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  (SELECT SUM(x::DOUBLE * y::DOUBLE)
        |   FROM (SELECT unnest(q.embedding) AS x, unnest(c.embedding) AS y))
        |  / (q.nrm * c.nrm) AS cos
        | FROM q, e c WHERE c.vec_id != q.vec_id),
        |r AS (SELECT query_id, neighbor_id, cos, row_number() OVER
        |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cos, rank
        |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = embeddings(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 20), "vec_id", "embedding", 3)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    },

    GateQuery("q56_knn_label",
      """WITH e AS (SELECT vec_id, label, embedding,
        |  sqrt((SELECT SUM(x::DOUBLE * x::DOUBLE)
        |        FROM (SELECT unnest(embedding) AS x))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 50),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
        |  (SELECT SUM(x::DOUBLE * y::DOUBLE)
        |   FROM (SELECT unnest(q.embedding) AS x, unnest(c.embedding) AS y))
        |  / (q.nrm * c.nrm) AS cos
        | FROM q, e c WHERE c.vec_id != q.vec_id),
        |r AS (SELECT query_id, label, row_number() OVER
        |  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM s),
        |v AS (SELECT query_id, label, count(*) AS votes FROM r
        |      WHERE rank <= 5 GROUP BY 1, 2),
        |w AS (SELECT query_id, label, row_number() OVER
        |  (PARTITION BY query_id ORDER BY votes DESC, label) AS vr FROM v)
        |SELECT query_id, label AS knn_label FROM w WHERE vr = 1
        |ORDER BY query_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = embeddings(s, dir)
      val topk = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 50),
        "vec_id", "embedding", 5)
      topk.join(e.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
        .groupBy("query_id", "label").agg(count(lit(1)).as("votes"))
        .withColumn("vr", row_number().over(
          Window.partitionBy("query_id").orderBy(desc("votes"), asc("label"))))
        .filter(col("vr") === 1)
        .select(col("query_id"), col("label").as("knn_label"))
        .orderBy("query_id")
    },

    GateQuery("q57_minhash_lsh",
      // full pipeline re-derived in DuckDB SQL: xxHash64 macro chain (as in
      // q58) over the 2-word shingles AND over the band strings, the 64
      // affine permutations as literal (a, b) pairs (the deterministic
      // java.util.Random stream, like q62's literal profiles) with
      // HUGEINT 2^64 wrap + Java-% mod 2^61-1, band bucketing, and the
      // exact-Jaccard verification — the oracle replicates the BANDING
      // (probabilistic recall and all), not just the threshold
      GateQuery.oracleResource("q57_minhash_lsh.sql")) { (s, dir) =>
      // 16 bands x 4 rows: LSH s-curve threshold ~ (1/16)^(1/4) ~ 0.5 —
      // banding matched to the verify threshold keeps candidate volume
      // near-linear in the true near-dup count
      Dedup.minhashNearDuplicates(documents(s, dir), "doc_id", "text",
        shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.5)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b")
    },

    GateQuery("q58_simhash",
      // full xxHash64 (public spec, seed 42) re-implemented in DuckDB SQL
      // macros (HUGEINT mod-2^64 arithmetic), then the simhash bit votes
      // and an exact all-pairs hamming join — valid as an oracle because
      // the pigeonhole banding is full-recall, so banded == all-pairs
      GateQuery.oracleResource("q58_simhash.sql")) { (s, dir) =>
      // maxHamming 7 -> 8 banding chunks of 8 bits: the widest radius the
      // guaranteed-recall banding supports without the candidate join
      // degenerating (chunk width 64/(h+1); see Dedup scale note)
      Dedup.simhashNearDuplicates(documents(s, dir), "doc_id", "text", maxHamming = 7)
        .orderBy("id_a", "id_b")
    },

    GateQuery("q59_fingerprint_rolling",
      // DuckDB replication of the rolling hash: per-codepoint fold of
      // acc*31+cp with Java 64-bit WRAPPING before the mod 2^61-1 (acc can
      // reach 2^61-2, so acc*31 overflows a signed 64-bit long routinely).
      // HUGEINT does the exact math; the two nested CASEs re-create the
      // two's-complement wrap and Java's dividend-sign % + negative fixup.
      // list_filter drops the '' element DuckDB yields for empty strings
      // (unicode('') = -1 would poison the fold; Spark hashes '' to 0).
      """WITH cleaned AS (
        |  SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS t
        |  FROM documents),
        |folded AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(0::HUGEINT,
        |        list_transform(
        |          list_filter(string_split(t, ''), c -> c <> ''),
        |          c -> unicode(c)::HUGEINT)),
        |      (acc, cp) -> CASE
        |        WHEN ((acc * 31 + cp) % 18446744073709551616::HUGEINT)
        |             >= 9223372036854775808::HUGEINT
        |        THEN CASE
        |          WHEN (((acc * 31 + cp) % 18446744073709551616::HUGEINT)
        |                - 18446744073709551616::HUGEINT) % 2305843009213693951::HUGEINT < 0
        |          THEN ((((acc * 31 + cp) % 18446744073709551616::HUGEINT)
        |                - 18446744073709551616::HUGEINT) % 2305843009213693951::HUGEINT)
        |               + 2305843009213693951::HUGEINT
        |          ELSE (((acc * 31 + cp) % 18446744073709551616::HUGEINT)
        |                - 18446744073709551616::HUGEINT) % 2305843009213693951::HUGEINT
        |          END
        |        ELSE ((acc * 31 + cp) % 18446744073709551616::HUGEINT)
        |             % 2305843009213693951::HUGEINT
        |        END) AS fp
        |  FROM cleaned)
        |SELECT doc_id, fp::BIGINT AS fp FROM folded ORDER BY doc_id""".stripMargin) { (s, dir) =>
      documents(s, dir).select(col("doc_id"),
        TextAnalysis.rollingFingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    GateQuery("q60_lsh_ann",
      // the 48 hyperplanes re-derived in SQL (splitmix finalizer, seed 42,
      // q57-style HUGEINT mod-2^64 macros); signature bits and re-ranked
      // cosines use the engine's exact left-to-right double fold, so the
      // sign thresholds — tolerance-free — agree bit-for-bit
      GateQuery.oracleResource("q60_lsh_ann.sql")) { (s, dir) =>
      val e = embeddings(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 3, dim = 64, bits = 48, bands = 12)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    },

    GateQuery("q61_ivf_ann",
      // full in-SQL re-derivation of the index build: strided init over
      // the id-ordered sample, three unrolled Lloyd iterations with the
      // engine's exact fold/tie semantics, nearest-centroid assignment,
      // probing, and exact cosine re-rank (see the .sql header)
      GateQuery.oracleResource("q61_ivf_ann.sql")) { (s, dir) =>
      val e = embeddings(s, dir)
      val centroids = Similarity.trainCentroids(e, "vec_id", "embedding", nlist = 8, iters = 3)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 3, centroids, nprobe = 3)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("query_id", "rank")
    },

    GateQuery("q63_embedding_neardup",
      // bounded id range keeps the exact quadratic anchor linear-ish in SF;
      // the LSH variant (tested for recall) is the unbounded scale path
      """WITH e AS (SELECT vec_id, embedding,
        |  sqrt((SELECT SUM(x::DOUBLE * x::DOUBLE)
        |        FROM (SELECT unnest(embedding) AS x))) AS nrm
        |  FROM embeddings WHERE vec_id < 1000)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round((SELECT SUM(x::DOUBLE * y::DOUBLE)
        |         FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
        |        / (a.nrm * b.nrm), 6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE (SELECT SUM(x::DOUBLE * y::DOUBLE)
        |       FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
        |      / (a.nrm * b.nrm) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Similarity.exactNearDuplicates(
        embeddings(s, dir).filter(col("vec_id") < 1000), "vec_id", "embedding", 0.45)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("id_a", "id_b")
    },

    GateQuery("q62_ngram_langid",
      // DuckDB replication of train-then-predict: top-20 trigrams per lang
      // by (count desc, gram asc) over the 1000 lowest doc_ids (multiset
      // counts — CharNgramsExpr emits every window, and a string shorter
      // than n yields ONE gram of the whole string, hence greatest(..,1));
      // prediction scores profile-gram PRESENCE in the cleaned text and
      // breaks score ties toward the lexicographically greatest language
      // (array_max on (score, lang) structs = ORDER BY score DESC, lang DESC).
      """WITH cleaned AS (
        |  SELECT doc_id, lang, regexp_replace(lower(text), '\s+', ' ', 'g') AS t
        |  FROM documents),
        |train AS (
        |  SELECT lang, t FROM cleaned ORDER BY doc_id LIMIT 1000),
        |grams AS (
        |  SELECT lang, substring(t, i, 3) AS ng
        |  FROM train, unnest(generate_series(1, greatest(length(t) - 2, 1))) AS u(i)),
        |counted AS (
        |  SELECT lang, ng, count(*) AS cnt FROM grams GROUP BY lang, ng),
        |profiles AS (
        |  SELECT lang, ng FROM (
        |    SELECT lang, ng,
        |      row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, ng ASC) AS rk
        |    FROM counted) WHERE rk <= 20),
        |scores AS (
        |  SELECT c.doc_id, p.lang,
        |    SUM(CASE WHEN position(p.ng IN c.t) > 0 THEN 1 ELSE 0 END) AS score
        |  FROM cleaned c CROSS JOIN profiles p
        |  GROUP BY c.doc_id, p.lang),
        |pred AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rk
        |  FROM scores)
        |SELECT doc_id, lang AS pred_lang FROM pred WHERE rk = 1
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = documents(s, dir)
      // profiles are distribution-level statistics: train on a bounded
      // sample (deterministic: lowest doc_ids), predict over everything
      val profiles = TextAnalysis.trainNgramProfiles(
        docs.orderBy("doc_id").limit(1000), "lang", "text",
        n = 3, profileSize = 20)
      docs.select(col("doc_id"),
        TextAnalysis.ngramLangId(col("text"), profiles).as("pred_lang"))
        .orderBy("doc_id")
    },

    GateQuery("q64_multimodal",
      // the StubCodec fold is deterministic: h = h*31 + byte (64-bit wrap,
      // expressed as a closed-form window prefix sum via 31^{-k} mod 2^64)
      // and float32 bucket accumulation (every step cast to REAL — f32 ops
      // emulated in f64 are correctly rounded, so DuckDB matches the JVM)
      GateQuery.oracleResource("q64_multimodal.sql")) { (s, dir) =>
      // the modality path end to end: documents stand in for a media
      // table (payload = utf-8 bytes; a real pipeline reads binary
      // parquet columns), batched per-partition decode via the marked
      // stub codec, deterministic per-record feature summary
      import s.implicits._
      val media = documents(s, dir)
        .select(
          col("doc_id").as("mediaId"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          encode(col("text"), "UTF-8").as("payload"),
          (length(col("text")) % 640).cast("int").as("width"),
          (length(col("text")) % 480).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          (length(col("text")) * 10).cast("int").as("durationMs"))
        .as[graft.operators.Multimodal.MediaRecord]
      val feats = graft.operators.Multimodal.extractFeatures(
        graft.operators.Multimodal.partitionByKind(media, 8), dim = 16)
      feats.toDF()
        .select(col("mediaId").as("media_id"), col("kind"),
          round(aggregate(col("features").cast("array<double>"), lit(0.0),
            (acc, x) => acc + abs(x)), 4).as("feat_l1"))
        .orderBy("media_id")
    },
  )
}
