package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition a production
  * training-data pipeline actually runs, wired from this engine's
  * deterministic stages so the WHOLE chain stays oracle-checkable:
  *
  *  1. exact dedup (keep the lowest id per distinct text) — one
  *     map-side-combining hash aggregate on the text;
  *  2. Gopher quality-rule battery (Rae et al. 2021 App. A1.1) — map-only
  *     signal computation, composite pass flag;
  *  3. benchmark decontamination — broadcast 8-gram semi-join against the
  *     benchmark set, corpus side never shuffled.
  *
  * Each stage is also available (and verified) standalone (q53, q118,
  * q80); this operator binds their composition: stages commute with the
  * keeper choice because dedup keeps a deterministic representative and
  * the later stages are per-document predicates. The probabilistic
  * stages (MinHash/SemDeDup near-dup, model-based quality) intentionally
  * sit OUTSIDE this composition — they carry their own recall/holdout
  * contracts and a pipeline inserts them between 1 and 2.
  *
  * 100 TB posture: one keyed shuffle (dedup) + map-only predicates +
  * one broadcast semi-join; nothing scales beyond the scan except the
  * dedup exchange.
  */
object CleanCorpus {

  /** Surviving (id, n_words) after dedup → quality → decontamination. */
  def clean(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val keepers = Dedup.exactKeepFirst(docs, idCol, textCol)
      .select(col(idCol), col(textCol))
    val quality = QualityRules.gopherStats(keepers, idCol, textCol)
      .filter(col("pass"))
      .select(col(idCol), col("n_words"))
    val surviving = quality.join(keepers, idCol)
    val contaminated = Decontaminate.contaminated(
      surviving, idCol, textCol, bench, benchTextCol, n)
      .select(col(idCol))
    surviving.join(contaminated, Seq(idCol), "left_anti")
      .select(col(idCol), col("n_words"))
  }
}
