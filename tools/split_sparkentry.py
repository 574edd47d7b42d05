#!/usr/bin/env python3
"""One-shot refactor (VERDICT r7 #7): split SparkEntry.scala's two 151-entry
map literals into per-domain registry objects that compose back into the
same maps. Pure re-grouping — entry bodies are moved verbatim, so the
declared slate and every oracle stay byte-identical.

Usage: python3 tools/split_sparkentry.py   (run from /root/repo)
"""
import re, collections

SRC = "src/main/scala/graft/SparkEntry.scala"
OUTDIR = "src/main/scala/graft/queries"

DOMAINS = {
    "QScanJoin": [
        "scan_project", "reindex_columns", "filter_eq", "filter_date_range",
        "distinct_keys", "anti_join_new_keys", "semi_join_active",
        "join_enrich", "left_join_counts", "full_outer_keys", "union_pages",
        "add_literal", "union_by_name", "bloom_join", "salted_join_counts",
        "set_intersect", "set_except", "range_join_pairs",
        "asof_last_purchase", "asof_next_purchase", "merge_upsert",
        "ref_integrity", "star_join_revenue", "json_extract_settings",
        "explode_tokens", "flagship_pipeline"],
    "QAggWindow": [
        "count_per_group", "agg_revenue_by_flag", "topk_orders",
        "window_rank", "window_running_sum", "window_lag_ntile",
        "window_first_last", "user_profile", "window_dist_funcs",
        "stats_by_group", "cube_counts", "percentile_by_group",
        "rollup_revenue", "grouping_sets_revenue", "pivot_daily_events",
        "unpivot_metrics", "heatmap_counts", "props_json_stats",
        "wow_change", "quantile_bins", "zscore_normalize",
        "value_histogram", "mad_by_group", "iqr_outliers",
        "approx_quantiles", "approx_distinct_parts", "sample_hash",
        "per_group_sample", "stratified_sample", "window_percentiles",
        "dist_drift", "skyline_orders", "profile_columns", "zorder_layout"],
    "QTemporal": [
        "max_watermark", "watermark_next_date", "school_year_start",
        "parse_timestamp_tz", "date_format_iso", "gap_fill_daily",
        "tumbling_daily_counts", "sliding_window_counts", "sessionize_gap",
        "event_funnel", "retention_cohorts", "scd2_history", "scd2_lookup",
        "snapshot_diff", "ivm_daily_counts", "ivm_join_counts",
        "sliding_distinct_users", "rolling_user_counts", "event_paths"],
    "QDedup": [
        "dedup_exact", "dedup_embedding", "dedup_semantic", "dedup_jaccard",
        "dedup_near", "minhash_estimate", "incremental_near_dup",
        "incremental_dedup", "dedup_simhash", "doc_winnow",
        "dedup_clusters", "dedup_quality_survivor", "simhash_pairs",
        "simhash_dropped_buckets", "near_dup_eval", "chunk_dedup",
        "source_overlap", "ngram_dup_rate", "dup_span_stats"],
    "QVector": [
        "similarity_topk", "knn_classify", "hard_negatives",
        "knn_classify_ann", "hard_negatives_ann", "similarity_ivf",
        "similarity_ann", "embedding_quantize", "kmeans_assign",
        "embedding_outliers", "pagerank_topk", "fuzzy_pairs"],
    "QTextCuration": [
        "text_stats", "quality_score", "lang_id", "lang_profile",
        "bm25_topk", "pmi_pairs", "tfidf_top_terms", "cms_term_counts",
        "contamination_check", "contamination_bloom", "chunk_contamination",
        "chunk_windows", "bpe_pair_counts", "bpe_apply", "bpe_learn",
        "heavy_hitters", "mixture_apply", "mixture_plan",
        "mixture_plan_temp", "unicode_nfc", "text_normalize",
        "repetition_score", "pii_scrub", "pack_sequences",
        "curation_pipeline", "export_manifest", "vocab_coverage",
        "filter_funnel", "fertility_by_lang", "token_len_histogram",
        "lm_score", "perplexity_buckets", "dataset_split", "split_balance",
        "split_leakage"],
    "QMultimodal": [
        "multimodal_join", "multimodal_features", "image_meta_decode",
        "audio_meta_decode", "video_meta_decode", "image_meta_filter"],
}

HEADER = """package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorOps
import graft.ops.{Ingest, LlmOps, Relational, Temporal}
import graft.pipeline.ZoomJobs
import graft.QShared._
"""

ENTRY_RE = re.compile(r'^    "([a-z0-9_]+)" ->')


def extract_entries(lines):
    """lines: the interior of a Map( ... ) literal. Returns ordered
    {key: [lines]} where each entry carries its preceding comment block."""
    headers = [i for i, l in enumerate(lines) if ENTRY_RE.match(l)]
    entries = collections.OrderedDict()
    for n, h in enumerate(headers):
        end = headers[n + 1] if n + 1 < len(headers) else len(lines)
        # attach comment/blank lines directly above the header
        start = h
        while start > 0 and (lines[start - 1].strip().startswith("//")
                             or not lines[start - 1].strip()):
            start -= 1
            if start <= (headers[n - 1] if n else -1):
                break
        block = lines[start:end]
        # strip leading/trailing blank lines; re-add a uniform separator later
        while block and not block[0].strip():
            block.pop(0)
        while block and not block[-1].strip():
            block.pop()
        # every entry ends with a trailing comma (Scala 2.13 allows it
        # before a newline-closing paren)
        if not block[-1].rstrip().endswith(","):
            block[-1] = block[-1].rstrip() + ","
        key = ENTRY_RE.match(lines[h]).group(1)
        entries[key] = block
    return entries


def main():
    text = open(SRC).read().splitlines()
    # locate the three sections
    q_open = next(i for i, l in enumerate(text)
                  if l.startswith("  def queries"))
    o_open = next(i for i, l in enumerate(text)
                  if l.startswith("  def oracleSql"))

    def map_close(start):
        for i in range(start + 1, len(text)):
            if text[i].rstrip() == "  )":
                return i
        raise AssertionError("no close")

    q_close = map_close(q_open)
    o_close = map_close(o_open)
    queries = extract_entries(text[q_open + 1:q_close])
    oracles = extract_entries(text[o_open + 1:o_close])

    all_assigned = [k for ks in DOMAINS.values() for k in ks]
    assert len(all_assigned) == len(set(all_assigned)), "dup assignment"
    missing = set(queries) - set(all_assigned)
    extra = set(all_assigned) - set(queries)
    assert not missing, f"unassigned queries: {sorted(missing)}"
    assert not extra, f"assigned but undeclared: {sorted(extra)}"

    import os
    os.makedirs(OUTDIR, exist_ok=True)
    for obj, keys in DOMAINS.items():
        out = [HEADER]
        out.append(f"/** {obj[1:]} slice of the declared query slate — split "
                   "from the former 4.3k-line")
        out.append("  * SparkEntry.scala (VERDICT r7 #7); bodies moved "
                   "verbatim, composition in")
        out.append("  * [[SparkEntry]] keeps the driver contract identical. */")
        out.append(f"private[graft] object {obj} {{")
        out.append("")
        out.append("  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(")
        out.append("")
        for k in keys:
            out.extend(queries[k])
            out.append("")
        out.append("  )")
        out.append("")
        out.append("  val oracle: Map[String, String] = Map(")
        out.append("")
        for k in keys:
            if k in oracles:
                out.extend(oracles[k])
                out.append("")
        out.append("  )")
        out.append("}")
        with open(f"{OUTDIR}/{obj}.scala", "w") as f:
            f.write("\n".join(out) + "\n")
        print(f"wrote {OUTDIR}/{obj}.scala "
              f"({len(keys)} queries, {sum(1 for k in keys if k in oracles)} oracles)")

    orphan_oracles = set(oracles) - set(queries)
    assert not orphan_oracles, f"oracle without query: {orphan_oracles}"

    # rewrite SparkEntry.scala: keep prelude (entry + helpers move to QShared),
    # compose the domain maps.
    helpers_start = next(i for i, l in enumerate(text)
                         if l.startswith("  private def t("))
    prelude = text[:helpers_start]           # imports + scaladoc + object line + entry? no — entry comes after t
    # Actually: t is first helper (line ~24), entry at ~28, synth helpers after.
    # We move ALL private helpers to QShared and keep entry in SparkEntry.
    # Simplest rewrite: emit a fresh SparkEntry.scala.
    compose_q = " ++\n    ".join(f"{obj}.queries" for obj in DOMAINS)
    compose_o = " ++\n    ".join(f"{obj}.oracle" for obj in DOMAINS)
    doc_q = "\n".join(text[next(i for i in range(q_open, 0, -1)
                                if text[i].strip().startswith("/**")):q_open])
    entry_new = f"""package graft

import org.apache.spark.sql.{{DataFrame, SparkSession}}

import graft.pipeline.ZoomJobs

{chr(10).join(text[11:21])}
object SparkEntry {{

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ZoomJobs.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator (SURVEY.md §2) — composed from the
    * per-domain registries under graft/queries/ (split per VERDICT r7 #7;
    * same keys, same bodies, same driver contract).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    {compose_q}

{chr(10).join(text[next(i for i in range(o_open, 0, -1) if text[i].strip().startswith("/**")):o_open])}
  val oracleSql: Map[String, String] =
    {compose_o}
}}
"""
    with open(SRC, "w") as f:
        f.write(entry_new)
    print(f"rewrote {SRC}")

    # QShared: the helper defs (t, synthImages, leHex, synthAudio,
    # synthVideo, curationSurvivors) verbatim, package-private.
    helpers_end = next(i for i, l in enumerate(text)
                       if l.startswith("  def queries"))
    helper_lines = text[helpers_start:helpers_end]
    # drop the entry() def (kept in SparkEntry)
    out_h = [HEADER.replace("import graft.QShared._\n", "")]
    out_h.append("/** Shared fixtures/helpers for the per-domain query "
                 "registries (split from")
    out_h.append("  * SparkEntry.scala — bodies verbatim). */")
    out_h.append("private[graft] object QShared {")
    skip = False
    for l in helper_lines:
        if l.startswith("  /** Flagship query"):
            skip = True
        if skip:
            if l.startswith("  def entry"):
                continue
            if l.strip().startswith("ZoomJobs.flagship"):
                skip = False
                continue
            if skip and (l.strip().startswith("*") or l.strip().startswith("/**")
                         or not l.strip()):
                continue
        out_h.append(l.replace("  private def ", "  private[graft] def ", 1))
    out_h.append("}")
    with open(f"{OUTDIR}/QShared.scala", "w") as f:
        f.write("\n".join(out_h) + "\n")
    print(f"wrote {OUTDIR}/QShared.scala")


if __name__ == "__main__":
    main()
