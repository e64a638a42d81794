"""CORRECTNESS at 10x scale: the driver gate runs at sf0.01 and the bench
scaling section proves sf1 *speed* — this sweep proves sf1 *answers*.
Every query below runs through Spark AND its DuckDB oracle on the
deterministic 10x weak-scaled fixtures (dp3_spark/scale_gen.py) and must
match rows + schema + values, exactly like the driver gate.

What this catches that sf0.01 cannot:
- plan-strategy flips (broadcast->shuffle joins, AQE re-plans) changing
  results, not just speed;
- the asof AUTO skew guard engaging on real 10x row counts (sliced path
  must be answer-identical to the unsliced one);
- accumulator overflow / precision drift that only shows past fixture
  cardinalities (HLL registers, decimal sums, int64 fingerprint sums);
- streaming drains fragmenting state across more files/batches.

Opt-in (adds ~10 min; scale data is generated on first use):
    DP3_SF1=1 python -m pytest tests/test_oracle_sf1.py -q

Round 6 expanded the sweep from 97 to 113 of 129: the ENTIRE minhash
family (lsh/capped/incremental/clusters/keep_best/pagerank/
decontam_fuzzy/stream_corpus_dedup) runs at 10x now — measured at sf1,
the 0.7-jaccard pair volume is LINEAR in the weak-scaled corpus (5.8k
capped / 6.8k all pairs; perturbed copies do NOT cross-match), so the
oracles are minutes, not the feared quadratic blowup.  The one real
blowup found was EXECUTION, not semantics: DuckDB inlines a CTE
referenced from a recursive CTE's step, so the 2-minute pair
derivation re-ran once per reachability iteration — fixed by AS
MATERIALIZED on the shared pairs/edges CTEs (results unchanged).  The
fixed-geometry LSH/IVF gate rows (sim_lsh_topk/recall,
sim_ivf_topk/recall) were never size-locked — their signatures pin
planes/bands explicitly — and their oracles run in seconds at sf1.

Excluded rows, with reasons (not silent gaps — see COVERAGE.md):
- sim_dup_pairs_lsh: geometry is lsh_geometry(corpus rows) BY DESIGN
  (rows-per-band grows with the corpus), so at 20k vectors the operator
  legitimately computes a different banding than the fixture-geometry
  oracle text — a scale-adaptive answer cannot have one fixed oracle
  string.  The adaptive geometry itself is pinned by unit tests; the
  fixed-geometry LSH surface is sf1-swept via sim_lsh_topk/recall.
- dedup_simhash_pairs: OUTPUT-quadratic at sf1 (measured 191M pairs —
  hamming-3 blocks collide across weak-scaling copies); collecting both
  sides is infeasible and the operator would never be run in 'all
  pairs' form on such a corpus.  Signatures stay swept (dedup_simhash).
- sim_dup_pairs / dedup_ngram_jaccard: documented quadratic oracle
  baselines — running them at 10x is the quadratic trap the capped
  variants exist to avoid.
- mm_* codec rows: byte-level codecs are scale-invariant; 10x of the
  same python kernel proves nothing new.
- mcap_roundtrip_agg: re-encodes the corpus through the python MCAP
  writer — minutes of fixture construction, no new plan surface.
- pack_greedy_bins: first-fit packing is sequential by definition; its
  oracle is a one-row-per-iteration recursive CTE — O(n^2) at 200k.
"""

from __future__ import annotations

import os

import pytest

from test_oracle import compare_query_to_oracle, connect_duck

SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "scale_sf1"
)

pytestmark = pytest.mark.skipif(
    os.environ.get("DP3_SF1") != "1", reason="sf1 sweep is opt-in: DP3_SF1=1"
)

SF1_QUERIES = [
    # QL surface — incl. all four asof rows: at 6M events the AUTO skew
    # guard's engage decision is made on real row counts
    "ql_scan_between", "ql_scan_desc_paged", "ql_merge_playback", "ql_skeleton",
    "ql_where_split", "ql_asof_precedes", "ql_asof_unbounded",
    "ql_asof_immediate", "ql_asof_succeeds", "ql_between_iso8601",
    "ql_where_regex", "ql_where_trigram_pruned",
    # statistics — exact quantiles sort at 10x, HLL bit-exact at 10x
    # cardinality, CMS map columns, counter/gap window chains
    "stat_range_hourly", "stat_quantiles_hourly", "stat_hll_daily",
    "stat_resample_hourly", "stat_resample_lerp", "stat_twa_daily",
    "stat_counter_daily", "stat_gaps", "stat_cms_daily",
    "stat_cms_weekly_rollup", "stat_by_schema", "stat_catalog_tables",
    # ln()-based sketch bins: bit-identity across JVM Math.log and libm
    # was verified on fixture values — sf1's perturbed copies are new
    # values, so this is a live cross-engine float contract at 10x
    "stat_range_by_producer", "stat_rollup_daily", "stat_sketch_daily",
    # events analytics + the two SQL-oracled streaming drains (state
    # fragments across 10x files / more micro-batches)
    "events_sessionize", "events_props_json", "events_funnel",
    "events_retention", "stream_sessionize_gap", "stream_stats_rollup",
    # interval overlap join: the engine runs the grid-bucketed plan, the
    # oracle DuckDB's native IEJoin — live at 10x user-density where the
    # broadcast side flips to shuffle
    "events_interval_overlap",
    # built-in session_window aggregation + exact k-per-group sample
    "events_session_native", "sample_k_per_domain",
    # DSIR importance selection: profiles/scores are n-gram-linear in
    # both engines; micro-quantized weights must stay integer-exact at
    # 10x profile counts
    "dsir_select",
    # ... and the Gumbel-top-k sampling variant: the md5-uniform noise
    # key is value-deterministic, so the drawn set must be identical in
    # both engines at 10x candidate volume
    "dsir_sample",
    # native stream-stream join drain: sf1 is a DIRECTORY of part files,
    # so the file source really batches — the fixture-span watermark
    # determinism claim is live here
    "stream_interval_attrib",
    # text pipeline (fingerprint sums are int64 — overflow check at 10x)
    "text_metrics", "text_gopher_flags", "text_langid", "text_fingerprint",
    "text_vocab_topk", "text_pii_scrub", "text_repetition", "text_lm_score",
    # BPE tokenizer training: the weak-scaled copies preserve the word
    # distribution, so the learned merges must be IDENTICAL at 10x rows
    # (10x pair counts) — any argmax/tie divergence at scale fails the hash
    "bpe_train_merges", "bpe_vocab_topk", "bpe_encode_counts",
    "bpe_encode_tokens",
    # image near-dup: the group count scales with the corpus (dup-group
    # size constant), so pair volume is LINEAR at 10x docs (11.7k ->
    # 117k measured); the oracle blocks candidates by the same pigeonhole
    "mm_image_dedup",
    # StatRange + quantiles served from the persisted summary store:
    # summary-served == raw-derived must hold at 10x summary volume too
    "stat_quantiles_served",
    "stat_range_served",
    # producer-axis serving (round 7): the grouped summary merge must
    # stay hash-equal to raw at 10x producers
    "stat_range_by_producer_served",
    # ingest dedup drain: overlapping re-delivered files == exact distinct
    "stream_ingest_dedup",
    # dedup rows whose oracles are linear-cost in DuckDB
    "dedup_exact", "dedup_paragraphs", "dedup_substring_flags",
    "dedup_simhash",
    # the minhash family at 10x: pair volume measured LINEAR on the
    # weak-scaled corpus (5.8k capped / 6.8k all); shared pairs CTE
    # materialized so the recursive/unrolled consumers stay ~2 min each
    "dedup_minhash_lsh", "dedup_minhash_capped", "dedup_incremental",
    "dedup_clusters", "dedup_keep_best", "graph_pagerank",
    "decontam_fuzzy", "stream_corpus_dedup",
    # SemDeDup: k=8 seeded centroids at any scale; cluster-quadratic
    # screen is the documented cost, tractable at 20k vectors (~30 s)
    "sem_dedup",
    # fixed-geometry ANN gate rows (planes/bands pinned in the signature,
    # never corpus-size-aware): signatures, banding, candidates and
    # millicosine reranks re-derive in seconds at 10x
    "sim_lsh_topk", "sim_lsh_recall", "sim_ivf_topk", "sim_ivf_recall",
    # similarity rows with corpus-size-independent parameters
    "sim_cosine_topk", "sim_knn_classify",
    # PQ compressed-index ANN: seeds are the 16 lowest-id vectors at ANY
    # scale and the oracle's encode/scan CTEs are corpus-linear (N x m*k
    # fold rows), so unlike the banding-geometry-locked LSH/IVF rows the
    # whole PQ pipeline re-derives at 10x; BM25 is posting-linear
    "sim_pq_topk", "sim_pq_recall", "search_bm25", "search_hybrid_rrf",
    # persisted-inverted-index probe (index rebuilt at 10x, cached)
    "search_bm25_indexed",
    # exact-phrase retrieval: positional self-join oracle is
    # posting-linear like BM25
    "search_phrase",
    # relational / TPC-H join trees — ALL 22 shapes: broadcast-vs-shuffle
    # and AQE decisions change at 10x — answers must not
    "tpch_q1_pricing", "tpch_q2_min_cost_supp", "tpch_q3_shipping",
    "tpch_q4_priority", "tpch_q5_region_revenue", "tpch_q6_forecast",
    "tpch_q7_volume", "tpch_q8_market_share", "tpch_q9_profit",
    "tpch_q10_returns", "tpch_q11_important_stock", "tpch_q12_latency",
    "tpch_q13_custdist", "tpch_q14_promo", "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt", "tpch_q17_small_qty", "tpch_q18_large_orders",
    "tpch_q19_disjunctive", "tpch_q20_volume_suppliers",
    "tpch_q21_waiting_supplier", "tpch_q22_idle_balance",
    "window_running_total", "window_moving_avg", "window_top_customers",
    "rel_cube_agg", "rel_correlated_subquery", "rel_distinct_agg",
    "rel_rollup_agg", "rel_semi_anti", "rel_set_except", "rel_set_intersect",
    "rel_pivot_status", "rel_argmax_customer",
    # training-data pipeline compositions + lifecycle versioned reads
    # (pack_greedy_bins excluded: first-fit packing is sequential by
    # definition, so its oracle is a one-row-per-iteration recursive CTE
    # — O(n^2) in DuckDB at 200k docs; the splitting variant
    # pack_sequences covers the packing family here)
    "pack_sequences", "split_train_test", "mix_domains",
    "decontam_check", "curate_corpus", "lifecycle_delete_versions",
    # z-order layout rebuilt at 10x rows; pruned scan == unpruned oracle
    "zorder_pruned_scan",
]


@pytest.fixture(scope="module")
def sf1_dir():
    from dp3_spark import scale_gen

    scale_gen.generate("/root/testdata/sf0.1", SF1_DIR, copies=10)
    return SF1_DIR


@pytest.fixture(scope="module")
def duck_sf1(sf1_dir):
    con = connect_duck(sf1_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", SF1_QUERIES)
def test_sf1_matches_oracle(spark, duck_sf1, sf1_dir, name):
    compare_query_to_oracle(spark, duck_sf1, name, sf1_dir)
