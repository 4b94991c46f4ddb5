"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (noop sink — full computation, no
serialization/collect cost) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q17_avg_quantity_filter",
    "q6_forecast_revenue",
    "q9_product_type_profit",
    "q21_waiting_suppliers",
    "star_fact_rollup",
    "j2_multikey_join",
    "r1_unpivot",
    "r2_pivot_roundtrip",
    "a2_keep_last",
    "w1_lag_diff",
    "j5_upsert_merge",
    "ev_window_agg",
    # LLM-pipeline operators (scale paths only — d2's exact inverted-index
    # join is the sf0.01 oracle twin, not a 100 TB path)
    "d1_exact_dedup",
    "d3_minhash_candidates",
    "d4_simhash",
    "t1_token_stats",
    "t2_quality_score",
    "t3_language_id",
    "t4_fingerprint",
    "e1_cosine_topk",
    "e2_ann_lsh",
    "ev_sessionize",
    "a10_distinct_agg",
    "u2_grouped_ema",
    "q13_customer_distribution",
    "tj1_asof_join",
    "tj2_range_join",
    "rl1_time_rollup",
    "e4_ivf_topk",
    # round-2 heavyweights (added r3 so future rounds get deltas; the
    # original 32-query set above is unchanged for 1:1 r02 comparison)
    "e7_kmeans",
    "sd1_semantic_dedup",
    "cl1_cluster_stats",
    "w7_mad_outliers",
    "ix1_global_index",
    "dq1_profile",
    # round-3 batch-2 operators
    "nv1_ngram_novelty",
    "ga1_activity_islands",
    "mk1_event_transitions",
    "zo1_zorder_key",
    "cp1_compaction_plan",
    "x1_chi2_keywords",
    "e8_sq_topk",
    "dc1_dataset_card",
    "tp3_repair_pipeline",
    "tr1_triangles",
    "dq2_profile_approx",
    # round-3b curation/retrieval operators
    "qsel1_classifier_topfrac",
    "cx2_split_leakage",
    "rrf1_rank_fusion",
    "un1_unicode_normalize",
    "d10_incremental_dedup",
    "tp4_release_pipeline",
    "rfm1_customer_segments",
    # round-4 operators (appended — earlier subsets stay 1:1 comparable)
    "er1_entity_resolution",
    "kc1_kcore",
    "pa1_top_paths",
    "bfs1_copurchase_hops",
    "bf1_bloom_decontamination",
    "ss1_repeated_substrings",
    # pj1_prefix_jaccard LEFT the headline in round 12 (composition
    # policy, COVERAGE.md): its capped production twin pj1c carries the
    # PPJoin cost signal here; the exact form still runs 4x per close in
    # the sweeps and its idle cost is pinned in SCALING.md (round-12
    # retime: warm median 21.6s with a +-10s contention envelope - 12%
    # of headline wall and the single largest noise source).
    "sj1_stream_stream_join",
    "ss2_span_repair",
    "tp5_decontaminated_release",
    # round-4 continuation (appended — earlier subsets stay 1:1 comparable)
    "ap1_average_precision",
    "js1_source_divergence",
    "en1_char_entropy",
    "zipf1_token_zipf",
    # round-4 third continuation (appended)
    "ndcg1_retrieval_ndcg",
    "mrr1_reciprocal_rank",
    "tcl1_t_closeness",
    "acf1_autocorrelation",
    "hp1_heaps_law",
    "sv1_survival_hazard",
    # round-6 additions (appended)
    "e11_pq_portable",
    # round-8 additions (appended)
    "bpe1_bpe_merges",
    "bpe2_bpe_fertility",
    "sdd1_streaming_dedup",
    # round-9 additions (appended)
    "wp1_wordpiece_merges",
    "kcs1_kcenter_coreset",
    "ssw1_streaming_sessions",
    "rag1_context_assembly",
    "uni1_unigram_segments",
    # round-10 additions (appended): uniT = the unigram EM trainer;
    # pj1c = pj1's per_token_cap=8 production form, so the headline's
    # largest single cost tracks the plan you'd run at 100 TB
    # (SCALING.md's 100× adjudication) — exact pj1 stays for the
    # round-over-round comparison and as the oracle twin
    "uniT_unigram_em",
    "pj1c_prefix_jaccard_capped",
    "uni2_unigram_fertility",
    "jl1_random_projection",
    "kn1_kneser_ney",
    "iso1_isotonic_calibration",
    # round-10 late additions (appended)
    "bs1_brier_calibration",
    "ct1_rank_langid",
    "pt1_prototype_prune",
    "prf1_rm3_expansion",
    "mmr1_diversified_topk",
    "wf1_winnow_matches",
    "ari1_cluster_agreement",
    "fk1_annotator_agreement",
    "mwu1_rank_sum",
    # round-11 additions (appended): ct1p = ct1 on a 400-normalized-char
    # prefix — the production langid plan (profiles saturate at a few
    # hundred chars), so the headline's top single cost tracks what
    # you'd run at 100 TB; exact ct1 stays for the round-over-round
    # comparison and as the full-document oracle twin
    "ct1p_rank_langid_prefix",
    # uniT2 = multi-round EM with a [48, 32] prune schedule — the
    # full Kudo recipe's cost shape (3 bounded-sample passes, still
    # scale-flat; uniT's single round stays for comparison)
    "uniT2_unigram_em_pruned",
    # round-11 batch 2: Good-Turing unseen mass, Davies-Bouldin
    # internal validity, Spearman rank correlation, CUSUM changepoint,
    # split-conformal coverage — all histogram-/domain-sized after one
    # corpus (or day-rollup) pass
    "gt1_good_turing",
    "db1_davies_bouldin",
    "sr1_spearman_quality_length",
    "cusum1_event_changepoint",
    "cf1_conformal_coverage",
    # round-11 batch 3: distribution-shift completions over the shared
    # score histogram (W1 integral, Q-Q deciles) + variance explained
    # by source
    "ot1_wasserstein_quality",
    "qq1_quality_deciles",
    "eta1_quality_by_source",
    # scs1: the streaming-maintained daily histogram + the same CUSUM
    # monitor — fixed state-store/checkpoint cost like sdd1/ssw1
    "scs1_streaming_cusum",
    # round-12 additions (appended)
    # sps1: the streaming-maintained daily VALUE histogram + dr1's PSI
    # algebra — completes the drift suite's streaming story
    "sps1_streaming_psi",
    # trend tests over the day-domain (pair joins never touch the
    # corpus), association suite completions (contingency-/confusion-
    # sized algebra after one corpus scan each)
    "mk2_mann_kendall",
    "ts2_theil_sen",
    "kp1_cohens_kappa",
    "crv1_cramers_v",
    "kt1_kendall_tau",
    # cld1: Cliff's delta effect size off the shared score histogram
    "cld1_cliffs_delta",
    # dlg1: DeLong SE for auc1's exact AUC — same shared histogram
    "dlg1_auc_delong_se",
    # rbo1: ranker-agreement audit over rrf1's two rankers (k2-sized tail)
    "rbo1_rank_overlap",
    # round-13 additions (appended)
    # x13: the 13-gram decontamination gate — one checkpointed shingle
    # explode + a gram semi join (class C bounded-candidate; a real
    # benchmark side broadcasts)
    "x13_ngram_decontamination",
    # d14: quality-aware canonical dedup — d1's single fingerprint
    # shuffle with a window instead of a groupBy
    "d14_quality_canonical",
    # corpus-linear single-scan statistics (class B): contingency-/
    # confusion-/moment-sized algebra after one pass
    "kwh1_kruskal_wallis",
    "mcc1_matthews_corr",
    "ca1_cochran_armitage",
    "ccc1_lins_concordance",
    # lb1: acf1's bounded day-grid shape (class A-fixed after the day
    # rollup)
    "lb1_ljung_box",
    # round-13 second batch: McNemar / ANOVA / Welch / Jonckheere are
    # one-scan class-B contingency/moment algebra; dw1/rns1 are day-
    # domain shapes off the shared daily rollup
    "mcn1_mcnemar_gates",
    "aov1_anova_f",
    "wel1_welch_t",
    "jt1_jonckheere",
    "dw1_durbin_watson",
    "rns1_runs_test",
    # round-13 third batch: lev1 is histogram-domain work after one
    # rollup; wsr1/fr1 are day-domain shapes off one rollup each
    "lev1_brown_forsythe",
    "wsr1_weekly_shift",
    "fr1_friedman_daytype",
]


def _cpu_jiffies() -> dict[str, int]:
    """First ``cpu`` line of /proc/stat → {user, nice, system, idle,
    iowait, irq, softirq, steal, ...}. ``steal`` is the hypervisor
    run-queue time this guest was denied — the co-tenant contention
    signal that adjudicates round-over-round bench noise (VERDICT r09:
    the r08↔r09 delta was traced to ~5e5 steal jiffies, but only via an
    out-of-band reading; this makes the artifact self-contained)."""
    fields = ["user", "nice", "system", "idle", "iowait", "irq",
              "softirq", "steal", "guest", "guest_nice"]
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
    except (OSError, ValueError):
        return {}
    # a truncated cpu line (old kernel / container) must degrade to the
    # same {} the except path returns — a partial dict without 'steal'
    # would pass the caller's truthiness guard and KeyError at payload
    # assembly AFTER all queries ran
    if len(vals) < 8:
        return {}
    return dict(zip(fields, vals))


def main() -> None:
    import __spark_entry__ as entry_mod
    from etl_oms_spark.session import get_spark

    # sample BEFORE Spark spins up: the end-of-run loadavg_1m always
    # reads ~10+ because it includes this bench's own local[32] burn —
    # co-tenant contention is only visible in the start sample
    loadavg_start = round(os.getloadavg()[0], 2)
    jiffies_start = _cpu_jiffies()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm the JVM/session once so q1 doesn't pay session startup
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # 1 cold + 3 warm runs per query; report the MEDIAN of the warm runs.
    # The cold run pays one-time whole-stage-codegen/JIT compilation
    # (amortized over the data at real scale) and is totalled separately;
    # the median — not min — is robust against co-tenant host noise in
    # BOTH directions, so round-over-round bench diffs reflect plan
    # changes, not load spikes (r3 verdict: single-shot timings produced
    # 10 phantom sub-second regressions under loadavg ~9).
    timings: dict[str, float] = {}
    cold_total = 0.0
    total = 0.0
    import gc

    for name in names:
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        cold_total += runs[0]
        dt = round(sorted(runs[1:])[1], 3)  # median of the 3 warm runs
        timings[name] = dt
        total += dt
        # drop dead DataFrame/RDD references (localCheckpoint blocks from
        # checkpointed plans like tp3) so the ContextCleaner can unpersist
        # them — otherwise later queries in a 50+-query session inherit
        # their GC pressure and drift upward
        gc.collect()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "cold_total_sec": round(cold_total, 3),
        # host contention context for the reader of round-over-round
        # diffs (the numbers move with co-tenant load, the plans don't);
        # _start is pre-Spark (true co-tenant load), the unsuffixed one
        # is end-of-run (includes this bench's own 32 threads)
        "loadavg_start_1m": loadavg_start,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # steal-aware noise evidence (VERDICT r09 item 4): whole-run deltas
    # of the aggregate /proc/stat counters. steal_jiffies_delta >> 0
    # means a hypervisor co-tenant was eating this guest's run queue —
    # read per-query regressions as noise unless plans changed too.
    jiffies_end = _cpu_jiffies()
    if jiffies_start and jiffies_end:
        payload["steal_jiffies_delta"] = (
            jiffies_end["steal"] - jiffies_start["steal"]
        )
        payload["busy_jiffies_delta"] = sum(
            jiffies_end[k] - jiffies_start[k]
            for k in ("user", "nice", "system", "irq", "softirq")
        )
        # canonical 8 fields only: guest/guest_nice are already counted
        # inside user/nice, and double-counting them would understate
        # the steal fraction this field exists to expose
        payload["total_jiffies_delta"] = sum(
            jiffies_end[k] - jiffies_start[k]
            for k in ("user", "nice", "system", "idle", "iowait",
                      "irq", "softirq", "steal")
            if k in jiffies_end and k in jiffies_start
        )
    # Full per-query JSON goes to a file: the driver captures only the
    # LAST ~2000 chars of stdout, and the 70-query line outgrew it in
    # r04/r05 ("parsed": null). The printed line keeps the contract
    # shape but includes only as many of the slowest queries as fit the
    # capture window; the full-dict file always holds the complete dict.
    #
    # Output-path provenance (VERDICT r12 item 2): the committed idle
    # record is bench_full.json, written ONLY when the run explicitly
    # claims idle provenance via SPARK_GRAFT_BENCH_OUT=bench_full.json
    # (the round-close procedure, which also records loadavg/steal).
    # Any other invocation — in particular the driver's post-close
    # contended run — defaults to bench_full.latest.json, so the
    # committed idle artifact at HEAD is never shadowed again (it was,
    # three rounds running: r10-r12).
    out_name = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", "bench_full.latest.json"
    )
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), out_name
    )
    with open(full_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)

    slowest = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    line = ""
    for k in range(len(slowest), -1, -1):
        compact = dict(payload)
        compact["queries"] = dict(sorted(slowest[:k]))
        compact["queries_omitted"] = len(timings) - k
        compact["queries_full"] = out_name
        line = json.dumps(compact, separators=(",", ":"))
        if len(line) <= 1800:
            break
    print(line)


if __name__ == "__main__":
    main()
