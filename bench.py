#!/usr/bin/env python
"""Bench harness (driver contract): runs the headline pipelines and prints
ONE JSON line. `--scaling` runs the headline job at num_cpus=8 and 32 in
fresh processes and reports throughput at both + scaling efficiency
(the sandbox evidence for the N vs 4N cluster criterion, BASELINE.md §2).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).
This script OWNS its Ray session (init/shutdown) — library code never does.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("BSPP_BENCH_CONVS", "12000"))
# --scaling needs a compute-dominated run: the N -> 4N criterion models a
# fixed-size multi-node cluster streaming ~100 TB, where per-worker
# compute dwarfs per-job fixed costs (exchange barrier, write commit,
# pool spin-up). A corpus that is too small measures those fixed costs,
# not scaling. 400k conversations ≈ 5M turns ≈ 1.5 GB keeps the 8-CPU
# leg extraction-bound the way a real per-node data slice would be;
# BASELINE.md §3 reports the smaller 160k corpus alongside for
# continuity with round 1.
SCALING_CONVS = int(os.environ.get("BSPP_SCALING_CONVS", "400000"))
# ambient load on the shared sandbox swings single-run walls by ±25%
# (measured 29.4-48.5 s for identical 32-CPU runs); each scaling level
# takes best-of-N so the ratio reflects the pipeline, not the noise
SCALING_REPS = int(os.environ.get("BSPP_SCALING_REPS", "2"))
BENCH_SEED = 42
BENCH_MEGA = 2000


def _corpus_path() -> str:
    """Seeded bench transcript corpus, generated DISTRIBUTED once and
    cached on disk (identical across runs/CPU levels: per-conversation
    determinism, sources/corpus.py)."""
    import ray

    path = f"/tmp/bspp_bench_corpus_{BENCH_CONVS}_{BENCH_SEED}"
    if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
        return path
    import pyarrow as pa

    import ray.data

    from bank_statement_pdf_parser_ray.schema import INPUT_SCHEMA
    from bank_statement_pdf_parser_ray.sources.corpus import gen_conversation

    def gen(batch) -> "pa.Table":
        rows = []
        for i in batch["id"]:
            rows.extend(gen_conversation(BENCH_SEED, int(i), BENCH_MEGA if int(i) == 0 else 0))
        cols = {name: [r[name] for r in rows] for name in INPUT_SCHEMA.names}
        return pa.Table.from_pydict(cols, schema=INPUT_SCHEMA)

    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ray.data.range(BENCH_CONVS).map_batches(gen, batch_size=64).write_parquet(tmp)
    os.replace(tmp, path)
    return path


def _oracle_pass_rate(corpus: str, out_dir: str, part: int, cap: int) -> float:
    """Per-turn text-equality rate of one written part vs the sequential
    oracle (bank_statement_pdf_parser_ray.oracle) on the same turns."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from bank_statement_pdf_parser_ray.oracle import oracle_extract

    part_dir = os.path.join(out_dir, f"part={part}")
    if not os.path.isdir(part_dir):
        # tiny corpora may leave the requested part empty — verify any
        # part that was actually written rather than crashing the bench
        candidates = sorted(d for d in os.listdir(out_dir) if d.startswith("part="))
        if not candidates:
            return 1.0
        part_dir = os.path.join(out_dir, candidates[0])
    got = (
        pads.dataset(part_dir, format="parquet")
        .to_table(columns=["conv_id", "turn_idx", "extracted_text"])
        .slice(0, cap)
    )
    convs = pc.unique(got.column("conv_id"))
    inp = pads.dataset(corpus, format="parquet").to_table(
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        filter=pc.field("conv_id").isin(convs),
    )
    exp = oracle_extract(inp).select(["conv_id", "turn_idx", "extracted_text"])
    exp_lut = {
        (c, i): t
        for c, i, t in zip(
            exp.column("conv_id").to_pylist(),
            exp.column("turn_idx").to_pylist(),
            exp.column("extracted_text").to_pylist(),
        )
    }
    ok = sum(
        1
        for c, i, t in zip(
            got.column("conv_id").to_pylist(),
            got.column("turn_idx").to_pylist(),
            got.column("extracted_text").to_pylist(),
        )
        if exp_lut.get((c, i)) == t
    )
    return ok / max(1, got.num_rows)


def run_bench() -> dict:
    import ray

    # BSPP_OBJECT_STORE_BYTES pins a deliberately small object store for
    # the spill-pressure experiment (SCALE.md §10): the streaming
    # executor must degrade to disk spilling, not fail or corrupt.
    store = os.environ.get("BSPP_OBJECT_STORE_BYTES")
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        **({"object_store_memory": int(store)} if store else {}),
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    try:
        # prompt actor-pool ramp (default 2.0 leaves the extraction pool
        # under-grown on compute-dominated jobs; see flagship.py)
        ctx.autoscaling_config.actor_pool_util_upscaling_threshold = 1.0
    except Exception:
        pass

    from bank_statement_pdf_parser_ray.pipelines.flagship import run_flagship

    corpus = _corpus_path()

    # warm the page cache so we measure compute+shuffle, not first disk read
    import pyarrow.dataset as pads

    pads.dataset(corpus).to_table()

    out_dir = f"/tmp/bspp_bench_out_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    # n_parts pinned (NOT derived from NUM_CPUS) so the two --scaling
    # levels run the identical job configuration
    summary = run_flagship(corpus, out_dir, salt_chunk=512, n_parts=64)
    headline_sec = time.perf_counter() - t0
    turns = summary["rows_written"]
    # the headline metric is "turns/sec WITH per-turn text-equality pass
    # rate = 100%" (BASELINE.json): sample-verify one whole output part
    # against the sequential oracle, outside the timed window
    pass_rate = _oracle_pass_rate(corpus, out_dir, part=0, cap=20_000)
    shutil.rmtree(out_dir, ignore_errors=True)

    if os.environ.get("BSPP_SCALING_HEADLINE_ONLY"):
        ray.shutdown()
        return {
            "metric": "flagship_extract_sec",
            "value": round(headline_sec, 3),
            "unit": "sec",
            "turns": turns,
            "turns_per_sec": round(turns / headline_sec, 1),
            "oracle_pass_rate": pass_rate,
            # phase split for the scaling residual analysis (BASELINE.md §3)
            "write_sec": summary.get("write_sec"),
            "commit_sec": summary.get("commit_sec"),
            "queries": {},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
        }

    # per-query timings over the shared sf tables
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entry_mod

    qfns = entry_mod.queries()
    bench_queries = [
        "extract_documents",
        "lineitem_agg",
        "filter_highvalue",
        "topk_users",
        "events_windowed",
        "events_ordered",
        "events_sessionized",
        "broadcast_join",
        "hash_join_revenue",
        "q5_region_revenue",
        "part_brand_revenue",
        "anti_join_customers",
        "semi_join_customers",
        "left_join_big_orders",
        "merge_upsert",
        "table_diff",
        "full_outer_user_activity",
        "asof_join_events",
        "events_hopping",
        "cross_join_sweep",
        "pagerank_nations",
        "triangle_count",
        "nation_hops",
        "events_rolling",
        "events_lag_lead",
        "events_cumsum",
        "events_ewma",
        "events_ohlc",
        "funnel_windowed",
        "grouped_topk_events",
        "user_value_quantiles",
        "range_join_counts",
        "interval_join_events",
        "late_events",
        "events_centered_mean",
        "top_paths",
        "events_ranked",
        "events_percent_rank",
        "user_event_paths",
        "events_pivot",
        "events_stats",
        "lineitem_corr",
        "value_histogram",
        "approx_quantiles_events",
        "union_event_slices",
        "union_distinct_users",
        "intersect_users",
        "except_users",
        "rollup_orders",
        "cube_orders",
        "stratified_sample",
        "prep_corpus",
        "approx_distinct_users",
        "approx_distinct_per_type",
        "json_props_sum",
        "normalize_ws",
        "token_count",
        "quality_score",
        "vocab_topk",
        "tfidf_topterms",
        "unigram_logprob",
        "corpus_clean",
        "pii_scrub",
        "repetition_ratio",
        "hash_split",
        "decontaminate",
        "passage_dedup",
        "extract_links",
        "host_stats",
        "gopher_quality",
        "c4_filters",
        "bm25_search",
        "source_cap",
        "chunk_documents",
        "build_index",
        "key_skew_profile",
        "dq_checks",
        "outlier_filter",
        "latest_events",
        "user_value_median",
        "null_funcs",
        "collocations",
        "session_stats",
        "user_top_event",
        "user_first_last",
        "mixture_sample",
        "pack_sequences",
        "langid",
        "exact_dedup",
        "ingest_dedup",
        "minhash_candidates",
        "minhash_verified",
        "neardup_clean",
        "simhash",
        "knn_cosine",
        "knn_cosine_filtered",
        "knn_cosine_ivf",
        "knn_cosine_ivf_indexed",
        "knn_cosine_pq",
        "ann_recall",
        "minhash_eval",
        "embedding_neardup_lsh",
        "kmeans_embeddings",
        "semantic_dedup",
        "cluster_sample",
        "string_funcs",
        "user_funnel",
        "bloom_join_revenue",
        "heavy_hitters",
        "count_min_freq",
        "date_funcs",
        "unpivot_lineitem",
        "char_entropy",
        "weighted_sample",
        "incremental_agg",
        "global_rank",
        "profile_events",
        "events_resampled",
        "budget_select",
        "vector_funcs",
        "value_quartiles",
        "explode_embedding",
        "embedding_dim_stats",
        "label_centroids",
        "orders_above_cust_avg",
        "bigram_logprob",
        "distinct_users_per_type",
        "events_by_month",
        "media_features",
        "audio_features",
        "video_frames",
        "dup_char_windows",
        "exact_substr_dedup",
        "epoch_plan",
        "shuffle_rank",
        "event_transitions",
        "cohort_retention",
        "dsir_resample",
        "standardize_events",
        "target_encode_events",
        "winsorize_events",
        "value_drift_psi",
        "type_drift_chi2",
        "robust_zscore",
        "ab_welch_ttest",
        "skyline_orders",
        "user_value_trend",
        "user_coverage",
        "time_decay_agg",
        "events_gap_dedup",
        "user_scd2",
        "fuzzy_pairs",
        "image_neardup",
        "q3_shipping",
        "compression_ratio",
        "zorder_benefit",
        "compact_files",
        "leakage_safe_split",
        "hybrid_search",
        "ngram_jaccard_pairs",
        "semantic_decontaminate",
        "hard_negatives",
        "warc_ingest",
        "bucketed_join_revenue",
        "extract_links",
        "host_stats",
        "approx_distinct_users_checked",
        "ingest_dedup",
        "user_first_last",
        "session_stats",
        # round-5 additions
        "heavy_hitters_checked",
        "count_min_freq_checked",
        "approx_quantiles_events_checked",
        "pack_sequences_checked",
        "wave_ingest",
        "media_probe",
    ]
    qtimes = {}
    for name in bench_queries:
        t0 = time.perf_counter()
        res = qfns[name](SF_DIR)
        if hasattr(res, "materialize"):
            res = res.materialize()
            res.count()
        qtimes[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "flagship_extract_sec",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "turns": turns,
        "turns_per_sec": round(turns / headline_sec, 1),
        "oracle_pass_rate": pass_rate,
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i
    return x


def effective_cores(procs: int, n: int = 8_000_000) -> float:
    """Achievable parallel speedup at `procs`-way parallelism on THIS
    box right now, via a pure-CPU integer loop (no I/O, no Ray): the
    hardware ceiling any pipeline measurement is bounded by. The
    sandbox advertises 32 schedulable vCPUs (lscpu: 1 thread/core) but
    they share drifting HOST capacity — measured effective cores at
    32-way have ranged ~15-21 across a single day, which moves whole-job walls 2x with no
    code change (BASELINE.md §3)."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    _burn(n)
    t1 = time.perf_counter() - t0
    with mp.Pool(procs) as p:
        t0 = time.perf_counter()
        p.map(_burn, [n] * procs)
        tp = time.perf_counter() - t0
    return round(procs * t1 / tp, 1)


def run_scaling() -> dict:
    def run_once(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BSPP_BENCH_CONVS=str(SCALING_CONVS),
            BSPP_SCALING_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # calibrate immediately before EVERY rep, at the rep's own
        # width, so each wall time is paired with the host capacity
        # that produced it (suite-level bracketing left the pairing
        # ambiguous — a slow leg could not be attributed)
        reps = []
        ecs = []
        for _ in range(max(1, SCALING_REPS)):
            ecs.append(effective_cores(ncpu))
            reps.append(run_once(ncpu))
        best = min(reps, key=lambda r: r["value"])
        best["all_sec"] = [r["value"] for r in reps]
        best["ec_per_rep"] = ecs
        return best

    lo, hi = run(8), run(32)
    ec8 = sum(lo["ec_per_rep"]) / len(lo["ec_per_rep"])
    ec32 = sum(hi["ec_per_rep"]) / len(hi["ec_per_rep"])
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    # fraction of the HARDWARE-achievable ratio the pipeline realizes:
    # the nominal 4x denominator assumes 4x the silicon, which this
    # box does not deliver (SMT threads on a shared host)
    hw_ratio = ec32 / max(ec8, 1e-9)
    eff_vs_achievable = (lo["value"] / hi["value"]) / hw_ratio
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "sec_8_all": lo["all_sec"],
        "sec_32_all": hi["all_sec"],
        "turns_per_sec_8": lo["turns_per_sec"],
        "turns_per_sec_32": hi["turns_per_sec"],
        "oracle_pass_rate": hi.get("oracle_pass_rate"),
        "turns": lo["turns"],
        "effective_cores_8": lo["ec_per_rep"],
        "effective_cores_32": hi["ec_per_rep"],
        "hw_achievable_ratio": round(hw_ratio, 2),
        "efficiency_vs_achievable": round(eff_vs_achievable, 3),
        "note": (
            "same seeded corpus, fresh ray.init per level, best of "
            f"{max(1, SCALING_REPS)} reps per level; effective_cores_* = pure-CPU "
            "achievable parallelism probed immediately before each rep (hardware ceiling on the "
            "ratio; the box's 32 vCPUs share drifting host capacity); see BASELINE.md §3"
        ),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        # The driver records only the last ~2000 chars of stdout; the full
        # per-query JSON line is ~3.5 KB, so round 2's summary was cut
        # mid-line and parsed to null. Print the full detail FIRST (for
        # humans and logs), persist it to a sidecar file, and make the
        # LAST line a short summary guaranteed to fit the tail window.
        print(json.dumps(result))
        # Headline-only subprocess legs of --scaling must NOT clobber the
        # full per-query sweep sidecar (they carry queries == {}).
        if not os.environ.get("BSPP_SCALING_HEADLINE_ONLY"):
            try:
                sidecar = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json"
                )
                with open(sidecar, "w") as f:
                    json.dump(result, f, indent=1)
            except OSError:
                pass
        qt = result.get("queries") or {}
        short = {k: v for k, v in result.items() if k != "queries"}
        short["queries"] = {"flagship": result["value"]}
        short["queries_n"] = len(qt)
        short["queries_total_sec"] = round(sum(qt.values()), 2)
        short["queries_file"] = "BENCH_QUERIES.json"
        print(json.dumps(short))
