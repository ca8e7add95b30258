#!/usr/bin/env python3
"""Scale-rehearsal bench: run the corpus-operator queries on sf0.1 AND
on the 10x corpus (built by build_sfbig.py), in both Spark
(graft.Bench) and DuckDB (the oracle SQL), and write BENCH_sfbig.json
— the committed artifact behind SURVEY's 100 TB posture claim (Spark
sub-linear where the answer scales; DuckDB inverting its small-SF
edge). Driver-side tooling; run from the repo root:

    python3 tools/build_sfbig.py
    python3 tools/bench_sfbig.py
"""
import json
import os
import subprocess
import sys
import time

import duckdb

QUERIES = [
    "x02_dedup_minhash", "x04_dedup_chargram", "x05_dedup_embed",
    "x07_ann_lsh", "x13_clean_corpus", "x17_dedup_clusters",
    "x18_decontaminate", "x27_incremental_dedup", "x28_dedup_survivors",
    "x29_novelty", "x30_containment", "x33_semdedup", "x35_exact_substr",
    "x39_line_dedup", "x41_bloom_decontaminate", "x42_length_quartiles",
    "x43_edit_distance", "x44_gram_matrix", "x45_bigram_lm",
    "x49_bm25_topk", "x50_hll_distinct", "x51_token_pack",
    "x52_cms_heavy_hitters",
    # round-7 additions: the heavy rows whose flat-at-scale claims
    # previously rested on sf0.1 alone (verdict r6 item 6)
    "x22_tfidf_topk", "x37_closest_pairs", "x57_training_assembly",
    # round-7 second push: the s-family BATCH TWINS over the now-10x
    # events table, the cheap text/assembly family, and the new sketch
    # gates - scaling evidence for the remaining operator families
    "q13_window_hourly", "q14_key_latency", "q15_timeout_alert",
    "x46_user_sequences", "x08_lang_id", "x09_quality_score",
    "x21_repetition", "x32_quality_filter", "x36_unigram_score",
    "x34_shard_pack", "x53_mixture_sample", "x54_doc_chunks",
    "x58_chunk_dups", "x59_sample_quantiles", "x60_sketch_rollup",
    "x61_cms_rollup",
    # round-8: the quantile-sketch rollup completing the algebra family
    "x62_sample_rollup",
    # round-8: the streaming near-dup admission gate - the 100 TB ingest
    # path claim, measured (candidates scale with the batch)
    "s17_stream_admission",
    # round-8 second push: hybrid BM25+cosine RRF retrieval - two
    # bounded-heap corpus scans, fusion on driver-sized lists
    "x63_hybrid_rrf",
    # round-9: quality propagation over the dup graph (bounded Pregel
    # rounds), KMV cross-source Jaccard (one corpus pass + sketch-table
    # compare), and BPE merge rounds (one corpus pass + vocab-row dict
    # rounds) - each claims a flat-at-scale stage structure; measure it
    "x64_quality_propagate", "x65_sketch_jaccard", "x66_bpe_merges",
    # round-9: ordered funnel - user-keyed joins over the genuinely-10x
    # events table (the q13/q14 batch-twin family's join-shaped sibling)
    "x67_funnel",
    # round-9: corpus snapshot diff and the x40 rebuild leg the 100x
    # curve reads (hash-first full-outer join; linear answers)
    "x69_corpus_diff", "x40_corpus_rebuild",
    # round-10: the verdict-r9 `weak` rows (the only >2x-at-sf0.1 batch
    # rows without a committed scale curve) plus the new IVF-PQ gate -
    # every ANN/training stage is a broadcast-model narrow map, search
    # an equi-join; the curve should be near-flat in corpus size
    "x12_ann_ivf", "x70_ann_pq", "x14_asof_join", "x47_cluster_sizes",
    "x55_leakage_split",
    # round-10: the deep BPE chain (fixed-cost vocab-dict rounds) and
    # the streaming funnel over the genuinely-10x events table
    "x71_bpe_deep", "s18_stream_funnel",
    # round-10 second push: IVF-PQ completed with the exact re-rank tier,
    # and the CDC corpus-diff twin (bucket-local state I/O per batch)
    "x72_ann_pq_rerank", "s19_stream_diff",
    # round-10 third push: tokenizer application (corpus-word join
    # against the vocab dict)
    "x73_bpe_encode",
    # round-11: exact prefix-filter similarity join (output-bound — the
    # replica fixture makes TRUE pairs quadratic, so this row measures
    # the output-scale claim, like x47), priority sampling (one
    # bounded-heap pass), and the streaming quantile sketch
    "x74_exact_simjoin", "x75_priority_sample", "s21_stream_quantiles",
    # round-11 second push: exact containment join (same output-bound
    # profile as x74) and the streaming priority sample
    "x76_exact_containment", "s22_stream_sample",
    # round-11 third push: the cosine member of the exact-join trilogy
    # (output-bound like x74/x76) and the hopping-window replay over
    # the genuinely-10x events table
    "x77_exact_cosine", "s23_hopping_window",
    # round-12: the streaming leakage-free split — the suite's heaviest
    # replay row, previously unrehearsed at any scale: 3 micro-batches
    # each 10x bigger, per-batch cost must track O(batch + touched
    # clusters), not O(corpus). (Off the 100x list: its per-batch
    # verified-edge relation is output-quadratic on the replica fixture,
    # like x74/x76/x77.) Plus the OPQ-permuted IVF-PQ re-rank gate.
    "s20_leakage_split", "x78_ann_opq",
    # round-12: the re-arrival-tolerant CDC diff (s19's sibling — same
    # bucket-local state I/O claim under duplicate arrivals)
    "s24_diff_rearrive",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def spark_bench(sf_dir, names):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_ONLY=",".join(names),
               SPARK_GRAFT_BENCH_RUNS="3",
               # this script times DuckDB itself (with caps) — Bench's
               # embedded uncapped oracle pass must not run at 10x scale
               SPARK_GRAFT_ORACLE_RUNS="0")
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                   check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    with open("bench_result.json") as f:
        return json.load(f)["queries"]


def capped_bench(sf_dir):
    """graft.CappedBench: the banded operators with maxBandBucket, timed
    against their uncapped forms with recall, at the given dir."""
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_RUNS="2")
    subprocess.run(["sbt", "-batch", "runMain graft.CappedBench"], env=env,
                   check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    with open("capped_result.json") as f:
        return json.load(f)


TIMEOUT_S = 300   # cap per DuckDB run; a hit records "timeout:<cap>"
SLOW_S = 30       # one sample suffices when a single run exceeds this


def duck_bench(sf_dir, oracles, names, runs=3):
    import threading
    res = {}
    for name in names:
        con = duckdb.connect()  # fresh connection: no cross-query cache
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{p}')")
        ts = []
        verdict = None
        for _ in range(runs):
            timer = threading.Timer(TIMEOUT_S, con.interrupt)
            timer.start()
            t0 = time.time()
            try:
                con.sql(oracles[name]).fetchall()
                ts.append(time.time() - t0)
            except Exception as e:
                # classify by elapsed time: only a run that actually
                # reached the cap is a timeout — a genuine failure
                # (missing view, SQL error) must be recorded as one,
                # not published as a fake 300s runtime
                if time.time() - t0 >= TIMEOUT_S * 0.98:
                    verdict = f"timeout:{TIMEOUT_S}"
                else:
                    verdict = f"error:{type(e).__name__}"
                break
            finally:
                timer.cancel()
            if ts[-1] >= SLOW_S:    # slow-but-finite: one sample is
                break               # plenty, do not triple the cost
        if verdict is not None:
            res[name] = verdict
        elif ts:
            res[name] = round(sorted(ts)[len(ts) // 2], 3)
        # close the connection even on success: a Timer that fired just
        # as fetchall returned would otherwise poison the NEXT run on a
        # shared connection (the per-query connection bounds the blast
        # radius to this query)
        con.close()
        print(f"  duckdb {sf_dir} {name}: {res.get(name)}", flush=True)
    return res


def main(sf1="/root/testdata/sf0.1", sf10="/tmp/sfbig",
         out="BENCH_sfbig.json"):
    if not os.path.exists(os.path.join(sf10, "documents.parquet")):
        sys.exit(f"{sf10} missing - run tools/build_sfbig.py first")
    # oracle SQL comes from the library itself (Verify dumps it; the
    # __none__ filter skips the query dumps)
    subprocess.run(["sbt", "-batch",
                    "runMain graft.Verify /root/testdata/sf0.001 /tmp/sfbig_oracle"],
                   env=dict(os.environ, SPARK_GRAFT_VERIFY_ONLY="__none__"),
                   check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    oracles = json.load(open("/tmp/sfbig_oracle/oracle_sql.json"))

    result = {
        "base": sf1, "big": sf10,
        "queries": QUERIES,
        "spark_1x": spark_bench(sf1, QUERIES),
        "spark_10x": spark_bench(sf10, QUERIES),
        "duckdb_1x": duck_bench(sf1, oracles, QUERIES),
        "duckdb_10x": duck_bench(sf10, oracles, QUERIES),
        # round-8 verdict #5: the candidate cap rehearsed where it
        # matters — the 10x output-quadratic tail — with per-row recall
        # (capped pairs / uncapped pairs; x37: top-k overlap fraction)
        "capped_10x": capped_bench(sf10),
    }
    def ratio(a, b):
        ok = all(isinstance(v, (int, float)) and v for v in (a, b))
        return round(b / a, 2) if ok else None

    result["spark_scaling"] = {
        q: ratio(result["spark_1x"].get(q), result["spark_10x"].get(q))
        for q in QUERIES}
    result["duckdb_scaling"] = {
        q: ratio(result["duckdb_1x"].get(q), result["duckdb_10x"].get(q))
        for q in QUERIES}
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"wrote {out}")
    for q in QUERIES:
        print(f"{q:24s} spark {result['spark_1x'].get(q)!s:>7} -> "
              f"{result['spark_10x'].get(q)!s:>7}  duckdb "
              f"{result['duckdb_1x'].get(q)!s:>7} -> "
              f"{result['duckdb_10x'].get(q)!s:>7}")


if __name__ == "__main__":
    main(*sys.argv[1:])
