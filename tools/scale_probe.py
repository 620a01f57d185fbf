#!/usr/bin/env python3
"""Standing sf1 scale gate (VERDICT r6 #6).

Regenerates the fresh-universe 10x fixture with graft.GenSf, benches a
pinned subset of known-risk queries at sf0.1 and at the 10x fixture
(both passes through graft.Bench, best-of-2 per query), and fails when
any query's wall-clock ratio exceeds its budget:

  - default budget: 5x for 10x data (sub-linear wall is the norm at
    local[32] because fixed overheads amortize);
  - LINEAR_SATURATED queries get 10x: their WORK is provably linear in
    data (disjoint-universe copies; analysis in PLANS.md round 6) and
    the 32 cores are already saturated at sf0.1, so wall tracks work
    ~1:1 and a 5x gate would flag honest linearity. 10x still catches
    super-linear regressions.

Usage: python3 tools/scale_probe.py [--reuse-fixture] [--out report.md]
Exit status 0 = gate passed, 1 = at least one query over budget.
"""
import argparse, json, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/graft_sf1_fresh"

# Pinned subset spanning every family a probe has ever flagged plus
# relational/streaming controls.
QUERIES = [
    # ER / fuzzy (r6: 21.7x / 24x under the nation block)
    "cust_fuzzy_pairs", "cust_er_golden", "cust_blocking_quality",
    # embedding LSH (r6: 12.5x / 7.1x under fixed planes)
    "emb_neardup_pairs", "emb_semantic_dedup", "emb_knn_classifier_eval",
    "emb_lsh_topk",
    # ANN training + serve
    "emb_ivf_pq_topk",
    # full-corpus kNN join + reciprocity self-join (r7 addition)
    "emb_mutual_knn",
    # banded perceptual-hash image index (fixed 16-bit band geometry —
    # the same fixed-width risk class as fixed nPlanes)
    "mm_phash_neardups",
    # shingle / minhash / winnow / substring
    "doc_minhash_neardups", "doc_winnow_pairs", "doc_containment_pairs",
    "doc_substring_dup_coverage", "doc_dedup_normalized",
    "doc_span_dedup_rewrite",
    # retrieval (postings + per-query ranking windows)
    "doc_search_eval",
    # graph
    "graph_pagerank", "graph_personalized_pagerank", "graph_triangles",
    "graph_kcore", "graph_hits_bipartite",
    # pair-bounded text grading over the cluster pairs (r7 addition)
    "doc_bleu_pairs",
    # relational + skew + streaming controls
    "q9_profit_by_nation", "join_salted_skew", "events_stream_hourly",
    "events_funnel_latency",
    # truss/support family (r7 cont.4: shared wedge enumeration,
    # multi-round peel)
    "graph_edge_support", "graph_ktruss",
    # replicate-weight explode (x100), JL sketch explode (x1024),
    # bigram LM counts, per-doc MATTR fold, EM rounds, vocab curve
    "orders_poisson_bootstrap_ci", "emb_rp_distortion",
    "doc_kn_bigram_lm", "doc_mattr_lexdiv", "lineitem_gmm_em",
    "doc_heaps_law",
    # r7 cont.5: per-position md5 explode (CDC), posting-list windows,
    # supplier-grain distributed range sort (ABC)
    "doc_cdc_chunks", "doc_posting_compression", "supp_abc_classes",
    # r7 cont.6: corpus-LM scoring joins, CC-label consumer,
    # bounded greedy selection rounds
    "doc_lm_perplexity_filter", "doc_training_triplets",
    "supp_greedy_coverage",
    # r8 (VERDICT r7 #5): waves 25-29 shapes — 4 sequential GD training
    # chains with per-round driver barriers; rarefaction riding the
    # shared near-dup pair relation at 4 sample grains
    "doc_learning_curve", "doc_dup_rate_rarefaction",
    # r9 (VERDICT r8 #6): waves 30-31 shapes — checkpointed MM rounds on
    # the bounded comparison grain, integer-weighted PageRank on the
    # vocabulary grain, an exact-long pinball-GD chain, and the Shapley
    # lattice over ONE user-grain rollup (names regenerated from
    # SparkEntry.queries this round)
    "doc_bradley_terry", "doc_textrank_keywords",
    "lineitem_quantile_regression", "events_shapley_attribution",
    # r9 additions: the grid-bounded MMD (33-cell rollup — ratio should
    # stay near 1x by construction) and the r9-touched native-hash
    # feature bucketing (explode+agg, linear)
    "events_mmd_drift", "doc_feature_hashing",
    # r9 continuation: (max, min)-semiring frontier relaxation — same
    # bounded-round edge-join class as pagerank/bfs
    "graph_widest_paths",
    # r10 (VERDICT r9 #1): the four r9 in-suite tail movers on unchanged
    # code — pinned so every future anomaly has an isolated baseline
    "events_crosscorr_lagged", "dq_key_density_audit",
    "doc_minhash_band_sweep", "lineitem_theil_index",
    # r11 (VERDICT r10 #1): the three r10 driver-run tail movers on
    # unchanged code — pinned so every future anomaly has an isolated
    # baseline (federated_trisource_join additionally had its /tmp
    # fixture write taken out of the timed path this round)
    "doc_ppl_transfer", "federated_trisource_join", "doc_topic_classify",
    # r11 (VERDICT r10 #4): families never probed at 100x before —
    # the classifier family and a second multimodal beyond pHash
    "doc_nb_source_classify", "mm_audio_loudness",
    # r12 (VERDICT r11 #1): the last two top-10-cost queries that had
    # zero scale datapoints — LP's per-round (src,label) aggregate and
    # the 4-round seed-cohort BFS
    "graph_label_communities", "graph_harmonic_centrality",
    # r12 (VERDICT r11 #2): the r11 driver-run >2x mover on unchanged
    # code — pinned so the anomaly has an isolated baseline
    "events_json_extract",
]

# Work linear in data by construction AND CPU-saturated at sf0.1 ->
# wall tracks the 10x work. Justifications: PLANS.md round-6 probe table.
LINEAR_SATURATED = {
    "graph_triangles": "wedge space scales 10x (disjoint copies)",
    # emb_knn_classifier_eval / emb_mutual_knn left OUT since r8: their
    # query sets are stride-bounded samples (~256 / ~512), so cost is
    # ~constant in corpus size and the default 5x budget should hold
    # with room (expected ~1x).
    "doc_minhash_neardups": "signatures + bucket pairs scale 10x",
    "doc_winnow_pairs": "fingerprint postings scale 10x",
    "doc_substring_dup_coverage": "gram explode scales 10x",
    "graph_pagerank": "edge rounds scale 10x",
    "graph_personalized_pagerank": "edge rounds scale 10x",
    "graph_kcore": "peeling rounds scale 10x",
    "doc_dedup_normalized":
        "exact hash-dedup of the full corpus: work linear in rows, saturated",
    "graph_hits_bipartite":
        "distinct (customer, part) edge volume scales 10x; half-steps are edge-sized shuffles",
    "doc_search_eval":
        "term postings and per-query candidate sets scale 10x; ranking windows grow with them",
    "graph_edge_support": "wedge space scales 10x (disjoint copies)",
    "graph_ktruss":
        "per-round wedge space scales 10x; rounds bounded at 3",
    "orders_poisson_bootstrap_ci":
        "rows x 100 replicate explode: work scales 10x, cores saturated",
    "emb_rp_distortion":
        "vecs x 1024 (coord x sketch-dim) explode: work scales 10x, saturated",
    "doc_mattr_lexdiv":
        "per-doc window fold: work linear in docs, interpreted HOF saturates cores",
    "doc_cdc_chunks":
        "per-position md5 explode: work linear in corpus chars, saturated",
    "doc_bleu_pairs":
        "exemplar grading is linear in cluster members (the r7 cont.2 fix); "
        "members scale 10x, gram joins saturate cores",
    "doc_lm_perplexity_filter":
        "bigram explode + gram-keyed train/score joins: work linear in "
        "corpus tokens, saturated",
    "doc_ppl_transfer":
        "(source, word) unigram counts + word-keyed score join across the "
        "bounded source matrix: work linear in corpus tokens, saturated",
    "graph_label_communities":
        "3 LP rounds, each an edge-sized (src,label) aggregate; "
        "edge volume scales 10x, saturated",
    "graph_harmonic_centrality":
        "4 bounded BFS rounds, each a frontier⋈edges join that scans "
        "the full edge set; edge volume scales 10x",
}

def run(cmd, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, cwd=REPO, env=e, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
        raise SystemExit(f"command failed: {' '.join(cmd)}")
    return r.stdout

def bench(sf_dir, out_json, queries):
    run(["sbt", "-batch", "runMain graft.Bench"], env={
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": "32",
        "SPARK_GRAFT_ONLY": ",".join(queries),
        "SPARK_GRAFT_BENCH_OUT": out_json,
        "SPARK_GRAFT_NOWARM": "1",  # cross-sf comparison: both passes cold-ish, best-of-2 handles JIT
        # self-contained per-query state: shared-memo builds bill to every
        # consumer at BOTH scales and suite cache pressure can't inflate
        # late queries (r7: containment flaked 12x in-suite vs 2.3x isolated)
        "SPARK_GRAFT_ISOLATE": "1",
        # symmetry: the sf0.1 dir usually has the persisted edge-index
        # layout (earlier full-suite runs built it) while the fresh 10x
        # fixture never does; force BOTH passes onto the derive path so
        # the ratio measures the operator, not the layout's presence
        "SPARK_GRAFT_NO_EDGE_IDX": "1",
    })
    with open(out_json) as f:
        return json.load(f)

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reuse-fixture", action="store_true",
                    help="skip GenSf if the fixture dir already exists")
    ap.add_argument("--out", default="/tmp/scale_probe_report.md")
    ap.add_argument("--factor", type=int, default=10,
                    help="fixture size as a multiple of sf0.1 (default 10; "
                         "e.g. 100 for a two-decade probe). Budgets scale "
                         "proportionally: factor for linear-saturated pins, "
                         "factor/2 for the rest.")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of the pin list (absolute "
                         "cost of the big linear families grows with factor "
                         "— a 100x pass should drop e.g. graph_triangles)")
    args = ap.parse_args()

    sf_big = SF1 if args.factor == 10 else f"/tmp/graft_sf{args.factor}x_fresh"
    queries = QUERIES
    if args.only:
        only = set(args.only.split(","))
        unknown = only - set(QUERIES)
        if unknown:
            raise SystemExit(f"--only names not in the pin list: {unknown}")
        queries = [q for q in QUERIES if q in only]

    # The fixture is only as fresh as the generator that built it:
    # --reuse-fixture used to skip GenSf whenever the dir existed, so a
    # fixture from an OLDER generator (pre-suffix-rotate, pre-QR pixels)
    # was silently reused and the probe measured the old data shape
    # (ADVICE r9). Stamp the dir with a hash of GenSf.scala at build
    # time and rebuild whenever HEAD's generator no longer matches.
    import hashlib
    gensf_src = os.path.join(REPO, "src/main/scala/graft/GenSf.scala")
    with open(gensf_src, "rb") as f:
        gen_ver = hashlib.sha256(f.read()).hexdigest()[:16]
    stamp = os.path.join(sf_big, "GENSF_VERSION")
    def stamp_matches():
        try:
            with open(stamp) as f:
                return f.read().strip() == gen_ver
        except OSError:
            return False
    reuse = args.reuse_fixture and os.path.isdir(sf_big)
    if reuse and not stamp_matches():
        print(f"[scale_probe] fixture at {sf_big} was built by a different "
              f"GenSf (stamp mismatch) — rebuilding")
        reuse = False
    if not reuse:
        print(f"[scale_probe] building fresh-universe {args.factor}x fixture ...")
        run(["sbt", "-batch", f"runMain graft.GenSf {SF01} {sf_big} {args.factor}"])
        with open(stamp, "w") as f:
            f.write(gen_ver + "\n")
        # drop any persisted edge-index layout keyed to the old fixture:
        # the path now carries a base-table content fingerprint, so a
        # regenerated universe lands on a fresh dir by construction —
        # this sweep only reclaims orphaned dirs from older fixtures
        import glob as _glob, shutil
        for d in _glob.glob(
                "/tmp/graft_edge_idx_v*_" + os.path.basename(sf_big) + "*"):
            shutil.rmtree(d, ignore_errors=True)

    print("[scale_probe] benching pinned subset at sf0.1 ...")
    base_out = bench(SF01, "/tmp/scale_probe_sf01.json", queries)
    print(f"[scale_probe] benching pinned subset at {args.factor}x ...")
    big_out = bench(sf_big, "/tmp/scale_probe_sf1.json", queries)
    base, big = base_out["queries"], big_out["queries"]

    # contamination sentinel: the mc (all-core) calibration sees the
    # shared-core load the single-partition one is blind to; a pass whose
    # mc value is far off the other pass's means its per-query times are
    # suspect and a FAIL below should be re-measured before any rewrite
    def cal(d):
        return (f"sc {d.get('calibration_pre', 0):.2f}/"
                f"{d.get('calibration_post', 0):.2f} "
                f"mc {d.get('calibration_mc_pre', 0):.2f}/"
                f"{d.get('calibration_mc_post', 0):.2f}")
    cal_line = (f"calibration: sf0.1 [{cal(base_out)}] "
                f"{args.factor}x [{cal(big_out)}]")

    def mc_med(d):
        vals = [d.get("calibration_mc_pre"), d.get("calibration_mc_post")]
        vals = [v for v in vals if v]
        return sum(vals) / len(vals) if vals else 0.0
    mc_a, mc_b = mc_med(base_out), mc_med(big_out)
    if mc_a > 0 and mc_b > 0 and max(mc_a, mc_b) / min(mc_a, mc_b) > 1.5:
        cal_line += (
            "\n\n**WARNING: the two passes' all-core calibrations differ "
            f"{max(mc_a, mc_b) / min(mc_a, mc_b):.2f}x — one pass shared "
            "its cores with other load and its per-query times are not "
            "comparable. Re-run on an idle machine before trusting any "
            "FAIL (or ok) below.**")

    rows, failed = [], []
    scale = args.factor / 10.0
    for q in queries:
        b, g = base.get(q), big.get(q)
        if b is None or g is None:
            failed.append((q, "missing from bench output"))
            continue
        ratio = g / b if b > 0 else float("inf")
        budget = (10.0 if q in LINEAR_SATURATED else 5.0) * scale
        note = LINEAR_SATURATED.get(q, "")
        ok = ratio <= budget
        if not ok:
            failed.append((q, f"{ratio:.1f}x > {budget:.0f}x budget"))
        rows.append((q, b, g, ratio, budget, "ok" if ok else "FAIL", note))

    lines = [f"| query | sf0.1 s | {args.factor}x s | ratio | budget | gate | note |",
             "|---|---|---|---|---|---|---|"]
    for q, b, g, r, bud, st, note in sorted(rows, key=lambda x: -x[3]):
        lines.append(f"| `{q}` | {b:.2f} | {g:.2f} | {r:.1f}x | "
                     f"{bud:.0f}x | {st} | {note} |")
    report = "\n".join(lines)
    with open(args.out, "w") as f:
        f.write(f"# scale-probe report ({args.factor}x fresh-universe "
                f"fixture, {len(queries)} pins)\n\n"
                + cal_line + "\n\n" + report + "\n")
    print(cal_line)
    print(report)
    if failed:
        print("\n[scale_probe] GATE FAILED:")
        for q, why in failed:
            print(f"  {q}: {why}")
        return 1
    print("\n[scale_probe] gate passed")
    return 0

if __name__ == "__main__":
    sys.exit(main())
