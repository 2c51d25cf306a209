"""Driver-contract smoke: entry() runs on sf0.001; every queries() entry has
a callable; every oracle key exists in queries()."""

from __future__ import annotations

import __spark_entry__ as E


def test_contract_shape():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    # every query now carries an oracle (multimodal_decode gained a
    # precomputed-expected-values oracle in round 2)
    assert set(qs) == set(oracles)


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0
    cols = set(df.columns)
    assert {"url", "host", "sched_rank", "priority"} <= cols


def test_sample_queries_run(spark):
    qs = E.queries()
    for name in ["pricing_summary", "dedup_exact", "text_lang_id"]:
        assert qs[name](spark, "/root/testdata/sf0.001").count() > 0


def test_url_template_mining_masks_all_digits(spark):
    rows = E.q_url_template_mining(spark, E.SF001).collect()
    assert rows
    n_orders = spark.read.parquet(f"{E.SF001}/orders.parquet").count()
    assert sum(r["n_urls"] for r in rows) == n_orders
    for r in rows:
        assert "N" in r["template"]
        assert not any(c.isdigit() for c in r["template"])


def test_host_cocitation_invariants(spark):
    # sf0.01: sf0.001's orders are too few for any pair to clear the
    # cocite >= 5 floor (max observed there is 4) — the report would be
    # vacuously green, which is exactly what this test forbids
    rows = E.q_host_cocitation(spark, "/root/testdata/sf0.01").collect()
    assert rows, "cocitation must be non-vacuous at sf0.01"
    for r in rows:
        assert r["host_a"] < r["host_b"]
        assert r["cocite"] >= E._COCITE_MIN
        # cocite <= min(indeg) => cosine <= 1; > 0 by construction
        assert 0.0 < r["cosine"] <= 1.0


def test_recrawl_lambda_estimator(spark):
    import math

    rows = E.q_recrawl_lambda(spark, E.SF001).collect()
    assert rows
    for r in rows:
        frac = r["n_changed"] / r["n_pages"]
        assert 0.0 < frac < 1.0
        want = round(-math.log(1.0 - frac), 6)
        assert abs(r["lambda_hat"] - want) < 1e-9
        # the Poisson correction always estimates MORE change than the
        # naive fraction (a page can flip twice between visits)
        assert r["lambda_hat"] > r["change_frac"]
        assert r["revisit_interval"] > 0


def test_tokenizer_oov_rate_bounds(spark):
    rows = E.q_tokenizer_oov_rate(spark, E.SF001).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0.0 <= r["oov_rate"] <= 1.0
    # a 20-term vocab over a real corpus must leave SOME tokens out
    assert any(r["n_oov"] > 0 for r in rows)


def test_dedup_savings_accounting(spark):
    rows = E.q_dedup_savings_report(spark, E.SF001).collect()
    assert rows
    assert any(r["n_docs_kept"] < r["n_docs"] for r in rows), \
        "near-dups must exist somewhere at sf0.001"
    for r in rows:
        assert 0 < r["n_docs_kept"] <= r["n_docs"]
        assert 0 < r["n_tokens_kept"] <= r["n_tokens"]
        assert 0.0 <= r["token_reduction"] < 1.0


def test_image_transcode_savings_directions(spark):
    rows = {r["orig_fmt"]: r
            for r in E.q_image_transcode_savings(spark, E.SF001).collect()}
    assert set(rows) == {"png", "jpeg", "webp"}
    # lossless png -> 7-bit webp always shrinks; webp -> webp round-trips
    # to (near) identical size; totals are exact integer sums
    assert rows["png"]["savings_frac"] > 0
    assert abs(rows["webp"]["savings_frac"]) < 0.05
    for r in rows.values():
        assert r["bytes_now"] > 0 and r["bytes_webp"] > 0


def test_corr_length_tokens_sane(spark):
    rows = E.q_corr_length_tokens(spark, E.SF001).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["pearson_r"] <= 1.0
        # longer documents hold more whitespace tokens: strongly positive
        assert r["pearson_r"] > 0.5, r


def test_bloom_shard_health_formula(spark):
    import math

    rows = E.q_bloom_shard_health(spark, E.SF001).collect()
    assert len(rows) > 0
    for r in rows:
        want = round((1.0 - math.exp((-float(E._BFH_K) * r["n_urls"])
                                     / float(E._BFH_M))) ** float(E._BFH_K), 9)
        assert abs(r["fpp_est"] - want) < 1e-12
        assert r["over_budget"] == (r["fpp_est"] > 0.01)
        # tiny sf: every shard far under capacity, fpp far under budget
        assert r["fill_ratio"] < 1.0 and not r["over_budget"]


def test_budget_sensitivity_monotone(spark):
    rows = {r["budget"]: r
            for r in E.q_budget_sensitivity(spark, E.SF001).collect()}
    assert set(rows) == set(E._BUDGET_SWEEP)
    bs = sorted(rows)
    for lo, hi in zip(bs, bs[1:]):
        # more budget can only shorten the crawl
        assert rows[hi]["makespan_rounds"] <= rows[lo]["makespan_rounds"]
        assert rows[hi]["mean_drain"] <= rows[lo]["mean_drain"]
    for r in rows.values():
        assert r["n_critical_hosts"] >= 1
        assert r["mean_drain"] <= r["makespan_rounds"]


def test_crawl_makespan_integer_math(spark):
    rows = E.q_crawl_makespan(spark, E.SF001).collect()
    assert rows
    mk = max(r["drain_rounds"] for r in rows)
    for r in rows:
        want = -(-r["pending"] // E.HOST_BUDGET)  # ceil
        assert r["drain_rounds"] == want
        assert 1 <= r["last_round_urls"] <= E.HOST_BUDGET
        assert (r["pending"] - r["last_round_urls"]) % E.HOST_BUDGET == 0
        assert r["makespan_rounds"] == mk


def test_no_shadowed_toplevel_names():
    """A duplicated module-level constant silently clobbers the earlier
    one (this bit depth_gate's oracle when the depth-profile SQL reused
    its constant name) — forbid duplicate top-level assignments/defs in
    the entry module outright."""
    import ast
    import collections

    tree = ast.parse(open(E.__file__).read())
    names = collections.Counter()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names[t.id] += 1
        elif isinstance(node, ast.FunctionDef):
            names[node.name] += 1
    dupes = {n: c for n, c in names.items() if c > 1}
    assert not dupes, f"shadowed top-level names: {dupes}"


def test_image_letterbox_semantics(spark):
    rows = {r["image_id"]: r
            for r in E.q_image_letterbox(spark, E.SF001).collect()}
    assert len(rows) == E._LB_N
    blank = rows["lb-00007"]
    assert blank["top"] == blank["h"] and blank["content_h"] == 0
    flagged = [r for r in rows.values() if r["letterboxed"]]
    clean = [r for r in rows.values() if not r["letterboxed"]]
    assert flagged and clean  # planted bars found; raw synth images not
    for r in rows.values():
        assert r["content_w"] == r["w"] - r["left"] - r["right"]
        assert r["content_h"] == r["h"] - r["top"] - r["bottom"]


def test_ann_nprobe_recall_monotone(spark):
    rows = E.q_ann_nprobe_sweep(spark, "/root/testdata/sf0.01").collect()
    assert rows
    avg = {r["nprobe"]: r["avg_recall"] for r in rows}
    assert set(avg) == set(E._NP_SWEEP)
    # probing more cells can only add candidates -> recall is monotone
    assert avg[1] <= avg[2] <= avg[4]
    assert avg[4] > avg[1]  # and the lever actually moves on this corpus
    for r in rows:
        assert 0 <= r["n_hit"] <= E._IVF_K


def test_image_phash_recall_crop_blind_spot(spark):
    rows = E.q_image_phash_recall(spark, E.SF001).collect()
    assert rows
    rec = {r["tier"]: r["tier_recall"] for r in rows}
    # lossy re-encodes are phash-stable; border crops shift the DCT grid
    assert rec[0] == 1.0 and rec[1] == 1.0
    assert rec[2] < rec[0]
    for r in rows:
        if r["found"]:
            assert 0 <= r["hamming"] <= 3
        else:
            assert r["hamming"] == -1


def test_dedup_method_recall_comparison(spark):
    rows = E.q_dedup_method_recall(spark, "/root/testdata/sf0.01").collect()
    assert rows
    rec = {(r["method"], r["tier"]): r["tier_recall"] for r in rows}
    assert set(rec) == {(m, t) for m in ("minhash", "simhash64")
                        for t in (0, 1, 2)}
    # shingle-set minhash is robust to prefix drops; bitwise simhash at
    # Hamming<=3 is not — the comparison must show it at every tier
    for t in (0, 1, 2):
        assert rec[("minhash", t)] >= rec[("simhash64", t)]
    assert rec[("minhash", 0)] == 1.0


def test_host_ucb_exploration_bonus(spark):
    import math

    rows = E.q_host_ucb_priority(spark, E.SF001).collect()
    assert rows
    n_total = sum(r["n_fetches"] for r in rows)
    for r in rows:
        # ucb = yield + c*sqrt(ln(N)/n), recomputed from the row's ints
        want = round(r["n_good"] / r["n_fetches"]
                     + E._UCB_C * math.sqrt(math.log(n_total) / r["n_fetches"]), 6)
        assert abs(r["ucb"] - want) < 1e-9
        assert r["ucb"] >= r["yield"]  # the bonus never demotes
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_dedup_recall_curve_monotone(spark):
    rows = E.q_dedup_recall_planted(spark, "/root/testdata/sf0.01").collect()
    assert rows
    recall = {r["tier"]: r["tier_recall"] for r in rows}
    assert set(recall) == {0, 1, 2}
    # light mutations must all be found; recall must fall with corruption
    assert recall[0] == 1.0
    assert recall[0] >= recall[1] >= recall[2]
    assert recall[2] < 1.0  # heavy tier visibly below the cliff
    for r in rows:
        if r["found"]:
            assert r["est_sim"] >= E._MH_MIN


def test_host_mirror_detect_finds_planted_pairs(spark):
    rows = E.q_host_mirror_detect(spark, "/root/testdata/sf0.01").collect()
    assert rows
    mirrors = [r for r in rows if r["mirror"]]
    assert mirrors, "planted mirror pairs must be detected"
    for r in rows:
        ia = int(r["host_a"][4:])
        ib = int(r["host_b"][4:])
        # only the planted (h, h+250 mod 500) placements share content
        assert (ia + E._MIR_SHIFT) % E.N_FRONTIER_HOSTS == ib \
            or (ib + E._MIR_SHIFT) % E.N_FRONTIER_HOSTS == ia
        assert r["shared"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["jaccard"] <= 1.0


def test_event_pmi_matches_python_reference(spark):
    import math

    rows = E.q_event_pmi(spark, E.SF001).collect()
    assert rows
    ev = spark.read.parquet(f"{E.SF001}/events.parquet")
    from pyspark.sql import functions as F2
    baskets = (ev.select("user_id", F2.to_date("ts").alias("day"), "event_type")
               .distinct())
    n = baskets.select("user_id", "day").distinct().count()
    for r in rows:
        assert r["c_ab"] <= min(r["c_a"], r["c_b"])
        want = round(math.log(r["c_ab"] * float(n) / (r["c_a"] * r["c_b"])), 6)
        assert abs(r["pmi"] - want) < 1e-9, (r, want)


def test_sitemap_coverage_gap_accounting(spark):
    rows = E.q_sitemap_coverage_gap(spark, E.SF001).collect()
    assert rows
    for r in rows:
        # matched + stale partition the advertised set exactly
        assert r["n_matched"] + r["n_stale"] == r["n_advertised"]
        # every host advertises phantom '-99' rows it never links
        assert r["n_stale"] >= 1
        # lines 5..7 exist in the frontier but never in the sitemap
        assert r["n_organic"] >= 0
        assert 0.0 <= r["coverage"] < 1.0


def test_image_color_profile_planted_pathologies(spark):
    rows = {r["image_id"]: r
            for r in E.q_image_color_profile(spark, E.SF001).collect()}
    assert len(rows) == E._DC_N
    solid = rows["dc-00011"]
    assert solid["dom_share"] == 1.0   # solid tile: one posterized bucket
    grays = [rows[f"dc-{i:05d}"] for i in range(E._DC_N) if i % 9 == 0 and i != 11]
    assert grays and all(r["is_gray"] and r["gray_frac"] == 1.0 for r in grays)
    normal = [r for k, r in rows.items()
              if int(k[3:]) % 9 != 0 and k != "dc-00011"]
    assert normal and not any(r["is_gray"] for r in normal)


def test_robots_generation_diff_flip_directions(spark):
    rows = E.q_robots_generation_diff(spark, E.SF001).collect()
    assert rows
    blocked_hosts = [r for r in rows if r["newly_blocked"] > 0]
    allowed_hosts = [r for r in rows if r["newly_allowed"] > 0]
    assert blocked_hosts and allowed_hosts  # both edit kinds took effect
    for r in rows:
        idx = int(r["host"][2:r["host"].index(".")])
        # tightening only on h%4 hosts (the '/p/1*' Allow withdrawn)
        if r["newly_blocked"] > 0:
            assert idx % 4 == 0, r
        # loosening only on h%7 hosts (the new '/p/2*' Allow)
        if r["newly_allowed"] > 0:
            assert idx % 7 == 0, r
        assert r["changed"] == (r["newly_blocked"] + r["newly_allowed"] > 0)


def test_politeness_audit_invariants(spark):
    rows = E.q_politeness_audit(spark, E.SF001).collect()
    assert rows
    n_events = spark.read.parquet(f"{E.SF001}/events.parquet").count()
    assert sum(r["n_fetches"] for r in rows) == n_events
    for r in rows:
        assert 0 <= r["n_violations"] <= max(r["n_fetches"] - 1, 0)
        assert 0.0 <= r["violation_rate"] <= 1.0
        if r["n_fetches"] > 1:
            assert r["min_gap_us"] is not None and r["min_gap_us"] >= 0


def test_zipf_fit_matches_numpy_ols(spark):
    import math

    rows = E.q_zipf_term_fit(spark, E.SF001).collect()
    assert rows
    slope = rows[0]["zipf_slope"]
    # natural-ish corpus: frequency decreasing in rank -> negative slope
    assert slope < 0
    # the fixed-point OLS must agree with a float reference to ~1e-4
    # (the 1e-6 ln() quantum bounds the drift)
    pts = sorted((r["rank"], r["freq"]) for r in rows)
    xs = [math.log(r) for r, _ in pts]
    ys = [math.log(f) for _, f in pts]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    ref = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(slope - ref) < 1e-4, (slope, ref)


def test_dust_rules_find_planted_alias_families(spark):
    rows = E.q_dust_rule_mining(spark, E.SF001).collect()
    froms = {r["rule_from"] for r in rows}
    # the three planted alias families, and nothing else
    assert froms == {
        "https://www.hostN.example.test/p/N-N",
        "https://hostN.example.test/p/N-N/index.html",
        "https://hostN.example.test/p/N-N?session=N",
    }
    for r in rows:
        assert r["rule_to"] == "https://hostN.example.test/p/N-N"
        assert r["support"] >= E._DUST_MIN_SUPPORT


def test_budget_apportion_sums_exactly(spark):
    import __spark_entry__ as E
    rows = E.q_budget_apportion(spark, E.SF001).collect()
    total = sum(r["quota"] for r in rows)
    assert total == E._APPORTION_BUDGET
    assert all(r["quota"] >= 0 for r in rows)


def test_embedding_norm_hist_matches_numpy(spark):
    import numpy as np

    rows = E.q_embedding_norm_hist(spark, E.SF001).collect()
    assert rows
    emb = spark.read.parquet(f"{E.SF001}/embeddings.parquet").collect()
    want = {}
    for r in emb:
        v = np.array(r["embedding"], dtype=np.float64)
        s = int(sum(int(round(float(x) * float(x) * E._ENORM_SCALE))
                    for x in v))
        b = int(np.floor(np.sqrt(s / float(E._ENORM_SCALE)) / E._ENORM_BIN))
        want[(r["label"], b)] = want.get((r["label"], b), 0) + 1
    got = {(r["label"], r["norm_bin"]): r["n"] for r in rows}
    assert got == want


def test_corpus_temperature_mix_flattens_tail(spark):
    rows = E.q_corpus_temperature_mix(spark, E.SF001).collect()
    assert rows
    by_alpha = {}
    for r in rows:
        by_alpha.setdefault(r["alpha"], {})[r["lang"]] = r
    assert set(by_alpha) == set(E._TMIX_ALPHAS)
    for a, per in by_alpha.items():
        s = sum(r["weight"] for r in per.values())
        assert abs(s - 1.0) < 1e-4  # weights normalize
    # alpha=1 reproduces the natural mix; alpha<1 up-weights the
    # smallest language and down-weights the largest (lang counts are
    # genuinely skewed: en dominates)
    nat = by_alpha[1.0]
    small = min(nat.values(), key=lambda r: r["n_docs"])["lang"]
    big = max(nat.values(), key=lambda r: r["n_docs"])["lang"]
    assert by_alpha[0.3][small]["weight"] > nat[small]["weight"]
    assert by_alpha[0.3][big]["weight"] < nat[big]["weight"]


def test_graph_mixing_stats_bounds(spark):
    r = E.q_graph_mixing_stats(spark, E.SF001).first()
    assert r["n_edges"] > 0
    assert 0.0 <= r["reciprocity"] <= 1.0
    assert -1.0 <= r["assortativity"] <= 1.0


def test_frontier_gini_reference(spark):
    r = E.q_frontier_gini(spark, E.SF001).first()
    assert 0.0 <= r["gini"] < 1.0
    # python reference on the same counts
    per = sorted(
        (row["n"], row["host"]) for row in
        E._frontier(spark, E.SF001).groupBy("host").count()
        .withColumnRenamed("count", "n").collect())
    h = len(per)
    t = sum(n for n, _ in per)
    s = sum((i + 1) * n for i, (n, _) in enumerate(per))
    want = round(2.0 * s / (h * t) - (h + 1) / h, 6)
    assert abs(r["gini"] - want) < 1e-9


def test_event_burstiness_reference(spark):
    rows = E.q_event_burstiness(spark, E.SF001).collect()
    assert rows
    for r in rows:
        assert r["n_days"] > 1
        assert r["fano"] >= 0.0
        assert r["bursty"] == (r["fano"] > E._FANO_TH)


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE entry must exist in queries() — a stale
    name would crash the driver's per-round benchmark run."""
    import bench

    qs = set(E.queries())
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing


def test_frontier_lorenz_curve(spark):
    rows = sorted(E.q_frontier_lorenz(spark, E.SF001).collect(),
                  key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["cum_url_share"] for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))  # monotone
    assert abs(shares[-1] - 1.0) < 1e-9                      # sums to 1
    # lightest-first ranking: the bottom decile holds <= its uniform share
    assert shares[0] <= 0.1 + 1e-9
