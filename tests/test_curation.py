"""Curation operators: deterministic sampling, splits, corpus cleaning."""

import numpy as np
import pandas as pd
import ray.data


def test_hash_sample_deterministic_and_partition_invariant(ray_session):
    from archivesspace_virgo_ray.pipelines.curation import hash_sample

    df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64), "v": 1})
    a = hash_sample(ray.data.from_pandas(df).repartition(3), 0.3).to_pandas()
    b = hash_sample(ray.data.from_pandas(df).repartition(11), 0.3).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # partitioning-invariant
    frac = len(a) / len(df)
    assert 0.25 < frac < 0.35  # Bernoulli(0.3) at n=2000
    # different salt → different (but still deterministic) subset
    c = hash_sample(ray.data.from_pandas(df), 0.3, salt="other").to_pandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])


def test_split_assign_partitions_everything_once(ray_session):
    from archivesspace_virgo_ray.pipelines.curation import split_assign

    df = pd.DataFrame({"doc_id": np.arange(3000, dtype=np.int64)})
    out = split_assign(ray.data.from_pandas(df).repartition(7)).to_pandas()
    assert len(out) == 3000 and out["doc_id"].is_unique
    counts = out["split"].value_counts(normalize=True)
    assert abs(counts["train"] - 0.8) < 0.03
    assert abs(counts["val"] - 0.1) < 0.02
    assert abs(counts["test"] - 0.1) < 0.02
    # stable across partitionings
    out2 = split_assign(ray.data.from_pandas(df).repartition(2)).to_pandas()
    m1 = dict(zip(out["doc_id"], out["split"]))
    m2 = dict(zip(out2["doc_id"], out2["split"]))
    assert m1 == m2


def test_corpus_clean_semantics(ray_session):
    from archivesspace_virgo_ray.pipelines.curation import corpus_clean

    long_a = " ".join(f"alpha_{i}" for i in range(40))
    long_b = " ".join(f"beta_{i}" for i in range(40))
    rows = [
        {"doc_id": 1, "text": long_a},            # keeper (exact rep)
        {"doc_id": 2, "text": long_a},            # exact dup → dropped
        {"doc_id": 3, "text": long_a + " tail_tok"},  # near dup of 1 → dropped
        {"doc_id": 4, "text": long_b},            # independent keeper
        {"doc_id": 5, "text": "too short"},       # quality floor → dropped
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    kept = corpus_clean(ds, min_tokens=10, near_threshold=0.7).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 4]


def test_stratified_sample_rates_and_nesting(ray_session):
    from archivesspace_virgo_ray.pipelines.curation import (
        hash_sample,
        stratified_sample,
    )

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "doc_id": np.arange(4000, dtype=np.int64),
        "source": rng.choice(["a", "b", "c", "d"], size=4000),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    out = stratified_sample(ds, rates, salt="t", default_p=0.25).to_pandas()
    by = out.groupby("source").size()
    n_by = df.groupby("source").size()
    assert by.get("a", 0) == n_by["a"]          # rate 1.0 keeps everything
    assert "c" not in by.index                  # rate 0.0 drops the group
    assert 0.4 < by["b"] / n_by["b"] < 0.6      # ~Bernoulli(0.5)
    assert 0.17 < by.get("d", 0) / n_by["d"] < 0.33  # default 0.25

    # nested: every row kept at rate p is kept at rate p' >= p (same salt)
    lo = stratified_sample(ds, {"b": 0.25}, salt="t", default_p=1.0).to_pandas()
    hi = stratified_sample(ds, {"b": 0.5}, salt="t", default_p=1.0).to_pandas()
    assert set(lo["doc_id"]) <= set(hi["doc_id"])

    # group-1.0 stratified == plain hash_sample restricted to that group
    plain = hash_sample(ds, 0.5, salt="t").to_pandas()
    strat_b = set(out[out["source"] == "b"]["doc_id"]) if len(out) else set()
    plain_b = set(plain[plain["source"] == "b"]["doc_id"])
    assert strat_b == plain_b


def test_decontaminate_finds_planted_overlap(ray_session):
    from archivesspace_virgo_ray.pipelines.curation import decontaminate

    eval_texts = {100: "alpha beta gamma delta epsilon", 101: "one two three four"}
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "xx alpha beta gamma delta yy",      # shares 1 4-gram with 100
            "alpha beta gamma delta epsilon zz", # shares 2 with 100
            "totally unrelated words here now",  # clean
            "zero one two three four five",      # shares eval 101's only 4-gram
        ],
    })
    out = (
        decontaminate(ray.data.from_pandas(df).repartition(2), eval_texts,
                      shingle_w=4)
        .to_pandas().sort_values(["doc_id", "eval_id"], ignore_index=True)
    )
    assert out[["doc_id", "eval_id", "n_shared"]].values.tolist() == [
        [0, 100, 1], [1, 100, 2], [3, 101, 1],
    ]


def test_decontaminate_repeated_shingle_counts_once(ray_session):
    from archivesspace_virgo_ray.pipelines.curation import decontaminate

    eval_texts = {7: "a b c d"}
    df = pd.DataFrame({
        "doc_id": np.array([1], dtype=np.int64),
        "text": ["a b c d x a b c d"],  # same 4-gram twice -> distinct once
    })
    out = decontaminate(ray.data.from_pandas(df), eval_texts, shingle_w=4).to_pandas()
    assert out["n_shared"].tolist() == [1]


def test_classifier_scores_exact_and_custom_weights(ray_session):
    """Surrogate-weight path matches a direct computation; custom-weights
    path scores with the provided vector; empty docs drop out."""
    import numpy as np
    import pandas as pd
    import ray.data

    from archivesspace_virgo_ray.functions.hashing import md5_u64
    from archivesspace_virgo_ray.pipelines.curation import (
        HashedLinearScorerStage,
        classifier_scores,
    )

    docs = pd.DataFrame({
        "doc_id": pd.Series([1, 2, 3], dtype=np.int64),
        "text": ["apple banana apple", "cherry", ""],
    })
    out = classifier_scores(
        ray.data.from_pandas(docs).repartition(2), n_buckets=64, bias=0.5
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert out["doc_id"].tolist() == [1, 2]

    def w_int(tok):
        return (int(md5_u64(tok)) % 64 * 2654435761) % 2000001

    s1 = 2 * w_int("apple") + w_int("banana")
    z1 = 0.5 + (s1 / 1e6 - 3) / 3
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "z"] == round(z1, 6)
    assert out.loc[0, "p"] == round(1 / (1 + np.exp(-z1)), 6)

    # custom trained-artifact path: all-ones weights -> z = bias + 1
    ones = np.ones(64)
    got = HashedLinearScorerStage(64, 0.0, ones)(docs)
    assert np.allclose(got["z"], 1.0)


def test_leakage_safe_split_clusters_share_split(ray_session):
    """Near-dup pairs always share a split; planted near-dups verify the
    leakage guarantee."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from archivesspace_virgo_ray.pipelines.curation import split_assign
    from archivesspace_virgo_ray.pipelines.dedup import minhash_dedup

    rng = np.random.default_rng(3)
    rows = []
    for i in range(40):
        filler = " ".join(f"tok_{rng.integers(0, 9999)}" for _ in range(25))
        rows.append({"doc_id": i, "text": f"base text {filler}"})
    # planted near-dup pairs (one token changed)
    for i, src in ((100, 0), (101, 1), (102, 2)):
        rows.append({"doc_id": i,
                     "text": rows[src]["text"].replace("tok_", "tok2_", 1)})
    docs = pd.DataFrame(rows)
    ds = ray.data.from_pandas(docs).repartition(3)
    clusters = minhash_dedup(ds, threshold=0.6, n_perm=128, bands=32)
    cl = clusters if isinstance(clusters, pd.DataFrame) else clusters.to_pandas()
    rep = dict(zip(cl["doc_id"], cl["rep_id"]))

    keyed = ds.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "split_key": pd.Series(
                [rep.get(int(d), int(d)) for d in df["doc_id"]],
                dtype=np.int64),
        }),
        batch_format="pandas",
    )
    out = split_assign(keyed, id_col="split_key", salt="leak1").to_pandas()
    split_of = dict(zip(out["doc_id"], out["split"]))
    for dup, src in ((100, 0), (101, 1), (102, 2)):
        assert rep.get(dup) == rep.get(src, src) or rep.get(dup) == src
        assert split_of[dup] == split_of[src], (dup, src)


def test_dsir_selection_prefers_target_like_docs(ray_session):
    """Docs drawn from the target vocabulary must receive higher importance
    weights than off-target docs; selection is deterministic and
    partition-invariant."""
    import ray.data

    from archivesspace_virgo_ray.pipelines.curation import (
        dsir_sample,
        dsir_weights,
    )

    rng = np.random.default_rng(5)
    tgt_vocab = [f"law_{i}" for i in range(50)]
    raw_vocab = [f"web_{i}" for i in range(50)]

    rows = []
    # 20 labeled target docs (the mask slice), 40 unlabeled: 20 target-like,
    # 20 off-target
    for i in range(20):
        rows.append({"doc_id": i, "grp": "tgt",
                     "text": " ".join(rng.choice(tgt_vocab, 40))})
    for i in range(20, 40):
        rows.append({"doc_id": i, "grp": "raw",
                     "text": " ".join(rng.choice(tgt_vocab, 40))})
    for i in range(40, 60):
        rows.append({"doc_id": i, "grp": "raw",
                     "text": " ".join(rng.choice(raw_vocab, 40))})
    pdf = pd.DataFrame(rows)
    mask = lambda df: (df["grp"] == "tgt").to_numpy()  # noqa: E731

    ds = ray.data.from_pandas(pdf).repartition(4)
    w = dsir_weights(ds, mask, n_buckets=256).to_pandas()
    w = w.sort_values("doc_id", ignore_index=True)
    tgt_like = w.loc[20:39, "logratio"].to_numpy()
    off = w.loc[40:59, "logratio"].to_numpy()
    assert tgt_like.min() > off.max()  # clean separation by construction

    sel = dsir_sample(ds, mask, n_keep=25, n_buckets=256)
    assert len(sel) == 25
    # selection is dominated by target-vocabulary docs
    assert (sel["doc_id"] < 40).mean() > 0.8

    # partition invariance: same weights and same selection on 1 block
    ds1 = ray.data.from_pandas(pdf)
    sel1 = dsir_sample(ds1, mask, n_keep=25, n_buckets=256)
    pd.testing.assert_frame_equal(sel.reset_index(drop=True),
                                  sel1.reset_index(drop=True))


def test_temperature_sample_upweights_small_domains(ray_session):
    """τ=0.5 on a 900/100 split: the small domain's keep rate must exceed
    the big domain's, empirical keeps track the advertised rates, and a
    capped rate (τ→0, tiny budget share per group n) never exceeds 1."""
    import ray.data

    from archivesspace_virgo_ray.pipelines.curation import temperature_sample

    pdf = pd.DataFrame(
        {"doc_id": np.arange(1000, dtype=np.int64),
         "source": ["big"] * 900 + ["small"] * 100}
    )
    out = temperature_sample(
        ray.data.from_pandas(pdf).repartition(4),
        group_col="source", tau=0.5, budget_frac=0.5,
    ).to_pandas().sort_values("doc_id", ignore_index=True)

    rates = out.drop_duplicates("source").set_index("source")["rate"]
    assert rates["small"] > rates["big"]
    # single-pass UniMax arithmetic: w_d = sqrt(n_d)/Z, rate = min(1, T*w/n)
    z = np.sqrt(900) + np.sqrt(100)
    assert rates["big"] == round(min(1.0, 500 * (np.sqrt(900) / z) / 900), 6)
    assert rates["small"] == round(min(1.0, 500 * (np.sqrt(100) / z) / 100), 6)
    for g in ("big", "small"):
        sub = out[out["source"] == g]
        assert abs(sub["keep"].mean() - rates[g]) < 0.08

    # rate cap: τ=0 with a big budget → small groups hit rate 1.0, keep all
    out0 = temperature_sample(
        ray.data.from_pandas(pdf), group_col="source", tau=0.0, budget_frac=0.9,
    ).to_pandas()
    small0 = out0[out0["source"] == "small"]
    assert (small0["rate"] == 1.0).all() and small0["keep"].all()


def test_line_dedup_removes_cross_doc_boilerplate(ray_session):
    """Lines repeated across >= min_df docs (header/footer chrome) vanish;
    unique lines survive in order; counts are exact; the keyed-fallback
    aggregation path returns the identical table."""
    import ray.data

    from archivesspace_virgo_ray.pipelines.curation import line_dedup

    header = "SITE NAV | home | products"
    footer = "(c) 2003 example corp"
    rows = []
    for i in range(10):
        body = f"unique body {i}\nsecond unique {i}"
        rows.append({"doc_id": i, "text": f"{header}\n{body}\n{footer}"})
    rows.append({"doc_id": 99, "text": "no boilerplate at all"})
    pdf = pd.DataFrame(rows)
    ds = ray.data.from_pandas(pdf).repartition(3)

    out = line_dedup(ds, min_df=5).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    for i in range(10):
        assert out.loc[i, "text"] == f"unique body {i}\nsecond unique {i}"
        assert out.loc[i, "n_lines"] == 4 and out.loc[i, "n_dropped"] == 2
    assert out.loc[10, "text"] == "no boilerplate at all"
    assert out.loc[10, "n_dropped"] == 0

    forced = line_dedup(ds, min_df=5, expected_lines=10**9).to_pandas()
    forced = forced.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(out, forced)


def test_intra_doc_line_dedup(ray_session):
    from archivesspace_virgo_ray.pipelines.curation import intra_doc_line_dedup

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a\nb\na\nc\nb\na",   # repeats keep first occurrence, order kept
            "solo",               # single line untouched
            "x\nx\nx",            # all-repeats collapse to one
            "\n\na",              # empty lines dedup like any line
        ],
    })
    out = (
        intra_doc_line_dedup(ray.data.from_pandas(pdf).repartition(2))
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert out["text"].tolist() == ["a\nb\nc", "solo", "x", "\na"]
    assert out["n_lines"].tolist() == [6, 1, 3, 3]
    assert out["n_dropped"].tolist() == [3, 0, 2, 1]


def test_substring_span_dedup(ray_session):
    """Lee et al. duplicated-substring removal: tokens covered by any
    cross-doc duplicated k-shingle vanish (ALL occurrences, both docs);
    overlapping duplicated spans merge via the coverage sweep; docs shorter
    than k and unique docs pass through (modulo the tokenizer contract);
    the keyed-fallback aggregation path returns the identical table."""
    import ray.data

    from archivesspace_virgo_ray.pipelines.curation import substring_span_dedup

    dup = "the quick brown fox jumps"          # the 5-token duplicated span
    rows = [
        {"doc_id": 0, "text": f"alpha one {dup} beta two"},
        {"doc_id": 1, "text": f"{dup} gamma delta epsilon zeta eta"},
        # 6-token shared run: two overlapping dup 5-shingles, all 6 covered
        {"doc_id": 2, "text": "intro words then the quick brown fox jumps high"},
        {"doc_id": 3, "text": "the quick brown fox jumps high and more stuff"},
        {"doc_id": 4, "text": "too short"},
        {"doc_id": 5, "text": "Entirely unique sentence with different words"},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = substring_span_dedup(ds, k=5, min_df=2).to_pandas().sort_values(
        "doc_id", ignore_index=True)

    assert out.loc[0, "text"] == "alpha one beta two"
    assert out.loc[0, "n_tokens"] == 9 and out.loc[0, "n_removed"] == 5
    assert out.loc[1, "text"] == "gamma delta epsilon zeta eta"
    # docs 2/3 share "the quick brown fox jumps high" (6 tokens) — the two
    # overlapping dup shingles cover all 6 positions in both docs
    assert out.loc[2, "text"] == "intro words then"
    assert out.loc[2, "n_removed"] == 6
    assert out.loc[3, "text"] == "and more stuff"
    assert out.loc[3, "n_removed"] == 6
    assert out.loc[4, "text"] == "too short" and out.loc[4, "n_removed"] == 0
    # tokenizer contract: output is lowercased space-joined tokens
    assert out.loc[5, "text"] == "entirely unique sentence with different words"
    assert out.loc[5, "n_removed"] == 0

    forced = substring_span_dedup(
        ds, k=5, min_df=2, expected_shingles=10**9
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(out, forced)


def test_ccnet_ppl_buckets_ntile_and_order(ray_session):
    """Bucket sizes mirror SQL NTILE(3) (first n%3 buckets take the extra
    row, tiny languages degrade to one-row buckets) and the head bucket
    holds the highest avg log-probs within each language."""
    import ray.data

    from archivesspace_virgo_ray.pipelines.curation import ccnet_ppl_buckets

    rows = []
    # lang "en": 7 docs -> NTILE sizes 3/2/2; repetitive docs score higher
    for i in range(7):
        rows.append({"doc_id": i, "lang": "en",
                     "text": ("common words " * (i + 1)) + f"rare{i} tail"})
    # lang "fr": 2 docs -> sizes 1/1/0 (no tail)
    rows.append({"doc_id": 100, "lang": "fr", "text": "un deux trois"})
    rows.append({"doc_id": 101, "lang": "fr", "text": "quatre cinq six sept"})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)

    out = ccnet_ppl_buckets(ds).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    en = out[out["lang"] == "en"]
    sizes = en["ppl_bucket"].value_counts()
    assert sizes["head"] == 3 and sizes["middle"] == 2 and sizes["tail"] == 2
    order = {"head": 0, "middle": 1, "tail": 2}
    ranked = en.sort_values(["avg_logprob", "doc_id"],
                            ascending=[False, True])
    assert ranked["ppl_bucket"].map(order).is_monotonic_increasing

    fr = out[out["lang"] == "fr"]
    assert sorted(fr["ppl_bucket"]) == ["head", "middle"]


def test_contrastive_crops_non_overlap_and_determinism(ray_session):
    """Crops are crop_len tokens each, non-overlapping (B strictly right of
    A), short docs are skipped, and offsets are partition-invariant."""
    import ray.data

    from archivesspace_virgo_ray.functions.tokenize import TOKEN_RE
    from archivesspace_virgo_ray.pipelines.curation import contrastive_crops

    texts = {
        0: " ".join(f"tok{i}" for i in range(30)),   # eligible (30 >= 24)
        1: " ".join(f"w{i}" for i in range(24)),     # exactly 2L: forced a=0,b=12
        2: "too few tokens here",                    # skipped
    }
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = contrastive_crops(
        ray.data.from_pandas(pdf).repartition(2), crop_len=12
    ).to_pandas().sort_values("doc_id", ignore_index=True)

    assert out["doc_id"].tolist() == [0, 1]
    for _, r in out.iterrows():
        toks = TOKEN_RE.findall(texts[r["doc_id"]].lower())
        ca, cb = r["crop_a"].split(" "), r["crop_b"].split(" ")
        assert len(ca) == 12 and len(cb) == 12
        # locate offsets; B must start at or after A's end
        sa = " ".join(toks).find(r["crop_a"])
        a = len(" ".join(toks)[:sa].split()) if sa > 0 else 0
        sb = " ".join(toks).find(r["crop_b"])
        b = len(" ".join(toks)[:sb].split()) if sb > 0 else 0
        assert b >= a + 12
    # doc 1 has exactly 2L tokens: the only legal pair is (0, 12)
    t1 = TOKEN_RE.findall(texts[1].lower())
    assert out.loc[1, "crop_a"] == " ".join(t1[:12])
    assert out.loc[1, "crop_b"] == " ".join(t1[12:24])

    again = contrastive_crops(
        ray.data.from_pandas(pdf).repartition(3), crop_len=12
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(out, again)
