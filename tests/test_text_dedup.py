"""Unit + pipeline tests for the text analysis and dedup operators,
including planted near-duplicates for the probabilistic (LSH) paths."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.functions.dedup import (
    band_hashes,
    band_hashes_batch,
    hamming64,
    hashed_shingles,
    hashed_shingles_batch,
    minhash_signature,
    minhash_signatures_batch,
    simhash64,
    simhash64_batch,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.functions.text import (
    char_shingles,
    fingerprint,
    jaccard,
    lang_id,
    quality_metrics,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.dedup import (
    exact_dedup,
    minhash_neardup_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)


def docs_ds(rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    return ray.data.from_pandas(df).repartition(3)


BASE = (
    "the quick brown fox jumps over the lazy dog and runs to the forest "
    "with a friend of the pack for a long day in the sun"
)


def test_quality_metrics_by_hand():
    m = quality_metrics(pd.Series(["Hi, there! To be or not."]))
    assert m["n_chars"][0] == 24
    assert m["n_words"][0] == 6
    assert m["punct_ratio"][0] == round(3 / 24, 6)  # "," "!" "."
    # stopwords present: "to" (1)
    assert m["stop_ratio"][0] == round(1 / 6, 6)


def test_langid_profiles():
    texts = pd.Series(
        [
            "the cat and the dog sat on the mat with a hat",
            "el perro y el gato en la casa con su amigo",
            "der Hund und die Katze in den Garten mit dem Ball",
            "zzz qqq xxx",  # no stopword hits -> 'und'
        ]
    )
    assert list(lang_id(texts)) == ["en", "es", "de", "und"]


def test_fingerprint_deterministic_and_order_sensitive():
    a = fingerprint(pd.Series(["alpha beta gamma", "beta alpha gamma"]))
    b = fingerprint(pd.Series(["alpha beta gamma"]))
    assert a[0] == b[0]
    assert a[0] != a[1]  # rolling hash is order-sensitive


def test_minhash_estimates_jaccard():
    t1 = BASE
    t2 = BASE.replace("lazy", "sleepy")  # near-dup
    t3 = "completely different content about spaceships and nebulae"
    s1, s2, s3 = (minhash_signature(t) for t in (t1, t2, t3))
    est12 = float(np.mean(s1 == s2))
    true12 = jaccard(char_shingles(t1), char_shingles(t2))
    assert abs(est12 - true12) < 0.15
    assert float(np.mean(s1 == s3)) < 0.2


def test_simhash_near_for_neardups():
    h1 = simhash64(BASE)
    h2 = simhash64(BASE.replace("lazy", "sleepy"))
    h3 = simhash64("totally unrelated words about orbital mechanics and fuel")
    assert hamming64(h1, h2) < hamming64(h1, h3)
    assert hamming64(h1, h2) <= 16


# edge cases: empty, shorter-than-k, exactly-k, repeated shingles,
# unicode (non-ascii codepoints), whitespace-only, long realistic text
PARITY_TEXTS = [
    "",
    "ab",
    "abcde",
    "aaaaaaaaaa",
    "héllo wörld ünïcode ÿ",
    "   ",
    BASE,
    BASE.replace("lazy", "sleepy"),
    "Mixed CASE Text With Punctuation!!! and... numbers 12345",
]


def test_hashed_shingles_batch_parity():
    vals, offs = hashed_shingles_batch(PARITY_TEXTS, 5)
    for i, t in enumerate(PARITY_TEXTS):
        want = np.sort(hashed_shingles(t, 5))
        got = vals[offs[i]: offs[i + 1]]
        assert np.array_equal(got, want), t


def test_minhash_and_band_batch_parity():
    sigs = minhash_signatures_batch(PARITY_TEXTS)
    bands = band_hashes_batch(sigs)
    for i, t in enumerate(PARITY_TEXTS):
        want_sig = minhash_signature(t)
        assert np.array_equal(sigs[i], want_sig), t
        assert np.array_equal(bands[i], band_hashes(want_sig)), t


def test_simhash_batch_parity():
    got = simhash64_batch(PARITY_TEXTS)
    for i, t in enumerate(PARITY_TEXTS):
        assert got[i] == simhash64(t), t


def test_exact_dedup_pipeline(ray_session):
    rows = [
        (1, "aaa", "en", "s0"),
        (2, "bbb", "en", "s0"),
        (3, "aaa", "en", "s1"),
        (4, "ccc", "en", "s1"),
        (5, "aaa", "en", "s2"),
    ]
    out = exact_dedup(docs_ds(rows)).take_all()
    got = {(r["doc_id"], r["n_copies"]) for r in out}
    assert got == {(1, 3), (2, 1), (4, 1)}


def test_minhash_lsh_finds_planted_neardups(ray_session):
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(40):
        words = list(rng.choice(vocab, size=60))
        rows.append((i, " ".join(words), "en", "s0"))
    # plant 3 near-dup pairs (1-word perturbation => jaccard ~ 0.9)
    for j, base_id in enumerate([3, 7, 11]):
        words = rows[base_id][1].split()
        words[5] = "changed"
        rows.append((100 + j, " ".join(words), "en", "s0"))
    out = minhash_neardup_pairs(docs_ds(rows), threshold=0.7)
    pairs = {(a, b) for a, b in zip(out["a"].to_pylist(), out["b"].to_pylist())}
    assert {(3, 100), (7, 101), (11, 102)} <= pairs
    # sanity: no massive false-positive explosion
    assert len(pairs) < 10


def test_minhash_distributed_verify_at_10x_high_dup_rate(ray_session):
    """10x corpus with a crawl-like ~43% duplicate rate: the distributed
    verify (no driver-side candidate materialization) must still find
    every planted near-dup pair and nothing of the unrelated docs."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(800)]
    rows = []
    for i in range(400):
        rows.append((i, " ".join(rng.choice(vocab, size=60)), "en", "s0"))
    want_pairs = set()
    for j, base_id in enumerate(range(0, 300, 2)):  # 150 planted dups
        words = rows[base_id][1].split()
        words[7] = "changed"
        rows.append((1000 + j, " ".join(words), "en", "s0"))
        want_pairs.add((base_id, 1000 + j))
    out = minhash_neardup_pairs(docs_ds(rows), threshold=0.7)
    pairs = {(a, b) for a, b in zip(out["a"].to_pylist(), out["b"].to_pylist())}
    assert want_pairs <= pairs
    extras = pairs - want_pairs
    assert len(extras) < 20  # random 60-word docs shouldn't verify at 0.7


def test_ngram_jaccard_pairs_exact(ray_session):
    rows = [
        (1, "abcdefghij", "en", "s0"),
        (2, "abcdefghiX", "en", "s0"),   # high 3-gram overlap with 1
        (3, "zzzzyyyyxxxx", "en", "s0"),
        (4, "abcdefghij", "en", "s1"),   # other source: never paired with 1
    ]
    out = ngram_jaccard_pairs(docs_ds(rows), threshold=0.3, k=3).take_all()
    got = {(r["a"], r["b"]): r["jaccard"] for r in out}
    assert (1, 2) in got
    assert all(a != 4 and b != 4 for a, b in got)
    want = jaccard(char_shingles("abcdefghij", 3), char_shingles("abcdefghiX", 3))
    assert got[(1, 2)] == round(want, 6)


def test_simhash_pipeline_deterministic(ray_session):
    rows = [(i, f"text number {i} with words", "en", "s0") for i in range(10)]
    a = sorted((r["doc_id"], r["simhash"]) for r in simhash_signatures(docs_ds(rows)).take_all())
    b = sorted((r["doc_id"], r["simhash"]) for r in simhash_signatures(docs_ds(rows)).take_all())
    assert a == b


def test_sharded_candidate_broadcast_millions(ray_session):
    """A forced >10^6-candidate id set must broadcast as MULTIPLE shard
    objects (no single all-candidates object) and filter exactly."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.dedup import (
        filter_to_candidates,
        shard_candidate_ids,
    )

    rng = np.random.default_rng(1)
    needed = np.unique(rng.integers(0, 10_000_000, size=1_200_000))
    n_sh, refs = shard_candidate_ids(needed)
    assert n_sh >= 2 and len(refs) == n_sh
    probe = rng.integers(0, 10_000_000, size=50_000)
    got = filter_to_candidates(probe, n_sh, refs)
    want = np.isin(probe, needed)
    assert np.array_equal(got, want)
    # empty set round-trips
    n0, r0 = shard_candidate_ids(np.empty(0, np.int64))
    assert not filter_to_candidates(probe[:10], n0, r0).any()


def test_token_and_bigram_topk(ray_session):
    """Hand-checkable corpus: counts, tie-breaking (n desc, token asc)
    and document-boundary masking (no cross-doc bigrams)."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.text import (
        bigram_topk,
        token_topk,
    )

    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": "a b a b a"},
            {"doc_id": 1, "text": "b a"},
            {"doc_id": 2, "text": "c"},
        ]
    )
    toks = token_topk(docs, k=2).to_pandas()
    # counts: a=4, b=3, c=1 -> top-2 = a, b
    assert list(toks["token"]) == ["a", "b"]
    assert list(toks["n"]) == [4, 3]

    big = bigram_topk(docs, k=10).to_pandas()
    got = dict(zip(big["bigram"], big["n"]))
    # doc0: "a b" x2, "b a" x2; doc1: "b a"; NO "a b" across doc0|doc1
    assert got == {"a b": 2, "b a": 3}
    # tie-break determinism at equal n: lexicographic ascending
    docs2 = ray.data.from_items([{"doc_id": 0, "text": "z y z y"}])
    t2 = token_topk(docs2, k=1).to_pandas()
    assert list(t2["token"]) == ["y"]


def test_simhash_neardup_pairs_equals_bruteforce(ray_session):
    """Banded simhash near-dup must equal the brute-force all-pairs
    hamming filter (pigeonhole-exact at max_hamming <= n_bands - 1),
    including exact duplicates (hamming 0) and an 8-band radius."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.dedup import (
        simhash_neardup_pairs,
    )

    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(400)]
    rows = []
    for i in range(40):
        rows.append((i, " ".join(rng.choice(vocab, size=30)), "en", "s0"))
    # exact duplicate pair and a 1-token perturbation (tiny hamming)
    rows.append((100, rows[5][1], "en", "s0"))
    w = rows[9][1].split()
    w[3] = "tokX"
    rows.append((101, " ".join(w), "en", "s0"))
    ds = docs_ds(rows)

    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(ds).take_all()}
    ids = sorted(sigs)
    sh = np.array([sigs[i] for i in ids], np.int64).view(np.uint64)

    def brute(max_h):
        want = set()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                d = int(bin(int(sh[x] ^ sh[y])).count("1"))
                if d <= max_h:
                    want.add((ids[x], ids[y], d))
        return want

    for max_h in (0, 3, 7):
        got = {(r["a"], r["b"], r["hamming"])
               for r in simhash_neardup_pairs(ds, max_hamming=max_h).take_all()}
        assert got == brute(max_h), f"max_hamming={max_h}"
    assert (5, 100, 0) in brute(0)  # the planted exact dup is found


def test_minhash_hot_bucket_cap_linear(ray_session):
    """A pathological LSH bucket (many byte-identical docs) must emit
    O(n) representative-star candidates, not O(n^2) all-pairs — and the
    verified pairs must all be (rep, x) at jaccard 1.0."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.dedup import (
        minhash_candidates,
        minhash_verified_pairs,
    )

    n = 3000
    rows = [(i, BASE, "en", "s0") for i in range(n)]
    ds = docs_ds(rows)
    cap = 64
    cands = minhash_candidates(ds, bucket_cap=cap).take_all()
    # every band bucket holds all n ids -> capped to n-1 star pairs each,
    # deduped per exchange part; total must stay linear in n
    assert len(cands) <= 16 * n  # MINHASH_BANDS * n, far below n^2/2
    assert all(r["a"] == 0 for r in cands)
    ver = minhash_verified_pairs(ds, threshold=0.9, bucket_cap=cap).take_all()
    got = {(r["a"], r["b"]) for r in ver}
    assert got == {(0, i) for i in range(1, n)}
    assert all(r["jaccard"] == 1.0 for r in ver)


def test_ngram_jaccard_hot_source_deskewed(ray_session):
    """A planted hot source (80% of docs from one domain) must produce
    the same exact pairs as a serial per-source computation — the work
    shards by SHINGLE, so no task ever holds a whole source."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.functions.text import (
        char_shingles_str,
        jaccard as jac_fn,
    )

    rng = np.random.default_rng(11)
    alpha = list("abcdefgh")
    rows = []
    for i in range(200):
        src = "hot" if i < 160 else f"s{i % 5}"
        rows.append((i, "".join(rng.choice(alpha, size=12)), "en", src))
    # planted near-dups inside the hot source + an empty-doc pair
    rows.append((500, rows[0][1], "hot", "x"))  # wrong tuple order guard
    rows[-1] = (500, rows[0][1], "en", "hot")
    rows.append((501, rows[0][1][:-1] + "z", "en", "hot"))
    rows.append((600, "", "en", "hot"))
    rows.append((601, "", "en", "hot"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])

    got = ngram_jaccard_pairs(
        ray.data.from_pandas(df).repartition(4), threshold=0.3, k=3
    ).take_all()
    got_set = {(r["a"], r["b"], r["jaccard"]) for r in got}

    want = set()
    for _, g in df.groupby("source"):
        recs = list(g.itertuples())
        for x in range(len(recs)):
            for y in range(len(recs)):
                a, b = recs[x], recs[y]
                if a.doc_id >= b.doc_id:
                    continue
                j = jac_fn(char_shingles_str(a.text, 3),
                           char_shingles_str(b.text, 3))
                if j >= 0.3:
                    want.add((a.doc_id, b.doc_id, round(j, 6)))
    assert got_set == want
    assert (0, 500, 1.0) in want and (600, 601, 1.0) in want


def _pandas_top_terms(docs: pd.DataFrame, k: int = 3) -> pd.DataFrame:
    n = len(docs)
    toks = (
        pd.DataFrame({"doc_id": docs["doc_id"], "token": docs["text"].str.split()})
        .explode("token").dropna(subset=["token"])
    )
    tf = toks.groupby(["doc_id", "token"], sort=False).size().rename("tf").reset_index()
    df = tf.groupby("token", sort=False).size().rename("df").reset_index()
    s = tf.merge(df, on="token")
    s["score"] = s["tf"].to_numpy(np.int64) * (
        (np.float64(n) - s["df"].to_numpy(np.int64) + 0.5)
        / (s["df"].to_numpy(np.int64) + 0.5)
    )
    s = s.sort_values(["score", "token"], ascending=[False, True], kind="stable")
    return s.groupby("doc_id", sort=False).head(k)


def test_doc_top_terms_matches_pandas(ray_session):
    """tf-idf top terms == a hand-rolled pandas oracle, including planted
    score ties (same tf/df -> identical score, token-asc tie-break) and
    a repeated-token doc (tf > 1)."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.text import (
        doc_top_terms,
    )

    rng = np.random.default_rng(17)
    vocab = np.array([f"w{i:02d}" for i in range(40)])
    texts = [
        " ".join(rng.choice(vocab, rng.integers(5, 30))) for _ in range(60)
    ]
    texts[0] = "zebra zebra zebra alpha beta"   # tf>1 rare token dominates
    texts[1] = "aaa bbb"                        # tie: both unique, same df -> token asc
    texts[2] = ""                               # empty doc -> no rows
    texts[3] = "   "                            # whitespace-only -> no rows
    docs = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": texts})

    got = (
        doc_top_terms(ray.data.from_pandas(docs).repartition(5), k=3)
        .to_pandas()
        .sort_values(["doc_id", "token"], kind="stable")
        .reset_index(drop=True)
    )
    want = (
        _pandas_top_terms(docs, k=3)[["doc_id", "token", "tf", "df", "score"]]
        .sort_values(["doc_id", "token"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert not (got["doc_id"] == 2).any() and not (got["doc_id"] == 3).any()
    # the planted rare repeated token wins doc 0
    assert got[got["doc_id"] == 0].iloc[0]["token"] in ("alpha", "beta", "zebra")
    z = got[(got["doc_id"] == 0) & (got["token"] == "zebra")]
    assert len(z) == 1 and int(z["tf"].iloc[0]) == 3


def test_doc_boilerplate_by_hand(ray_session):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.text import (
        doc_boilerplate,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "a b a b a b",      # bigrams: ab,ba,ab,ba,ab -> 5 total, all dup
            "x y z",            # 2 distinct bigrams -> no dup
            "",                 # no tokens
            "solo",             # one token -> 0 bigrams
            "p q r p q",        # pq,qr,rp,pq -> 4 total, 2 dup (pq x2)
        ],
    })
    got = (
        doc_boilerplate(ray.data.from_pandas(docs).repartition(3))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["n_bigrams"].tolist() == [5, 2, 0, 0, 4]
    assert got["n_dup_bigrams"].tolist() == [5, 0, 0, 0, 2]
    assert got["dup_frac"].tolist() == [1.0, 0.0, 0.0, 0.0, 0.5]


def test_decontaminate_flags_shared_spans(ray_session):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.text import (
        decontaminate,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "completely different words here entirely now",
            "the quick brown fox jumps",
            "short doc",  # < 5 tokens -> zero grams, never contaminated
        ],
    })
    bench = pd.DataFrame({
        "doc_id": np.array([100], np.int64),
        "text": ["xx the quick brown fox jumps yy"],
    })
    out = (
        decontaminate(
            ray.data.from_pandas(docs).repartition(2),
            ray.data.from_pandas(bench), n=5,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [1, 0, 1, 0]
    assert out.loc[0, "n_overlap"] == 1  # only the shared 5-gram
    assert out.loc[2, "n_overlap"] == 1
