"""TF-IDF top-k: df correctness, brute scoring parity, determinism."""
import numpy as np
import pandas as pd


def test_tfidf_topk_matches_brute(ray_session):
    import ray.data as rd

    from proj_ray.functions.text import tfidf_topk

    rng = np.random.default_rng(5)
    vocab = [f"w{j}" for j in range(12)]
    docs = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
            for _ in range(200)]
    df_in = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                          "text": docs})
    got = tfidf_topk(rd.from_pandas(df_in), k=3).to_pandas() \
        .sort_values(["doc_id", "rk"]).reset_index(drop=True)

    # brute: pandas end-to-end, same fixed-point convention
    tok = df_in.assign(term=df_in["text"].str.split(" ")) \
        .explode("term")
    tf = tok.groupby(["doc_id", "term"], as_index=False).size()
    dfc = tok.drop_duplicates(["doc_id", "term"]) \
        .groupby("term").size()
    n = len(df_in)
    tf["score_f"] = np.floor(
        tf["size"].to_numpy(np.float64)
        * np.log(float(n) / dfc[tf["term"]].to_numpy(np.float64))
        * 1e6 + 0.5).astype(np.int64)
    tf = tf.sort_values(["doc_id", "score_f", "term"],
                        ascending=[True, False, True], kind="stable")
    tf["rk"] = tf.groupby("doc_id").cumcount() + 1
    exp = tf[tf["rk"] <= 3].reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.array_equal(got["doc_id"], exp["doc_id"])
    assert list(got["term"]) == list(exp["term"])
    assert np.array_equal(got["score_f"], exp["score_f"])


def test_document_frequencies_vocab_cap(ray_session):
    import pytest
    import ray.data as rd

    from proj_ray.functions.text import document_frequencies

    df_in = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "b c d"]})
    df = document_frequencies(rd.from_pandas(df_in))
    assert df == {"a": 1, "b": 2, "c": 2, "d": 1}
    with pytest.raises(ValueError):
        document_frequencies(rd.from_pandas(df_in), vocab_cap=2)


def test_cooccurrence_pmi_matches_brute(ray_session):
    import itertools

    import ray.data as rd

    from proj_ray.functions.text import cooccurrence_pmi

    rng = np.random.default_rng(11)
    vocab = [f"w{j}" for j in range(10)]
    docs = [" ".join(rng.choice(vocab, rng.integers(2, 12)))
            for _ in range(150)]
    df_in = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64),
                          "text": docs})
    got = cooccurrence_pmi(rd.from_pandas(df_in), k=15, n_buckets=8)

    # brute force in plain python
    n = len(docs)
    dfc: dict = {}
    cab: dict = {}
    for d in docs:
        terms = sorted(set(d.split(" ")))
        for t in terms:
            dfc[t] = dfc.get(t, 0) + 1
        for a, b in itertools.combinations(terms, 2):
            cab[(a, b)] = cab.get((a, b), 0) + 1
    rows = []
    for (a, b), c in cab.items():
        pmi = np.log(float(n) * float(c)
                     / (float(dfc[a]) * float(dfc[b])))
        rows.append((a, b, c, int(np.floor(pmi * 1e6 + 0.5))))
    exp = pd.DataFrame(rows, columns=["ta", "tb", "c_ab", "pmi_f"]) \
        .sort_values(["pmi_f", "ta", "tb"],
                     ascending=[False, True, True]).head(15) \
        .reset_index(drop=True)
    assert list(got["ta"]) == list(exp["ta"])
    assert list(got["tb"]) == list(exp["tb"])
    assert np.array_equal(got["c_ab"], exp["c_ab"])
    assert np.array_equal(got["pmi_f"], exp["pmi_f"])


def test_substring_dup_stats_matches_brute(ray_session):
    """Planted exact duplicates across documents: per-doc duplicated
    coverage and gram counts must equal a brute-force dict-of-grams
    computation (interval union semantics, min_count=2 global)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from proj_ray.functions.text import substring_dup_stats

    rng = np.random.default_rng(13)
    alpha = np.array(list("abcdefghij"))
    shared = "the quick brown fox jumps over the lazy dog again"
    docs = []
    for i in range(40):
        base = "".join(rng.choice(alpha, rng.integers(60, 200)))
        if i % 3 == 0:
            at = int(rng.integers(0, max(1, len(base) - 1)))
            base = base[:at] + shared + base[at:]
        if i % 7 == 0:
            base = base + base[:35]  # intra-doc repeat
        docs.append(base)
    k = 12
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                       "text": docs})
    got = substring_dup_stats(
        rd.from_pandas(df), k=k).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    from collections import Counter
    c = Counter()
    for t in docs:
        for i in range(len(t) - k + 1):
            c[t[i:i + k]] += 1
    rows = []
    for d, t in enumerate(docs):
        pos = [i for i in range(len(t) - k + 1) if c[t[i:i + k]] >= 2]
        if not pos:
            continue
        cover = 0
        prev_end = -1
        for p in pos:
            cover += max(0, p + k - max(p, prev_end))
            prev_end = max(prev_end, p + k)
        rows.append((d, cover, len(pos)))
    want = pd.DataFrame(rows, columns=["doc_id", "dup_chars",
                                       "dup_grams"])
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["dup_chars"].tolist() == want["dup_chars"].tolist()
    assert got["dup_grams"].tolist() == want["dup_grams"].tolist()


def test_substring_dup_stride_subsample(ray_session):
    """stride=3 keeps only every 3rd window start: dup_grams shrinks
    accordingly and coverage never exceeds the exact run's."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from proj_ray.functions.text import substring_dup_stats

    df = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["abcdefghijklmnopqrstuvwxyz0123456789" * 3] * 2})
    exact = substring_dup_stats(rd.from_pandas(df), k=10).to_pandas()
    sub = substring_dup_stats(rd.from_pandas(df), k=10,
                              stride=3).to_pandas()
    e = exact.set_index("doc_id")
    s = sub.set_index("doc_id")
    assert (s["dup_grams"] < e["dup_grams"]).all()
    assert (s["dup_chars"] <= e["dup_chars"]).all()
    assert (s["dup_chars"] > 0).all()
