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
