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
