"""Inverted index: stats parity vs brute pandas, build/lookup
round-trip, bucket-pruned I/O accounting."""
import numpy as np
import pandas as pd


def _corpus(n_docs=300, seed=11):
    rng = np.random.default_rng(seed)
    vocab = [f"w{j}" for j in range(40)]
    docs = [" ".join(rng.choice(vocab, rng.integers(2, 25)))
            for _ in range(n_docs)]
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": docs})


def _brute_stats(df_in, min_df=1):
    tok = df_in.assign(term=df_in["text"].str.split(" ")) \
        .explode("term").drop_duplicates(["doc_id", "term"])
    g = tok.groupby("term", as_index=False).agg(
        df=("doc_id", "size"), id_sum=("doc_id", "sum"),
        id_min=("doc_id", "min"), id_max=("doc_id", "max"))
    g = g[g["df"] >= min_df]
    for c in ("df", "id_sum", "id_min", "id_max"):
        g[c] = g[c].astype(np.int64)
    return g.sort_values("term", ignore_index=True)


def test_inverted_index_stats_matches_brute(ray_session):
    import ray.data as rd

    from proj_ray.functions.invindex import inverted_index_stats

    df_in = _corpus()
    got = inverted_index_stats(
        rd.from_pandas(df_in).repartition(7), min_df=2) \
        .to_pandas().sort_values("term", ignore_index=True)
    exp = _brute_stats(df_in, min_df=2)
    pd.testing.assert_frame_equal(
        got[exp.columns].reset_index(drop=True), exp)


def test_build_and_lookup_roundtrip(tmp_path, ray_session):
    import ray.data as rd

    from proj_ray.functions.invindex import (build_inverted_index,
                                             lookup_postings)

    df_in = _corpus(seed=3)
    path = str(tmp_path / "idx")
    man = build_inverted_index(rd.from_pandas(df_in).repartition(5),
                               path, n_buckets=16)
    # manifest accounts for every distinct (term, doc) pair
    tok = df_in.assign(term=df_in["text"].str.split(" ")) \
        .explode("term").drop_duplicates(["doc_id", "term"])
    assert int(man["n_postings"].sum()) == len(tok)

    terms = ["w0", "w7", "w39", "absent"]
    got = lookup_postings(path, terms, n_buckets=16)
    exp = tok[tok["term"].isin(terms)][["term", "doc_id"]] \
        .sort_values(["term", "doc_id"], ignore_index=True)
    assert list(got["term"]) == list(exp["term"])
    assert np.array_equal(got["doc_id"].to_numpy(np.int64),
                          exp["doc_id"].to_numpy(np.int64))

    # empty query -> empty frame, correct dtypes
    empty = lookup_postings(path, [], n_buckets=16)
    assert len(empty) == 0 and list(empty.columns) == ["term", "doc_id"]


def test_lookup_reads_only_probed_buckets(tmp_path, ray_session):
    import ray.data as rd

    from proj_ray.functions.invindex import (build_inverted_index,
                                             lookup_postings)

    df_in = _corpus(n_docs=500, seed=9)
    path = str(tmp_path / "idx")
    build_inverted_index(rd.from_pandas(df_in).repartition(5),
                         path, n_buckets=32)
    st = {}
    lookup_postings(path, ["w3"], n_buckets=32, _stats=st)
    assert st["buckets_read"] == 1
    # single-term probe touches a small fraction of the index
    assert st["bytes_read"] < 0.25 * st["bytes_total"]
