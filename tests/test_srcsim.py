"""q146 source similarity: Gram pieces match a brute token count."""
import numpy as np
import pandas as pd

import __ray_entry__ as E


def test_source_similarity_brute(ray_session, tmp_path):
    rng = np.random.default_rng(37)
    vocab = np.array(list("abcdefgh"))
    texts, srcs = [], []
    for i in range(200):
        srcs.append(f"s{i % 4}")
        texts.append(" ".join(rng.choice(vocab, rng.integers(3, 12))))
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts, "lang": ["en"] * 200,
                       "source": srcs,
                       "n_chars": [len(t) for t in texts]})
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "documents.parquet")
    got = E._q146_source_similarity(str(d))
    cnt = {}
    for s, t in zip(srcs, texts):
        for w in t.split(" "):
            cnt[(s, w)] = cnt.get((s, w), 0) + 1
    import itertools
    for a, b in itertools.combinations(sorted({*srcs}), 2):
        dot = sum(cnt.get((a, w), 0) * cnt.get((b, w), 0)
                  for w in vocab)
        row = got[(got["src_a"] == a) & (got["src_b"] == b)].iloc[0]
        assert int(row["dot"]) == dot
        assert int(row["norm_a2"]) == sum(
            v * v for (s, w), v in cnt.items() if s == a)
