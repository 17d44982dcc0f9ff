"""q140 CDC chunking: vectorized sliding hash matches a per-position
loop; short docs get one chunk."""
import numpy as np
import pandas as pd

import __ray_entry__ as E

M = 1_000_000_007
P = [pow(257, j, M) for j in range(8)]


def _loop_cuts(s):
    bs = s.encode()
    cuts = []
    for i in range(len(bs) - 7):
        h = sum(bs[i + j] * P[j] for j in range(8)) % M
        if h % 64 == 0:
            cuts.append(i + 1)
    return cuts


def test_cdc_matches_loop(ray_session, tmp_path):
    rng = np.random.default_rng(17)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, L))
             for L in [0, 3, 8, 40, 200, 513]]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts,
                       "lang": ["en"] * len(texts),
                       "source": ["t"] * len(texts),
                       "n_chars": [len(t) for t in texts]})
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "documents.parquet")
    got = E._q140_cdc_chunks(str(d))
    for _, row in got.iterrows():
        cuts = _loop_cuts(texts[int(row["doc_id"])])
        assert int(row["n_cuts"]) == len(cuts)
        assert int(row["n_chunks"]) == len(cuts) + 1
        assert int(row["cut_chk"]) == sum(cuts)
