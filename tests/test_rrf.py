"""MIPS top-k and reciprocal-rank fusion: brute parity + fusion math."""
import numpy as np
import pandas as pd
import ray.data

from proj_ray.functions.ann import mips_topk, rrf_fuse


def test_mips_matches_brute(ray_session):
    rng = np.random.default_rng(9)
    V = rng.normal(size=(200, 24)).astype(np.float32).astype(np.float64)
    df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                       "embedding": [v for v in V]})
    Q = np.floor(V * 1e6 + 0.5).astype(np.int64)
    dots = Q @ Q[7]
    order = np.lexsort((np.arange(200), -dots))[:5]
    for parts in (1, 6):
        got = mips_topk(ray.data.from_pandas(df).repartition(parts),
                        query_id=7, k=5)
        assert np.array_equal(got["id"].to_numpy(), order)
        assert np.array_equal(got["dot"].to_numpy(), dots[order])


def test_rrf_fuse_exact():
    a = pd.DataFrame({"id": [1, 2, 3], "rank": [1, 2, 3]})
    b = pd.DataFrame({"id": [3, 4], "rank": [1, 2]})
    got = rrf_fuse([a, b], k=10, c=60, scale=1_000_000_000)
    want = {1: 10 ** 9 // 61, 2: 10 ** 9 // 62,
            3: 10 ** 9 // 63 + 10 ** 9 // 61, 4: 10 ** 9 // 62}
    assert dict(zip(got["id"], got["rrf"])) == want
    # id 3 fused from both lists must rank first
    assert int(got.iloc[0]["id"]) == 3
    # tie between id 2 and id 4 (both 1e9//62) broken by id asc
    ids = got["id"].tolist()
    assert ids.index(2) < ids.index(4)
