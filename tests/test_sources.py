"""Source dispatch: csv/jsonl read+write paths with pruning."""
import numpy as np


def test_read_table_csv_jsonl_dispatch(ray_session, tmp_path):
    import pandas as pd

    from proj_ray.sources.lance import read_table, write_table

    df = pd.DataFrame({"a": np.arange(10, dtype=np.int64),
                       "b": np.arange(10) * 0.5,
                       "c": [f"s{i}" for i in range(10)]})
    csv = tmp_path / "t.csv"
    df.to_csv(csv, index=False)
    got = read_table(str(csv)).to_pandas().sort_values("a")
    assert np.array_equal(got["a"], df["a"])
    assert list(got["c"]) == list(df["c"])
    pruned = read_table(str(csv), columns=["a", "c"]).to_pandas()
    assert sorted(pruned.columns) == ["a", "c"]

    jl = tmp_path / "t.jsonl"
    df.to_json(jl, orient="records", lines=True)
    got = read_table(str(jl)).to_pandas().sort_values("a")
    assert np.array_equal(got["a"], df["a"])
    pruned = read_table(str(jl), columns=["b"]).to_pandas()
    assert list(pruned.columns) == ["b"]

    # write dispatch round-trips through a directory of csv shards
    import ray.data as rd

    out = tmp_path / "outcsv"
    write_table(rd.from_pandas(df), str(out), fmt="csv")
    import glob

    shards = sorted(glob.glob(str(out) + "/*.csv"))
    assert shards, "write_csv produced no shards"
    back = pd.concat([read_table(s).to_pandas() for s in shards])
    assert len(back) == 10
