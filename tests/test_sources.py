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


def test_read_table_orc_feather_dispatch(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.feather as fe
    import pyarrow.orc as orc

    from proj_ray.sources.lance import read_table, write_table

    df = pd.DataFrame({"a": np.arange(20, dtype=np.int64),
                       "b": np.arange(20) * 1.5,
                       "c": [f"s{i}" for i in range(20)]})
    t = pa.Table.from_pandas(df)
    op = tmp_path / "t.orc"
    orc.write_table(t, str(op))
    got = read_table(str(op)).to_pandas().sort_values("a") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df)
    pruned = read_table(str(op), columns=["a", "c"]).to_pandas()
    assert sorted(pruned.columns) == ["a", "c"]

    fp = tmp_path / "t.feather"
    fe.write_feather(t, str(fp))
    got = read_table(str(fp)).to_pandas().sort_values("a") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df)
    pruned = read_table(str(fp), columns=["b"]).to_pandas()
    assert list(pruned.columns) == ["b"]

    # sharded write -> directory read round-trip, both formats
    import ray.data as rd

    for fmt in ("orc", "feather"):
        out = tmp_path / f"shards_{fmt}"
        write_table(rd.from_pandas(df).repartition(4), str(out),
                    fmt=fmt)
        files = list(out.iterdir())
        assert len(files) >= 2  # one shard per block
        back = read_table(str(out), columns=["a", "c"])
        gb = back.to_pandas().sort_values("a").reset_index(drop=True)
        pd.testing.assert_frame_equal(gb, df[["a", "c"]])
