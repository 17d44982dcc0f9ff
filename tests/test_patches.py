"""Image patchify stats: parity with a direct per-image computation."""

import numpy as np


def test_patch_stats_matches_direct(ray_session):
    from proj_ray.images import decode, images_table, patch_stats

    n = 150
    out = patch_stats(
        images_table(n, columns=["image_id", "bytes", "fmt"]), grid=4)
    assert len(out) == 16
    assert (out["n_imgs"] == n).all()

    # direct: decode every image locally and accumulate
    import ray

    tbl = images_table(n, columns=["image_id", "bytes", "fmt"]).to_pandas()
    sum_lum = np.zeros((4, 4), dtype=np.int64)
    chk = np.zeros((4, 4), dtype=np.int64)
    for _, row in tbl.iterrows():
        px = decode(row["bytes"], row["fmt"]).astype(np.int64)
        h, w, _ = px.shape
        lum = 2 * px[..., 0] + 3 * px[..., 1] + px[..., 2]
        p = lum.reshape(4, h // 4, 4, w // 4).sum(axis=(1, 3))
        i = int(row["image_id"][3:])
        sum_lum += p
        chk += p * (i + 1)
    got_sum = out.pivot(index="pr", columns="pc",
                        values="sum_lum").to_numpy()
    got_chk = out.pivot(index="pr", columns="pc", values="chk").to_numpy()
    assert (got_sum == sum_lum).all()
    assert (got_chk == chk).all()
