"""Binary grid/file readers (NTv2/GTX live in ops.gridshift; GeoTIFF
here)."""
