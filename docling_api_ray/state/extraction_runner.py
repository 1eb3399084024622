"""One wave = one streaming Dataset run writing partitioned parquet."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from ..config import PipelineConfig
from ..pipelines.extraction import build_extraction


def run_wave(paths: list[str], out_dir: str, cfg: PipelineConfig) -> int:
    ds = build_extraction(paths, cfg)
    # min_rows_per_file coalesces the giant branch's small reassembled
    # blocks (~7 rows each) at the writer — without it a wave emits
    # hundreds of tiny parquet files, the many-tiny-files antipattern at
    # 100 TB (metadata pressure + footer-read fan-out on resume)
    ds.write_parquet(out_dir, min_rows_per_file=1000)
    # row count comes free from the parquet footers
    return sum(
        pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
