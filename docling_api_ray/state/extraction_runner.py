"""One wave = one streaming Dataset run writing partitioned parquet."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from ..config import PipelineConfig
from ..pipelines.extraction import build_extraction


def run_wave(paths: list[str], out_dir: str, cfg: PipelineConfig) -> int:
    ds = build_extraction(paths, cfg)
    ds.write_parquet(out_dir)  # streaming consumption — no materialization
    # row count comes free from the parquet footers
    return sum(
        pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
