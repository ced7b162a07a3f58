"""Size-bucketed skew isolation (north rule: heavyweight-document handling)."""

import glob
import os

import pandas as pd
import pyarrow as pa
import ray.data

from b_pdf_parser_ray.fixtures import corpus_table
from b_pdf_parser_ray.pipelines.flagship import extract_documents
from b_pdf_parser_ray.stages.skew import (
    DEFAULT_HEAVY_SPANS,
    extract_with_skew_isolation,
    partition_corpus_by_size,
    split_by_size,
)


def _corpus_with_heavies(n=120):
    # seed 42 families: ~5% heavy (100-500 txns → >600 spans)
    return corpus_table(n)


def test_split_by_size_partitions_all_rows(ray_session):
    tbl = _corpus_with_heavies()
    light, heavy = split_by_size(ray.data.from_arrow(tbl))
    nl, nh = light.count(), heavy.count()
    assert nl + nh == tbl.num_rows
    assert nh >= 1  # the heavy family exists at this seed/size
    assert heavy.to_pandas()["n_spans"].min() >= DEFAULT_HEAVY_SPANS


def test_skew_isolated_extraction_matches_direct(ray_session):
    tbl = _corpus_with_heavies()
    direct = (
        extract_documents(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    isolated = (
        extract_with_skew_isolation(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(direct) == len(isolated)
    pd.testing.assert_series_equal(direct["is_valid"], isolated["is_valid"])
    pd.testing.assert_series_equal(direct["n_chars"], isolated["n_chars"])
    # full metadata parity on a sample
    for i in range(0, len(direct), 17):
        assert direct["metadata"][i] == isolated["metadata"][i]


def test_partition_corpus_by_size_layout(ray_session, tmp_path):
    out = str(tmp_path / "sized")
    partition_corpus_by_size(ray.data.from_arrow(_corpus_with_heavies()), out)
    dirs = sorted(os.path.basename(d) for d in glob.glob(os.path.join(out, "size=*")))
    assert dirs == ["size=heavy", "size=light"]
    heavy = ray.data.read_parquet(os.path.join(out, "size=heavy")).to_pandas()
    assert (heavy["spans"].map(len) >= DEFAULT_HEAVY_SPANS).all()
