"""dsutil.read_parquet_clean: pandas-metadata stripping at the read
edge (the source of Ray's per-task "Failed to hash the schemas"
warning spam — round-4 verdict item 6)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from k_gap_ray.dsutil import read_parquet_clean

SF = "/root/testdata/sf0.001"


def test_testdata_schema_is_unhashable_without_strip():
    # the premise: the raw file schema cannot be hashed (pandas
    # metadata carries a dict) — if this ever starts passing, the
    # helper is no longer needed
    s = pq.read_schema(f"{SF}/documents.parquet")
    with pytest.raises(TypeError):
        hash(s)
    hash(s.remove_metadata())  # stripped: hashable


def test_clean_read_full_and_projected(ray_session):
    full = read_parquet_clean(f"{SF}/documents.parquet")
    assert full.count() == 500
    assert "doc_id" in full.schema().names

    proj = read_parquet_clean(f"{SF}/documents.parquet",
                              columns=["doc_id", "lang"])
    assert proj.schema().names == ["doc_id", "lang"]
    # values survive intact and hashable-schema blocks flow through
    t = pa.Table.from_pylist(proj.take(5))
    assert t.column("doc_id").to_pylist() == sorted(
        t.column("doc_id").to_pylist())


def test_clean_read_falls_back_on_directories(ray_session, tmp_path):
    import ray.data as rd

    d = str(tmp_path / "store")
    rd.from_arrow(pa.table({"a": [1, 2, 3]})).write_parquet(d)
    # directory path: helper skips the schema override (repo-written
    # stores carry no pandas metadata) but still reads fine
    assert read_parquet_clean(d).count() == 3
