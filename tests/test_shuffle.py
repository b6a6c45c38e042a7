"""Seeded epoch shuffle (functions/shuffle.py).

Covers the 31-bit mix's numpy/SQL parity, the bucket-and-carry global
positions, NTILE fill-rule shard balance, seed independence, and the
input-validation edges."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from k_gap_ray.functions.shuffle import (_mix, epoch_shuffle,
                                         sql_epoch_shuffle)


def test_mix_matches_sql_and_spreads():
    ids = np.array([0, 1, 2, 7, 1000, 2**31 - 1, 2**31, 10**12 + 5],
                   np.int64)
    mine = _mix(ids, seed=42)
    con = duckdb.connect()
    con.register("t", pa.table({"doc_id": pa.array(ids, pa.int64())}))
    sql = sql_epoch_shuffle(42, 4, table="t")
    # pull just the v expression via the full oracle's ordering: ids
    # sorted by their mix must equal the numpy argsort
    orc = con.execute(sql).fetchdf().sort_values("pos")
    order_sql = orc["doc_id"].to_numpy()
    order_np = ids[np.lexsort((ids, mine))]
    assert (order_sql == order_np).all()
    # ids 2**31-1 and 2**31 wrap to different keys than their raw
    # values; sanity: keys are inside the 31-bit domain and not all
    # clustered
    assert mine.min() >= 0 and mine.max() < 2**31
    assert len(np.unique(mine // 2**23)) > 4  # spread across buckets


def test_epoch_shuffle_parity_and_balance(ray_session):
    import ray.data as rd

    ids = pa.table({"doc_id": pa.array(
        list(range(0, 900, 2)) + [10**12 + 5], pa.int64())})
    ds = rd.from_arrow(ids).repartition(7)
    mine = epoch_shuffle(ds, "doc_id", seed=3, n_shards=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", ids)
    orc = con.execute(sql_epoch_shuffle(3, 8)).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine.astype("int64"),
                                  orc.astype("int64"))
    # a permutation: every position exactly once
    assert sorted(mine["pos"]) == list(range(1, len(ids) + 1))
    # NTILE balance: shard sizes differ by at most one
    sizes = mine.groupby("shard").size()
    assert len(sizes) == 8 and sizes.max() - sizes.min() <= 1
    # epochs are independent: a different seed reorders
    m2 = epoch_shuffle(ds, "doc_id", seed=4, n_shards=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert not (m2["pos"].to_numpy() == mine["pos"].to_numpy()).all()


def test_epoch_shuffle_small_corpus_and_validation(ray_session):
    import ray.data as rd

    ids = pa.table({"doc_id": pa.array([5, 9, 11], pa.int64())})
    ds = rd.from_arrow(ids)
    out = epoch_shuffle(ds, "doc_id", seed=0, n_shards=8) \
        .to_pandas().sort_values("pos")
    # fewer rows than shards: NTILE gives shards 1..n one row each
    assert out["shard"].tolist() == [1, 2, 3]
    with pytest.raises(ValueError, match="seed"):
        epoch_shuffle(ds, "doc_id", seed=2**31, n_shards=4)
    with pytest.raises(ValueError, match="n_shards"):
        epoch_shuffle(ds, "doc_id", seed=1, n_shards=0)


def test_stratified_cap_parity_and_skew(ray_session, sf_dir):
    """Survivor-set parity with the SQL window-rank oracle on the sf
    corpus, plus a skewed synthetic corpus (one stratum owns 90% of
    rows, one stratum is smaller than the cap)."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data as rd

    from k_gap_ray.functions.shuffle import (sql_stratified_cap,
                                             stratified_cap)

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang"])
    got = (stratified_cap(rd.from_arrow(tbl), "lang", "doc_id",
                          cap=7, seed=3)
           .to_pandas().sort_values(["lang", "doc_id"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", tbl)
    want = (con.execute(sql_stratified_cap(cap=7, seed=3)).df()
            .sort_values(["lang", "doc_id"]).reset_index(drop=True))
    con.close()
    pd.testing.assert_frame_equal(
        got[["doc_id", "lang"]], want[["doc_id", "lang"]])

    # skew: 900 rows in 'hot', 100 in 'cold', 2 in 'tiny'
    ids = np.arange(1002, dtype=np.int64)
    lang = np.array(["hot"] * 900 + ["cold"] * 100 + ["tiny"] * 2)
    skew = pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "lang": pa.array(lang)})
    out = (stratified_cap(rd.from_arrow(skew).repartition(8),
                          "lang", "doc_id", cap=5, seed=11)
           .to_pandas())
    sizes = out.groupby("lang").size().to_dict()
    assert sizes == {"hot": 5, "cold": 5, "tiny": 2}
    con = duckdb.connect()
    con.register("skew", skew)
    want = con.execute(sql_stratified_cap(cap=5, seed=11,
                                          table="skew")).df()
    con.close()
    assert (sorted(out["doc_id"]) == sorted(want["doc_id"]))

    with pytest.raises(ValueError, match="cap"):
        stratified_cap(rd.from_arrow(skew), "lang", "doc_id", cap=0)
    with pytest.raises(ValueError, match="seed"):
        stratified_cap(rd.from_arrow(skew), "lang", "doc_id",
                       cap=1, seed=-1)
