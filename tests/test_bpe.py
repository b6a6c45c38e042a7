"""Distributed BPE merge learning (functions/bpe.py).

Covers the pinned merge-application convention (fixpoint leftmost
replace, incl. the self-pair odd-run case where it differs from
single-pass greedy), driver-vs-distributed path parity, DuckDB oracle
parity on a corpus with ties, and early stop when pairs run dry."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from k_gap_ray.functions.bpe import (_fixpoint_replace, _sentinel,
                                     _train_driver, bpe_train,
                                     sql_bpe_train)


def test_fixpoint_replace_conventions():
    # distinct pair: one pass is the classic greedy merge
    assert _fixpoint_replace(" a b a b z ", " a b ", " ab ") \
        == " ab ab z "
    # self pair, odd run: the fixpoint rule leaves the middle symbol
    # unpaired (documented divergence from single-pass greedy, which
    # would leave the LAST symbol unpaired) — pinned because SQL
    # replace() iterates the same way
    assert _fixpoint_replace(" x x x x x ", " x x ", " xx ") \
        == " xx x xx "
    # sentinel spaces prevent substring false-matches across symbols
    assert _fixpoint_replace(" ca b ", " a b ", " ab ") == " ca b "


def test_train_driver_order_and_early_stop():
    words = {_sentinel("abab"): 10, _sentinel("ab"): 5}
    merges = _train_driver(words, 10)
    # (a,b) appears 2*10+5=25 times; after merging, (ab,ab) 10 times
    assert merges[0] == ("a", "b", 25)
    assert merges[1] == ("ab", "ab", 10)
    # vocabulary collapses to single symbols -> early stop
    assert len(merges) == 2
    # tie-break is (count DESC, lhs ASC, rhs ASC)
    tied = {_sentinel("zy"): 3, _sentinel("ba"): 3}
    assert _train_driver(tied, 1)[0] == ("b", "a", 3)


def _corpus():
    return pa.table({
        "doc_id": pa.array(range(30), pa.int64()),
        "text": pa.array(
            ["the cat sat on the mat" if i % 3 == 0 else
             "banana bandana and band" if i % 3 == 1 else
             "aaa aa aaaa the band and cat"
             for i in range(30)], pa.string())})


def test_bpe_oracle_parity_and_distributed(ray_session):
    import ray.data as rd

    docs = _corpus()
    ds = rd.from_arrow(docs).repartition(5)
    mine = bpe_train(ds, n_merges=6).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    orc = con.execute(sql_bpe_train(6)).fetchdf() \
        .sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        mine.astype({"rank": "int64", "pair_count": "int64"}),
        orc.astype({"rank": "int64", "pair_count": "int64"}))
    # the distributed path (per-merge pair-count shuffle + broadcast
    # apply) learns the identical table
    dist = bpe_train(ds, n_merges=6, force_distributed=True).to_pandas()
    pd.testing.assert_frame_equal(mine, dist)
    # sanity: real merges came out (multi-char units appear)
    assert (mine["merged"].str.len() >= 2).all()


def test_bpe_encode_parity_both_paths(ray_session):
    import ray.data as rd

    from k_gap_ray.functions.bpe import bpe_encode, sql_bpe_encode

    docs = _corpus()
    ds = rd.from_arrow(docs).repartition(5)
    mine = bpe_encode(ds, n_merges=6).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    orc = con.execute(sql_bpe_encode(6)).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(mine.astype("int64"),
                                  orc.astype("int64"))
    # the above-cap path (distributed train + explode/join/sum) agrees
    dist = bpe_encode(ds, n_merges=6, force_distributed=True) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        mine.astype("int64"),
        dist[["doc_id", "n_subwords", "n_tokens"]].astype("int64"))
    # merging can only shrink segmentations, never below one subword
    # per token
    assert (mine["n_subwords"] >= mine["n_tokens"]).all()
