"""Persisted fingerprint store + incremental dedup (state/fingerprints).

Covers the cross-batch contract the in-run oracle cannot see: the
store GROWS by each batch's novel set (batch 3 sees batch 2's novels
as dup_store), and re-running a batch is idempotent for membership.
"""
import pyarrow as pa
import pytest


def _statuses(res):
    return {r["doc_id"]: r["status"] for r in res.take_all()}


def test_incremental_dedup_statuses_and_store_growth(ray_session,
                                                     tmp_path):
    import duckdb
    import ray.data as rd

    from k_gap_ray.state.fingerprints import (incremental_dedup,
                                              init_fingerprint_store,
                                              sql_incremental_dedup)

    store = str(tmp_path / "fp_store")
    b1 = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                   "text": pa.array(["alpha beta", "gamma delta",
                                     "alpha beta"])})
    b2 = pa.table({"doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                   "text": pa.array(["alpha beta",      # in store
                                     "epsilon zeta",    # novel
                                     "epsilon zeta",    # dup within b2
                                     "eta theta"])})    # novel
    init_fingerprint_store(rd.from_arrow(b1), store)
    got = _statuses(incremental_dedup(rd.from_arrow(b2), store))
    assert got == {10: "dup_store", 11: "novel",
                   12: "dup_batch", 13: "novel"}

    # the oracle CASE over old=b1 / new=b2 agrees exactly
    con = duckdb.connect()
    both = pa.concat_tables([b1, b2])
    con.register("documents", both)
    want = dict(con.execute(sql_incremental_dedup(
        "doc_id < 10", "doc_id >= 10")).fetchall())
    assert got == want

    # batch 3: b2's novels are NOW in the store; re-sent b2 rows too
    b3 = pa.table({"doc_id": pa.array([20, 21, 22], pa.int64()),
                   "text": pa.array(["epsilon zeta",    # b2 novel
                                     "eta theta",       # b2 novel
                                     "iota kappa"])})   # new
    got3 = _statuses(incremental_dedup(rd.from_arrow(b3), store))
    assert got3 == {20: "dup_store", 21: "dup_store", 22: "novel"}

    # idempotence: re-running b3 classifies everything dup_store and
    # appends nothing new (membership is EXISTS, not counts)
    got3b = _statuses(incremental_dedup(rd.from_arrow(b3), store))
    assert set(got3b.values()) == {"dup_store"}


def test_incremental_dedup_prefix_key_and_empty_store(ray_session,
                                                      tmp_path):
    import ray.data as rd

    from k_gap_ray.state.fingerprints import incremental_dedup

    store = str(tmp_path / "no_store")   # never initialized
    b = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([
                      "a b c SUFFIX-ONE extra tail",
                      "a b c SUFFIX-TWO other tail",
                      "totally different head text"])})
    # prefix_tokens=3: docs 1 and 2 share the head key; empty store ->
    # everything resolves within the batch
    got = _statuses(incremental_dedup(rd.from_arrow(b), store,
                                      prefix_tokens=3))
    assert got == {1: "novel", 2: "dup_batch", 3: "novel"}
    # second run: the appended novels now match by prefix
    got2 = _statuses(incremental_dedup(rd.from_arrow(b), store,
                                       prefix_tokens=3))
    assert got2 == {1: "dup_store", 2: "dup_store", 3: "dup_store"}


def test_incremental_near_dup_probes_and_grows_index(ray_session,
                                                     tmp_path):
    """Band-index near-dup: batch 2 finds its near-dup of an indexed
    doc (exact-Jaccard verified evidence integers); with append=True
    batch 3 then matches batch 2's doc too — the index grew; an
    unrelated doc produces no pair; re-probing is idempotent for the
    pair set."""
    import ray.data as rd

    from k_gap_ray.state.fingerprints import (incremental_near_dup,
                                              init_band_index)

    idx = str(tmp_path / "band_index")
    base = ("the quick brown fox jumps over the lazy dog and then "
            "naps in the warm afternoon sun near the old barn")
    b1 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "text": pa.array([
                       base,
                       "completely different content about databases "
                       "and distributed systems running on clusters"])})
    init_band_index(rd.from_arrow(b1), idx)

    # batch 2: one near-dup of doc 1 (one word changed), one novel
    b2 = pa.table({"doc_id": pa.array([10, 11], pa.int64()),
                   "text": pa.array([
                       base.replace("lazy", "sleepy"),
                       "unrelated poetry about mountains rivers and "
                       "the slow march of glaciers under moonlight"])})
    docs_all = pa.concat_tables([b1, b2])
    got = incremental_near_dup(rd.from_arrow(b2), idx,
                               rd.from_arrow(docs_all),
                               threshold=0.5).take_all()
    pairs = {(r["doc_id_a"], r["doc_id_b"]) for r in got}
    assert pairs == {(10, 1)}
    ev = got[0]
    assert ev["n_common"] > 0 and ev["n_union"] > ev["n_common"]
    assert 2 * ev["n_common"] >= ev["n_union"]

    # append=True folded batch 2 in: batch 3's near-dup of DOC 10
    # (not in batch 1!) is found via the grown index
    b3 = pa.table({"doc_id": pa.array([20], pa.int64()),
                   "text": pa.array([
                       base.replace("lazy", "sleepy")
                           .replace("barn", "shed")])})
    docs_all3 = pa.concat_tables([docs_all, b3])
    got3 = incremental_near_dup(rd.from_arrow(b3), idx,
                                rd.from_arrow(docs_all3),
                                threshold=0.5, append=False).take_all()
    pairs3 = {(r["doc_id_a"], r["doc_id_b"]) for r in got3}
    assert (20, 10) in pairs3 and (20, 1) in pairs3
    # re-probe: identical pair set (no state mutated with append=False)
    got3b = incremental_near_dup(rd.from_arrow(b3), idx,
                                 rd.from_arrow(docs_all3),
                                 threshold=0.5, append=False).take_all()
    assert {(r["doc_id_a"], r["doc_id_b"]) for r in got3b} == pairs3


def test_compact_store_merges_files_and_preserves_semantics(ray_session,
                                                            tmp_path):
    """Three appended batches leave multiple files per bucket;
    compaction merges each bucket to one file, dedups the fingerprint
    rows, and the NEXT batch classifies identically against the
    compacted store."""
    import glob

    import ray.data as rd

    from k_gap_ray.state.fingerprints import (compact_store,
                                              incremental_dedup,
                                              init_fingerprint_store)

    store = str(tmp_path / "fp")
    texts = [["aa bb", "cc dd"], ["ee ff", "aa bb"], ["gg hh"]]
    next_id = 0
    for batch in texts:
        t = pa.table({
            "doc_id": pa.array(range(next_id, next_id + len(batch)),
                               pa.int64()),
            "text": pa.array(batch)})
        next_id += len(batch)
        if next_id == len(texts[0]):
            init_fingerprint_store(rd.from_arrow(t), store)
        else:
            incremental_dedup(rd.from_arrow(t), store)

    before = len(glob.glob(f"{store}/bucket=*/*.parquet"))
    stats = compact_store(store, dedup_cols=("h",))
    after = len(glob.glob(f"{store}/bucket=*/*.parquet"))
    assert stats["files_after"] <= stats["files_before"]
    assert after <= before

    probe = pa.table({"doc_id": pa.array([100, 101], pa.int64()),
                      "text": pa.array(["aa bb", "zz zz"])})
    got = {r["doc_id"]: r["status"] for r in
           incremental_dedup(rd.from_arrow(probe), store,
                             append=False).take_all()}
    assert got == {100: "dup_store", 101: "novel"}


def test_probe_paths_prune_to_touched_buckets(ray_session, tmp_path):
    """A one-doc probe against a multi-bucket store reads only the
    bucket files its fingerprint hashes into (the O(touched) claim),
    and an all-novel batch whose bucket dir doesn't exist yet skips
    it without error."""
    import ray.data as rd

    from k_gap_ray.state.fingerprints import (_hash_batch, _probe_paths,
                                              incremental_dedup,
                                              init_fingerprint_store)

    store = str(tmp_path / "fp")
    corpus = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array([f"document number {i} body" for i in range(40)])})
    init_fingerprint_store(rd.from_arrow(corpus), store)

    probe = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["document number 0 body"])})
    hashed = rd.from_arrow(_hash_batch(probe, "text", "doc_id", None, 16))
    paths = _probe_paths(store, hashed, "bucket")
    assert len(paths) >= 1
    assert all(p.endswith(".parquet") for p in paths)
    # exactly the one bucket this fingerprint hashes into
    assert len({p.split("bucket=")[1].split("/")[0] for p in paths}) == 1
    # and the probe still classifies correctly through the pruned read
    got = {r["doc_id"]: r["status"] for r in
           incremental_dedup(rd.from_arrow(probe), store,
                             append=False).take_all()}
    assert got == {0: "dup_store"}


def test_stores_persist_bucket_counts(ray_session, tmp_path):
    """Both persisted stores record their bucket count and probe with
    it even when the caller passes nothing (wrong-mapping hazard
    closed for every bucketed store in round 5)."""
    import glob

    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.state.fingerprints import (incremental_dedup,
                                              incremental_near_dup,
                                              init_band_index,
                                              init_fingerprint_store)

    docs = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array([f"alpha beta gamma delta {i % 4}"
                          for i in range(8)], pa.string())})
    fp = str(tmp_path / "fp5")
    init_fingerprint_store(rd.from_arrow(docs), fp, n_buckets=5)
    dirs = {int(p.rsplit("=", 1)[1]) for p in glob.glob(f"{fp}/bucket=*")}
    assert dirs and max(dirs) < 5
    # probe WITHOUT repeating n_buckets: persisted count must win
    out = incremental_dedup(rd.from_arrow(docs), fp, append=False)
    statuses = {r["status"] for r in out.take_all()}
    assert statuses == {"dup_store"}  # every fingerprint already stored

    band = str(tmp_path / "band5")
    init_band_index(rd.from_arrow(docs.slice(0, 4)), band, n_buckets=7)
    bdirs = {int(p.rsplit("=", 1)[1])
             for p in glob.glob(f"{band}/bucket=*")}
    assert bdirs and max(bdirs) < 7
    pairs = incremental_near_dup(rd.from_arrow(docs.slice(4, 4)), band,
                                 rd.from_arrow(docs), append=False)
    # docs 4..7 repeat the texts of 0..3 exactly (and all fixture
    # texts share 2/4 shingles, exactly the 0.5 threshold): the probe
    # through the persisted 7-bucket mapping must find every exact
    # twin (doc i vs i-4, n_common == n_union) among the 4x4 matches
    rows = pairs.take_all()
    assert len(rows) == 16
    twins = {(r["doc_id_a"], r["doc_id_b"]) for r in rows
             if r["n_common"] == r["n_union"]}
    assert twins == {(i + 4, i) for i in range(4)}
