"""Sequence packing (functions/packing.py): global token prefix sum via
the deterministic two-stage block scheme, chunked into fixed-length
training sequences. No counterpart in the reference (a single-document
JSON validator) — LLM-training-data tier."""

import pytest
from pyspark.sql import functions as F

from jsonschemaparse_spark.functions.packing import pack_sequences, pack_stats


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_hand_computed(spark):
    # stream: [0,5) [5,12) [12,12) [12,30) with seq_len 8
    rows = [(1, 5), (2, 7), (3, 0), (4, 18)]
    out = {r.doc_id: r for r in
           pack_sequences(_mk(spark, rows), "doc_id", "n_tokens", 8).collect()}
    assert (out[1].start_token, out[1].seq_first, out[1].seq_last) == (0, 0, 0)
    assert (out[2].start_token, out[2].seq_first, out[2].seq_last) == (5, 0, 1)
    # zero-count doc sits at its boundary point
    assert (out[3].start_token, out[3].seq_first, out[3].seq_last) == (12, 1, 1)
    assert (out[4].start_token, out[4].seq_first, out[4].seq_last) == (12, 1, 3)


def test_pack_null_and_negative_counts_clamp_to_zero(spark):
    rows = [(1, 4), (2, None), (3, -7), (4, 4)]
    out = {r.doc_id: r for r in
           pack_sequences(_mk(spark, rows), "doc_id", "n_tokens", 4).collect()}
    assert out[2].start_token == 4 and out[3].start_token == 4
    assert out[4].start_token == 4
    assert (out[4].seq_first, out[4].seq_last) == (1, 1)


def test_pack_invariant_to_blocks_and_partitioning(spark):
    """The determinism contract: output is a pure function of
    (id, count) — identical across n_blocks choices and layouts."""
    rows = [(i * 3 + 1, (i * 7) % 13) for i in range(200)]  # sparse ids
    df = _mk(spark, rows)
    base = sorted(map(tuple, pack_sequences(df, "doc_id", "n_tokens", 16,
                                            n_blocks=4).collect()))
    for variant in [
        pack_sequences(df.repartition(13), "doc_id", "n_tokens", 16, n_blocks=4),
        pack_sequences(df.coalesce(1), "doc_id", "n_tokens", 16, n_blocks=97),
        pack_sequences(df.orderBy(F.desc("doc_id")), "doc_id", "n_tokens", 16,
                       n_blocks=1),
    ]:
        assert sorted(map(tuple, variant.collect())) == base


def test_pack_no_single_partition_window(spark):
    """Scale shape: the cumsum window partitions by the block key — the
    plan must NOT contain a SinglePartition exchange (the serial global
    window a naive orderBy-only Window produces)."""
    df = _mk(spark, [(i, 1) for i in range(50)])
    plan = pack_sequences(df, "doc_id", "n_tokens", 8, n_blocks=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_empty_frame(spark):
    out = pack_sequences(_mk(spark, []), "doc_id", "n_tokens", 8)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_tokens", "start_token",
                           "seq_first", "seq_last"]


def test_pack_rejects_bad_seq_len(spark):
    with pytest.raises(ValueError):
        pack_sequences(_mk(spark, [(1, 1)]), "doc_id", "n_tokens", 0)


def test_pack_stats(spark):
    rows = [(1, 5), (2, 7), (3, 0), (4, 18)]  # 30 tokens, seq_len 8
    packed = pack_sequences(_mk(spark, rows), "doc_id", "n_tokens", 8)
    s = pack_stats(packed, "n_tokens", 8).first()
    assert (s.n_docs, s.total_tokens, s.n_sequences) == (4, 30, 4)
    assert s.n_boundary_docs == 2  # docs 2 and 4 straddle boundaries


def test_export_shards_contiguous_ranges(spark, tmp_path):
    """Shards partition the token stream into contiguous, disjoint
    ranges; every doc appears exactly once, in stream order within its
    shard file."""
    import glob

    from jsonschemaparse_spark.functions.packing import export_shards

    rows = [(i, (i * 5) % 11 + 1) for i in range(300)]
    packed = pack_sequences(_mk(spark, rows), "doc_id", "n_tokens", 16)
    out = str(tmp_path / "shards")
    export_shards(packed, out, n_shards=4)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    seen, ranges = [], []
    for f in files:
        rows_f = spark.read.parquet(f).collect()
        ids = [r.doc_id for r in rows_f]
        assert ids == sorted(ids)          # stream order inside the shard
        seen.extend(ids)
        starts = [r.start_token for r in rows_f]
        ranges.append((min(starts), max(starts)))
    assert sorted(seen) == [r[0] for r in rows]   # exactly once each
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo                 # disjoint contiguous ranges


def test_shard_manifest_totals_and_checksum(spark, tmp_path):
    import glob

    from jsonschemaparse_spark.functions.packing import (
        export_shards,
        shard_manifest,
    )

    rows = [(i, (i * 7) % 9 + 1) for i in range(200)]
    packed = pack_sequences(_mk(spark, rows), "doc_id", "n_tokens", 16)
    out = str(tmp_path / "shards_m")
    export_shards(packed, out, n_shards=3)

    man = shard_manifest(spark, out).collect()
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(man) == len(files)
    assert sum(r["n_docs"] for r in man) == 200
    assert sum(r["n_tokens"] for r in man) == sum(n for _, n in rows)
    # shard token ranges tile the stream [0, total)
    spans = sorted((r["first_token"], r["last_token_excl"]) for r in man)
    assert spans[0][0] == 0
    assert spans[-1][1] == sum(n for _, n in rows)
    # order-insensitive checksum: identical re-export verifies equal
    out2 = str(tmp_path / "shards_m2")
    export_shards(packed.repartition(7), out2, n_shards=3)
    man2 = shard_manifest(spark, out2).collect()
    assert (sorted(r["content_hash"] for r in man)
            != [] and sum(r["content_hash"] for r in man)
            == sum(r["content_hash"] for r in man2))
    # a dropped row changes the aggregate checksum
    broken = packed.filter(F.col("doc_id") != 7)
    out3 = str(tmp_path / "shards_m3")
    export_shards(broken, out3, n_shards=3)
    man3 = shard_manifest(spark, out3).collect()
    assert (sum(r["content_hash"] for r in man3)
            != sum(r["content_hash"] for r in man))
