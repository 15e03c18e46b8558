"""Greedy sequence packing: budget invariant and shard isolation."""

import pandas as pd

from raster_tools_spark.functions import text as ftext


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        schema="doc_id long, text string",
    )


def test_budget_invariant_and_order(spark):
    rows = [(i, " ".join(["w"] * (5 + (i * 7) % 40))) for i in range(60)]
    out = ftext.pack_sequences(
        _docs(spark, rows), budget=64, n_shards=4
    ).collect()
    assert len(out) == 60
    by_pack = {}
    for r in out:
        by_pack.setdefault((r.shard, r.pack_id), []).append(r)
    for (_, _), docs in by_pack.items():
        total = sum(r.n_tokens for r in docs)
        # a pack only exceeds the budget when it holds ONE oversized doc
        assert total <= 64 or len(docs) == 1
    # packs fill in doc_id order within a shard: pack ids are
    # non-decreasing as doc_id grows
    for shard in {r.shard for r in out}:
        seq = sorted(
            (r for r in out if r.shard == shard), key=lambda r: r.doc_id
        )
        packs = [r.pack_id for r in seq]
        assert packs == sorted(packs)


def test_oversized_doc_gets_own_pack(spark):
    rows = [(0, " ".join(["w"] * 10)), (1, " ".join(["w"] * 200)),
            (2, " ".join(["w"] * 10))]
    out = {r.doc_id: r for r in ftext.pack_sequences(
        _docs(spark, rows), budget=64, n_shards=1
    ).collect()}
    assert out[1].pack_id not in (out[0].pack_id, out[2].pack_id)
    assert out[0].pack_id != out[2].pack_id or (
        out[0].n_tokens + out[2].n_tokens <= 64
    )
