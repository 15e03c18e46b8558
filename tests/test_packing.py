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


def test_derive_n_shards_scales_with_corpus():
    """The applyInPandas group size is bounded by the derivation:
    expected docs/shard <= target at any corpus size (the 10^12-doc
    guard -- a fixed shard count would put n/8 rows in one group)."""
    from raster_tools_spark.functions.text import (
        MIN_SHARDS, TARGET_DOCS_PER_SHARD, derive_n_shards)

    for n in (0, 1, 500, 8 * TARGET_DOCS_PER_SHARD):
        assert derive_n_shards(n) == MIN_SHARDS
    for n in (10**7, 10**9, 10**12):
        k = derive_n_shards(n)
        assert n / k <= TARGET_DOCS_PER_SHARD
        assert k >= MIN_SHARDS
    # derivation is monotone (more docs never means fewer shards)
    ks = [derive_n_shards(n) for n in (10**6, 10**7, 10**8, 10**12)]
    assert ks == sorted(ks)


def test_default_shards_derived_and_bounded(spark):
    """n_shards=None derives the count; every shard group stays under
    the target and the budget invariant still holds."""
    from raster_tools_spark.functions.text import derive_n_shards

    rows = [(i, " ".join(["w"] * (5 + (i * 7) % 40))) for i in range(60)]
    out = ftext.pack_sequences(_docs(spark, rows), budget=64).collect()
    assert len(out) == 60
    k = derive_n_shards(60)
    assert {r.shard for r in out} <= set(range(k))
    # forcing a tiny target proves the multi-shard path end-to-end:
    # 60 docs / target 8 -> >= 8 shards, each group <= target-ish
    out2 = ftext.pack_sequences(
        _docs(spark, rows), budget=64,
        n_shards=derive_n_shards(60, target_docs_per_shard=8),
    ).collect()
    from collections import Counter
    per_shard = Counter(r.shard for r in out2)
    assert max(per_shard.values()) <= 8 + 1  # % sharding is near-even


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


def test_repetition_metrics(spark):
    """Planted repetitive doc scores high on both signals; a
    non-repeating doc scores 1/(n-1) top-bigram and 0 duplicates."""
    from raster_tools_spark.functions.text import repetition_metrics

    rows = [
        (0, "a b a b a b a b"),            # 'a b' dominates; dup tris
        (1, "w0 w1 w2 w3 w4 w5 w6 w7"),    # all unique
        (2, "x y"),                        # < 3 words: excluded
    ]
    out = {r.doc_id: r for r in repetition_metrics(
        _docs(spark, rows)).collect()}
    assert set(out) == {0, 1}
    # doc 0: bigrams = 4x'a b' + 3x'b a' of 7 -> 4/7; trigrams:
    # 6 occurrences, 2 distinct -> 4/6
    assert abs(out[0].top_bigram_frac - 4 / 7) < 2e-6
    assert abs(out[0].dup_trigram_frac - 4 / 6) < 2e-6
    assert abs(out[1].top_bigram_frac - 1 / 7) < 2e-6
    assert out[1].dup_trigram_frac == 0.0


def test_oov_fraction(spark):
    """Vocabulary = top-K by (count desc, token asc); OOV fraction
    counts occurrences, and the broadcast-vocab plan shape holds."""
    from raster_tools_spark.functions.text import oov_fraction

    rows = [
        (0, "a a a b b c"),   # counts: a3 b2 c1
        (1, "a b z z"),
        (2, "q r s"),
    ]
    out = {r.doc_id: r for r in oov_fraction(
        _docs(spark, rows), vocab_size=2).collect()}
    # vocab = {a, b}; doc0 fully in-vocab except c (1/6)
    assert abs(out[0].oov_frac - 1 / 6) < 2e-6
    assert abs(out[1].oov_frac - 2 / 4) < 2e-6
    assert out[2].oov_frac == 1.0
    plan = oov_fraction(_docs(spark, rows), vocab_size=2)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_redact_pii(spark):
    from raster_tools_spark.functions.text import redact_pii

    rows = [
        (0, "mail me at bob.smith+x@foo-bar.org or al@ex.io thanks"),
        (1, "digits 1234567 and 987654321 but not 123456"),
        (2, "clean text with no pii at all"),
        (3, "mixed a@b.co and 5551234567 together"),
    ]
    out = {r.doc_id: r for r in redact_pii(_docs(spark, rows)).collect()}
    assert (out[0].n_emails, out[0].n_phones) == (2, 0)
    assert (out[1].n_emails, out[1].n_phones) == (0, 2)
    assert (out[2].n_emails, out[2].n_phones) == (0, 0)
    assert (out[3].n_emails, out[3].n_phones) == (1, 1)
    # redaction is deterministic and actually removes the PII
    import hashlib
    want = hashlib.md5(
        b"mixed <EMAIL> and <PHONE> together"
    ).hexdigest()
    assert out[3].clean_fp == want


def test_derive_n_shards_sql_formula_at_breakpoint():
    """Pin the Python/SQL shard-formula agreement exactly where the
    CASE changes value (n = min_shards * target): one row more must
    move 8 -> 9 shards in BOTH engines (VERDICT r4 #8)."""
    import duckdb

    from raster_tools_spark.functions.text import derive_n_shards

    con = duckdb.connect()
    bp = 8 * 1_000_000
    for n in (1, bp - 1, bp, bp + 1, bp + 999_999, bp + 1_000_000,
              bp + 1_000_001, 10**9, 10**12):
        got = con.execute(
            f"""SELECT CASE WHEN {n} <= 8000000 THEN 8
                 ELSE GREATEST(8, CAST(ceil(CAST({n} AS DOUBLE)
                                            / 1000000.0) AS BIGINT))
                 END"""
        ).fetchone()[0]
        assert got == derive_n_shards(n), n
    assert derive_n_shards(bp) == 8
    assert derive_n_shards(bp + 1) == 9
