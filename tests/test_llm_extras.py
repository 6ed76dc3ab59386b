"""Invariant pins for llm_extras.py (exact values are pinned by the
DuckDB oracles; these pin semantics and edge behavior)."""

import pytest

from data_wrangler_spark.registry import REGISTRY


def test_repetition_fractions_bounded_and_consistent(spark, sf_dir):
    rows = REGISTRY["q_text_repetition"].run(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_distinct <= r.n_grams
        assert 0.0 <= r.dup_frac < 1.0
        assert r.top_frac >= 1.0 / r.n_grams
        assert r.is_repetitive == (r.dup_frac > 0.2)


def test_repetition_flags_looping_text(spark, tmp_path):
    """A document that repeats one phrase must flag; a no-repeat
    document must not."""
    rows = [
        (1, " ".join(["spam ham"] * 50)),  # 'ham spam'/'spam ham' loops
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in REGISTRY["q_text_repetition"].run(spark, str(tmp_path)).collect()}
    assert got[1].is_repetitive and got[1].dup_frac > 0.9
    assert not got[2].is_repetitive and got[2].dup_frac == 0.0


def test_ngram_lm_probabilities(spark, sf_dir):
    import math

    rows = REGISTRY["q_ngram_lm"].run(spark, sf_dir).collect()
    assert rows
    by_w1 = {}
    for r in rows:
        assert r.c12 >= 3
        assert r.c12 <= r.c1
        assert r.p_micro == math.floor(r.c12 * 1_000_000 / r.c1)
        by_w1.setdefault(r.w1, 0)
        by_w1[r.w1] += r.c12
    # emitted continuations never exceed the continuation total
    for w1, s in by_w1.items():
        c1 = next(r.c1 for r in rows if r.w1 == w1)
        assert s <= c1


def test_mix_temperature_allocation(spark, sf_dir):
    from data_wrangler_spark.operators.llm_extras import MIX_BUDGET

    rows = REGISTRY["q_mix_temperature"].run(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    assert sum(r.target_docs for r in rows) <= MIX_BUDGET
    # temperature flattens: weight order follows count order, but
    # share ratios are damped below count ratios
    rs = sorted(rows, key=lambda r: r.n_docs)
    for a, b in zip(rs, rs[1:]):
        assert a.w_micro <= b.w_micro
        if a.n_docs > 0 and b.n_docs > a.n_docs:
            assert b.w_micro / a.w_micro < b.n_docs / a.n_docs + 1e-9


def test_hard_negatives_shape(spark, sf_dir):
    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.operators.llm_extras import HN_K, HN_N_QUERIES

    rows = REGISTRY["q_hard_negatives"].run(spark, sf_dir).collect()
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    anchors = sorted(labels)[:HN_N_QUERIES]
    per_q = {}
    for r in rows:
        assert labels[r.vec_id] != labels[r.query_id]  # genuinely negative
        assert -1.0 - 1e-9 <= r.cos_sim <= 1.0 + 1e-9
        per_q.setdefault(r.query_id, []).append(r.cos_sim)
    assert sorted(per_q) == anchors
    for sims in per_q.values():
        assert len(sims) == HN_K


def test_doc_lm_score_orders_rare_continuations_below_common(spark, tmp_path):
    """Under the corpus bigram model, a document built from the
    DOMINANT continuation of an ambiguous context must outscore one
    built from the RARE continuation of the same context."""
    rows = (
        # context "go" continues to "fast" 9x for every 1x "slow"
        [(i, "go fast") for i in range(90)]
        + [(200 + i, "go slow") for i in range(10)]
        + [(300, " ".join(["go fast"] * 5))]
        + [(301, " ".join(["go slow"] * 5))]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in REGISTRY["q_doc_lm_score"].run(spark, str(tmp_path)).collect()}
    assert got[300].avg_lp_micro > got[301].avg_lp_micro
    # all log-probs are ≤ 0; totals follow
    for r in got.values():
        assert r.sum_lp_micro <= 0 and r.n_bigrams > 0


def test_substring_dedup_finds_shared_passage(spark, tmp_path):
    """Two documents sharing one long passage must each report a span
    covering exactly that passage; unique text must not flag."""
    shared = " ".join(f"s{i}" for i in range(12))  # 12-token passage
    rows = [
        (1, f"u1a u1b u1c {shared} u1d u1e u1f u1g u1h"),
        (2, f"v1a v1b {shared} v1c v1d v1e v1f v1g v1h v1i"),
        (3, " ".join(f"w{i}" for i in range(30))),  # all unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {}
    for r in REGISTRY["q_dedup_substring"].run(spark, str(tmp_path)).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end, r.span_tokens))
    assert 3 not in got
    # doc 1: shared passage occupies tokens 4..15 (1-based)
    assert got[1] == [(4, 15, 12)]
    # doc 2: tokens 3..14
    assert got[2] == [(3, 14, 12)]


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_vocab_coverage"].run(spark, sf_dir).collect(),
        key=lambda r: r.vocab_size,
    )
    assert [r.vocab_size for r in rows] == [64, 128, 256, 512]
    for a, b in zip(rows, rows[1:]):
        assert a.covered_tokens <= b.covered_tokens
        assert a.coverage <= b.coverage <= 1.0
    assert rows[0].coverage > 0


def test_embed_quantize_roundtrip_bounded(spark, sf_dir):
    """Codes are in [0, 255]; the max reconstruction error cannot
    exceed half a quantization step (plus micro rounding)."""
    rows = REGISTRY["q_embed_quantize"].run(spark, sf_dir).collect()
    assert rows
    for r in rows:
        codes = [int(c) for c in r.codes.split(",")]
        assert all(0 <= c <= 255 for c in codes)
        step_micro = (r.hi_micro - r.lo_micro) / 255.0
        assert r.max_err_micro <= step_micro / 2 + 2

def test_dsir_selects_target_style_regardless_of_label(spark, tmp_path):
    """DSIR's defining property: selection follows CONTENT, not the
    label that defined the target split. A doc labeled outside the
    target but written in target-style n-grams must be selected; a
    doc in raw style must not."""
    en = "the cat sat on the mat and the dog ran to the park"
    xx = "zork blarg quux fizz grok splat wibble beep"
    rows = (
        [(i, en, "en", "s0", len(en)) for i in range(20)]
        + [(100 + i, xx, "xx", "s1", len(xx)) for i in range(20)]
        # content-en, labeled xx: must be selected anyway
        + [(300, en, "xx", "s1", len(en))]
        # content-xx, labeled en: must NOT be selected
        + [(301, xx, "en", "s0", len(xx))]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r for r in REGISTRY["q_dsir_select"].run(spark, str(tmp_path)).collect()}
    assert got[300].selected and not got[300].is_target
    assert not got[301].selected and got[301].is_target
    # the pure-style populations land on their own sides
    assert all(got[i].selected for i in range(20))
    assert not any(got[100 + i].selected for i in range(20))
    # score identities: avg is the floored mean of the integer sum
    import math
    for r in got.values():
        assert r.avg_lw_micro == math.floor(r.sum_lw_micro / r.n_grams)
        assert r.selected == (r.avg_lw_micro > 0)

def test_dsir_resample_is_gumbel_topk_of_select_scores(spark, sf_dir):
    """The resampler must equal an independent pure-Python Gumbel
    top-k over q_dsir_select's (oracle-verified) per-doc weights:
    same seeded uniforms (hashlib md5), same double-squeezed
    -ln(-ln(u)), same (key desc, doc_id) order."""
    import hashlib
    import math

    import numpy as np

    from data_wrangler_spark.operators.llm_extras import DSIR_SAMPLE_K

    weights = {
        r.doc_id: r.sum_lw_micro
        for r in REGISTRY["q_dsir_select"].run(spark, sf_dir).collect()
    }

    def gumbel_micro(doc_id):
        h = int(hashlib.md5(f"{doc_id}#7".encode()).hexdigest()[:15], 16)
        u = ((h >> 7) + 1) / float(1 << 54)
        nl = float(np.float32(-math.log(u)))
        return math.floor(float(np.float32(-math.log(nl))) * 1_000_000)

    keyed = sorted(
        ((w + gumbel_micro(d), d) for d, w in weights.items()),
        key=lambda t: (-t[0], t[1]),
    )
    expected = [
        (d, weights[d], gumbel_micro(d), k, i + 1)
        for i, (k, d) in enumerate(keyed[:DSIR_SAMPLE_K])
    ]
    got = [
        (r.doc_id, r.sum_lw_micro, r.gumbel_micro, r.key_micro, r.rk)
        for r in sorted(
            REGISTRY["q_dsir_resample"].run(spark, sf_dir).collect(),
            key=lambda r: r.rk,
        )
    ]
    assert got == expected
    assert len(got) == DSIR_SAMPLE_K

def test_dsir_lw_expr_survives_past_int64_products(spark):
    """The smoothed-ratio factors widen to double BEFORE multiplying:
    with counts x totals whose integer product exceeds 2^63 the
    expression must return a finite weight, not an ANSI overflow."""
    from data_wrangler_spark.operators.llm_extras import _dsir_lw_expr
    from pyspark.sql import functions as F

    row = spark.createDataFrame(
        [(10_000_000, 3, 1_000_000_000_000, 2_000_000_000_000)],
        "ct long, cr long, nt long, nr long",
    )
    got = row.select(
        _dsir_lw_expr(F.col("ct"), F.col("cr"), F.col("nt"), F.col("nr"))
    ).collect()[0]["lw_micro"]
    # (ct+1)*(nr+B) ~ 2e19 > 2^63; weight ~ ln(1e7/4 * 2) ~ 15.4
    assert isinstance(got, int) and 14_000_000 < got < 17_000_000


def test_dsir_weight_vector_empty_fit_split_raises_clearly(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_wrangler_spark.operators.llm_extras import dsir_weight_vector

    df = spark.createDataFrame(
        [(1, "two words", "en", "s0", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    with pytest.raises(ValueError, match="fit split is empty"):
        dsir_weight_vector(spark, str(tmp_path), F.lit(False))


def test_dsir_exemplar_fit_disagrees_with_lang_fit(spark, sf_dir):
    """VERDICT r15 #4: the estimator is predicate-generic — fitting
    on the exemplar slice (source = src0) selects documents the
    language fit MISSES (and vice versa), so the exemplar op is a
    genuinely different selector, not a relabeling. Doc 40 at
    sf0.001 is one such: exemplar-selected, lang-rejected."""
    from data_wrangler_spark.registry import REGISTRY

    lang = {
        r.doc_id
        for r in REGISTRY["q_dsir_select"].run(spark, sf_dir).collect()
        if r.selected
    }
    ex = {
        r.doc_id
        for r in REGISTRY["q_dsir_select_exemplar"]
        .run(spark, sf_dir)
        .collect()
        if r.selected
    }
    missed_by_lang = ex - lang
    assert missed_by_lang, "exemplar fit must select docs the lang fit misses"
    assert lang - ex, "and the lang fit must select docs the exemplar fit misses"
    if sf_dir.rstrip("/").endswith("sf0.001"):
        assert 40 in missed_by_lang
