"""Behavioral tests for the training-data-pipeline operators that the
oracle comparison can't fully cover: multimodal mapInPandas plumbing,
ANN recall vs brute force, and minhash actually catching the real
near-duplicates planted at sf0.1."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_tutorial_spark.operators import similarity as S
from flink_tutorial_spark.operators.dedup import minhash_lsh_dedup, ngram_jaccard_pairs
from flink_tutorial_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    sample_frames,
)
from flink_tutorial_spark.session import load_table


def test_multimodal_decode_plumbing(spark, sf_dir):
    media = attach_payload(load_table(spark, sf_dir, "documents").limit(50))
    decoded = decode_media(media)
    rows = decoded.collect()
    assert len(rows) == 50
    assert all(r.payload_bytes > 0 and r.width >= 64 and r.n_frames >= 1 for r in rows)
    # deterministic: same input -> same fake dims
    again = {r.doc_id: (r.width, r.height) for r in decode_media(media).collect()}
    assert all((r.width, r.height) == again[r.doc_id] for r in rows)


def test_frame_sampling_explodes_per_frame(spark, sf_dir):
    media = attach_payload(load_table(spark, sf_dir, "documents").limit(10))
    frames = sample_frames(decode_media(media), every=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc, idxs in by_doc.items():
        assert idxs == list(range(0, max(idxs) + 1, 2))


def test_topk_numpy_equals_expr_variant(spark, sf_dir):
    from flink_tutorial_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    a = {(r.query_id, r.neighbor_id, r.rank) for r in S.brute_force_topk(emb, q, k=3).collect()}
    b = {(r.query_id, r.neighbor_id, r.rank) for r in S.brute_force_topk_expr(emb, q, k=3).collect()}
    assert a == b


def test_hll_uv_within_tolerance(spark, sf_dir):
    # UniqueVisitorWithBloom replacement: approx_count_distinct must sit
    # within its configured rsd of the exact distinct count
    from flink_tutorial_spark import plans

    exact = {
        r.day: r.uv for r in plans.REGISTRY["pv_uv_daily"].fn(spark, sf_dir).collect()
    }
    approx = {
        r.day: r.uv_approx
        for r in plans.REGISTRY["uv_approx_distinct"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for day, uv in exact.items():
        assert abs(approx[day] - uv) <= max(3, 0.05 * uv), (day, uv, approx[day])


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id) for r in S.brute_force_topk(emb, q, k=3).collect()
    }
    # random 64-dim corpus: top neighbors are weak (cos ~0.5), so use the
    # wider-recall configuration: 4 bits + multi-probe radius 1.
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_topk(
            emb, q, k=3, bit_dims=(1, 17, 33, 49), probe_radius=1
        ).collect()
    }
    covered = {q for q, _ in approx}
    assert len(covered) == 20, f"multi-probe should cover all queries: {len(covered)}"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"suspiciously low multi-probe LSH recall {recall}"


@pytest.mark.slow
def test_minhash_catches_planted_neardups_sf01(spark):
    sf = "/root/testdata/sf0.1"
    docs = load_table(spark, sf, "documents")
    exact_pairs = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.95).collect()
    }
    assert exact_pairs, "sf0.1 should contain planted near-duplicates"
    mh_pairs = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_dedup(docs, threshold=0.5).collect()
    }
    caught = len(exact_pairs & mh_pairs) / len(exact_pairs)
    assert caught >= 0.9, f"minhash missed too many true near-dups: {caught}"


def test_resize_media_binary_roundtrip(spark):
    # binary in -> binary out through mapInPandas: payloads truncate to
    # the target, shorter ones pass through whole
    from flink_tutorial_spark.operators.multimodal import attach_payload, resize_media

    docs = spark.createDataFrame(
        [(1, "x" * 300), (2, "short")], ["doc_id", "text"]
    )
    out = {r.doc_id: (bytes(r.payload), r.n_bytes) for r in
           resize_media(attach_payload(docs), target_bytes=128).collect()}
    assert out[1][1] == 128 and out[1][0] == b"x" * 128
    assert out[2][1] == 5 and out[2][0] == b"short"


def test_minhash_hot_band_guard(spark):
    # a degenerate bucket (identical boilerplate docs) above the cap is
    # dropped before the pair join; pairs in cold buckets still emit
    words = " ".join(f"w{i}" for i in range(12))
    boiler = [(i, words) for i in range(12)]
    near = [
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    docs = spark.createDataFrame(boiler + near, ["doc_id", "text"])

    uncapped = {(r.doc_a, r.doc_b) for r in minhash_lsh_dedup(docs).collect()}
    assert (100, 101) in uncapped
    assert sum(1 for a, b in uncapped if a < 100 and b < 100) == 66  # 12*11/2

    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_dedup(docs, max_band_freq=10).collect()
    }
    assert capped == {(100, 101)}


def test_decode_real_media_headers(spark):
    # real header decode through the live mapInPandas path: PNG, GIF,
    # BMP, JPEG (SOF scan), and a stdlib-generated WAV; unknown bytes
    # keep the deterministic stub (oracle-parity for the text corpus)
    import io
    import struct
    import wave

    png = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"\x00" * 14          # APP0
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"               # SOF0
        + struct.pack(">HH", 480, 640) + b"\x00" * 10
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x00" * 2 * 1000)
    wav = buf.getvalue()
    unknown = b"just some text bytes"

    media = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif)), (3, bytearray(bmp)),
         (4, bytearray(jpeg)), (5, bytearray(wav)), (6, bytearray(unknown))],
        "doc_id long, payload binary",
    ).withColumn("meta", F.struct(F.lit("x").alias("mime"), F.lit(0).cast("long").alias("n_bytes")))

    from flink_tutorial_spark.operators.multimodal import _decode_stub, decode_media

    got = {r.doc_id: (r.width, r.height, r.n_frames) for r in decode_media(media).collect()}
    assert got[1] == (640, 480, 1)
    assert got[2] == (320, 200, 1)
    assert got[3] == (800, 600, 1)
    assert got[4] == (640, 480, 1)
    assert got[5] == (8000, 2, 1000)
    assert got[6] == _decode_stub(unknown)


def test_minhash_16hash_recall_vs_8hash(spark):
    # recall-vs-cost benchmark on borderline pairs (exact shingle
    # Jaccard = 0.5 by construction: 20-word docs sharing a 14-word
    # prefix -> 12 shared / 24 union shingles): 2-row bands collide with
    # prob J^2=0.25, so expected candidate recall is 1-0.75^4 ~ 0.68 at
    # 4 bands vs 1-0.75^8 ~ 0.90 at 8 bands. Deterministic hashing makes
    # the measured values stable: 0.633 vs 0.900 on this corpus.
    words_a = lambda i: [f"p{i}w{j}" for j in range(20)]  # noqa: E731
    rows = []
    for i in range(60):
        a = words_a(i)
        b = a[:14] + [f"p{i}x{j}" for j in range(6)]
        rows.append((2 * i, " ".join(a)))
        rows.append((2 * i + 1, " ".join(b)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    true_pairs = {(2 * i, 2 * i + 1) for i in range(60)}

    m8 = {(r.doc_a, r.doc_b) for r in minhash_lsh_dedup(docs, threshold=0.3).collect()}
    m16 = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_dedup(docs, threshold=0.3, k=16, bands=8).collect()
    }
    recall8 = len(true_pairs & m8) / len(true_pairs)
    recall16 = len(true_pairs & m16) / len(true_pairs)
    assert recall16 >= 0.85, f"16-hash/8-band recall regressed: {recall16}"
    assert recall16 > recall8, (recall8, recall16)


def test_connected_components_transitive(spark):
    # a~b, b~c, no direct a~c pair: all three must land in one component
    # labeled by the min doc id; isolated pair forms its own component
    from flink_tutorial_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (20, 30)], ["doc_a", "doc_b"]
    )
    got = {r.doc_id: r.component_id for r in dedup_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 20: 20, 30: 20}


def test_connected_components_empty_pairs(spark):
    # r20 observe-based convergence: an empty pair graph must terminate
    # on round 1 (the observed changed-count is NULL on an empty write)
    # and return zero components, not loop or raise
    from flink_tutorial_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup_components(pairs).count() == 0


def test_ngram_decontaminate_edges(spark):
    # overlap counts are exact; docs below the threshold or sharing
    # nothing with the benchmark never emit; short docs contribute no
    # shingles at all
    from flink_tutorial_spark.operators.text import ngram_decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # 2 shared
            (2, "completely unrelated words here entirely"),     # 0 shared
            (3, "too short"),                                    # < n words
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox sat and jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.n_overlap for r in
           ngram_decontaminate(corpus, bench, min_overlap=2).collect()}
    # shared 3-grams: "the quick brown", "quick brown fox",
    # "jumps over the", "over the lazy", "the lazy dog" = 5
    assert got == {1: 5}
    none = ngram_decontaminate(corpus, bench.limit(0), min_overlap=1).collect()
    assert none == []  # empty benchmark -> nothing contaminated


def test_repetition_ratio_edges(spark):
    from flink_tutorial_spark.operators.text import repetition_ratio

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c a b c"),  # heavy repetition
            (2, "all distinct words in this document right here"),
            (3, "x y"),  # shorter than n -> ratio 0, keep
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.rep_ratio, r.rep_keep) for r in repetition_ratio(docs).collect()}
    # doc 1: 10 shingles, 3 distinct -> 0.7 ratio, dropped
    assert got[1] == (0.7, False)
    assert got[2] == (0.0, True)
    assert got[3] == (0.0, True)


def test_funnel_stats_stages_and_dedup(spark):
    # duplicates collapse to ONE canonical doc in n_dedup; a text that
    # fails an earlier stage contributes 0 to every later stage (the
    # canonical flag is guarded to kept docs, so a dropped group can
    # never resurrect a doc into n_dedup); tokens_kept coalesces to 0
    # for an all-dropped group
    from flink_tutorial_spark.operators.text import funnel_stats

    good = "the fox is one of the animals and the dog is one of the pets " * 2
    nonen = " ".join(f"wort{i}" for i in range(25))  # 25 words, not en
    docs = spark.createDataFrame(
        [
            (1, good, "en", "s1", len(good)),   # canonical copy
            (2, good, "en", "s1", len(good)),   # dup of 1 -> dropped
            (3, nonen, "de", "s1", len(nonen)),  # passes quality, fails lang
            (4, "tiny", "en", "s2", 4),         # fails quality
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = {r.source: r for r in funnel_stats(docs).collect()}
    s1 = got["s1"]
    assert (s1.n_total, s1.n_quality, s1.n_lang, s1.n_dedup) == (3, 3, 2, 1)
    assert s1.tokens_kept > 0
    s2 = got["s2"]
    assert (s2.n_total, s2.n_quality, s2.n_lang, s2.n_dedup) == (1, 0, 0, 0)
    assert s2.tokens_kept == 0  # coalesce guards the all-dropped group


def test_temperature_rebalance_edges(spark):
    from flink_tutorial_spark.operators.text import temperature_rebalance

    # single domain: c_min == c -> target == c -> hash threshold is
    # always satisfied (h % 1e6 * c < c * 1e6), every doc kept
    uni = spark.createDataFrame(
        [(i, f"text number {i}", "en") for i in range(40)],
        ["doc_id", "text", "lang"],
    )
    out = temperature_rebalance(uni)
    assert out.count() == 40
    assert out.select("n_target").distinct().collect()[0].n_target == 40

    # skewed domains: target math is ceil(sqrt(c_min * c_i)) capped at
    # c_i, and the filter is deterministic across reruns
    skew = spark.createDataFrame(
        [(i, f"doc {i}", "en" if i < 90 else "fr") for i in range(100)],
        ["doc_id", "text", "lang"],
    )
    got = {r.lang: r for r in
           temperature_rebalance(skew).select("lang", "c_lang", "n_target")
           .distinct().collect()}
    assert (got["en"].c_lang, got["en"].n_target) == (90, 30)  # ceil(sqrt(10*90))
    assert (got["fr"].c_lang, got["fr"].n_target) == (10, 10)
    a = sorted(r.doc_id for r in temperature_rebalance(skew).collect())
    b = sorted(r.doc_id for r in temperature_rebalance(skew).collect())
    assert a == b and len(a) > 0


def test_boilerplate_ratio_edges(spark):
    from flink_tutorial_spark.operators.text import boilerplate_ratio

    shared = "this exact header appears in many documents"
    docs = spark.createDataFrame(
        [(i, shared + f" u{i}a u{i}b u{i}c") for i in range(4)]
        + [(99, "totally fresh content nobody else shares at all"),
           (100, "ab cd")],  # < 3 words -> no shingles -> 0.0, keep
        ["doc_id", "text"],
    )
    # min_df=4: only shingles fully inside the shared prefix reach df>=4
    got = {r.doc_id: (r.boiler_ratio, r.boiler_keep)
           for r in boilerplate_ratio(docs, min_df=4, keep_below=0.3).collect()}
    assert got[99] == (0.0, True)
    assert got[100] == (0.0, True)
    # templated docs: 10 words -> 8 shingles, the 5 inside the 7-word
    # shared prefix are corpus-common, the 3 touching the unique tail
    # are not -> ratio 5/8, dropped at 0.3
    for i in range(4):
        assert got[i] == (round(5 / 8, 4), False)


def test_ngram_jaccard_strategies_identical(spark):
    """The blocked self-join and the AllPairs prefix-filter strategy
    (Bayardo et al., WWW'07) must produce the identical exact pair set;
    auto-dispatch picks one of them from shingle df stats."""
    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    block = sorted(
        map(tuple, ngram_jaccard_pairs(docs, strategy="block").collect())
    )
    prefix = sorted(
        map(tuple, ngram_jaccard_pairs(docs, strategy="prefix").collect())
    )
    auto = sorted(map(tuple, ngram_jaccard_pairs(docs).collect()))
    assert block == prefix
    assert auto == block
    assert block, "sf0.01 should contain planted near-duplicates"


def test_ngram_jaccard_candidate_budget_breaker(spark):
    """The saturation circuit breaker (r9 sf10 adjudication made
    self-enforcing): a saturated corpus — tiny closed shingle
    vocabulary, so the blocked candidate volume sum(df^2) explodes —
    must trip CandidateBudgetExceeded with the routing advice BEFORE
    any self-join runs; the opt-in lsh-verify route must return a
    subset of the exact pair set with bit-exact jaccard values; and
    the normal corpus under the default budget is untouched."""
    import pytest

    from flink_tutorial_spark.operators.dedup import CandidateBudgetExceeded

    # 60 docs over a 4-word vocabulary: every 3-shingle is shared by
    # ~all docs -> sum(df^2) ~ (docs*shingles)^2 / vocab >> 2000
    sat = spark.createDataFrame(
        [(i, " ".join("abcd"[(i + j) % 4] for j in range(10))) for i in range(60)],
        ["doc_id", "text"],
    )
    with pytest.raises(CandidateBudgetExceeded) as ei:
        ngram_jaccard_pairs(sat, threshold=0.8, candidate_budget=2000)
    assert "minhash_lsh_dedup" in str(ei.value)
    assert ei.value.sum_df2 > 2000 == ei.value.budget

    # the breaker must trip from the stats agg even when a strategy is
    # forced (the user explicitly picking "block" is exactly who needs it)
    with pytest.raises(CandidateBudgetExceeded):
        ngram_jaccard_pairs(
            sat, threshold=0.8, strategy="block", candidate_budget=2000
        )

    # opt-in auto-route: exact scoring on LSH candidates — a subset of
    # the true pair set, every surviving jaccard bit-equal to exact
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            sat, threshold=0.8, candidate_budget=None, strategy="block"
        ).collect()
    }
    routed = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            sat, threshold=0.8, candidate_budget=2000, on_exceed="lsh-verify"
        ).collect()
    }
    assert set(routed) <= set(exact)
    assert routed, "saturated corpus must have LSH-recoverable near-dups"
    for pair, j in routed.items():
        assert j == exact[pair]

    # normal corpus, default budget: breaker silent, result unchanged
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    unguarded = sorted(
        map(tuple, ngram_jaccard_pairs(docs, candidate_budget=None).collect())
    )
    guarded = sorted(map(tuple, ngram_jaccard_pairs(docs).collect()))
    assert guarded == unguarded


def test_chunk_dedup_edges(spark):
    from flink_tutorial_spark.operators.text import chunk_dedup

    docs = spark.createDataFrame(
        [
            # 16 words = 2 chunks of 8, all first-occurrence
            (1, " ".join(f"w{i}" for i in range(16))),
            # exact duplicate of doc 1: retains nothing
            (2, " ".join(f"w{i}" for i in range(16))),
            # second chunk repeats doc 1's first chunk; first chunk fresh
            (3, " ".join(f"x{i}" for i in range(8)) + " "
                + " ".join(f"w{i}" for i in range(8))),
            # shorter than one chunk: still 1 chunk, kept
            (4, "tiny doc"),
            # within-doc repetition: chunk 0 == chunk 1, second copy dropped
            (5, " ".join(f"y{i}" for i in range(8)) + " "
                + " ".join(f"y{i}" for i in range(8))),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in chunk_dedup(docs, chunk_words=8).collect()}
    assert (got[1].n_chunks, got[1].n_kept) == (2, 2)
    assert (got[2].n_chunks, got[2].n_kept) == (2, 0)
    assert (got[3].n_chunks, got[3].n_kept) == (2, 1)
    assert (got[4].n_chunks, got[4].n_kept) == (1, 1)
    assert (got[5].n_chunks, got[5].n_kept) == (2, 1)
    assert got[5].retained_ratio == 0.5


def test_bigram_lm_score_edges(spark):
    import math

    from flink_tutorial_spark.operators.text import bigram_lm_score

    docs = spark.createDataFrame(
        [
            (1, "a b"),        # bigram (a,b)
            (2, "a b"),        # duplicate: same score as doc 1
            (3, "a c"),        # rare transition (a,c): 1 of 3 a-bigrams
            (4, "solo"),       # no bigram: absent from output
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    assert 4 not in got
    # c(a,b)=2, c(a,.)=3 -> ln(2/3); c(a,c)=1 -> ln(1/3)
    assert got[1].avg_logprob == got[2].avg_logprob
    assert got[1].avg_logprob == pytest.approx(math.log(2 / 3), abs=1e-6)
    assert got[3].avg_logprob == pytest.approx(math.log(1 / 3), abs=1e-6)
    assert got[3].avg_logprob < got[1].avg_logprob


def test_dedup_keep_best_prefers_quality_not_min_id(spark):
    """The representative is the best-quality member (uniq-ratio desc,
    doc_id asc), NOT blindly the lowest doc_id: plant a 2-doc near-dup
    cluster where the HIGHER doc_id has the higher uniq ratio and
    assert it wins (ADVICE r7 — the previous sf-data form of this test
    was vacuous)."""
    from flink_tutorial_spark.plans.queries_datapipe import (
        keep_best_representatives,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = spark.createDataFrame(
        [
            # doc 1: base + a repeated prefix -> uniq_ratio 12/15 = 0.8,
            # 3-gram Jaccard vs doc 2 ~ 10/12 -> LSH-paired at 0.5
            (1, base + " alpha beta gamma"),
            # doc 2: all-distinct twin -> uniq_ratio 1.0, larger id
            (2, base),
            # doc 3: unrelated singleton
            (3, "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.component_id: r for r in keep_best_representatives(docs).collect()}
    # the planted cluster is labeled by its min member (1) but KEEPS the
    # higher-quality larger-id member (2)
    assert rows[1].n_members == 2
    assert rows[1].keep_id == 2
    assert rows[1].uniq_ratio == 1.0
    # singleton keeps itself
    assert rows[3].keep_id == 3 and rows[3].n_members == 1


def test_dedup_semantic_clusters_consistent(spark, sf_dir):
    from flink_tutorial_spark.plans.queries_datapipe import dedup_semantic

    rows = dedup_semantic(spark, sf_dir).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    for cid, members in by_comp.items():
        # component label is the cluster minimum and is kept; others not
        assert min(m.vec_id for m in members) == cid
        assert sum(1 for m in members if m.keep) == 1
        assert all(m.n_members == len(members) for m in members)


def test_mixed_lang_detect_edges(spark):
    from flink_tutorial_spark.operators.text import mixed_lang_detect

    en8 = "the a is of and the a is"          # marker-dense chunk
    xx8 = "zz yy xx ww vv uu tt ss"           # marker-free chunk
    docs = spark.createDataFrame(
        [
            (1, en8 + " " + en8),   # monolingual en: 2/2 en chunks
            (2, xx8 + " " + xx8),   # monolingual unknown: 0/2
            (3, en8 + " " + xx8),   # half/half: mixed, ratio 0.5
            (4, en8),               # single chunk: never mixed
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in mixed_lang_detect(docs, chunk_words=8).collect()}
    assert (got[1].n_en, got[1].is_mixed) == (2, False)
    assert (got[2].n_en, got[2].is_mixed) == (0, False)
    assert (got[3].n_en, got[3].is_mixed, got[3].mix_ratio) == (1, True, 0.5)
    assert (got[4].n_chunks, got[4].is_mixed) == (1, False)


def test_bucketed_nn_drops_null_buckets(spark):
    """Vectors with a NULL bucket have no candidate set: they must be
    DROPPED, not pooled into one giant NULL group (Spark groupBy keeps
    NULL keys; the SQL-oracle equi-join drops them — ADVICE r7)."""
    from flink_tutorial_spark.operators.similarity import bucketed_nn

    docs = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, [0.0, 1.0], None),   # NULL bucket: excluded entirely
            (4, [0.1, 0.9], None),   # would pair with 3 if NULLs pooled
        ],
        ["vec_id", "embedding", "label"],
    )
    got = {r.vec_id: r.nn_id for r in bucketed_nn(docs).collect()}
    assert got == {1: 2, 2: 1}


def test_substring_dedup_interval_union(spark):
    """The removed-span ratio counts the UNION of overlapping duplicated
    gram intervals, not their sum; docs shorter than the gram emit zero
    grams; self-repetition within one doc counts as duplication."""
    from flink_tutorial_spark.operators.text import substring_dedup

    w = [f"w{i}" for i in range(8)]
    base = " ".join(w)                       # doc 1: owns every gram
    shifted = " ".join(w[1:] + ["zz"])       # doc 2 shares grams 0..2 of its 4
    docs = spark.createDataFrame(
        [
            (1, base),                        # 5 grams (L=4), all owned
            (2, shifted),                     # grams at pos 0,1,2 dup'd (w1..w4 etc.)
            (3, "a b c"),                     # shorter than L: no grams
            (4, base + " " + base),           # 13 grams; tail repeats head + itself
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in substring_dedup(docs, gram_words=4).collect()}
    assert (got[1].n_grams, got[1].n_dup_grams, got[1].removed_tokens) == (5, 0, 0)
    # doc 2 (8 tokens: w1..w7 zz, 5 grams): grams at pos 0..3 are
    # w[1..4], w[2..5], w[3..6], w[4..7] — all owned by doc 1 (pos 1..4);
    # the pos-4 gram (w5 w6 w7 zz) is unique. Union of the four length-4
    # intervals starting 0,1,2,3 = [0,6] -> 7 of 8 tokens removed.
    assert (got[2].n_grams, got[2].n_dup_grams, got[2].removed_tokens) == (5, 4, 7)
    assert got[2].removed_ratio == 0.875
    assert (got[3].n_grams, got[3].removed_tokens, got[3].removed_ratio) == (0, 0, 0.0)
    # doc 4 = base+base (16 tokens, 13 grams): dup'd are the 5 grams doc 1
    # owns, repeated TWICE (pos 0..4 and 8..12) = 10; the 3 wrap grams
    # (w5 w6 w7 w0 etc. at pos 5..7) occur nowhere earlier and stay owned.
    # Union of starts {0..4, 8..12} with L=4 = [0,7] u [8,15] = all 16.
    assert (got[4].n_grams, got[4].n_dup_grams) == (13, 10)
    assert (got[4].removed_tokens, got[4].removed_ratio) == (16, 1.0)


def test_pii_scrub_patterns(spark):
    """Planted PII: emails, phone-ish numbers, long digit runs redact to
    typed placeholders with correct counts; clean text passes through."""
    from flink_tutorial_spark.operators.text import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@corp.example.org for details"),
            (2, "call +1 415-555-0132 or 020 7946 0958 today"),
            (3, "order 123456789 shipped"),
            (4, "the quick brown fox, room 42"),
            (5, "mail a@b.io ref 99887766"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert got[1].n_emails == 1 and "<EMAIL>" in got[1].text_scrubbed
    assert "bob" not in got[1].text_scrubbed
    assert got[2].n_phones == 2 and got[2].text_scrubbed.count("<PHONE>") == 2
    assert got[3].n_digit_runs == 1 and got[3].text_scrubbed == "order <NUM> shipped"
    assert got[4].pii_clean and got[4].text_scrubbed == got[4].text
    assert (got[5].n_emails, got[5].n_digit_runs) == (1, 1)
    assert got[5].text_scrubbed == "mail <EMAIL> ref <NUM>"


def test_code_prose_mix_detect(spark):
    """Planted code/prose docs: a doc with both a codey chunk and prose
    chunks is flagged mixed; pure prose and pure code are not."""
    from flink_tutorial_spark.operators.text import code_prose_mix_detect

    code8 = "x = arr[i] + f(y) ; { return x*2 } // done |= ok"
    prose8 = "the quick brown fox jumps over the lazy"
    docs = spark.createDataFrame(
        [
            (1, f"{prose8} {code8} {prose8}"),  # mixed
            (2, f"{prose8} {prose8}"),  # pure prose
            (3, " ".join(["a[i]=b{j};"] * 16)),  # pure code
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in code_prose_mix_detect(docs).collect()}
    assert got[1].is_mixed and 0 < got[1].code_ratio < 1
    # 8 + 14 + 8 = 30 words -> ceil(30/8) = 4 chunks; the code block
    # spans chunks 2-3 so 1-2 of them cross the marker threshold
    assert got[1].n_chunks == 4 and 1 <= got[1].n_code <= 2
    assert not got[2].is_mixed and got[2].n_code == 0 and got[2].code_ratio == 0.0
    assert not got[3].is_mixed and got[3].n_code == got[3].n_chunks
    assert got[3].code_ratio == 1.0


def test_code_prose_marker_class_matches_duckdb():
    """The marker char class must count identically under Java regex
    (Spark) and RE2 (DuckDB) — the cross-engine contract that would
    back a catalog oracle on a corpus that has marker chars."""
    import duckdb

    from flink_tutorial_spark.operators.text import CODE_MARKER_CLASS

    samples = [
        "x = arr[i] + f(y) ; { return x*2 }",
        "plain prose only",
        "50% of $100 #tag a@b c\\d /path_name|pipe <tag> 3*3",
    ]
    con = duckdb.connect()
    import re

    for s in samples:
        java_like = len(re.findall(CODE_MARKER_CLASS, s))  # Python re ~ Java here
        duck = con.execute(
            "SELECT len(?) - len(regexp_replace(?, ?, '', 'g'))",
            [s, s, CODE_MARKER_CLASS],
        ).fetchone()[0]
        assert java_like == duck, (s, java_like, duck)


def test_substring_dedup_hot_gram_guard(spark):
    """Hot-gram skew guard: a boilerplate gram repeated across hundreds
    of docs routes to the partial-agg + broadcast-join branch (no
    window sort over the hot hash partition), cold grams keep the
    window path, and the guarded result is IDENTICAL to the unguarded
    one — routing is semantics-free because both branches compute the
    same min-(doc_id, pos) owner."""
    from flink_tutorial_spark.operators.text import substring_dedup

    boiler = " ".join(f"b{i}" for i in range(6))  # 3 grams at L=4, x200 docs
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(1, 201)]
        + [(500, "u1 u2 u3 u4 u5"), (501, "a b c")],
        ["doc_id", "text"],
    )
    guarded = substring_dedup(docs, gram_words=4, hot_gram_cap=50)
    unguarded = substring_dedup(docs, gram_words=4, hot_gram_cap=None)
    assert sorted(map(tuple, guarded.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, unguarded.collect()), key=lambda t: t[0]
    )
    got = {r.doc_id: r for r in guarded.collect()}
    # doc 1 owns the boilerplate; 199 copies fully duplicated
    assert (got[1].n_dup_grams, got[1].removed_tokens) == (0, 0)
    assert (got[2].n_dup_grams, got[2].removed_tokens) == (3, 6)
    assert (got[500].n_dup_grams, got[501].n_grams) == (0, 0)
    # plan shape: hot branch = partial-agg owners + broadcast join-back
    # + union with the cold window — the hot hash never hits a window
    # sort task
    plan = guarded._jdf.queryExecution().explainString(
        guarded.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "Union" in plan
    # the unguarded plan has no hot/cold branch union
    plan_u = unguarded._jdf.queryExecution().explainString(
        unguarded.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Union" not in plan_u


def test_bpe_encode_token_budget_consistency(spark, sf_dir):
    """token_budget's bpe_tokens must equal text_bpe_encode's per-doc
    counts re-aggregated to (source, lang) — both derive from the same
    learned bpe_encoded_vocab, so any drift means the learn loop or the
    encode fold diverged between the two call sites."""
    from flink_tutorial_spark import plans
    from flink_tutorial_spark.session import load_table

    enc = plans.REGISTRY["text_bpe_encode"].fn(spark, sf_dir)
    bud = plans.REGISTRY["datapipe_token_budget"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    from pyspark.sql import functions as F

    per_cell = {
        (r.source, r.lang): r.total
        for r in enc.join(docs, "doc_id")
        .groupBy("source", "lang")
        .agg(F.sum("bpe_tokens").alias("total"))
        .collect()
    }
    got = {(r.source, r.lang): r.bpe_tokens for r in bud.collect()}
    assert got == per_cell and len(got) > 0


def test_repetition_profile_planted(spark, tmp_path):
    """Planted repetition pathologies flag; varied prose does not."""
    import pandas as pd

    import flink_tutorial_spark.plans.queries_datapipe as Q

    tmp = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "spam " * 19 + "spam",                      # one word repeated
                "the cat sat on the mat and then left now", # varied prose
                "buy now " * 9 + "buy now",                 # repeated phrase
            ],
            "source": ["s"] * 3,
            "lang": ["en"] * 3,
        }
    ).to_parquet(f"{tmp}/documents.parquet")
    got = {
        r.doc_id: r
        for r in Q.text_repetition_profile(spark, tmp).collect()
    }
    assert got[1].top_word_share == 1.0 and got[1].is_repetitive
    assert got[3].dup_trigram_frac > 0.8 and got[3].is_repetitive
    assert not got[2].is_repetitive


def test_decontamination_planted(spark, tmp_path):
    """A training doc sharing an 8-gram with a benchmark doc flags with
    the right overlap count; disjoint docs stay clean."""
    import pandas as pd

    import flink_tutorial_spark.plans.queries_datapipe as Q

    tmp = str(tmp_path)
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    leak = "xx yy " + " ".join(bench_text.split()[:8]) + " zz"  # one 8-gram window matches
    pd.DataFrame(
        {
            # doc_id 7 and 14 are benchmark (% 7 == 0)
            "doc_id": [7, 1, 2],
            "text": [bench_text, leak, "totally different words here padded out to be long enough"],
            "source": ["s"] * 3,
            "lang": ["en"] * 3,
        }
    ).to_parquet(f"{tmp}/documents.parquet")
    got = {r.doc_id: r for r in Q.datapipe_decontamination(spark, tmp).collect()}
    assert set(got) == {1, 2}
    assert got[1].contaminated and got[1].n_contaminated == 1
    assert not got[2].contaminated and got[2].n_contaminated == 0


def test_bpe_fold_matches_reference_greedy(spark):
    """The Spark aggregate-fold merge must equal a reference Python
    greedy-leftmost BPE merge on adversarial words (same-char runs,
    overlapping pair positions, multi-round interactions)."""
    from flink_tutorial_spark.operators.text import _bpe_merge_expr

    import pyspark.sql.functions as F

    def ref_merge(tokens, x, y):
        out = []
        i = 0
        while i < len(tokens):
            if i + 1 < len(tokens) and tokens[i] == x and tokens[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(tokens[i])
                i += 1
        return out

    words = [
        "aaaaa", "aaaa", "aaa", "aa", "a",
        "ababab", "aabbaabb", "abba", "baab",
        "hello", "mississippi", "banana", "xyzzy",
    ]
    merges = [("a", "a"), ("a", "b"), ("b", "a"), ("s", "s"), ("an", "a")]
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    toks = F.split(F.col("word"), "")
    expect = {}
    for w in words:
        t = list(w)
        for x, y in merges:
            t = ref_merge(t, x, y)
        expect[w] = t
    expr = toks
    for x, y in merges:
        expr = _bpe_merge_expr(expr, x, y)
    got = {r.word: r.t for r in df.select("word", expr.alias("t")).collect()}
    assert got == expect


def test_urlgov_family_planted_semantics(spark, sf_dir):
    """Domain-governance fixture invariants: the blocklist drops exactly
    the mirror domain's docs (one blocklisted domain absent from the
    fixture must drop nothing), dedup-rate columns reconcile, and the
    quota never exceeds 20 per domain with correctly dense ranks."""
    from flink_tutorial_spark import plans
    from flink_tutorial_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_mirror = docs.where((F.col("doc_id") % 10 >= 3) & (F.col("doc_id") % 10 < 5)).count()

    bl = plans.REGISTRY["urlgov_blocklist"].fn(spark, sf_dir).collect()
    assert sum(r.n_total for r in bl) == n_docs
    assert sum(r.n_blocked for r in bl) == n_mirror
    assert all(r.n_total == r.n_blocked + r.n_kept for r in bl)

    dd = plans.REGISTRY["urlgov_domain_dedup_rate"].fn(spark, sf_dir).collect()
    assert sum(r.n_docs for r in dd) == n_docs
    # planted boilerplate (doc_id % 9 == 5 -> 3 canonical texts) must
    # produce real dup mass and cross-domain sharing
    assert sum(r.n_dup for r in dd) > 0
    assert sum(r.n_cross_dup for r in dd) > 0
    assert all(0 <= r.dup_rate < 1 and r.n_unique <= r.n_docs for r in dd)

    q = plans.REGISTRY["urlgov_domain_quota"].fn(spark, sf_dir).collect()
    per_dom = {}
    for r in q:
        per_dom.setdefault(r.domain, []).append(r.rank)
    for dom, ranks in per_dom.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), dom
        assert len(ranks) <= 20


def test_url_canonicalize_unit(spark):
    """Operator-level contract for url_canonicalize: each planted noise
    class collapses, real params survive, and an already-canonical URL
    is a fixed point."""
    from flink_tutorial_spark.operators.text import url_canonicalize

    rows = [
        ("a", "https://x.com/p"),
        ("b", "https://x.com/p/"),
        ("c", "HTTPS://X.COM/p"),
        ("d", "https://www.x.com/p?utm_source=a&utm_campaign=b"),
        ("e", "https://x.com/p?id=7&ref=rss#frag"),
        ("f", "https://x.com/p?id=7&fbclid=zz"),
        ("g", "https://x.com/p?gclid=1"),
        ("h", "http://www.x.com/p"),
        ("i", "HTTP://X.COM/p?UTM_SOURCE=a"),
        ("j", "https://x.com/P"),
        ("k2", "https://x.com/p?q=Spark"),
    ]
    df = spark.createDataFrame(rows, ["k", "url"])
    got = {r.k: r.canon_url for r in url_canonicalize(df).collect()}
    assert got["a"] == "https://x.com/p"
    assert got["b"] == "https://x.com/p"
    assert got["c"] == "https://x.com/p"
    assert got["d"] == "https://x.com/p"
    assert got["e"] == "https://x.com/p?id=7"
    assert got["f"] == "https://x.com/p?id=7"
    assert got["g"] == "https://x.com/p"
    # scheme-agnostic www strip: the http twin collapses too
    assert got["h"] == "http://x.com/p"
    # tracking keys match case-insensitively even with case preserved
    assert got["i"] == "http://x.com/p"
    # RFC 3986: path case is significant — /P must NOT merge with /p
    assert got["j"] == "https://x.com/P"
    # real param values keep their case
    assert got["k2"] == "https://x.com/p?q=Spark"


def test_urlgov_canonicalize_planted(spark, sf_dir):
    """The hub domain (3 same-host residues per 7-doc path block) must
    show real collapse mass; the mirror (its two variant classes have
    distinct canonical forms) and the 17 small sites (one doc per
    host+path) must show zero — the negative control that proves the
    op never over-merges."""
    from flink_tutorial_spark import plans

    rows = plans.REGISTRY["urlgov_canonicalize"].fn(spark, sf_dir).collect()
    by_dom = {r.domain: r for r in rows}
    hub = by_dom["hub.example.com"]
    assert hub.n_collapsed > 0 and hub.collapse_rate > 0
    for dom, r in by_dom.items():
        assert r.n_canon_distinct <= r.n_raw_distinct <= r.n_urls, dom
        assert r.n_collapsed == r.n_raw_distinct - r.n_canon_distinct, dom
        if dom != "hub.example.com":
            assert r.n_collapsed == 0, dom


def test_temperature_mix_planted(spark, sf_dir):
    """Temperature mixing invariants on the planted 50/30/15/5 skew:
    weights sum to 1 and order by size, the sqrt temperature compresses
    the web:wiki ratio below the raw count ratio, targets never exceed
    availability, and the selection delivers exactly target_n docs."""
    from flink_tutorial_spark import plans

    rows = plans.REGISTRY["datapipe_temperature_mix"].fn(spark, sf_dir).collect()
    by_src = {r.mix_source: r for r in rows}
    assert set(by_src) == {"web", "books", "code", "wiki"}
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    assert by_src["web"].n_docs > by_src["wiki"].n_docs
    assert by_src["web"].weight > by_src["wiki"].weight
    # temperature flattening: weight ratio strictly inside count ratio
    assert (
        by_src["web"].weight / by_src["wiki"].weight
        < by_src["web"].n_docs / by_src["wiki"].n_docs
    )
    for r in rows:
        assert r.target_n <= r.n_docs, r
        assert r.sel_docs == r.target_n, r
        assert (r.sel_tokens > 0) == (r.sel_docs > 0), r
    assert sum(r.target_n for r in rows) <= 200


def test_value_drift_psi_planted(spark, sf_dir):
    """Exactly the planted type drifts: click (values shifted x1.6+40
    in the current window) must flag with PSI > 0.2; every undrifted
    type stays well under; window totals reconcile to the corpus."""
    from flink_tutorial_spark import plans
    from flink_tutorial_spark.session import load_table

    rows = plans.REGISTRY["value_drift_psi"].fn(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_ref + r.n_cur for r in rows) == n_events
    by_type = {r.event_type: r for r in rows}
    assert by_type["click"].drifted == 1 and by_type["click"].psi > 0.2
    for t, r in by_type.items():
        if t != "click":
            assert r.drifted == 0 and r.psi < 0.1, t


def test_url_canonicalize_differential_random(spark):
    """Differential test: the Spark column pipeline must agree with an
    independent pure-Python canonicalizer on a seeded random grid of
    URLs composed from hosts x paths x query-param soups x fragments x
    case/www/slash noise (the r9/r10 lesson: randomized equivalence
    catches what hand-picked goldens miss)."""
    import random
    import re as _re

    from flink_tutorial_spark.operators.text import url_canonicalize

    def py_canon(url: str) -> str:
        u = url.split("#", 1)[0]
        m = _re.match(r"^([^/?]*://[^/?]*)", u)
        head = m.group(1) if m else ""
        rest = u[len(head):]
        head = _re.sub(r"^(https?://)www\.", r"\1", head.lower())
        if "?" in rest:
            path, qs = rest.split("?", 1)
        else:
            path, qs = rest, ""
        path = _re.sub(r"/$", "", path)
        kept = [
            p
            for p in qs.split("&")
            if p != ""
            and not _re.match(r"^(utm_[a-z]+|ref|fbclid|gclid)=", p, _re.I)
        ]
        return head + path + ("?" + "&".join(kept) if kept else "")

    rng = random.Random(20260814)
    hosts = ["x.com", "a.example.org", "Sub.Domain.net"]
    paths = ["/p", "/a/b/c", "/idx.html", "/", "/CamelCase/Path"]
    params = [
        "id=7", "utm_source=f", "utm_campaign=C", "ref=rss", "q=Spark",
        "fbclid=zz", "gclid=1", "page=2", "utm_medium=email", "",
        "UTM_SOURCE=F", "Ref=rss", "ID=7",
    ]
    urls = []
    for _ in range(300):
        scheme = rng.choice(
            ["https://", "HTTPS://", "https://www.",
             "http://", "HTTP://", "http://www.", "Http://Www."]
        )
        host = rng.choice(hosts)
        if rng.random() < 0.3:
            host = host.upper()
        path = rng.choice(paths) + ("/" if rng.random() < 0.3 else "")
        qs = "&".join(rng.sample(params, rng.randint(0, 4)))
        frag = rng.choice(["", "#frag", "#a?b=c"])
        urls.append(scheme + host + path + ("?" + qs if qs else "") + frag)

    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["i", "url"])
    got = {r.i: r.canon_url for r in url_canonicalize(df).collect()}
    for i, u in enumerate(urls):
        assert got[i] == py_canon(u), (u, got[i], py_canon(u))


def test_urlgov_path_rules_planted(spark, sf_dir):
    """Path-prefix rule semantics: the hub loses exactly its pid-
    starts-with-'1' subtree, site3 loses everything, the absent spam
    domain drops nothing (negative control), and the per-source
    report reconciles."""
    from flink_tutorial_spark import plans
    from flink_tutorial_spark.session import load_table

    rows = plans.REGISTRY["urlgov_path_rules"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r.n_total for r in rows) == n_docs
    assert all(r.n_total == r.n_blocked + r.n_kept for r in rows)

    expected_blocked = docs.where(
        (
            (F.col("doc_id") % 10 < 3)
            & F.expr("CAST(doc_id div 7 AS STRING)").startswith("1")
        )
        | ((F.col("doc_id") % 10 >= 5) & (F.col("doc_id") % 17 == 3))
    ).count()
    assert sum(r.n_blocked for r in rows) == expected_blocked
    assert expected_blocked > 0
