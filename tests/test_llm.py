"""Tests for the LLM-data-pipeline operators (dedup, similarity, text,
multimodal) beyond the oracle gate: semantic properties on controlled data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sarpro_spark.llm import dedup as dd
from sarpro_spark.llm import multimodal as mm
from sarpro_spark.llm import similarity as sim
from sarpro_spark.llm import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different content about spark engines"),
        (4, "der hund und die katze und das haus"),
        (5, "le chat et le chien et les maisons des gens"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = dd.exact_dedup(docs).collect()
    assert len(out) == 5  # 6 docs, one exact dup
    dup = [r for r in out if r["n_copies"] == 2]
    assert len(dup) == 1 and dup[0]["canonical_id"] == 0
    deduped = dd.dedupe_exact(docs)
    assert deduped.count() == 5
    assert deduped.where(F.col("doc_id") == 1).count() == 0


def test_ngram_jaccard_finds_neardups(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in dd.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0  # identical
    assert (0, 2) in pairs and 0.6 < pairs[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in pairs  # unrelated


def test_minhash_lsh_candidates(spark, docs):
    out = {(r["doc_a"], r["doc_b"]): r["est_sim"] for r in dd.minhash_lsh_pairs(docs).collect()}
    assert out[(0, 1)] == 1.0  # identical docs always collide with est 1.0
    for (a, b), s in out.items():
        assert 0.0 <= s <= 1.0


def test_simhash_neardup_property(spark, docs):
    out = {r["doc_id"]: r["simhash"] for r in dd.simhash16(docs).collect()}
    assert out[0] == out[1]  # identical text -> identical simhash

    def hamming(a, b):
        return bin(a ^ b).count("1")

    # near-dup closer than unrelated (soft property on 16 bits)
    assert hamming(out[0], out[2]) <= hamming(out[0], out[3])
    assert all(0 <= v < 65536 for v in out.values())


@pytest.fixture(scope="module")
def emb(spark):
    rs = np.random.RandomState(3)
    vecs = rs.normal(0, 1, (40, 16)).astype(np.float32)
    vecs[7] = vecs[0] * 2.0  # same direction as 0 -> cosine 1
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(spark, emb):
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = sim.cosine_topk(emb, queries, k=3).collect()
    assert [r["vec_id"] for r in out if r["rnk"] == 1] == [0]  # self first
    second = [r["vec_id"] for r in out if r["rnk"] == 2]
    assert second == [7]  # scaled copy has cosine 1, id tiebreak after self
    assert all(abs(r["sim"]) <= 1.0 + 1e-9 for r in out)


def test_cosine_topk_pandas_agrees(spark, emb):
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = {(r["query_id"], r["rnk"]): r["vec_id"] for r in sim.cosine_topk(emb, queries, k=5).collect()}
    qrows = sorted(queries.collect(), key=lambda r: r["query_id"])
    qmat = np.array([r["qvec"] for r in qrows])
    qids = [r["query_id"] for r in qrows]
    fast = {(r["query_id"], r["rnk"]): r["vec_id"] for r in sim.cosine_topk_pandas(emb, qmat, qids, k=5).collect()}
    assert exact == fast


def test_lsh_topk_is_subset_of_bucket(spark, emb):
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = sim.cosine_topk_lsh(emb, queries, k=5, bands=4, band_bits=4, dim=16).collect()
    assert len(out) > 0
    # each query's self-match must be present (same bucket by construction)
    for qid in (0, 1, 2):
        assert any(r["query_id"] == qid and r["vec_id"] == qid for r in out)


def test_lang_id(spark):
    rows = [
        (0, "the cat and the dog went to the house of friends"),
        (1, "der hund und die katze und das haus ist ein traum"),
        (2, "le chat et la maison et les gens des villes"),
        (3, "el perro la casa de que los gatos"),
        (4, "xyzzy plugh qwerty"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["pred"] for r in df.select("doc_id", tx.lang_id_expr(F.col("text")).alias("pred")).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "fr"
    assert out[3] == "es"
    assert out[4] == "und"


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "Hello, world! 123 foo-bar")], "doc_id long, text string")
    r = df.select(
        tx.token_count(F.col("text")).alias("t"),
        tx.bpe_ish_count(F.col("text")).alias("b"),
    ).collect()[0]
    assert r["t"] == 5  # hello, world, 123, foo, bar
    # pieces: hello , world ! 123 foo - bar  => 8
    assert r["b"] == 8


def test_quality_scores_ordering(spark):
    rows = [
        (0, "the cat sat on the mat and the dog ran to the house with a friend " * 3),
        (1, "!!! ??? ### $$$ %%%"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["q_score"] for r in tx.quality_features(df).collect()}
    assert out[0] > out[1]  # clean prose beats punctuation soup


def test_multimodal_features(spark, docs):
    b = mm.attach_binary_payload(docs)
    feats = {r["doc_id"]: r for r in mm.decode_features(b).collect()}
    assert len(feats) == 6
    r = feats[0]
    assert r["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert 0 < r["byte_mean"] < 255 and r["byte_entropy"] > 0
    # payload column pruning: metadata-only projection must not fail
    assert b.select("media_meta.mime").distinct().count() == 3


def test_multimodal_decode_real_codecs():
    import numpy as np

    from sarpro_spark.sinks.jpeg import encode_jpeg
    from sarpro_spark.sinks.png import encode_png

    # PNG leg is lossless: decode == source, gray and RGB
    for channels in (1, 3):
        img = mm.formula_image(7, 20, 12, channels)
        dec = mm.decode_image(encode_png(img))
        assert dec.shape == img.shape and (dec == img).all()
    # JPEG leg: exact dims, bounded error
    img = mm.formula_image(9, 24, 16, 3)
    dec = mm.decode_image(encode_jpeg(img, 90))
    assert dec.shape == img.shape
    assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) < 12
    # header-only dims parse, both formats
    assert mm.image_dims(encode_png(img)) == (24, 16)
    assert mm.image_dims(encode_jpeg(img, 90)) == (24, 16)
    # unsupported magic still raises (declared capability boundary)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x00\x00\x00\x00")


def test_multimodal_native_decode_hook(monkeypatch):
    """The dormant PIL fast path (_native_decode): PNG always eligible,
    JPEG only behind SARPRO_NATIVE_JPEG=1, any native failure falls back to
    the in-repo codecs. PIL is absent in this container, so the hook is
    exercised with an injected fake whose calls we can observe — the point
    is the DISPATCH contract, which is what a real cluster (with PIL
    installed) relies on for hash-safety."""
    import io
    import sys
    import types

    import numpy as np

    from sarpro_spark.sinks.jpeg import encode_jpeg
    from sarpro_spark.sinks.png import encode_png

    img = mm.formula_image(3, 20, 12, 3)
    png_buf, jpg_buf = encode_png(img), encode_jpeg(img, 90)
    sentinel = np.full((5, 5), 77, dtype=np.uint8)
    calls = []

    class _FakeIm:
        mode = "L"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def __array__(self, dtype=None, copy=None):
            return sentinel

    def fake_open(fobj):
        calls.append(fobj.read(2))
        fobj.seek(0)
        return _FakeIm()

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.SimpleNamespace(open=fake_open)
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil.Image)

    # PNG: native path always taken when PIL imports
    monkeypatch.delenv("SARPRO_NATIVE_JPEG", raising=False)
    assert (mm.decode_image(png_buf) == sentinel).all()
    assert calls and calls[-1] == b"\x89P"
    # JPEG without the opt-in: native NOT consulted, in-repo decoder runs
    n_before = len(calls)
    dec = mm.decode_image(jpg_buf)
    assert len(calls) == n_before and dec.shape == img.shape
    # JPEG with SARPRO_NATIVE_JPEG=1: native path taken
    monkeypatch.setenv("SARPRO_NATIVE_JPEG", "1")
    assert (mm.decode_image(jpg_buf) == sentinel).all()
    assert calls[-1] == b"\xFF\xD8"
    # unsupported native mode -> fall back to the bit-exact in-repo codec
    _FakeIm.mode = "CMYK"
    dec = mm.decode_image(png_buf)
    assert dec.shape == img.shape and (dec == img).all()
    # native raising -> same fallback
    fake_pil.Image = types.SimpleNamespace(
        open=lambda f: (_ for _ in ()).throw(OSError("corrupt"))
    )
    dec = mm.decode_image(png_buf)
    assert dec.shape == img.shape and (dec == img).all()


def test_multimodal_frame_sampling():
    from sarpro_spark.sinks.jpeg import encode_jpeg

    frames = [mm.formula_image(3, 16, 8, 1, frame=f) for f in range(5)]
    payload = b"".join(encode_jpeg(f, 90) for f in frames)
    assert len(mm.split_mjpeg(payload)) == 5
    sampled = mm.sample_frames(payload, every_n=2)
    assert [i for i, _ in sampled] == [0, 2, 4]
    assert all(a.shape == (8, 16) for _, a in sampled)
    with pytest.raises(NotImplementedError):
        mm.sample_frames(b"\x00\x00")  # not a JPEG stream


def test_ivf_topk_contains_self(spark, emb):
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = sim.cosine_topk_ivf(emb, queries, k=5, n_centroids=8, nprobe=2).collect()
    assert len(out) > 0
    # a query is always in its own nearest-centroid list -> self always found
    for qid in (0, 1, 2):
        hits = [r for r in out if r["query_id"] == qid and r["vec_id"] == qid]
        assert hits and hits[0]["rnk"] == 1


def test_simhash_neardup_pairs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again!"),  # near-dup of 0
        (2, "completely different content about spark dataframes and shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in dd.simhash_neardup_pairs(df).collect()}
    assert (0, 1) in out and out[(0, 1)] <= 3
    assert (0, 2) not in out and (1, 2) not in out


def test_winnowing_shared_substring_guarantee(spark):
    """Docs sharing a substring of length >= window+k-1 (= 23 at defaults)
    MUST share at least one winnowing fingerprint; disjoint docs should not."""
    common = "abcdefghijklmnopqrstuvwxyz0123"  # 30 chars shared run
    rows = [
        (0, "PREFIX ONE %s SUFFIX ALPHA" % common),
        (1, "totally other start %s and another ending" % common),
        (2, "no overlap here at all with anything like those above ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in tx.winnowing_fingerprints(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1], "shared 30-char run must yield a common fingerprint"
    assert not (fps[0] & fps[2])


def test_lsh_results_independent_of_partitioning(spark, emb):
    """Bucket keys are exact integer arithmetic: candidate sets — and thus
    results — must be identical whatever the input partitioning."""
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    kw = dict(k=5, bands=4, band_bits=6, dim=16)
    a = sorted(map(tuple, sim.cosine_topk_lsh(emb.repartition(1), queries, **kw).collect()))
    b = sorted(map(tuple, sim.cosine_topk_lsh(emb.repartition(13), queries, **kw).collect()))
    assert a == b and len(a) > 0


def test_minhash_pairs_independent_of_partitioning(spark):
    rows = [(i, f"document number {i % 7} with mostly shared text content repeated "
                f"over and over {'x' * (i % 3)}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dd.minhash_jaccard_pairs(df.repartition(1), threshold=0.5).collect()))
    b = sorted(map(tuple, dd.minhash_jaccard_pairs(df.repartition(11), threshold=0.5).collect()))
    assert a == b and len(a) > 0


# --- corpus hygiene + sampling ------------------------------------------------


def test_pii_redaction_patterns(spark):
    from sarpro_spark.llm import filters as fl

    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.co.uk call +1 555-123-4567 ip 192.168.0.1 "
             "card 4111 1111 1111 1234 done")],
        "doc_id long, text string",
    )
    row = fl.redact_pii(df).collect()[0]
    assert row["pii_email"] == 1
    assert row["pii_phone"] == 1
    assert row["pii_ip"] == 1
    assert row["pii_card"] == 1
    red = row["redacted"]
    for tokn in ("<EMAIL>", "<PHONE>", "<IP>", "<CARD>"):
        assert tokn in red, red
    assert "@" not in red and "192.168" not in red and "4111" not in red


def test_contamination_hit_and_miss(spark):
    from sarpro_spark.llm import filters as fl

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),   # fully contained
         (2, "zzz completely unrelated content qqq xxyyzz abc")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in fl.contamination_scores(docs, bench).collect()}
    assert out[1]["contamination"] == 1.0
    assert out[2]["contamination"] == 0.0


def test_repetition_scores(spark):
    from sarpro_spark.llm import filters as fl

    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"),    # one token, all tri dup
         (2, "a b c d e f g h")],                  # all distinct
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in fl.repetition_scores(df).collect()}
    assert out[1]["top_token_frac"] == 1.0
    assert out[1]["dup_trigram_frac"] > 0.7
    assert out[2]["dup_trigram_frac"] == 0.0
    assert abs(out[2]["top_token_frac"] - 1.0 / 8.0) < 1e-9


def test_sampling_determinism_and_exact_k(spark):
    from sarpro_spark.llm import sampling as smp

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(400)],
        "doc_id long, lang string",
    )
    a = sorted(r["doc_id"] for r in smp.fraction_sample(df, 0.25).collect())
    b = sorted(r["doc_id"] for r in smp.fraction_sample(df, 0.25).collect())
    assert a == b                      # reproducible
    assert 50 <= len(a) <= 150        # ~100 of 400

    # stratified: en kept at 0.5, de dropped at 0.0 default
    kept = smp.stratified_sample(df, {"en": 0.5}, "lang").collect()
    assert all(r["lang"] == "en" for r in kept)

    # exact k per stratum, deterministic
    k1 = sorted((r["lang"], r["doc_id"]) for r in smp.topk_per_stratum(df, 5, "lang").collect())
    k2 = sorted((r["lang"], r["doc_id"]) for r in smp.topk_per_stratum(df, 5, "lang").collect())
    assert k1 == k2
    from collections import Counter
    assert Counter(lang for lang, _ in k1) == {"en": 5, "de": 5}


def test_kmeans_deterministic_and_improves(spark, sf_dir):
    """kmeans_train: reproducible across runs; mean assignment similarity
    does not decrease from iteration 1 to 3 (Lloyd's monotonicity, modulo
    fround); trained centroids drop into cosine_topk_ivf."""
    from sarpro_spark import frames
    from sarpro_spark.llm import similarity as sim

    e = frames.load_table(spark, sf_dir, "embeddings")

    c1 = sim.kmeans_train(e, k=4, iters=1, dim=64)
    c3 = sim.kmeans_train(e, k=4, iters=3, dim=64)
    c3b = sim.kmeans_train(e, k=4, iters=3, dim=64)
    rows3 = sorted((r["centroid_id"], tuple(r["cvec"])) for r in c3.collect())
    rows3b = sorted((r["centroid_id"], tuple(r["cvec"])) for r in c3b.collect())
    assert rows3 == rows3b  # deterministic

    def mean_sim(cent):
        assign = sim.ivf_assign(e, cent.select("centroid_id", "cvec"))
        j = (
            e.join(assign, "vec_id")
            .join(cent.select("centroid_id", "cvec"), "centroid_id")
            .select(sim.cosine_expr(F.col("embedding"), F.col("cvec")).alias("s"))
        )
        return j.agg(F.avg("s")).first()[0]

    assert mean_sim(c3) >= mean_sim(c1) - 1e-6

    # trained centroids slot into IVF
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = sim.cosine_topk_ivf(e, q, k=5, nprobe=2, centroids=c3)
    assert out.count() == 15


def test_int8_quantization_error_and_recall(spark, sf_dir):
    """int8 codes reconstruct within scale/2 per component; quantized
    brute-force top-10 overlaps exact top-10 by >= 8/10 on average."""
    from sarpro_spark import frames

    e = frames.load_table(spark, sf_dir, "embeddings")
    qc = sim.quantize_int8(e)
    j = e.join(qc, "vec_id").select(
        F.max(
            F.array_max(
                F.zip_with(
                    F.col("embedding"),
                    F.col("codes"),
                    lambda x, c: F.abs(x.cast("double") - c.cast("double") * F.col("scale")),
                )
            )
            / F.greatest(F.col("scale"), F.lit(1e-12))
        ).alias("max_err_scales")
    )
    assert j.first()["max_err_scales"] <= 0.5 + 1e-9

    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = sim.cosine_topk(e, q, k=10)
    approx = sim.cosine_topk_int8(e, q, k=10)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(ex[k_] & ap[k_]) / 10 for k_ in ex]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_kmeans_iteration_plan_shape(spark, sf_dir):
    """The k-means iteration internals (not visible behind the checkpoint in
    the final frame): assignment is a broadcast cross of the k centroids
    (BroadcastNestedLoopJoin, never CartesianProduct); the update is a
    HashAggregate."""
    from sarpro_spark import frames

    e = frames.load_table(spark, sf_dir, "embeddings")
    cent = e.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    assign = sim.ivf_assign(e, cent)
    plan = assign._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    upd = e.join(assign, "vec_id").groupBy("centroid_id").agg(
        F.avg(F.col("embedding")[0]).alias("c0")
    )
    plan2 = upd._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan2


def test_bpe_train_matches_python_reference(spark):
    """Golden: the distributed trainer must reproduce a from-scratch Python
    BPE (identical word split, symbol init, pair count, tie-breaks, and
    str.replace merge semantics) on a controlled corpus."""
    import re
    from collections import Counter

    from sarpro_spark.llm.bpe import MAX_WORD_LEN, MERGE_PASSES, bpe_train

    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a banana and a bandana",
        "low lower lowest low low",
        "newer newest new news",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    # pure-Python reference
    wc = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if 0 < len(w) <= MAX_WORD_LEN:
                wc[w] += 1
    words = {" " + " ".join(w) + " </w> ": f for w, f in wc.items()}
    expected = []
    for step in range(1, 9):
        pairs = Counter()
        for syms, f in words.items():
            toks = [s for s in syms.split(" ") if s]
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (lhs, rhs), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((step, lhs, rhs, lhs + rhs, freq))
        pat, rep = f" {lhs} {rhs} ", f" {lhs}{rhs} "
        new_words = Counter()
        for syms, f in words.items():
            for _ in range(MERGE_PASSES):
                syms = syms.replace(pat, rep)
            new_words[syms] += f
        words = dict(new_words)

    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_freq"])
        for r in bpe_train(docs, n_merges=8).orderBy("step").collect()
    ]
    assert got == expected
    # sanity: merges actually build multi-char subwords
    assert any(len(m[3].replace("</w>", "")) >= 2 for m in got)


def test_bpe_encode_stats(spark):
    from sarpro_spark.llm.bpe import bpe_encode_stats, bpe_train

    texts = ["the cat sat", "the cats sat on mats", "lower lowest low"]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges = bpe_train(docs, n_merges=6)
    out = {r["doc_id"]: r for r in bpe_encode_stats(docs, merges).collect()}
    assert set(out) == {0, 1, 2}
    for i, t in enumerate(texts):
        words = t.split()
        r = out[i]
        assert r["n_words"] == len(words)
        assert r["n_chars"] == sum(len(w) for w in words)
        # each word is at least 1 token (incl. </w>) and at most chars+1
        assert r["n_words"] <= r["n_tokens"] <= r["n_chars"] + r["n_words"]
    # merges must compress: tokens strictly below the no-merge count somewhere
    no_merge = {r["doc_id"]: r for r in bpe_encode_stats(docs, merges.limit(0)).collect()}
    assert sum(r["n_tokens"] for r in out.values()) < sum(
        r["n_chars"] + r["n_words"] for r in no_merge.values()
    )


def test_unigram_logprob_ordering(spark):
    """Common text scores lower mean NLL than rare-token text; OOV-heavy
    gibberish scores highest."""
    rows = [
        (0, "the cat and the dog and the cat and the dog"),
        (1, "the cat zyx the dog qwv the cat"),
        (2, "zzqj xvwk pffr glmb zzqj xvwk"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in tx.unigram_logprob_scores(docs).collect()}
    assert out[0]["mean_nll"] < out[1]["mean_nll"] < out[2]["mean_nll"]
    assert out[0]["n_tokens"] == 11


def test_sequence_packing_invariants(spark):
    """Concat-and-chunk conservation laws on a controlled corpus: every
    bucket's packed sequences hold exactly its documents' tokens, every
    non-tail sequence is exactly full, and the per-doc and per-seq legs
    agree on the sequence index range."""
    from sarpro_spark.llm import packing as pk

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(5 + (i * 7) % 40))) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    L, B = 16, 4
    a = pk.pack_assignments(docs, seq_len=L, n_buckets=B).collect()
    s = pk.pack_sequences(docs, seq_len=L, n_buckets=B).collect()

    # conservation: per bucket, sum of doc tokens == sum of sequence fills
    doc_tok = {}
    for r in a:
        doc_tok[r["bucket"]] = doc_tok.get(r["bucket"], 0) + r["n_tok"]
    seq_tok = {}
    for r in s:
        seq_tok[r["bucket"]] = seq_tok.get(r["bucket"], 0) + r["n_tokens"]
    assert doc_tok == seq_tok

    # every sequence except each bucket's last is exactly full
    last_seq = {}
    for r in s:
        last_seq[r["bucket"]] = max(last_seq.get(r["bucket"], -1), r["seq"])
    for r in s:
        if r["seq"] < last_seq[r["bucket"]]:
            assert r["is_full"] and r["n_tokens"] == L
        assert 0 < r["n_tokens"] <= L
        assert r["n_docs"] >= 1 and r["first_doc"] <= r["last_doc"]

    # sequence indices are contiguous from 0 per bucket, and the per-doc
    # spans cover exactly the same index set
    for b in last_seq:
        seqs = sorted(r["seq"] for r in s if r["bucket"] == b)
        assert seqs == list(range(last_seq[b] + 1))
        from_docs = set()
        for r in a:
            if r["bucket"] == b:
                from_docs |= set(range(r["first_seq"], r["last_seq"] + 1))
        assert from_docs == set(seqs)


def test_mixture_plan_budget(spark):
    """The planned desired_tokens sum to the budget fraction of the corpus,
    and rates/repeats are consistent with the inventory."""
    from sarpro_spark.llm import packing as pk

    rows = [(i, "tok " * (10 + i % 5), f"s{i % 3}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = pk.mixture_plan(docs, budget_frac=0.5).collect()
    total = sum(r["avail_tokens"] for r in out)
    assert abs(sum(r["desired_tokens"] for r in out) - 0.5 * total) < 1e-3
    for r in out:
        assert 0.0 < r["sample_rate"] <= 1.0
        assert r["upsampled"] == (r["repeat_factor"] > 1.0)
        assert abs(r["repeat_factor"] - r["desired_tokens"] / r["avail_tokens"]) < 1e-5


def test_tfidf_similarity_semantics(spark):
    """Identical docs are each other's top lexical neighbor with sim 1.0;
    disjoint-vocabulary docs never pair; top terms prefer rare words."""
    from sarpro_spark.llm import tfidf as ti

    rows = [
        (0, "alpha beta gamma delta shared words here"),
        (1, "alpha beta gamma delta shared words here"),
        (2, "alpha beta epsilon unrelated tail content"),
        (3, "zeta eta theta iota totally disjoint vocabulary"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = {(r["doc_id"], r["rnk"]): r for r in ti.tfidf_topk_similar(docs, k=3).collect()}
    assert top[(0, 1)]["nbr_id"] == 1 and abs(top[(0, 1)]["sim"] - 1.0) < 1e-6
    assert top[(1, 1)]["nbr_id"] == 0 and abs(top[(1, 1)]["sim"] - 1.0) < 1e-6
    pairs = {(r["doc_id"], r["nbr_id"]) for r in ti.tfidf_topk_similar(docs, k=3).collect()}
    assert not any(a == 3 or b == 3 for a, b in pairs)  # no shared terms

    terms = ti.tfidf_top_terms(docs, k=2).collect()
    t0 = [r["term"] for r in terms if r["doc_id"] == 2]
    # doc 2's signature is its unique words, not the corpus-common 'alpha'
    assert "alpha" not in t0 and "beta" not in t0


def test_duplicated_passages(spark):
    """Docs sharing a passage get matching dup runs; unique docs score 0."""
    from sarpro_spark.llm import filters as fl

    shared = "one two three four five"
    rows = [
        (0, f"intro words {shared} closing remark alpha"),
        (1, f"other opening {shared} different ending beta"),
        (2, "totally unique content nothing shared here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fl.duplicated_passages(docs, w=3).collect()}
    # the shared 5-word passage yields 3 consecutive duplicated 3-shingles
    assert out[0]["max_dup_run"] == 3 and out[1]["max_dup_run"] == 3
    assert out[0]["n_dup"] == 3 and out[1]["n_dup"] == 3
    assert out[2]["n_dup"] == 0 and out[2]["dup_frac"] == 0.0
    assert out[2]["max_dup_run"] == 0
    for did, r in out.items():
        n_tok = len(rows[did][1].split())
        assert r["n_shingles"] == n_tok - 3 + 1


def test_duplicated_passages_short_docs(spark):
    """Docs with fewer than w tokens (incl. empty) must yield zero shingles,
    not crash: sequence(1, 0) is DESCENDING in Spark, so the old plan
    emitted pos=0 and blew up F.slice (ADVICE r4 regression)."""
    from sarpro_spark.llm import filters as fl

    rows = [
        (0, "two words"),
        (1, ""),
        (2, "one"),
        (3, "exactly three tokens"),
        (4, "a normal length document with plenty of words inside it"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fl.duplicated_passages(docs, w=3).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    for did in (0, 1, 2):
        assert out[did]["n_shingles"] == 0
        assert out[did]["n_dup"] == 0
        assert out[did]["dup_frac"] == 0.0
        assert out[did]["max_dup_run"] == 0
    assert out[3]["n_shingles"] == 1
    assert out[4]["n_shingles"] == 10 - 3 + 1


def test_progressive_jpeg_graceful_degradation():
    """A progressive-marked (SOF2) blob must sniff as such, refuse entropy
    decode via (None, False) — never an exception — and still yield header
    dims; baseline JPEG/PNG/unknown magic dispatch correctly."""
    from sarpro_spark.llm import multimodal as mm
    from sarpro_spark.sinks.jpeg import encode_jpeg
    from sarpro_spark.sinks.png import encode_png

    img = mm.formula_image(3, 11, 11, 1)
    b = encode_jpeg(img, 90)
    p = mm.make_progressive(b)
    assert mm.sniff_image(b) == "jpeg"
    assert mm.sniff_image(p) == "jpeg_progressive"
    arr, ok = mm.safe_decode_image(b)
    assert ok and arr.shape == (11, 11)
    arr2, ok2 = mm.safe_decode_image(p)
    assert not ok2 and arr2 is None
    assert mm.image_dims(p) == (11, 11)
    assert mm.sniff_image(encode_png(img)) == "png"
    assert mm.safe_decode_image(b"\x00\x01\x02\x03") == (None, False)
    # truncated garbage after a JPEG SOI must degrade, not raise
    assert mm.safe_decode_image(b"\xFF\xD8\xFF") == (None, False)


def test_incremental_dedup_semantics(spark):
    """A batch copy of an index doc is an exact dup; a near-copy is a near
    dup; novel content is new. Split is forced via a controlled id set."""
    from sarpro_spark.llm import dedup as dd2
    from sarpro_spark.llm.sampling import hash_bucket
    from pyspark.sql import functions as F

    # find ids on each side of the deterministic split
    probe = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    flags = {
        r["doc_id"]: r["b"]
        for r in probe.select(
            "doc_id", ((hash_bucket(F.col("doc_id"), "inc") % 10) >= 7).alias("b")
        ).collect()
    }
    idx_ids = [i for i, b in flags.items() if not b]
    bat_ids = [i for i, b in flags.items() if b]
    assert len(idx_ids) >= 2 and len(bat_ids) >= 3

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("dog", "cat")
    rows = [
        (idx_ids[0], base),
        (idx_ids[1], "some other indexed document body with plenty of words"),
        (bat_ids[0], base),          # exact dup of idx_ids[0]
        (bat_ids[1], near),          # near dup of idx_ids[0]
        (bat_ids[2], "entirely novel text never seen in the index corpus"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dd2.incremental_dedup(docs).collect()}
    assert set(out) == {bat_ids[0], bat_ids[1], bat_ids[2]}
    assert out[bat_ids[0]]["exact_dup_of"] == idx_ids[0]
    assert not out[bat_ids[0]]["is_new"]
    assert out[bat_ids[1]]["exact_dup_of"] is None
    assert out[bat_ids[1]]["near_dup_of"] == idx_ids[0]
    assert out[bat_ids[1]]["near_jaccard"] > 0.5
    assert out[bat_ids[2]]["is_new"]


def test_quality_classifier_learns(spark):
    """On a separable corpus (curated sources = clean prose, others = punct
    noise) the GD trajectory reduces log-loss and the trained model
    separates the classes."""
    from pyspark.sql import functions as F

    from sarpro_spark.llm import classifier as cf
    from sarpro_spark.llm.sampling import hash_bucket

    # find source names on each side of the deterministic label split
    probe = spark.createDataFrame([(f"s{i}",) for i in range(20)], "source string")
    flags = {
        r["source"]: r["pos"]
        for r in probe.select(
            "source", ((hash_bucket(F.col("source"), "cur") % 3) == 0).alias("pos")
        ).collect()
    }
    pos = [s for s, b in flags.items() if b]
    neg = [s for s, b in flags.items() if not b]
    assert pos and neg

    clean = "the quick brown fox and the lazy dog walk to the old mill for a rest"
    noisy = "@@!! #$% ^& buy now!!! $$$ ??? ***"
    rows = [(i, clean + f" v{i}", pos[i % len(pos)]) for i in range(30)]
    rows += [(100 + i, noisy + f" z{i}", neg[i % len(neg)]) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    w, log = cf.train_quality_classifier(docs, n_steps=10)
    losses = [r["loss"] for r in log.orderBy("step").collect()]
    assert losses[-1] < losses[0]  # learning happened
    scored = cf.score_quality_classifier(docs, w).collect()
    acc = sum(1 for r in scored if (r["score"] >= 0.5) == (r["y"] == 1.0)) / len(scored)
    assert acc >= 0.9


def test_pca_matches_numpy(spark):
    """The rounded power iteration recovers numpy's top eigenvectors on a
    controlled anisotropic cloud (up to sign; 1e-5 tolerance for the 9-digit
    state rounding), components are orthonormal, and projections reproduce
    the centered dot products."""
    from sarpro_spark.llm import pca

    rs = np.random.RandomState(11)
    d, n = 12, 300
    base = rs.normal(0, 1, (n, d))
    base[:, 0] *= 6.0   # dominant direction
    base[:, 1] *= 3.0   # second direction
    X = (base + rs.normal(0, 0.1, (n, d))).astype(np.float32)
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    comps = {r["component"]: None for r in pca.pca_components(emb, dim=d).collect()}
    got = pca.pca_components(emb, dim=d).collect()
    V = {c: np.zeros(d) for c in comps}
    lam = {}
    for r in got:
        V[r["component"]][r["pos"]] = r["value"]
        lam[r["component"]] = r["eigenvalue"]

    Xc = X.astype(np.float64) - X.astype(np.float64).mean(axis=0)
    C = Xc.T @ Xc / n
    evals, evecs = np.linalg.eigh(C)
    for c, k in ((0, -1), (1, -2)):
        ref = evecs[:, k]
        assert min(np.abs(V[c] - ref).max(), np.abs(V[c] + ref).max()) < 1e-5
        assert abs(lam[c] - evals[k]) / evals[k] < 1e-6
    assert lam[0] > lam[1]
    assert abs(np.dot(V[0], V[1])) < 1e-6
    assert abs(np.linalg.norm(V[0]) - 1.0) < 1e-6

    proj = {r["vec_id"]: (r["pc0"], r["pc1"]) for r in pca.pca_project(emb, dim=d).collect()}
    ref0 = Xc @ V[0]
    assert max(abs(proj[i][0] - ref0[i]) for i in range(n)) < 1e-4


def test_bigram_logprob_catches_word_salad(spark):
    """A shuffled-token doc scores worse (higher NLL) under the bigram model
    than a doc whose bigrams are corpus-frequent, even when both share the
    unigram distribution."""
    from sarpro_spark.llm.text import bigram_logprob_scores

    fluent = "the cat sat on the mat"
    rows = [(i, fluent) for i in range(10)]
    rows.append((100, "mat the on sat cat the"))  # same unigrams, alien bigrams
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["mean_nll2"] for r in bigram_logprob_scores(docs).collect()}
    assert out[100] > out[0]


def test_pagerank_properties(spark):
    """On a hub-and-spoke graph the hub outranks every spoke; total rank
    mass is conserved (~1 after convergence from the perturbed seed)."""
    from sarpro_spark.llm import graph as gr

    # spokes 1..6 all cite the hub alongside their own page
    rows = []
    for d in range(1, 7):
        rows += [(d, "hub.example"), (d, f"spoke{d}.example")]
    mentions = spark.createDataFrame(rows, "doc_id long, domain string")
    out = {r["domain"]: r for r in gr.pagerank(gr.cocitation_edges(mentions), iters=20).collect()}
    hub = out["hub.example"]
    assert all(hub["rank"] > r["rank"] for d, r in out.items() if d != "hub.example")
    assert hub["n_in"] == 6 and hub["n_out"] == 6
    total = sum(r["rank"] for r in out.values())
    assert abs(total - 1.0) < 0.05


def test_wav_codec_roundtrip_and_features():
    """WAV encode->decode is lossless for PCM16 mono; decode walks extra
    RIFF chunks; features match direct computation."""
    import numpy as np

    from sarpro_spark.llm import multimodal as mm2

    s = mm2.formula_audio(7, 450)
    payload = mm2.encode_wav(s)
    sr, back = mm2.decode_wav(payload)
    assert sr == mm2.WAV_SR and (back == s).all()
    # tolerate a LIST chunk before data (conforming producers emit them)
    import struct

    extra = payload[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO" + payload[12:]
    sr2, back2 = mm2.decode_wav(extra)
    assert sr2 == sr and (back2 == s).all()
    with_pad = s[:3]  # odd data length path: 6 bytes, no padding needed, but
    p3 = mm2.encode_wav(with_pad)
    assert (mm2.decode_wav(p3)[1] == with_pad).all()
    import pytest as _pt

    with _pt.raises(NotImplementedError):
        mm2.decode_wav(b"\x00" * 32)


def test_weighted_topk_sampling(spark):
    """Efraimidis-Spirakis: heavier rows must be over-represented, k is
    exact per stratum, and the sample is reproducible run-to-run."""
    from sarpro_spark.llm import sampling as smp
    from pyspark.sql import functions as F

    rows = [(i, "a" if i % 2 == 0 else "b", 1 if i < 400 else 100) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string, w int")
    out = smp.weighted_topk_per_stratum(df, 25, "stratum", "w").collect()
    assert len(out) == 50
    per = {}
    for r in out:
        per.setdefault(r["stratum"], []).append(r)
    for s, grp in per.items():
        assert len(grp) == 25
        assert sorted(r["rnk"] for r in grp) == list(range(1, 26))
    # docs 400..499 carry weight 100 vs 1 — they are 20% of the population
    # but must dominate the sample
    heavy = sum(1 for r in out if r["doc_id"] >= 400)
    assert heavy > 35, heavy
    # reproducible: identical second run
    again = smp.weighted_topk_per_stratum(df, 25, "stratum", "w").collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)


def test_k_anonymize_semantics(spark):
    """Groups below k vanish entirely; groups at/above k keep every row;
    the report's suppressed mass accounts exactly for the dropped rows."""
    from pyspark.sql import functions as F

    from sarpro_spark.llm.privacy import k_anonymity_report, k_anonymize

    rows = [(i, "a" if i < 30 else ("b" if i < 34 else "c")) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, g string")
    out = k_anonymize(df, ["g"], 5)
    kept = {r["g"] for r in out.select("g").distinct().collect()}
    assert kept == {"a", "c"}  # b has 4 < 5 members
    assert out.count() == 30 + 6

    rep = {r["g"]: r for r in k_anonymity_report(df, ["g"], 5).collect()}
    assert rep["a"]["released"] and rep["a"]["suppressed_rows"] == 0
    assert not rep["b"]["released"] and rep["b"]["suppressed_rows"] == 4
    assert df.count() - out.count() == sum(r["suppressed_rows"] for r in rep.values())


def test_native_decode_dispatch(monkeypatch):
    """decode_image prefers the native hook when it yields pixels, falls
    back to the in-repo codecs when it returns None, and the two paths
    agree bit-for-bit on lossless PNG (the only always-on native leg)."""
    import numpy as np

    from sarpro_spark.llm import multimodal as mm
    from sarpro_spark.sinks.png import encode_png

    img = np.arange(8 * 6, dtype=np.uint8).reshape(6, 8)
    blob = encode_png(img)
    pure = mm.decode_image(blob)
    assert np.array_equal(pure, img)

    calls = {}

    def fake_native(buf):
        calls["hit"] = True
        return img.copy()  # stands in for PIL: lossless PNG decode is spec-exact

    monkeypatch.setattr(mm, "_native_decode", fake_native)
    fast = mm.decode_image(blob)
    assert calls.get("hit") and np.array_equal(fast, pure)

    monkeypatch.setattr(mm, "_native_decode", lambda buf: None)
    assert np.array_equal(mm.decode_image(blob), pure)  # fallback path


def test_semantic_dedup_hot_cluster_cap(spark):
    """Collapsed k-means (all vectors near-identical -> one cluster) must NOT
    go all-pairs: with max_cluster = 8 the 64-vector cluster splits into
    ceil(64/8) = 8 md5 sub-buckets, pairs stay within a sub-bucket, and each
    sub-bucket keeps >= 1 survivor — so kept-count >= number of sub-buckets,
    where uncapped SemDeDup would keep exactly 1. The pair join must carry
    the _salt key (plan-visible)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    rows = [
        (i, [float(x) for x in (base + rng.normal(scale=1e-6, size=8))])
        for i in range(64)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.semantic_dedup(emb, k=2, iters=1, tau=0.9, dim=8, max_cluster=8)
    rows_out = out.collect()
    assert len(rows_out) == 64
    kept = [r for r in rows_out if r["kept"]]
    # every (cluster, salt) sub-bucket keeps its own lowest id: with a
    # collapsed cluster of 64 and cap 8 there are 8 sub-buckets per cluster
    assert len(kept) >= 8
    # and the cap is doing real work: nothing like the 63-drop all-pairs run
    dropped = 64 - len(kept)
    assert dropped <= 64 - 8
    # plan carries the salt in the pair join (bounded-work shape is
    # structural, not a data accident)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan


def test_semantic_dedup_salt_inert_when_clusters_fit(spark):
    """When every cluster fits max_cluster the salt is constantly 0 and the
    result is EXACTLY the uncapped SemDeDup semantics (the oracle fixture
    path): compare against a run with a huge cap."""
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    small = sim.semantic_dedup(emb, k=4, iters=1, tau=0.35, dim=8, max_cluster=4096)
    huge = sim.semantic_dedup(emb, k=4, iters=1, tau=0.35, dim=8, max_cluster=10**9)
    a = sorted((r["vec_id"], r["centroid_id"], r["kept"]) for r in small.collect())
    b = sorted((r["vec_id"], r["centroid_id"], r["kept"]) for r in huge.collect())
    assert a == b


def test_semantic_dedup_depth2_recluster_matches_direct_scan(spark):
    """r10 (r9 verdict item 8): bounded depth-k recursion — a group still
    oversized after one split is re-clustered AGAIN instead of falling to
    the md5 salt. Planted two-level fixture: super-family A = two
    correlated sub-directions (e0 and (e0+e1)/sqrt2, 30 near-identical
    vectors each), family B = e2 x 20; ids 0/1/2 seed A-sub1/B/A-sub2.
    k=1 collapses everything; max_cluster=40 makes level 1 split A(60)
    from B(20) and level 2 split A's two sub-directions. At tau=0.9 only
    same-sub-direction vectors are near-dups, so depth=2 must prune
    EXACTLY the direct (uncapped) scan's set — while depth=1 (same
    params) salts A's 60-group and keeps MORE (scattered duplicate
    groups), which is the loss depth-2 removes."""
    dim = 64
    rng = np.random.default_rng(31)
    e0 = np.zeros(dim); e0[0] = 1.0
    e01 = np.zeros(dim); e01[0] = 1.0 / np.sqrt(2.0); e01[1] = 1.0 / np.sqrt(2.0)
    e2 = np.zeros(dim); e2[2] = 1.0
    # per-8 cycle: 3x A1, 2x B, 3x A2 -> 30/20/30 over 80 ids; ids 0/1/2
    # land on A1/B/A2 so every (sub-)family is seeded by a lowest id
    fam = {0: e0, 1: e2, 2: e01, 3: e0, 4: e01, 5: e2, 6: e0, 7: e01}
    vecs = [fam[i % 8] + rng.normal(scale=1e-3, size=dim) for i in range(80)]
    counts = {"A1": 0, "A2": 0, "B": 0}
    for i, v in enumerate(vecs):
        if abs(v[2]) > 0.5:
            counts["B"] += 1
        elif abs(v[1]) > 0.5:
            counts["A2"] += 1
        else:
            counts["A1"] += 1
    assert counts == {"A1": 30, "A2": 30, "B": 20}
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    kw = dict(k=1, iters=1, tau=0.9, dim=dim, max_cluster=40)
    out2 = sim.semantic_dedup(emb, depth=2, **kw)
    kept2 = {r["vec_id"] for r in out2.collect() if r["kept"]}
    arr = np.stack(vecs)
    norms = np.linalg.norm(arr, axis=1)
    cos6 = np.floor((arr @ arr.T) / np.outer(norms, norms) * 1e6 + 0.5) / 1e6
    want = {v for v in range(80) if not any(cos6[u, v] >= 0.9 for u in range(v))}
    assert want == {0, 1, 2}  # fixture does what it claims
    assert kept2 == want
    # depth-1 falls back to the salt for A's still-oversized 60-group and
    # scatters its duplicate groups -> strictly more survivors
    out1 = sim.semantic_dedup(emb, depth=1, **kw)
    kept1 = {r["vec_id"] for r in out1.collect() if r["kept"]}
    assert kept1 > want


def test_semantic_dedup_depth2_matches_duckdb_twin(spark):
    """The depth-2 SQL twin unrolls BOTH recursion levels in the same
    arithmetic: full-relation equality against DuckDB on a planted
    two-level fixture (the certificate's guarantee, exercised in-test at
    a size where the second level genuinely runs)."""
    import duckdb

    dim = 8
    rng = np.random.default_rng(37)
    dirs = [np.eye(dim)[d] for d in range(4)]
    # 4 directions x 15 = 60 vectors; k=1, max_cluster=20: level 1 splits
    # ceil(60/20)=3 ways (seeds = dirs 0,1,2 by id layout), leaving at
    # least one 2-direction group > 20 for level 2 to split again
    vecs = [dirs[i % 4] + rng.normal(scale=1e-3, size=dim) for i in range(60)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        (r["vec_id"], r["centroid_id"], r["kept"])
        for r in sim.semantic_dedup(
            emb, k=1, iters=1, tau=0.9, dim=dim, max_cluster=20, depth=2
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {list(map(float, v))})" for i, v in rows)
        + ") t(vec_id, embedding)"
    )
    sql = "WITH " + sim.sql_semantic_dedup(
        "embeddings", k=1, iters=1, tau=0.9, max_cluster=20, depth=2
    ) + " SELECT vec_id, centroid_id, kept FROM semkept"
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_semantic_dedup_seed_window_prunes_map_side(spark):
    """r10 (r9 verdict item 1): the sub-centroid seed selection bounds its
    rank filter with a LITERAL max(nsplit), so InferWindowGroupLimit
    plants a Partial-mode WindowGroupLimit — every map partition is
    pruned to <= L rows BEFORE the exchange, and a planted giant cluster
    no longer sorts its whole membership inside one task. The `<= nsplit`
    refinement keeps per-cluster seed counts exact."""
    # m-shaped relation: one giant cluster (0: 1000 members, nsplit=4) and
    # one mildly-oversized cluster (1: 20 members, nsplit=2); ids interleaved
    rows = [(i, [float(i % 7), 1.0], 0, 4) for i in range(1000)]
    rows += [(10_000 + i, [2.0, float(i)], 1, 2) for i in range(20)]
    m = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, centroid_id int, nsplit long"
    )
    seeds = sim._seed_subcentroids(m, 4)
    plan = seeds._jdf.queryExecution().executedPlan().toString()
    wgl = [ln for ln in plan.splitlines() if "WindowGroupLimit" in ln]
    # Partial = map-side pruning before the exchange; Final after it
    assert any("Partial" in ln for ln in wgl), plan
    assert any("Final" in ln for ln in wgl), plan
    assert any("centroid_id" in ln for ln in wgl), plan
    got = sorted((r["centroid_id"], r["sub_id"]) for r in seeds.collect())
    # giant cluster seeds 4 lowest ids, the nsplit=2 cluster exactly 2 —
    # the literal bound (4) did NOT inflate the smaller cluster's seeds
    assert got == [(0, 0), (0, 1), (0, 2), (0, 3), (1, 0), (1, 1)]
    picked = {r["centroid_id"]: [] for r in seeds.collect()}
    for r in seeds.collect():
        picked[r["centroid_id"]].append((r["sub_id"], r["scvec"]))
    # lowest-id members: cluster 0 ids 0..3 -> vectors [i%7, 1.0]
    c0 = sorted(picked[0])
    assert [v for _, v in c0] == [[float(i % 7), 1.0] for i in range(4)]


def test_ann_recall_sweep_monotone_and_multiprobe_lifts(spark, sf_dir):
    """r9 sweep invariants: (a) per-query hit counts are non-decreasing in
    the probe radius / nprobe (candidate supersets — recall@5 cannot drop
    when candidates are only added), (b) multi-probe LIFTS total LSH
    recall strictly on the fixture (the r7-documented 0.2-0.4 random-data
    floor), (c) the Hamming-2 ball lifts it further."""
    from sarpro_spark.queries_llm import q_ann_recall_multiprobe

    rows = q_ann_recall_multiprobe(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["lsh_hits_p0"] <= r["lsh_hits_p1"] <= r["lsh_hits_p2"]
        assert r["ivf_hits_np1"] <= r["ivf_hits_np2"] <= r["ivf_hits_np4"]
    tot = {c: sum(r[c] for r in rows) for c in rows[0].asDict() if c != "query_id"}
    assert tot["lsh_hits_p1"] > tot["lsh_hits_p0"]
    assert tot["lsh_hits_p2"] > tot["lsh_hits_p1"]
    assert tot["ivf_hits_np4"] > tot["ivf_hits_np1"]


def test_neardup_multiprobe_levels_and_lift(spark, sf_dir):
    """r10 doc-side multi-probe (llm/dedup.py minhash_probe_candidates):
    (a) level semantics — identical docs collide at level 0; a pair
    engineered to agree on r-1 of r band positions only surfaces at
    level 1; (b) on the documents fixture the probe strictly lifts pair
    recovery at tau=0.3 (the documented 25->27 of 36) while candidates
    stay orders of magnitude under all-pairs."""
    import sarpro_spark.llm.dedup as dd
    from sarpro_spark.queries_llm import q_neardup_recall_multiprobe

    # (a) identical docs -> level 0
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "the quick brown fox jumps over the lazy dog"),
         (2, "a completely different document about spark engines")],
        "doc_id long, text string",
    )
    got = {(r["doc_a"], r["doc_b"]): r["level"]
           for r in dd.minhash_probe_candidates(docs, probe=1).collect()}
    assert got.get((0, 1)) == 0
    # probe=0 emits no leave-one-out keys at all
    p0 = {(r["doc_a"], r["doc_b"]): r["level"]
          for r in dd.minhash_probe_candidates(docs, probe=0).collect()}
    assert all(lv == 0 for lv in p0.values())
    assert set(p0) <= set(got)

    # (a2) r11 probe=2: leave-two-out keys are a superset of probe=1's and
    # levels never increase; rows_per_band < 3 fails loudly
    import pytest as pt

    p2 = {(r["doc_a"], r["doc_b"]): r["level"]
          for r in dd.minhash_probe_candidates(docs, probe=2).collect()}
    assert set(got) <= set(p2)
    assert all(p2[k] <= lv for k, lv in got.items())
    assert all(lv in (0, 1, 2) for lv in p2.values())
    with pt.raises(ValueError, match="rows per band"):
        dd.minhash_probe_candidates(docs, num_hashes=8, bands=4, probe=2)

    # (b) fixture sweep: monotone ladder with strict lift, bounded cost
    row = q_neardup_recall_multiprobe(spark, sf_dir).collect()[0]
    assert row["monotone_ok"]
    assert row["hits_p1"] > row["hits_p0"]
    assert row["hits_p2"] > row["hits_p1"]
    assert row["cand_p2"] >= row["cand_p1"] >= row["cand_p0"]
    assert row["recall_p2"] > row["recall_p1"] > row["recall_p0"]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert row["cand_p1"] < n_docs * (n_docs - 1) / 20  # nowhere near all-pairs


def test_semantic_dedup_recluster_matches_direct_scan(spark):
    """r9 (r8 verdict item 6): an OVERSIZED cluster is split by one bounded
    level of grouped k-means instead of an md5 salt — semantically-near
    vectors stay together, so a planted hot cluster prunes EXACTLY the
    pairs a direct (uncapped) within-cluster scan prunes. Fixture: three
    orthogonal directions x 30 near-identical vectors each, ids
    interleaved (id % 3 = direction); global k=1 collapses everything into
    one 90-vector cluster, max_cluster=30 forces nsplit=3, and the
    sub-kmeans (seeded by ids 0/1/2 — one per direction) recovers the
    directions. An md5 salt here would scatter each direction across
    sub-buckets and KEEP extra survivors; the re-cluster keeps exactly the
    direct-scan set."""
    dim = 64
    rng = np.random.default_rng(23)
    vecs = []
    for i in range(90):
        d = i % 3
        base = np.zeros(dim)
        base[d] = 1.0
        vecs.append(base + rng.normal(scale=1e-3, size=dim))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = sim.semantic_dedup(emb, k=1, iters=1, tau=0.35, dim=dim, max_cluster=30)
    got_kept = {r["vec_id"] for r in out.collect() if r["kept"]}
    # direct scan, same fround'd-cosine rule: drop v iff some u < v has
    # round6(cos(u, v)) >= tau
    arr = np.stack(vecs)
    norms = np.linalg.norm(arr, axis=1)
    cos = (arr @ arr.T) / np.outer(norms, norms)
    cos6 = np.floor(cos * 1e6 + 0.5) / 1e6
    want_kept = {
        v for v in range(90) if not any(cos6[u, v] >= 0.35 for u in range(v))
    }
    # the planted geometry keeps one vector per direction under the direct
    # rule — the fixture is doing what it claims
    assert want_kept == {0, 1, 2}
    assert got_kept == want_kept


def test_binary_quantization_hamming_rerank(spark):
    """r11 1-bit ANN: sign-bit packing is exact (known vector -> known
    words), hamming(x, x) = 0, a sign-flipped vector is at distance dim,
    and the rescored top-1 for a query that EQUALS a corpus vector is
    that vector with sim 1.0 — while the shortlist rule is observable
    (hamming carried next to sim)."""
    import sarpro_spark.llm.similarity as sim

    dim = 64
    base = [1.0 if i % 3 == 0 else -1.0 for i in range(dim)]
    flipped = [-x for x in base]
    near = list(base)
    near[5] = -near[5]  # one sign flip -> hamming 1
    emb = spark.createDataFrame(
        [(0, base), (1, flipped), (2, near)],
        "vec_id long, embedding array<double>",
    )
    qb = sim.quantize_binary(emb, dim=dim).orderBy("vec_id").collect()
    # bit i of word w set iff dim 32w+i positive
    want0 = sum(1 << i for i in range(32) if i % 3 == 0)
    want1 = sum(1 << (i - 32) for i in range(32, 64) if i % 3 == 0)
    assert (qb[0]["b0"], qb[0]["b1"]) == (want0, want1)
    assert (qb[1]["b0"] & qb[0]["b0"]) == 0 and (qb[1]["b1"] & qb[0]["b1"]) == 0

    queries = spark.createDataFrame(
        [(100, base)], "query_id long, qvec array<double>"
    )
    out = {r["vec_id"]: r for r in
           sim.cosine_topk_binary(emb, queries, k=3, dim=dim).collect()}
    assert out[0]["hamming"] == 0 and out[0]["rnk"] == 1 and out[0]["sim"] == 1.0
    assert out[2]["hamming"] == 1
    assert out[1]["hamming"] == dim and out[1]["sim"] == -1.0


def test_binary_recall_sweep_monotone(spark, sf_dir):
    """r11: the 1-bit recall frontier is monotone in the shortlist
    multiplier per query (superset shortlist reranked by the same global
    order), every recall is in [0,1], and the largest multiplier beats or
    ties the smallest in aggregate."""
    from sarpro_spark.queries_llm import q_ann_recall_binary

    rows = q_ann_recall_binary(spark, sf_dir).collect()
    assert len(rows) == 15  # 5 queries x 3 multipliers
    assert all(r["monotone_ok"] for r in rows)
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    tot = {m: 0 for m in (1, 2, 4)}
    for r in rows:
        tot[r["mult"]] += r["hits"]
    assert tot[1] <= tot[2] <= tot[4]


# --- exact-substring dedup (suffix-array class, r11) --------------------------


@pytest.fixture(scope="module")
def run_docs(spark):
    shared = "x" * 0 + "the shared boilerplate sentence that repeats across documents verbatim here"
    rows = [
        (0, "unique preamble alpha. " + shared + " unique tail alpha."),
        (1, "different opening beta text. " + shared + " beta closing words here."),
        (2, "no overlap with anything else; entirely fresh content in this row."),
        # two disjoint shared runs with doc 0 (tests multi-span + islands):
        (3, "unique preamble alpha. " + shared[:40] + " GAPGAPGAPGAP " + shared[-45:]),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_substring_spans_finds_shared_run(spark, run_docs):
    from sarpro_spark.llm import substring as ssub

    spans = ssub.exact_substring_spans(run_docs, min_len=30).collect()
    by_pair = {}
    for r in spans:
        by_pair.setdefault((r["doc_a"], r["doc_b"]), []).append(r)
    # docs 0 and 1 share the full boilerplate sentence
    assert (0, 1) in by_pair
    longest = max(r["span_len"] for r in by_pair[(0, 1)])
    shared_len = len("the shared boilerplate sentence that repeats across documents verbatim here")
    assert longest >= shared_len
    # the span really is the claimed substring (verify step keeps it honest)
    texts = {r["doc_id"]: r["text"] for r in run_docs.collect()}
    for r in spans:
        a = texts[r["doc_a"]][r["start_a"] - 1 : r["start_a"] - 1 + r["span_len"]]
        b = texts[r["doc_b"]][r["start_b"] - 1 : r["start_b"] - 1 + r["span_len"]]
        assert a == b and len(a) == r["span_len"]
    # doc 2 shares nothing
    assert not any(2 in p for p in by_pair)


def test_exact_substring_pairs_and_removal(spark, run_docs):
    from sarpro_spark.llm import substring as ssub

    pairs = {(r["doc_a"], r["doc_b"]): r for r in ssub.exact_substring_pairs(run_docs, min_len=30).collect()}
    assert (0, 1) in pairs
    # doc 0 vs 3: prefix run ("unique preamble alpha. " + first 40 of shared)
    # and the disjoint tail run -> at least 2 spans on different diagonals
    assert (0, 3) in pairs and pairs[(0, 3)]["n_spans"] >= 2

    rem = {r["doc_id"]: r for r in ssub.exact_substring_removal(run_docs, min_len=30).collect()}
    assert 2 not in rem  # clean doc never appears
    for r in rem.values():
        assert 0 < r["duplicated_chars"] <= r["doc_chars"]
        assert r["clean_chars"] == r["doc_chars"] - r["duplicated_chars"]
        assert 0.0 < r["dup_ratio"] <= 1.0
    # doc 0's intervals from docs 1 and 3 overlap; the union must not
    # exceed the doc length (double-count guard)
    assert rem[0]["duplicated_chars"] < rem[0]["doc_chars"]


def test_exact_substring_gram_df_cap(spark):
    from sarpro_spark.llm import substring as ssub

    # 10 identical docs: every anchor gram has df=10; cap at 4 suppresses all
    rows = [(i, "an identical boilerplate document body repeated many times over") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ssub.exact_substring_pairs(df, min_len=20, max_gram_df=4)
    assert capped.count() == 0
    uncapped = ssub.exact_substring_pairs(df, min_len=20, max_gram_df=100)
    assert uncapped.count() == 45  # all C(10,2) pairs


def test_exact_substring_removal_tied_intervals_merge(spark):
    """Two partners sharing one region emit IDENTICAL (doc, s, e) intervals;
    the merge must count the region ONCE (r13 gate find: fully-tied island
    window keys made the DuckDB twin nondeterministic — 248 duplicated chars
    in a 124-char doc on 6/20 runs; both engines now dedupe intervals before
    the window, which is result-identical and tie-free by construction)."""
    from sarpro_spark.llm import substring as ssub

    body = "the one shared boilerplate body that is long enough to anchor"
    # doc 0 duplicates BOTH doc 1 and doc 2 over the same full-body region
    rows = [(0, body), (1, body + " tail-a unique"), (2, body + " tail-b other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rem = {r["doc_id"]: r for r in ssub.exact_substring_removal(df, min_len=20).collect()}
    assert rem[0]["n_intervals"] == 1
    assert rem[0]["duplicated_chars"] == len(body)
    assert rem[0]["clean_chars"] == 0
    assert rem[0]["dup_ratio"] == 1.0


# --- record linkage (llm/linkage.py, r11) --------------------------------------


def test_fuzzy_best_match_resolves_dirty_mentions(spark):
    from sarpro_spark.llm.linkage import blocked_candidates, fuzzy_best_match

    dic = spark.createDataFrame(
        [(1, "apple pie"), (2, "banana split"), (3, "carrot cake")],
        "name_id long, name string",
    )
    mentions = spark.createDataFrame(
        [
            (10, "aple pie"),       # deletion -> apple pie
            (11, "banana splat"),   # substitution -> banana split
            (12, "carrot cake"),    # exact
            (13, "zzzzzz qqqq"),    # matches nothing
        ],
        "mid long, name string",
    )
    best = {r["lid"]: r for r in
            fuzzy_best_match(mentions, dic, "mid", "name", "name_id", "name").collect()}
    assert best[10]["best_name"] == "apple pie" and best[10]["best_dist"] == 1
    assert best[11]["best_name"] == "banana split" and best[11]["best_dist"] == 1
    assert best[12]["best_dist"] == 0
    assert 13 not in best  # nothing within distance 2

    # the count filter keeps unrelated strings out of the candidate set
    cand = blocked_candidates(mentions, dic, "mid", "name", "name_id", "name")
    pairs = {(r["lid"], r["rid"]) for r in cand.collect()}
    assert (13, 1) not in pairs and (13, 2) not in pairs and (13, 3) not in pairs


def test_fuzzy_match_repetitive_strings_multiset_bound(spark):
    """Regression (r12): the Gravano bound holds for MULTISET gram counts.

    'abababababababab' (len 16) has only 2 distinct 3-grams but 14 with
    multiplicity; the count bound max(16,16)-2-6 = 8 prunes it under set
    semantics, so even its exact duplicate was silently unmatched before
    the occurrence-indexed join.
    """
    from sarpro_spark.llm.linkage import fuzzy_best_match

    s = "ab" * 8
    dic = spark.createDataFrame([(1, s)], "name_id long, name string")
    mentions = spark.createDataFrame(
        [(10, s), (11, s[:-2] + "ba")], "mid long, name string"
    )
    best = {r["lid"]: r for r in
            fuzzy_best_match(mentions, dic, "mid", "name", "name_id", "name").collect()}
    assert best[10]["best_dist"] == 0  # exact duplicate now matches
    assert best[11]["best_dist"] == 2  # swap = 2 edits, still within bound


def test_fuzzy_match_hot_gram_cap(spark):
    from sarpro_spark.llm.linkage import fuzzy_best_match

    # every dictionary entry shares the gram-rich suffix; cap at 1 kills
    # all blocking -> no matches survive (deterministic, mirrored in SQL)
    dic = spark.createDataFrame(
        [(i, f"item {i:02d} common suffix") for i in range(20)], "name_id long, name string"
    )
    mentions = spark.createDataFrame([(0, "item 00 common sufix")], "mid long, name string")
    assert fuzzy_best_match(mentions, dic, "mid", "name", "name_id", "name", max_gram_df=1).count() == 0
    hit = fuzzy_best_match(mentions, dic, "mid", "name", "name_id", "name").collect()
    assert hit and hit[0]["best_name"] == "item 00 common suffix"


# --- distributed OLS (llm/regression.py, r11) ----------------------------------


def test_ols_fit_recovers_exact_plane(spark):
    from pyspark.sql import functions as F

    from sarpro_spark.llm.regression import ols_fit

    # exact plane y = 2 + 3*x1 - 0.5*x2: coefficients recovered, r2 == 1
    df = spark.range(200).select(
        (F.col("id") % 13).cast("double").alias("x1"),
        (F.col("id") % 7).cast("double").alias("x2"),
    ).withColumn("y", 2.0 + 3.0 * F.col("x1") - 0.5 * F.col("x2"))
    row = ols_fit(df, "y", "x1", "x2").collect()[0]
    assert abs(row["b0"] - 2.0) < 1e-5
    assert abs(row["b1"] - 3.0) < 1e-5
    assert abs(row["b2"] + 0.5) < 1e-5
    assert abs(row["r2"] - 1.0) < 1e-6


def test_ols_fit_matches_numpy_and_guards_degenerate(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from sarpro_spark.llm.regression import ols_fit

    # noisy data (deterministic hash noise): match numpy lstsq
    df = spark.range(500).select(
        (F.col("id") % 17).cast("double").alias("x1"),
        (F.col("id") % 5).cast("double").alias("x2"),
        ((F.xxhash64(F.col("id")) % 1000).cast("double") / 1000.0).alias("noise"),
    ).withColumn("y", 1.5 - 2.0 * F.col("x1") + 4.0 * F.col("x2") + F.col("noise"))
    pdf = df.toPandas()
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    beta = np.linalg.lstsq(X, pdf.y.values, rcond=None)[0]
    row = ols_fit(df, "y", "x1", "x2").collect()[0]
    assert abs(row["b0"] - beta[0]) < 1e-4
    assert abs(row["b1"] - beta[1]) < 1e-4
    assert abs(row["b2"] - beta[2]) < 1e-4
    assert 0.9 < row["r2"] <= 1.0

    # constant predictor -> singular normal matrix -> NULLs, never garbage
    dg = spark.range(50).select(
        F.lit(1.0).alias("x1"), F.lit(1.0).alias("x2"),
        (F.col("id") % 3).cast("double").alias("y"),
    )
    drow = ols_fit(dg, "y", "x1", "x2").collect()[0]
    assert drow["b0"] is None and drow["b1"] is None and drow["b2"] is None


# --- BM25 retrieval (llm/bm25.py, r12) ------------------------------------------


def test_bm25_ranks_exact_match_first(spark):
    from sarpro_spark.llm.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple apple apple apple"),
            (3, "banana banana kiwi"),
            (4, "totally unrelated words here"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(100, "apple banana")], "query_id long, qtext string")
    out = bm25_topk(docs, qs, k=3).collect()
    assert [r["doc_id"] for r in out if r["rnk"] == 1] == [1]  # covers both terms
    ranked = {r["doc_id"] for r in out}
    assert 4 not in ranked  # shares no term -> never a candidate


def test_bm25_length_normalization(spark):
    from sarpro_spark.llm.bm25 import bm25_topk

    # same tf of the query term; shorter doc must score higher (b > 0)
    docs = spark.createDataFrame(
        [
            (1, "target word"),
            (2, "target word padding padding padding padding padding padding"),
            (3, "other content entirely different"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(1, "target")], "query_id long, qtext string")
    out = {r["doc_id"]: r for r in bm25_topk(docs, qs, k=3).collect()}
    assert out[1]["score"] > out[2]["score"]
    assert out[1]["rnk"] == 1


def test_bm25_spark_matches_duckdb_twin(spark):
    import duckdb

    from sarpro_spark.llm.bm25 import bm25_topk, sql_bm25_topk

    rows = [(i, f"term{i % 7} term{i % 3} shared word{'s' * (i % 4)} tail") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs_rows = [(i, f"term{i % 7} shared") for i in (0, 1, 2)]
    qs = spark.createDataFrame(qs_rows, "query_id long, qtext string")
    got = {
        (r["query_id"], r["rnk"]): (r["doc_id"], r["score"])
        for r in bm25_topk(docs, qs, k=4).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES " +
                ",".join(f"({i}, '{t}')" for i, t in rows) + ") t(doc_id, text)")
    con.execute("CREATE TABLE q AS SELECT * FROM (VALUES " +
                ",".join(f"({i}, '{t}')" for i, t in qs_rows) + ") t(query_id, qtext)")
    want = {
        (qid, rnk): (did, sc)
        for qid, did, sc, rnk in con.execute(sql_bm25_topk("d", "q", k=4)).fetchall()
    }
    assert got == want


# --- perceptual image hashing (llm/imagehash.py, r12) ---------------------------


def test_phash_invariant_under_nn_upscale():
    from sarpro_spark.llm.imagehash import dhash_from_gray, phash_from_gray

    rng_free = mm.formula_image(42, 23, 17, 1)  # deterministic fixture image
    up2 = np.repeat(np.repeat(rng_free, 2, axis=0), 2, axis=1)
    up3 = np.repeat(np.repeat(rng_free, 3, axis=0), 3, axis=1)
    assert phash_from_gray(rng_free) == phash_from_gray(up2) == phash_from_gray(up3)
    assert dhash_from_gray(rng_free) == dhash_from_gray(up2) == dhash_from_gray(up3)


def test_phash_robust_to_jpeg_reencode():
    """The perceptual property itself: a lossy JPEG re-encode of the same
    image stays within a small Hamming distance, while a different image
    is far away. Runs driver-side on the in-repo codecs (no Spark)."""
    from sarpro_spark.llm.imagehash import _gray_int, phash_from_gray
    from sarpro_spark.sinks.jpeg import encode_jpeg

    img = mm.formula_image(7, 24, 20, 3)
    jpeg = mm.decode_image(encode_jpeg(img, 90))
    h_orig = phash_from_gray(_gray_int(img))
    h_jpeg = phash_from_gray(_gray_int(jpeg))
    other = mm.formula_image(8, 24, 20, 3)
    h_other = phash_from_gray(_gray_int(other))

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert ham(h_orig, h_jpeg) <= 10
    assert ham(h_orig, h_other) > 10


def test_phash_neardup_pairs_finds_planted(spark):
    from sarpro_spark.llm.imagehash import (
        attach_image_payload_resized_dups,
        image_hashes,
        phash_neardup_pairs,
    )

    ids = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    payloads = attach_image_payload_resized_dups(ids)
    pairs = phash_neardup_pairs(image_hashes(payloads)).collect()
    planted = {(r["doc_a"], r["doc_b"]) for r in pairs
               if r["doc_a"] % 20 == 0 and r["doc_b"] == r["doc_a"] + 10}
    assert planted == {(a, a + 10) for a in range(0, 120, 20)}
    for r in pairs:
        if (r["doc_a"], r["doc_b"]) in planted:
            assert r["ph_dist"] == 0 and r["dh_dist"] == 0


# --- video frame-vote near-dup (llm/videohash.py, r13) ---------------------------


def test_video_neardup_finds_planted_rescaled_and_shifted(spark):
    """The VIDEO cell of the dedup matrix: planted 2x-rescaled clips match
    on ALL frames (NN-upscale pHash invariance, distance 0); planted
    1-frame-shifted clips match on N-1 of N frames per side (content-keyed
    voting, not index alignment); nothing else clears the vote."""
    from sarpro_spark.llm import videohash as vh

    ids = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    fh = vh.video_frame_hashes(vh.attach_video_payload_dups(ids))
    pairs = {(r["doc_a"], r["doc_b"]): r for r in vh.video_neardup_pairs(fh).collect()}
    expect = {(a, a + 10) for a in range(0, 120, 20)}
    assert set(pairs) == expect
    for (a, b), r in pairs.items():
        n = vh.CLIP_FRAMES
        want = n if b % 40 == 10 else n - 1  # rescaled: all; shifted: all but 1
        assert (r["matched_a"], r["matched_b"]) == (want, want)
        assert (r["n_frames_a"], r["n_frames_b"]) == (n, n)


def test_video_split_concat_png_roundtrip():
    """Marker-scan frame splitting recovers exactly the encoded frames."""
    import numpy as np

    from sarpro_spark.llm.multimodal import formula_image, safe_decode_image
    from sarpro_spark.llm.videohash import split_concat_png
    from sarpro_spark.sinks.png import encode_png

    frames = [formula_image(7, 12, 9, 3, frame=f) for f in range(4)]
    blob = b"".join(encode_png(f) for f in frames)
    parts = split_concat_png(blob)
    assert len(parts) == 4
    for orig, part in zip(frames, parts):
        img, ok = safe_decode_image(part)
        assert ok and np.array_equal(np.asarray(img), orig)


# --- winnow-anchored ExactSubstr (llm/substring_winnow.py, r12) ------------------


def test_winnowed_substring_equals_full_density(spark):
    """The scale path must reproduce the full-density spans exactly when
    every true run >= min_len (>= w+k-1): shared-run family, repetitive
    near-identical template docs, periodic multi-diagonal docs."""
    from sarpro_spark.llm import substring as ssub
    from sarpro_spark.llm import substring_winnow as sw

    rows = []
    shared = "the quick brown fox jumps over the lazy dog again and again!"
    for i in range(8):
        rows.append((i, f"prefix{i:02d} " + "x" * (i % 5) + shared + f" tail {i:02d}"))
    for i in range(8, 20):
        rows.append((i, f"template number {i} with nothing shared at all beyond short words {i*i}"))
    rows.append((20, "ab" * 60))
    rows.append((21, "ab" * 55 + " trailing bits here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {tuple(r) for r in ssub.exact_substring_pairs(df, min_len=40).collect()}
    win = {tuple(r) for r in sw.exact_substring_pairs_winnowed(df, min_len=40).collect()}
    assert win == full and len(full) > 0


def test_winnowed_substring_anchor_reduction(spark):
    """The point of the path: winnow anchors are ~2/(w+1) of full density
    on non-duplicated text (the shuffle-volume reduction, measured)."""
    from sarpro_spark.llm import substring_winnow as sw

    rows = [(i, f"completely unique document body number {i:04d} "
             + " ".join(f"tok{i}x{j}" for j in range(30))) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    total_chars = sum(len(t) for _, t in rows)
    n_anchors = sw.winnow_anchors(df).count()
    # expected density 2/(w+1) = 2/17 ~ 0.118; allow generous headroom
    assert n_anchors < 0.25 * total_chars
    assert n_anchors > 0.02 * total_chars


def test_winnowed_substring_long_doc_regression(spark):
    """r12 verdict defect 1: docs >= 2^20 chars were silently excluded from
    the winnowed path (POS_ENC was 2^20).  Two book-length (>1M-char) docs
    share a planted 200-char span; with POS_ENC widened to 2^32 the span
    must surface, and the hashed excluded_docs counter must read 0."""
    from sarpro_spark.llm import substring_winnow as sw

    span = ("shared duplicated sentence that both long documents contain "
            "verbatim and that substring dedup must recover exactly once. "
            "it is long enough to clear the min_len forty threshold with a "
            "very comfortable margin indeed!!")[:200]
    assert len(span) == 200
    n_blocks = 135_000  # 8 chars/block -> 1.08M chars, past the old 2^20 bound
    fill_a = "".join(f"A{i:07d}" for i in range(n_blocks))
    fill_b = "".join(f"B{i:07d}" for i in range(n_blocks))
    text_a = fill_a[: len(fill_a) // 2] + span + fill_a[len(fill_a) // 2:]
    text_b = fill_b[: len(fill_b) // 3] + span + fill_b[len(fill_b) // 3:]
    assert min(len(text_a), len(text_b)) > (1 << 20)
    df = spark.createDataFrame([(0, text_a), (1, text_b)], "doc_id long, text string")
    assert sw.excluded_long_docs(df).collect()[0]["excluded_docs"] == 0
    spans = sw.exact_substring_spans_winnowed(df, min_len=40).collect()
    assert len(spans) == 1
    r = spans[0]
    # maximal run may extend a couple chars where filler digits coincide
    assert (r["doc_a"], r["doc_b"]) == (0, 1) and 200 <= r["span_len"] <= 210
    run_a = text_a[r["start_a"] - 1 : r["start_a"] - 1 + r["span_len"]]
    run_b = text_b[r["start_b"] - 1 : r["start_b"] - 1 + r["span_len"]]
    assert run_a == run_b and span in run_a


# --- product quantization ANN (llm/similarity.py, r12) ---------------------------


def test_pq_topk_self_and_copy_first(spark, emb):
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = sim.cosine_topk_pq(emb, queries, k=3, m=4, ksub=8, dim=16).collect()
    assert [r["vec_id"] for r in out if r["rnk"] == 1] == [0]  # exact rerank: self
    assert [r["vec_id"] for r in out if r["rnk"] == 2] == [7]  # scaled copy
    for r in out:
        assert -1.0 - 1e-9 <= r["adc_sim"] <= 1.0 + 1e-9  # reconstructed cosine


def test_ivfpq_topk_self_and_copy_first(spark, emb):
    """IVF-PQ (r13): with nprobe covering the self list, the exact rerank
    puts self first and the scaled copy second — same contract as the
    PQ-only rung, now through the probed-list candidate gate."""
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = sim.cosine_topk_ivfpq(
        emb, queries, k=3, n_centroids=4, nprobe=4, m=4, ksub=8, dim=16
    ).collect()
    assert [r["vec_id"] for r in out if r["rnk"] == 1] == [0]
    assert [r["vec_id"] for r in out if r["rnk"] == 2] == [7]
    for r in out:
        assert -1.0 - 1e-9 <= r["adc_sim"] <= 1.0 + 1e-9


def test_ivfpq_recall_monotone_in_mult_per_probe(spark, emb):
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    rows = sim.ivfpq_recall_sweep(
        emb, queries, k=3, nprobes=(1, 2), mults=(1, 2), n_centroids=4,
        m=4, ksub=8, dim=16,
    ).collect()
    assert all(r["monotone_ok"] for r in rows)
    assert all(0 <= r["hits"] <= 3 for r in rows)
    # full probe coverage at nprobe = n_centroids would be exact; at 2 of 4
    # lists recall is a frontier — just require the grid is fully populated
    assert {(r["nprobe"], r["mult"]) for r in rows} == {(1, 1), (1, 2), (2, 1), (2, 2)}


def test_pq_recall_monotone_and_saturates(spark, emb):
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    rows = sim.pq_recall_sweep(emb, queries, k=3, mults=(1, 2, 4), m=4, ksub=8, dim=16).collect()
    assert all(r["monotone_ok"] for r in rows)
    by_mult = {}
    for r in rows:
        by_mult.setdefault(r["mult"], []).append(r["hits"])
    assert sum(by_mult[4]) >= sum(by_mult[1])
    assert all(0 <= h <= 3 for hs in by_mult.values() for h in hs)


# --- audio fingerprinting (llm/audiohash.py, r12) --------------------------------


def test_afp_invariant_under_repeat_and_gain():
    from sarpro_spark.llm.audiohash import DEFAULT_MAX_HAMMING, afp_from_samples

    s = mm.formula_audio(42, 517).astype(np.int64)
    assert afp_from_samples(s) == afp_from_samples(np.repeat(s, 2))
    assert afp_from_samples(s) == afp_from_samples(np.repeat(s, 3))
    # positive uniform gain preserves every delta-sign bit (no clipping at
    # int64; the PCM16 planted fixture uses repetition only for this reason)
    assert afp_from_samples(s) == afp_from_samples(s * 7)
    # a structurally different clip is far away (adjacent formula ids are
    # legitimately near — the +31 offset barely moves block energies, which
    # is exactly the near-dup sensitivity the banded join exploits)
    other = mm.formula_audio(997, 731).astype(np.int64)
    h, o = afp_from_samples(s), afp_from_samples(other)
    dist = bin(h[0] ^ o[0]).count("1") + bin(h[1] ^ o[1]).count("1")
    assert dist > DEFAULT_MAX_HAMMING


def test_afp_neardup_pairs_finds_planted(spark):
    from sarpro_spark.llm.audiohash import (
        afp_neardup_pairs,
        attach_wav_payload_stretched_dups,
        audio_fingerprints,
    )

    ids = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    payloads = attach_wav_payload_stretched_dups(ids)
    pairs = afp_neardup_pairs(audio_fingerprints(payloads)).collect()
    planted = {(r["doc_a"], r["doc_b"]) for r in pairs
               if r["doc_a"] % 20 == 0 and r["doc_b"] == r["doc_a"] + 10}
    assert planted == {(a, a + 10) for a in range(0, 120, 20)}
    for r in pairs:
        if (r["doc_a"], r["doc_b"]) in planted:
            assert r["afp_dist"] == 0


def test_afp_corrupt_payload_degrades(spark):
    from sarpro_spark.llm.audiohash import audio_fingerprints

    good = mm.encode_wav(mm.formula_audio(5, 450))
    rows = [(1, bytearray(good)), (2, bytearray(b"\x00garbage not riff")), (3, bytearray(good[:20]))]
    df = spark.createDataFrame(rows, "doc_id long, wav binary")
    out = {r["doc_id"]: r for r in audio_fingerprints(df).collect()}
    assert out[1]["decode_ok"] and out[1]["afp_hi"] is not None
    assert not out[2]["decode_ok"] and out[2]["afp_hi"] is None
    assert not out[3]["decode_ok"]


# --- exact set-similarity join via prefix filtering (llm/setjoin.py, r12) --------


def test_allpairs_equals_brute_force(spark):
    """Losslessness on an adversarial fixture: two near-identical docs whose
    shared shingles are ALL corpus-hot (every doc embeds the same template),
    exactly the pair a df-capped candidate generator can drop."""
    from fractions import Fraction

    from sarpro_spark.llm.setjoin import allpairs_jaccard_pairs

    template = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [(i, template + f" variant {i:03d}") for i in range(30)]
    rows.append((30, template + " variant 007"))  # near-identical to doc 7
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["inter_size"]
           for r in allpairs_jaccard_pairs(df, threshold=Fraction(4, 5)).collect()}
    # brute force driver-side
    def sh(t):
        t = t.lower()
        return {t[i:i + 5] for i in range(len(t) - 4)}
    sets = {i: sh(t) for i, t in rows}
    brute = {}
    for a in sets:
        for b in sets:
            if a < b:
                i = len(sets[a] & sets[b])
                u = len(sets[a] | sets[b])
                if i * 5 >= u * 4:
                    brute[(a, b)] = i
    assert got == brute and (7, 30) in brute


def test_allpairs_prefix_prunes(spark):
    """The prefix relation is ~(1-t) of the shingle relation and the
    candidate set is smaller than all-pairs on a distinctive corpus."""
    from fractions import Fraction

    from sarpro_spark.llm.setjoin import allpairs_prefix_stats

    rows = [(i, f"wholly distinct body {i:04d} " + " ".join(
        f"w{i}q{j}" for j in range(25))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = allpairs_prefix_stats(df, threshold=Fraction(4, 5)).collect()[0]
    assert r["n_prefix"] < 0.35 * r["n_tok"]
    assert r["n_candidates"] <= r["n_cand_prefix_only"] < 40 * 39 / 2
    assert r["n_pairs"] == 0


def test_ppjoin_positional_filter_prunes_low_vocab(spark):
    """r13 (verdict item 2): on a LOW-VOCABULARY dictionary corpus (the
    raw documents table's shape — every pair heavily co-shingled) the r12
    prefix-only candidate set was near-quadratic; the accumulation-form
    positional filter must cut it >= 5x while the planted duplicate — the
    one true pair — survives (losslessness is separately proven by the
    brute-force-oracle equality of test_allpairs_equals_brute_force)."""
    import hashlib
    from fractions import Fraction

    from sarpro_spark.llm.setjoin import allpairs_jaccard_pairs, allpairs_prefix_stats

    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
             "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
             "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
             "victor", "whiskey", "xray", "yankee", "zulu", "red", "green",
             "blue", "amber", "teal"]

    def words(i, n=40):
        return " ".join(
            vocab[int(hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:8], 16) % 31]
            for j in range(n)
        )

    rows = [(i, words(i)) for i in range(80)]
    rows.append((80, words(7)))  # planted exact duplicate of doc 7
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = allpairs_prefix_stats(df, threshold=Fraction(4, 5)).collect()[0]
    assert r["n_cand_prefix_only"] >= 5 * r["n_candidates"]
    assert r["n_pairs"] == 1
    got = {(p["doc_a"], p["doc_b"])
           for p in allpairs_jaccard_pairs(df, threshold=Fraction(4, 5)).collect()}
    assert got == {(7, 80)}


def test_allpairs_threshold_is_exact_boundary(spark):
    """Integer threshold compare: a pair at exactly J = t is kept, one
    shingle below is dropped (no float-boundary disagreement)."""
    from fractions import Fraction

    from sarpro_spark.llm.setjoin import allpairs_jaccard_pairs

    # craft sets via distinct 5-char tokens separated so shingles differ
    base = ["aaa%02d" % k for k in range(8)]
    a_txt = " ".join(base)
    b_txt = " ".join(base[:6] + ["zzz98", "zzz99"])
    df = spark.createDataFrame([(1, a_txt), (2, b_txt)], "doc_id long, text string")
    def sh(t):
        t = t.lower()
        return {t[i:i + 5] for i in range(len(t) - 4)}
    i = len(sh(a_txt) & sh(b_txt)); u = len(sh(a_txt) | sh(b_txt))
    t_exact = Fraction(i, u)
    kept = allpairs_jaccard_pairs(df, threshold=t_exact).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in kept] == [(1, 2)]
    dropped = allpairs_jaccard_pairs(df, threshold=Fraction(i + 1, u)).collect()
    assert dropped == []


# --- entity resolution survivorship (llm/resolution.py, r12) ---------------------


def test_resolution_survivorship_rules(spark):
    """Hand-checkable cluster: three linked records — canonical name is
    the longest (ties greatest), price the max, brand the mode with
    deterministic tie-break; a singleton resolves to itself."""
    from sarpro_spark.llm.resolution import resolve_entities

    records = spark.createDataFrame(
        [
            (1, "acme corp", 100, "B#1", "dict"),
            (2, "acme corporation", 90, "B#2", "mention"),
            (3, "acme c", 120, "B#2", "mention"),
            (9, "lonely ltd", 50, "B#9", "dict"),
        ],
        "rid long, name string, price_cents long, brand string, src string",
    )
    pairs = spark.createDataFrame([(2, 1), (3, 1)], "doc_a long, doc_b long")
    rows = {r["entity_id"]: r for r in resolve_entities(records, pairs).collect()}
    assert set(rows) == {1, 9}
    e = rows[1]
    assert e["n_members"] == 3 and e["n_mentions"] == 2
    assert e["canonical_name"] == "acme corporation"
    assert e["latest_price"] == 120
    assert e["majority_brand"] == "B#2"  # 2 votes beat 1
    s = rows[9]
    assert s["n_members"] == 1 and s["canonical_name"] == "lonely ltd"


def test_resolution_tie_breaks_deterministic(spark):
    """Equal-length names -> lexicographically greatest; equal brand
    counts -> greatest brand (the hashed tie-break contract)."""
    from sarpro_spark.llm.resolution import resolve_entities

    records = spark.createDataFrame(
        [
            (1, "aaaa", 1, "B#1", "dict"),
            (2, "zzzz", 1, "B#2", "mention"),
        ],
        "rid long, name string, price_cents long, brand string, src string",
    )
    pairs = spark.createDataFrame([(2, 1)], "doc_a long, doc_b long")
    e = resolve_entities(records, pairs).collect()[0]
    assert e["canonical_name"] == "zzzz" and e["majority_brand"] == "B#2"
