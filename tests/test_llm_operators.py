"""Tests for the LLM-data-pipeline operators: dedup family, text
analysis, similarity search, multimodal columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators import dedup as dd
from etl_spark_gradle_spark.operators import multimodal as mm
from etl_spark_gradle_spark.operators import similarity as sim
from etl_spark_gradle_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The  quick brown fox jumps over the lazy DOG"),  # normalized dup of 1
        (4, "the quick brown fox jumps over a sleepy dog"),  # near-dup of 1
        (5, "completely different content about spark engines"),
        (6, "el rapido zorro marron salta sobre el perro"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# -- dedup ------------------------------------------------------------------


def test_ensure_parallelism_conf_opt_out(spark):
    from etl_spark_gradle_spark.operators.dedup import _ensure_parallelism

    df = spark.createDataFrame([(i,) for i in range(10)], ["x"]).coalesce(1)
    assert _ensure_parallelism(df).rdd.getNumPartitions() > 1
    spark.conf.set("spark.etlgradle.ensureParallelism", "false")
    try:
        assert _ensure_parallelism(df).rdd.getNumPartitions() == 1
    finally:
        spark.conf.unset("spark.etlgradle.ensureParallelism")


def test_exact_dedup_content_hash(docs):
    out = dd.exact_dedup(docs, content_col="text", tiebreak_col="doc_id")
    kept = sorted(r.doc_id for r in out.collect())
    # 1,2,3 share a normalized fingerprint -> survivor is min doc_id 1
    assert kept == [1, 4, 5, 6]


def test_exact_dedup_keys_first_seen(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 5), (2, "c", 7)], ["k", "v", "ord"]
    )
    out = dd.exact_dedup(df, keys=["k"], tiebreak_col="ord")
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: "b", 2: "c"}  # min ord wins deterministically


def test_exact_dedup_incremental_against_store(spark, docs):
    """New batch vs persisted content-hash store: in-batch dups collapse
    first, then anything already in the corpus is dropped — both join
    strategies agree, and the store never needs the corpus text."""
    corpus = docs.filter("doc_id <= 3")  # all one normalized fingerprint
    seen = dd.content_hash_store(corpus, "text")
    assert seen.count() == 1
    new_batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # in corpus
            (11, "brand new document about incremental processing"),
            (12, "brand new document about incremental processing"),  # in-batch dup
            (13, "another unseen document entirely"),
        ],
        ["doc_id", "text"],
    )
    for strategy in ("broadcast_batch", "shuffle"):
        out = dd.exact_dedup_incremental(
            new_batch, seen, content_col="text", tiebreak_col="doc_id",
            strategy=strategy,
        )
        assert sorted(r.doc_id for r in out.collect()) == [11, 13], strategy
    # appending the survivors' hashes makes a rerun drop everything
    survivors = dd.exact_dedup_incremental(
        new_batch, seen, content_col="text", tiebreak_col="doc_id"
    )
    seen2 = seen.union(dd.content_hash_store(survivors, "text"))
    rerun = dd.exact_dedup_incremental(
        new_batch, seen2, content_col="text", tiebreak_col="doc_id"
    )
    assert rerun.count() == 0


def test_incremental_minhash_matches_batch_candidates(docs):
    """Store-backed cross candidates must equal the cross subset of the
    full-batch LSH run at the same family parameters — the incremental
    path loses nothing."""
    kw = dict(n=2, num_hashes=64, bands=32, use_tokens=True)
    old = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    store = dd.minhash_band_store(old, "doc_id", "text", **kw)
    for strategy in ("broadcast_batch", "shuffle"):
        cross = {
            (r.new_id, r.old_id)
            for r in dd.incremental_minhash_candidates(
                new, store, "doc_id", "text", strategy=strategy, **kw
            ).collect()
        }
        full = {
            (r.id_a, r.id_b)
            for r in dd.minhash_lsh_candidates(
                docs, id_col="doc_id", text_col="text", **kw
            ).collect()
        }
        full_cross = {
            (a, b) if a % 2 == 1 else (b, a)
            for (a, b) in full
            if (a % 2) != (b % 2)
        }
        assert cross == full_cross and len(cross) > 0, strategy
    assert (1, 2) in cross  # identical docs across the parity split


def test_incremental_minhash_store_never_shuffles(docs):
    """broadcast_batch plan shape: the store side of the band join must
    not sit under an Exchange — the corpus state is scanned in place."""
    kw = dict(n=2, num_hashes=64, bands=32)
    old = docs.filter("doc_id % 2 = 0")
    store = dd.minhash_band_store(old, "doc_id", "text", **kw)
    out = dd.incremental_minhash_candidates(
        docs.filter("doc_id % 2 = 1"), store, "doc_id", "text", **kw
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_incremental_validation_errors(spark, docs):
    import pytest as _pytest

    seen = spark.createDataFrame([("x",)], ["wrong_col"])
    with _pytest.raises(ValueError, match="content_hash"):
        dd.exact_dedup_incremental(docs, seen, content_col="text")
    with _pytest.raises(ValueError, match="strategy"):
        dd.exact_dedup_incremental(
            docs, seen.withColumnRenamed("wrong_col", "content_hash"),
            content_col="text", strategy="bogus",
        )
    bad_store = spark.createDataFrame([(1,)], ["id"])
    with _pytest.raises(ValueError, match="'id' and 'bh'"):
        dd.incremental_minhash_candidates(docs, bad_store, "doc_id", "text")


def test_duplicate_stats(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (3,), (3,), (3,)], ["k"])
    row = dd.duplicate_stats(df, ["k"]).collect()[0]
    assert (row.total, row.distinct_keys, row.duplicates) == (6, 3, 3)


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = dd.ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", n=3, threshold=0.3
    ).collect()
    pair_ids = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in pair_ids  # identical
    assert (1, 4) in pair_ids  # near-dup
    assert all(0.0 <= r.jaccard <= 1.0 for r in pairs)
    # exact-dup pair has jaccard exactly 1
    assert {r.jaccard for r in pairs if (r.id_a, r.id_b) == (1, 2)} == {1.0}


def test_minhash_lsh_candidates(docs):
    out = dd.minhash_lsh_candidates(
        docs, id_col="doc_id", text_col="text", n=2, num_hashes=64, bands=32
    ).collect()
    pair_ids = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in pair_ids  # identical docs always collide
    est = {(r.id_a, r.id_b): r.est_jaccard for r in out}
    assert est[(1, 2)] == 1.0
    assert all(r.id_a < r.id_b for r in out)


def test_simhash_candidates(docs):
    out = dd.simhash_candidates(docs, id_col="doc_id", text_col="text", max_hamming=3)
    pairs = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    assert pairs[(1, 2)] == 0  # identical text -> identical signature
    assert pairs[(1, 3)] == 0  # normalization-insensitive (lower/trim)


def test_shingles_linear_forms():
    # _windows_of builds sliding windows without partial tails
    from etl_spark_gradle_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]")
    df = spark.createDataFrame([("a b c d",)], ["t"])
    row = df.select(
        dd.token_shingles("t", 2).alias("tok2"),
        dd.char_shingles("t", 3).alias("ch3"),
    ).collect()[0]
    assert sorted(row.tok2) == ["a b", "b c", "c d"]
    assert "a b" in row.ch3 and len(row.ch3) == len("a b c d") - 2


# -- text -------------------------------------------------------------------


def test_text_stats_values(spark):
    df = spark.createDataFrame([(1, "the cat sat, on 2 mats!")], ["doc_id", "text"])
    row = tx.with_text_stats(df, "text").collect()[0]
    assert row.n_tokens == 6
    assert row.n_chars_c == 23
    assert row.stopword_ratio == pytest.approx(1 / 6)  # 'the'
    assert row.digit_ratio == pytest.approx(1 / 23)
    assert 0.0 <= row.quality_score <= 1.0


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is happy"),
            (2, "el perro y la casa de un amigo en madrid"),
            (3, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.lang_pred for r in tx.with_language_id(df, "text").collect()}
    assert rows == {1: "en", 2: "es", 3: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello, world! it's 42")], ["doc_id", "text"])
    row = df.select(
        tx.token_count("text").alias("ws"), tx.bpe_ish_token_count("text").alias("bpe")
    ).collect()[0]
    assert row.ws == 4
    # hello , world ! it ' s 42  -> 8 BPE-ish pieces
    assert row.bpe == 8


def test_clean_html_strips_and_decodes(spark):
    raw = (
        "<html><head><style>p{color:red}</style>"
        "<script>var x = '<evil>';</script></head>"
        "<body><!-- comment --><p>Tom &amp; Jerry &lt;3&nbsp;cheese</p></body></html>"
    )
    df = spark.createDataFrame([(raw,)], ["t"])
    out = df.select(tx.clean_html("t").alias("c")).collect()[0].c
    assert out == "Tom & Jerry <3 cheese"


def test_drop_boilerplate_lines(spark):
    raw = "\n".join(
        [
            "%%% $$ 404 #@! %%%",          # symbol soup: low alpha ratio
            "OK",                           # too short
            "This is a real content line about query engines.",
            "|||| 00 ||||",                 # low alpha ratio
            "Another substantive paragraph line with words.",
        ]
    )
    df = spark.createDataFrame([(raw,)], ["t"])
    out = df.select(tx.drop_boilerplate_lines("t").alias("c")).collect()[0].c
    assert out == (
        "This is a real content line about query engines.\n"
        "Another substantive paragraph line with words."
    )


def test_text_analysis_transformer_clean_option(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame(
        [(1, "<p>hello   brave new world of spark</p>")], ["doc_id", "text"]
    )
    tf = TRANSFORMER_REGISTRY["text_analysis"]
    cfg = TransformationConfig(
        type="text_analysis",
        options={"textColumn": "text", "clean": "true", "stats": "true"},
    )
    row = tf.transform(df, cfg, RunContext.create("t", spark)).collect()[0]
    assert row.clean_text == "hello brave new world of spark"
    # stats computed over the CLEANED column, not the raw one
    assert row.n_tokens == 6
    assert row.n_chars_c == len("hello brave new world of spark")


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame([("a  b c",), ("A b  C ",)], ["t"])
    fps = [r.fp for r in df.select(tx.fingerprint("t").alias("fp")).collect()]
    assert fps[0] == fps[1]


# -- similarity -------------------------------------------------------------


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_brute_force_topk_exact(emb):
    queries = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = sim.brute_force_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == 5
        sims = [r.cos_sim for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_lsh_topk_recall_vs_brute_force(emb):
    queries = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sim.brute_force_topk(emb, queries, k=5).collect()
    approx = sim.lsh_bucketed_topk(
        emb, queries, k=5, dim=64, num_bits=16, bands=8
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 8 bands x 2 bits: collision prob for near neighbors is high;
    # embeddings are cluster-structured so recall should be substantial
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_topk_recall_vs_brute_force(emb):
    queries = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sim.brute_force_topk(emb, queries, k=5).collect()
    approx = sim.ivf_topk(emb, queries, k=5, num_cells=8, nprobe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing half the cells of a clustered corpus should recover most
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # every query still gets k results (cells are non-empty)
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) == 5 for v in by_q.values())


def test_ivf_trained_centroids_on_clustered_data(spark):
    """Spherical-k-means refinement: on well-separated clusters the
    trained cells align with the true clusters, so probing ONE cell
    recovers near-perfect neighbors; training must not hurt vs the
    sampled-init baseline."""
    import random

    rng = random.Random(7)
    rows = []
    centers = [[5.0, 0, 0, 0], [0, 5.0, 0, 0], [0, 0, 5.0, 0], [0, 0, 0, 5.0]]
    for i in range(200):
        cball = centers[i % 4]
        rows.append((i, [c + rng.gauss(0, 0.2) for c in cball]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.neighbor_id)
             for r in sim.brute_force_topk(emb, queries, k=5).collect()}

    def recall(ti):
        got = {(r.query_id, r.neighbor_id)
               for r in sim.ivf_topk(emb, queries, k=5, num_cells=4, nprobe=1,
                                     train_iterations=ti).collect()}
        return len(got & exact) / len(exact)

    r_trained = recall(3)
    assert r_trained >= 0.9, f"trained 1-probe recall too low: {r_trained}"
    assert r_trained >= recall(0) - 1e-9  # training never hurts here


def test_train_ivf_centroids_shape_and_determinism(emb):
    cents = sim.train_ivf_centroids(emb, "embedding", "vec_id", num_cells=6, iterations=2)
    assert len(cents) == 6 and all(len(c) == 64 for c in cents)
    # unit-normalized output
    import math as _m
    for c in cents:
        assert abs(_m.sqrt(sum(x * x for x in c)) - 1.0) < 1e-9
    again = sim.train_ivf_centroids(emb, "embedding", "vec_id", num_cells=6, iterations=2)
    assert cents == again  # deterministic init + deterministic means


def test_lsh_topk_tuned_config_high_recall(emb):
    """Tuned recall target: at num_bits=32 / bands=16 (r=2 bits/band)
    the band-collision probability for true neighbors is high enough
    that recall@10 vs brute force is 1.0 on the seeded sf0.001
    embeddings (measured; deterministic hyperplanes, seed=42). Pin a
    >= 0.9 floor so hashing/banding regressions surface immediately.
    The cost knob: r=2 admits more candidates than the b=8/r=4 default
    — the documented recall-vs-candidate-volume trade."""
    queries = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.neighbor_id)
             for r in sim.brute_force_topk(emb, queries, k=10).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in sim.lsh_bucketed_topk(
                  emb, queries, k=10, dim=64, num_bits=32, bands=16).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"tuned LSH recall dropped: {recall}"


def test_ivf_topk_nprobe_monotonic_recall(emb):
    """More probed cells can only widen the scanned candidate set, so
    recall@10 must be monotonically non-decreasing in nprobe (measured
    on seeded data: ~0.41 at nprobe=4 -> ~0.70 at nprobe=8 -> 1.0 at
    nprobe=num_cells, where IVF degenerates to exact brute force)."""
    queries = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.neighbor_id)
             for r in sim.brute_force_topk(emb, queries, k=10).collect()}

    def recall(nprobe):
        approx = {(r.query_id, r.neighbor_id)
                  for r in sim.ivf_topk(
                      emb, queries, k=10, num_cells=16, nprobe=nprobe).collect()}
        return len(exact & approx) / len(exact)

    r4, r8, r16 = recall(4), recall(8), recall(16)
    assert r4 <= r8 <= r16, f"recall not monotonic in nprobe: {r4}, {r8}, {r16}"
    assert r16 == 1.0, f"nprobe=num_cells must equal brute force, got {r16}"
    assert r8 >= 0.55, f"nprobe=8 recall floor regressed: {r8}"


def test_embedding_cosine_dups_lsh_vs_exact(emb):
    exact = {
        (r.id_a, r.id_b)
        for r in sim.embedding_cosine_pairs_exact(emb, threshold=0.4).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in sim.embedding_cosine_dups_lsh(
            emb, threshold=0.4, dim=64, num_bits=16, bands=8
        ).collect()
    }
    # every LSH pair is exact-verified (rescoring guarantees precision 1.0)
    assert lsh <= exact
    assert len(lsh) / max(len(exact), 1) >= 0.3, (len(lsh), len(exact))


def test_cosine_zero_vector_guard(spark):
    df = spark.createDataFrame([(1, [0.0] * 4), (2, [1.0, 0.0, 0.0, 0.0])], ["id", "v"])
    row = (
        df.filter("id = 1")
        .crossJoin(df.filter("id = 2").select(F.col("v").alias("w")))
        .select(sim.cosine(F.col("v"), F.col("w")).alias("c"))
        .collect()[0]
    )
    assert row.c == 0.0


# -- multimodal -------------------------------------------------------------


def test_media_metadata_png_magic(spark):
    png = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A]) + b"fakebody"
    wav = b"RIFF" + b"\x00" * 8
    df = spark.createDataFrame([(1, png), (2, wav), (3, b"plain")], ["id", "content"])
    rows = {
        r.id: r
        for r in mm.with_media_metadata(df, "content")
        .select("id", "media_meta.*")
        .collect()
    }
    assert rows[1].format == "png"
    assert rows[2].format == "riff"
    assert rows[3].format == "unknown"
    assert rows[1].byte_len == len(png)
    assert len(rows[1].sha256) == 64


def _png_bytes(w: int, h: int, color_type: int = 6) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )


def _jpeg_bytes(w: int, h: int, ncomp: int = 3) -> bytes:
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0\x00\x11\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([ncomp])
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_image_dims_real_headers():
    assert mm.parse_image_dims(_png_bytes(640, 480)) == (640, 480, 4, "png")
    assert mm.parse_image_dims(_png_bytes(1, 70000, color_type=2)) == (1, 70000, 3, "png")
    assert mm.parse_image_dims(_jpeg_bytes(1920, 1080)) == (1920, 1080, 3, "jpeg")
    assert mm.parse_image_dims(_jpeg_bytes(8, 8, ncomp=1)) == (8, 8, 1, "jpeg")
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 4
    assert mm.parse_image_dims(gif) == (320, 200, 3, "gif")
    assert mm.parse_image_dims(b"not an image at all") is None
    assert mm.parse_image_dims(None) is None
    assert mm.parse_image_dims(b"\xff\xd8\xff\xd9") is None  # EOI before SOF
    # truncated PNG signature-only payload must not crash
    assert mm.parse_image_dims(b"\x89PNG\r\n\x1a\n\x00\x00") is None


def test_decode_images_real_and_fallback(spark):
    df = spark.createDataFrame(
        [(1, _png_bytes(100, 50)), (2, _jpeg_bytes(64, 32)), (3, b"unknownpayload")],
        ["id", "content"],
    )
    out = mm.decode_images(df)
    assert out.schema.simpleString() == (
        "struct<id:bigint,width:int,height:int,channels:int,decode_status:string>"
    )
    rows = {r.id: r for r in out.collect()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (100, 50, 4)
    assert rows[1].decode_status == "ok:png"
    assert (rows[2].width, rows[2].height, rows[2].channels) == (64, 32, 3)
    assert rows[2].decode_status == "ok:jpeg"
    assert rows[3].width is None and rows[3].decode_status == "unsupported"
    # stub fallback keeps the deterministic-fake plumbing path alive
    stub = {r.id: r for r in mm.decode_images(df, fallback="stub").collect()}
    assert stub[3].decode_status == "ok_stub" and stub[3].width is not None
    assert stub[1].decode_status == "ok:png"  # real parse still wins
    again = {r.id: (r.width, r.height) for r in mm.decode_images(df, fallback="stub").collect()}
    assert again == {r.id: (r.width, r.height) for r in stub.values()}


def _wav_bytes(sample_rate: int, channels: int, bits: int, data_len: int) -> bytes:
    byte_rate = sample_rate * channels * (bits // 8)
    return (
        b"RIFF"
        + (36 + data_len).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
        + b"data"
        + data_len.to_bytes(4, "little")
        + b"\x00" * data_len
    )


def test_parse_audio_meta_wav():
    # 1 s of 44.1 kHz stereo 16-bit: data = 44100*2*2 bytes
    wav = _wav_bytes(44100, 2, 16, 44100 * 2 * 2)
    assert mm.parse_audio_meta(wav) == (44100, 2, 16, 1000)
    # mono 8 kHz, half a second
    assert mm.parse_audio_meta(_wav_bytes(8000, 1, 16, 8000)) == (8000, 1, 16, 500)
    # extra chunk before fmt (LIST) still parses; odd-length pad honored
    wav2 = (
        b"RIFF" + (100).to_bytes(4, "little") + b"WAVE"
        + b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"  # odd len + pad
        + _wav_bytes(16000, 1, 16, 3200)[12:]
    )
    assert mm.parse_audio_meta(wav2) == (16000, 1, 16, 100)
    assert mm.parse_audio_meta(b"RIFF\x00\x00\x00\x00AVI ") is None  # riff, not wave
    assert mm.parse_audio_meta(b"ID3\x03mp3payload-needs-codec" + b"\x00" * 40) is None
    assert mm.parse_audio_meta(None) is None


def test_decode_audio_real_and_unsupported(spark):
    df = spark.createDataFrame(
        [(1, _wav_bytes(22050, 1, 16, 22050 * 2)), (2, b"OggS" + b"\x00" * 60)],
        ["id", "content"],
    )
    rows = {r.id: r for r in mm.decode_audio(df).collect()}
    assert (rows[1].sample_rate, rows[1].channels, rows[1].bits_per_sample) == (22050, 1, 16)
    assert rows[1].duration_ms == 1000
    assert rows[1].decode_status == "ok:wav"
    assert rows[2].sample_rate is None and rows[2].decode_status == "unsupported"


def test_embed_media_real_image_audio_and_stub(spark):
    import numpy as np

    from etl_spark_gradle_spark.operators import media_codecs as mc

    # solid-color image: channel means are exactly color/255, grid is gray
    png = mc.png_encode(np.full((6, 5, 3), [200, 100, 50], dtype=np.uint8))
    # constant-amplitude audio: every RMS slice equals the amplitude
    wav = mc.wav_encode(np.full(8000, 0.25), 8000)
    df = spark.createDataFrame(
        [(1, png), (2, wav), (3, b"not media")], ["id", "content"]
    )
    rows = {r.id: r for r in mm.embed_media(df, dim=8).collect()}
    assert rows[1].embed_status == "ok:png"
    got = rows[1].embedding
    assert len(got) == 8
    assert [round(v * 255) for v in got[:3]] == [200, 100, 50]
    gray = (200 + 100 + 50) / 3 / 255
    assert all(abs(v - gray) < 1e-3 for v in got[3:])
    assert rows[2].embed_status == "ok:audio"
    assert all(abs(v - 0.25) < 1e-3 for v in rows[2].embedding)
    assert rows[3].embed_status == "stub"
    assert len(rows[3].embedding) == 8
    assert all(0.0 <= x <= 1.0 for x in rows[3].embedding)


def test_sample_frames_y4m_gif_unsupported(spark):
    from etl_spark_gradle_spark.operators import media_codecs as mc

    # 25 fps, 10 frames, sample every 200 ms -> step 5 -> idx 0,5 / ts 0,200
    y4m = mc.y4m_encode(4, 4, 10, fps_num=25, fps_den=1)
    # GIF delays 400ms x 5 -> starts 0,400,800,1200,1600; every_ms=1000
    # buckets 0,0,0,1,1 -> frames 0 (t=0) and 3 (t=1200)
    gif = mc.gif_encode_frames(2, 2, [400] * 5)
    df = spark.createDataFrame(
        [(1, y4m), (2, gif), (3, b"mp4?" * 100)], ["id", "content"]
    )
    out = mm.sample_frames(df, every_ms=200, max_frames=4)
    assert "frame_status" in out.columns
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r.id, []).append(r)
    y = sorted(by_id[1], key=lambda r: r.frame_idx)
    assert [(r.frame_idx, r.frame_ts_ms) for r in y] == [(0, 0), (5, 200), (10, 400)][:len(y)]
    assert len(y) == 2 and all(r.frame_status == "ok:y4m" for r in y)
    g = sorted(by_id[2], key=lambda r: r.frame_idx)
    # every_ms=200 < every delay: every frame starts a new bucket -> 4 (cap)
    assert [r.frame_idx for r in g] == [0, 1, 2, 3]
    assert [r.frame_ts_ms for r in g] == [0, 400, 800, 1200]
    assert all(r.frame_status == "ok:gif" for r in g)
    (u,) = by_id[3]
    assert u.frame_idx is None and u.frame_status == "unsupported"


def test_sample_frames_gif_bucketing(spark):
    from etl_spark_gradle_spark.operators import media_codecs as mc

    gif = mc.gif_encode_frames(2, 2, [400] * 5)
    rows = sorted(
        mm.sample_frames(
            spark.createDataFrame([(1, gif)], ["id", "content"]),
            every_ms=1000,
            max_frames=8,
        ).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.frame_ts_ms) for r in rows] == [(0, 0), (3, 1200)]


def test_resize_images_real_png(spark):
    import numpy as np

    from etl_spark_gradle_spark.operators import media_codecs as mc

    # 2x2 quadrant image upscaled to 4x4: each quadrant becomes 2x2
    quad = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]], dtype=np.uint8
    )
    png = mc.png_encode(quad)
    gray = mc.png_encode(np.full((3, 3), 7, dtype=np.uint8))  # 1-channel
    df = spark.createDataFrame(
        [(1, png), (2, gray), (3, b"JFIF-ish junk")], ["id", "content"]
    )
    out = mm.resize_images(df, target_width=4, target_height=4)
    assert out.schema.simpleString() == (
        "struct<id:bigint,width:int,height:int,resized:binary,resize_status:string>"
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].resize_status == "ok:png"
    arr = np.frombuffer(bytes(rows[1].resized), dtype=np.uint8).reshape(4, 4, 3)
    expect = quad.repeat(2, axis=0).repeat(2, axis=1)
    assert (arr == expect).all()
    # grayscale broadcast to RGB, constant fill preserved
    arr2 = np.frombuffer(bytes(rows[2].resized), dtype=np.uint8)
    assert rows[2].width == 4 and len(arr2) == 4 * 4 * 3 and (arr2 == 7).all()
    assert rows[3].resized is None and rows[3].resize_status == "unsupported"
    # png output mode round-trips through the stdlib decoder
    rows_png = {
        r.id: r
        for r in mm.resize_images(df, target_width=4, target_height=4, output="png").collect()
    }
    assert (mc.png_decode(bytes(rows_png[1].resized)) == expect).all()


def test_media_codecs_png_filters_and_edge_cases():
    import numpy as np
    import zlib as _zlib

    from etl_spark_gradle_spark.operators import media_codecs as mc

    rng = np.random.default_rng(3)
    # round-trip every supported channel count
    for c in (1, 2, 3, 4):
        a = rng.integers(0, 256, (7, 5, c), dtype=np.uint8)
        assert (mc.png_decode(mc.png_encode(a)) == a).all()
    # filtered scanlines (types 1-4) decode correctly: build a PNG with
    # hand-filtered rows and check against the unfiltered original
    w, h = 4, 5
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y, ftype in zip(range(h), (0, 1, 2, 3, 4)):
        line = img[y].reshape(-1)
        enc = line.astype(np.int64).copy()
        for x in range(w * 3):
            left = int(line[x - 3]) if x >= 3 else 0
            up = int(prev[x])
            ul = int(prev[x - 3]) if x >= 3 else 0
            if ftype == 1:
                enc[x] = (int(line[x]) - left) & 0xFF
            elif ftype == 2:
                enc[x] = (int(line[x]) - up) & 0xFF
            elif ftype == 3:
                enc[x] = (int(line[x]) - ((left + up) >> 1)) & 0xFF
            elif ftype == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                enc[x] = (int(line[x]) - pred) & 0xFF
        raw += bytes([ftype]) + bytes(enc.astype(np.uint8))
        prev = line
    import struct as _struct

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + mc._chunk(b"IHDR", ihdr)
        + mc._chunk(b"IDAT", _zlib.compress(bytes(raw)))
        + mc._chunk(b"IEND", b"")
    )
    assert (mc.png_decode(payload) == img).all()
    # interlaced / 16-bit refused, not crashed
    bad_ihdr = _struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    assert mc.png_decode(
        b"\x89PNG\r\n\x1a\n" + mc._chunk(b"IHDR", bad_ihdr) + mc._chunk(b"IEND", b"")
    ) is None


def test_cli_missing_yaml_exits_cleanly(capsys):
    from etl_spark_gradle_spark.cli import main

    rc = main(["--pipeline", "/nonexistent/nope.yaml"])
    assert rc == 1
    out = capsys.readouterr()
    assert "pipeline YAML not found" in out.out + out.err


def test_cli_explain_dry_run(spark, tmp_path, capsys):
    """--explain prints the lineage chain + formatted physical plan and
    writes NOTHING — plan review before paying for the job."""
    import yaml as _yaml

    from etl_spark_gradle_spark.cli import main

    sink = tmp_path / "never_written"
    doc = {
        "pipelineId": "explain-t",
        "source": {
            "type": "file",
            "options": {
                "path": "/root/testdata/sf0.001/lineitem.parquet",
                "format": "parquet",
            },
        },
        "transformations": [
            {"type": "filter", "options": {"condition": "l_quantity > 45"}}
        ],
        "sink": {
            "type": "file",
            "options": {"path": str(sink), "format": "parquet"},
            "writeMode": "overwrite",
        },
    }
    p = tmp_path / "p.yaml"
    p.write_text(_yaml.safe_dump(doc))
    rc = main(["--pipeline", str(p), "--explain"])
    assert rc == 0
    out = capsys.readouterr()
    text = out.out + out.err
    assert "lineage chain" in text and "filter(condition=l_quantity > 45)" in text
    # the extract-count CollectMetrics sits between scan and filter by
    # design (it must count pre-filter rows), so the filter shows as a
    # plan node rather than a pushed scan predicate here
    assert "Physical Plan" in text and "Scan parquet" in text and "Filter" in text
    assert not sink.exists()  # dry run: sink untouched
    # broken transform config -> clean FAILED exit, still no write
    doc["transformations"][0]["options"] = {}
    p.write_text(_yaml.safe_dump(doc))
    assert main(["--pipeline", str(p), "--explain"]) == 1
    assert not sink.exists()


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        ["id_a", "id_b"],
    )
    comp = {r.id: r.cluster for r in dd.connected_components(pairs).collect()}
    # chain 1-2-3-4 collapses to cluster 1; islands keep their min
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dedup_from_pairs_keeps_min_survivor(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(1, 8)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
    out = dd.dedup_from_pairs(df, pairs, "doc_id")
    assert {r.doc_id for r in out.collect()} == {1, 4, 5, 7}


def test_multimodal_transformer_operations(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame(
        [(1, _png_bytes(32, 16)), (2, _wav_bytes(8000, 1, 16, 1600))],
        ["id", "content"],
    )
    tf = TRANSFORMER_REGISTRY["multimodal"]
    ctx = RunContext.create("t", spark)

    meta = tf.transform(
        df, TransformationConfig(type="multimodal", options={"operation": "metadata"}), ctx
    )
    fmts = {r.id: r.media_meta.format for r in meta.collect()}
    assert fmts == {1: "png", 2: "riff"}

    img = tf.transform(
        df,
        TransformationConfig(type="multimodal",
                             options={"operation": "decode_image", "idColumn": "id"}),
        ctx,
    )
    r1 = {r.id: r for r in img.collect()}[1]
    assert (r1.width, r1.height, r1.decode_status) == (32, 16, "ok:png")

    aud = tf.transform(
        df,
        TransformationConfig(type="multimodal",
                             options={"operation": "decode_audio", "idColumn": "id"}),
        ctx,
    )
    r2 = {r.id: r for r in aud.collect()}[2]
    assert (r2.sample_rate, r2.duration_ms, r2.decode_status) == (8000, 100, "ok:wav")

    import pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError

    with pytest.raises(TransformationError, match="operation"):
        tf.transform(
            df, TransformationConfig(type="multimodal", options={"operation": "nope"}), ctx
        )
    with pytest.raises(TransformationError, match="binaryColumn"):
        tf.transform(
            df,
            TransformationConfig(
                type="multimodal",
                options={"operation": "metadata", "binaryColumn": "missing"},
            ),
            ctx,
        )


def test_dedup_transformer_fuzzy_strategy(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " extra"),          # near-dup of 1
        (3, "completely different content about distributed query engines"),
        (4, base),                     # exact dup of 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    tf = TRANSFORMER_REGISTRY["dedup"]
    cfg = TransformationConfig(
        type="dedup",
        options={
            "strategy": "fuzzy",
            "idColumn": "doc_id",
            "contentColumn": "text",
            "threshold": "0.5",
        },
    )
    out = tf.transform(df, cfg, RunContext.create("t", spark))
    kept = {r.doc_id for r in out.collect()}
    assert 3 in kept            # unique survives
    assert 1 in kept            # min-id survivor of the dup cluster
    assert kept.isdisjoint({2, 4})

    bad = TransformationConfig(type="dedup", options={"strategy": "fuzzy"})
    import pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError

    with pytest.raises(TransformationError):
        tf.transform(df, bad, RunContext.create("t", spark))


def test_contamination_check(spark):
    """Benchmark decontamination: docs sharing an n-gram with the
    benchmark are flagged; clean docs report matched=0."""
    from etl_spark_gradle_spark.operators import dedup as dd

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark executors"),
            (3, "short"),  # < n tokens -> zero shingles
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "somebody quoted the quick brown fox in an eval set")],
        ["bid", "text"],
    )
    out = {
        r.id: (r.n_shingles, r.matched, r.contaminated)
        for r in dd.contamination_check(
            corpus, bench, "doc_id", "text", "text", n=3
        ).collect()
    }
    assert out[1][1] >= 2 and out[1][2] is True      # "the quick brown", "quick brown fox"
    assert out[2] == (out[2][0], 0, False)
    assert out[3] == (0, 0, False)
    # higher min_matches threshold declassifies the borderline doc
    strict = {
        r.id: r.contaminated
        for r in dd.contamination_check(
            corpus, bench, "doc_id", "text", "text", n=3, min_matches=5
        ).collect()
    }
    assert strict[1] is False


def test_contamination_transformer_yaml_surface(spark):
    """type: contamination with the benchmark as a views:-style temp
    view; filter action drops flagged docs."""
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark executors"),
        ],
        ["doc_id", "text"],
    )
    spark.createDataFrame(
        [(100, "an eval set quoting the quick brown fox verbatim")], ["bid", "text"]
    ).createOrReplaceTempView("bench_view")
    tf = TRANSFORMER_REGISTRY["contamination"]
    ctx = RunContext.create("t", spark)

    annotated = tf.transform(
        corpus,
        TransformationConfig(
            type="contamination",
            options={
                "benchmarkTable": "bench_view",
                "idColumn": "doc_id",
                "shingleSize": "3",
            },
        ),
        ctx,
    )
    got = {r.doc_id: r.contaminated for r in annotated.collect()}
    assert got == {1: True, 2: False}

    filtered = tf.transform(
        corpus,
        TransformationConfig(
            type="contamination",
            options={
                "benchmarkTable": "bench_view",
                "idColumn": "doc_id",
                "shingleSize": "3",
                "action": "filter",
            },
        ),
        ctx,
    )
    assert [r.doc_id for r in filtered.collect()] == [2]
    assert "contaminated" not in filtered.columns


def test_minhash_band_payload_strategies_identical(spark):
    """band_payload='id' (join-back) and 'signature' (replicate) return
    the same candidate pairs and estimates."""
    from etl_spark_gradle_spark.operators import dedup as dd
    from tests.conftest import load_table

    docs = load_table(spark, "documents")
    kw = dict(id_col="doc_id", text_col="text", n=3, num_hashes=64, bands=16)
    a = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dd.minhash_lsh_candidates(docs, band_payload="id", **kw).collect()
    }
    b = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dd.minhash_lsh_candidates(docs, band_payload="signature", **kw).collect()
    }
    assert a == b and len(a) > 0


# -- repetition / top-ngram / PII ------------------------------------------


def test_repetition_stats_values(spark):
    rows = [
        (1, "aaa\nbbb\naaa\n\n ccc "),          # 4 lines, 'aaa' repeats
        (2, "one two two two"),                  # token repeat only
        (3, "unique single line"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in tx.with_repetition_stats(df).collect()}
    r1 = out[1]
    assert r1.line_count == 4
    assert r1.dup_line_frac == pytest.approx(1 - 3 / 4)
    # chars: aaa(3)+bbb(3)+aaa(3)+ccc(3)=12, distinct 9
    assert r1.dup_line_char_frac == pytest.approx(1 - 9 / 12)
    r2 = out[2]
    assert r2.line_count == 1
    assert r2.dup_line_frac == 0.0
    assert r2.dup_word_frac == pytest.approx(1 - 2 / 4)
    r3 = out[3]
    assert r3.dup_line_frac == 0.0 and r3.dup_word_frac == 0.0


def test_top_ngram_coverage_bigram(spark):
    rows = [
        (1, "buy now buy now buy now"),   # 'buy now' x3 of 5 bigrams, 6 tokens
        (2, "all words here are different"),
        (3, "short"),                      # fewer tokens than n
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in tx.top_ngram_coverage(df, "doc_id", n=2).collect()}
    assert out[1].top_ngram_count == 3
    assert out[1].top_ngram_frac == pytest.approx(min(3 * 2 / 6, 1.0))
    assert out[2].top_ngram_count == 1
    assert out[3].top_ngram_count == 0 and out[3].top_ngram_frac == 0.0
    with pytest.raises(ValueError):
        tx.top_ngram_coverage(df, "doc_id", n=0)


def test_pii_counts_and_redaction(spark):
    from etl_spark_gradle_spark.operators import pii

    rows = [
        (1, "mail a.b+c@ex.co or admin@site.org from 192.168.0.1"),
        (2, "call +1 (555) 123-4567 now"),
        (3, "clean text, no identifiers"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in pii.with_pii_counts(df).collect()}
    assert (out[1].pii_email, out[1].pii_ipv4, out[1].pii_total) == (2, 1, 3)
    assert out[2].pii_phone == 1 and out[2].pii_total == 1
    assert out[3].pii_total == 0
    red = {r.doc_id: r.text for r in pii.redact_pii(df).collect()}
    assert "<EMAIL>" in red[1] and "<IPV4>" in red[1] and "@" not in red[1]
    assert "<PHONE>" in red[2] and "555" not in red[2]
    assert red[3] == rows[2][1]


def test_pii_transformer_modes(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    rows = [(1, "x@y.io here"), (2, "nothing")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    tf = TRANSFORMER_REGISTRY["pii"]
    ctx = RunContext.create("t", spark)
    filt = tf.transform(
        df, TransformationConfig(type="pii", options={"mode": "filter"}), ctx
    )
    assert [r.doc_id for r in filt.collect()] == [2]
    ann = tf.transform(
        df, TransformationConfig(type="pii", options={"kinds": "email"}), ctx
    )
    assert "pii_email" in ann.columns and "pii_ipv4" not in ann.columns
    bad = TransformationConfig(type="pii", options={"mode": "zap"})
    assert not tf.validate(df, bad).is_valid
    bad2 = TransformationConfig(type="pii", options={"kinds": "ssn"})
    assert not tf.validate(df, bad2).is_valid


# -- corpus assembly: chunk / pack / vocab / hash sampling ------------------


def test_chunk_documents_overlap_and_tail(spark):
    from etl_spark_gradle_spark.operators import corpus as cp
    from etl_spark_gradle_spark.operators.relational import TransformationError

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "")], ["doc_id", "text"]
    )
    out = cp.chunk_documents(df, "doc_id", chunk_tokens=3, overlap=1)
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.chunk_text, r.chunk_tokens) for r in out.collect())
    )
    assert rows == [
        (1, 0, "a b c", 3),
        (1, 1, "c d e", 3),
        (1, 2, "e f g", 3),
        (2, 0, "x y", 2),
    ]  # empty doc -> no chunks; short doc -> one short chunk
    # no overlap: disjoint cover
    plain = cp.chunk_documents(df, "doc_id", chunk_tokens=4)
    got = {(r.doc_id, r.chunk_idx): r.chunk_text for r in plain.collect()}
    assert got[(1, 0)] == "a b c d" and got[(1, 1)] == "e f g"
    with pytest.raises(TransformationError):
        cp.chunk_documents(df, "doc_id", chunk_tokens=0)
    with pytest.raises(TransformationError):
        cp.chunk_documents(df, "doc_id", chunk_tokens=3, overlap=3)


def test_pack_sequences_running_layout(spark):
    from etl_spark_gradle_spark.operators import corpus as cp

    # one shard -> pure concat-and-split layout in key order
    df = spark.createDataFrame(
        [(1, 30), (2, 50), (3, 10), (4, 40)], ["doc_id", "nt"]
    )
    out = {
        r.doc_id: (r.pack_seq, r.pack_offset)
        for r in cp.pack_sequences(df, "doc_id", "nt", max_tokens=64, shards=1).collect()
    }
    # starts: 0, 30, 80, 90 -> seq 0,0,1,1; offsets 0,30,16,26
    assert out == {1: (0, 0), 2: (0, 30), 3: (1, 16), 4: (1, 26)}
    # sharding: same totals, independent streams
    sharded = cp.pack_sequences(df, "doc_id", "nt", max_tokens=64, shards=2)
    assert sharded.select("pack_shard").distinct().count() == 2
    assert sharded.filter("pack_offset >= 64 OR pack_offset < 0").count() == 0


def test_token_frequency_topk_deterministic(spark):
    from etl_spark_gradle_spark.operators import corpus as cp

    df = spark.createDataFrame(
        [(1, "a b a C c"), (2, "a b")], ["doc_id", "text"]
    )
    out = [(r.token, r.freq) for r in cp.token_frequency(df, top_k=3).collect()]
    assert out == [("a", 3), ("b", 2), ("C", 1)]  # ties break token-asc
    low = {
        r.token: r.freq
        for r in cp.token_frequency(df, lowercase=True, min_count=2).collect()
    }
    assert low == {"a": 3, "b": 2, "c": 2}


def test_mix_to_target_hits_proportions(spark):
    """Mixture solver: binding group fully kept, others downsampled to
    the target ratio; deterministic across runs; unlisted groups
    dropped."""
    from etl_spark_gradle_spark.operators.corpus import mix_to_target

    rows = [(i, ["web", "code", "books", "junk"][i % 4]) for i in range(4000)]
    df = spark.createDataFrame(rows, ["id", "src"])  # 1000 per group
    targets = {"web": 0.5, "code": 0.3, "books": 0.2}
    out = mix_to_target(df, "src", targets, key_col="id")
    got = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert "junk" not in got
    # N = min(1000/0.5, 1000/0.3, 1000/0.2) = 2000 -> web keeps ALL
    assert got["web"] == 1000
    # md5 sampling is binomial around the rate; 1000 draws -> ~±5%
    assert abs(got["code"] - 600) < 75 and abs(got["books"] - 400) < 75
    again = {
        r.src: r.n
        for r in mix_to_target(df, "src", targets, key_col="id")
        .groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert got == again  # deterministic


def test_mix_to_target_normalizes_and_validates(spark):
    from etl_spark_gradle_spark.operators.corpus import mix_to_target
    from etl_spark_gradle_spark.operators.relational import TransformationError

    df = spark.createDataFrame([(i, "a" if i % 2 else "b") for i in range(100)], ["id", "g"])
    # unnormalized targets behave like their normalization
    a = sorted(r.id for r in mix_to_target(df, "g", {"a": 2.0, "b": 2.0}, "id").collect())
    b = sorted(r.id for r in mix_to_target(df, "g", {"a": 0.5, "b": 0.5}, "id").collect())
    assert a == b
    with pytest.raises(TransformationError, match="non-empty"):
        mix_to_target(df, "g", {}, "id")
    with pytest.raises(TransformationError, match="> 0"):
        mix_to_target(df, "g", {"a": 0.0, "b": 1.0}, "id")
    with pytest.raises(TransformationError, match="no rows"):
        mix_to_target(df, "g", {"a": 0.5, "nope": 0.5}, "id")


def test_mix_transformer_adapter(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(200)], ["id", "g"]
    )
    ctx = RunContext(pipeline_id="t", run_id="t", spark=spark)
    out = TRANSFORMER_REGISTRY["mix"].transform(
        df,
        TransformationConfig(
            type="mix", options={"groupColumn": "g", "keyColumn": "id", "targets": "a:0.7,b:0.3"}
        ),
        ctx,
    )
    got = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert got["a"] == 100  # binding group fully kept
    assert 20 <= got["b"] <= 65  # ~43 expected at rate 3/7


def test_hash_sample_deterministic_and_stratified(spark):
    from etl_spark_gradle_spark.operators import corpus as cp
    from etl_spark_gradle_spark.operators.relational import TransformationError

    df = spark.range(0, 2000).withColumnRenamed("id", "k").withColumn(
        "src", (F.col("k") % 2).cast("string")
    )
    half = cp.hash_sample(df, "k", fraction=0.5)
    assert half.exceptAll(cp.hash_sample(df, "k", fraction=0.5)).count() == 0
    assert abs(half.count() / 2000 - 0.5) < 0.05
    # nested fractions: a 0.25 sample is a subset of the 0.5 sample
    quarter = cp.hash_sample(df, "k", fraction=0.25)
    assert quarter.join(half, "k", "left_anti").count() == 0
    # full keep / full drop
    assert cp.hash_sample(df, "k", fraction=1.0).count() == 2000
    assert cp.hash_sample(df, "k", fraction=0.0).count() == 0
    strat = cp.hash_sample(
        df, "k", fractions={"0": 1.0}, strata_col="src", default_fraction=0.0
    )
    assert strat.count() == 1000 and strat.filter("src <> '0'").count() == 0
    with pytest.raises(TransformationError):
        cp.hash_sample(df, "k")
    with pytest.raises(TransformationError):
        cp.hash_sample(df, "k", fraction=0.5, fractions={"0": 1.0}, strata_col="src")
    with pytest.raises(TransformationError):
        cp.hash_sample(df, "k", fraction=1.5)


def test_corpus_transformer_registry_surface(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame(
        [(1, "a b c d", "s0", 4), (2, "x y", "s1", 2)],
        ["doc_id", "text", "source", "nt"],
    )
    ctx = RunContext.create("t", spark)
    chunk = TRANSFORMER_REGISTRY["chunk"].transform(
        df,
        TransformationConfig(
            type="chunk", options={"idColumn": "doc_id", "chunkTokens": "2"}
        ),
        ctx,
    )
    assert chunk.count() == 3 and "chunk_text" in chunk.columns
    pack = TRANSFORMER_REGISTRY["pack"].transform(
        df,
        TransformationConfig(
            type="pack",
            options={"keyColumn": "doc_id", "tokenCountColumn": "nt", "maxTokens": "4"},
        ),
        ctx,
    )
    assert {"pack_shard", "pack_seq", "pack_offset"} <= set(pack.columns)
    freq = TRANSFORMER_REGISTRY["token_frequency"].transform(
        df, TransformationConfig(type="token_frequency", options={"topK": "2"}), ctx
    )
    assert freq.count() == 2
    samp = TRANSFORMER_REGISTRY["hash_sample"].transform(
        df,
        TransformationConfig(
            type="hash_sample",
            options={"keyColumn": "doc_id", "fractions": "s0:1.0", "strataColumn": "source"},
        ),
        ctx,
    )
    assert [r.doc_id for r in samp.collect()] == [1]
    for bad_opts in (
        {"idColumn": "nope"},
        {"idColumn": "doc_id", "chunkTokens": "2", "overlap": "2"},
    ):
        assert not TRANSFORMER_REGISTRY["chunk"].validate(
            df, TransformationConfig(type="chunk", options=bad_opts)
        ).is_valid
    assert not TRANSFORMER_REGISTRY["hash_sample"].validate(
        df,
        TransformationConfig(
            type="hash_sample", options={"keyColumn": "doc_id"}
        ),
    ).is_valid


def test_cap_per_group_deterministic(spark):
    from etl_spark_gradle_spark.operators.corpus import cap_per_group

    rows = [(i, f"src{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = cap_per_group(df, ["source"], max_rows=4, order_col="doc_id")
    got = [(r.doc_id, r.source) for r in out.collect()]
    by_src = {}
    for d, s in got:
        by_src.setdefault(s, []).append(d)
    assert all(len(v) == 4 for v in by_src.values())
    # deterministic: same survivors on a re-run
    again = {(r.doc_id, r.source) for r in
             cap_per_group(df, ["source"], max_rows=4, order_col="doc_id").collect()}
    assert set(got) == again
    # python-side md5-rank reference agrees
    import hashlib

    for s, kept in by_src.items():
        pool = sorted(
            (d for d in range(30) if f"src{d % 3}" == s),
            key=lambda d: (hashlib.md5(("cap:" + str(d)).encode()).hexdigest(), str(d)),
        )
        assert sorted(kept) == sorted(pool[:4])


def test_cap_per_group_transformer(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame([(i, f"s{i % 2}") for i in range(10)], ["id", "src"])
    tf = TRANSFORMER_REGISTRY["cap_per_group"]
    out = tf.transform(
        df,
        TransformationConfig(
            type="cap_per_group",
            options={"groupBy": "src", "maxRows": "3", "orderColumn": "id"},
        ),
        RunContext.create("t", spark),
    )
    assert out.count() == 6
    import pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError

    with pytest.raises(TransformationError, match="groupBy"):
        tf.transform(
            df,
            TransformationConfig(type="cap_per_group", options={"maxRows": "3"}),
            RunContext.create("t", spark),
        )
    # orderColumn is required: a group column is constant per group, so
    # omitting it would make survivor choice depend on scan order
    with pytest.raises(TransformationError, match="orderColumn"):
        tf.transform(
            df,
            TransformationConfig(
                type="cap_per_group", options={"groupBy": "src", "maxRows": "3"}
            ),
            RunContext.create("t", spark),
        )
    from etl_spark_gradle_spark.operators.corpus import cap_per_group

    with pytest.raises(TransformationError, match="order_col"):
        cap_per_group(df, ["src"], max_rows=3, order_col=None)


def test_with_url_features_edges(spark):
    rows = [
        (1, "https://www.foo.example.com/a/b/c?x=1#frag"),
        (2, "http://bar.org"),
        (3, "HTTPS://UPPER.NET/path"),
        (4, "not a url at all"),
        (5, "ftp://other.scheme/x"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    got = {r.id: r for r in tx.with_url_features(df, "url").collect()}
    assert got[1].url_domain == "www.foo.example.com"
    assert got[1].url_tld == "com"
    assert got[1].url_path_depth == 3  # query/fragment excluded
    assert got[1].url_is_https is True
    assert got[2].url_domain == "bar.org" and got[2].url_path_depth == 0
    assert got[2].url_is_https is False
    assert got[3].url_domain == "upper.net" and got[3].url_path_depth == 1
    assert got[3].url_is_https is True  # case-insensitive scheme
    assert got[4].url_domain == "" and got[5].url_domain == ""  # filterable


def test_hash_domains_independent_across_stages(spark):
    """Chained deterministic-hash stages must not correlate: capping /
    sampling keeps low-rank keys of ITS OWN hash domain, and a
    downstream split must still produce every bucket at ~its weight.
    (Regression: with a shared raw md5(key), cap->split produced 1 val
    doc out of 382 — the capped survivors were exactly the split's
    train range.)"""
    from etl_spark_gradle_spark.operators import corpus as cp
    from etl_spark_gradle_spark.operators.relational import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "k").withColumn(
        "src", (F.col("k") % 4).cast("string")
    )
    splits = [("train", 0.9), ("val", 0.1)]

    capped = cp.cap_per_group(df, ["src"], max_rows=250, order_col="k")
    val_frac = (
        hash_split(capped, "k", splits).filter("split = 'val'").count()
        / capped.count()
    )
    assert 0.05 < val_frac < 0.16, f"cap->split correlated: val={val_frac}"

    sampled = cp.hash_sample(df, "k", fraction=0.5)
    val_frac2 = (
        hash_split(sampled, "k", splits).filter("split = 'val'").count()
        / sampled.count()
    )
    assert 0.05 < val_frac2 < 0.16, f"sample->split correlated: val={val_frac2}"


def test_score_with_model_plumbing_and_injection(spark):
    from etl_spark_gradle_spark.operators.text import score_with_model

    df = spark.createDataFrame(
        [(1, "good document text"), (2, "bad"), (3, None)], ["doc_id", "text"]
    )
    # default: deterministic stub, schema-correct, scores in [0,1)
    out = score_with_model(df, "doc_id", "text")
    assert out.schema.simpleString() == (
        "struct<id:bigint,model_score:double,score_status:string>"
    )
    rows = {r.id: r for r in out.collect()}
    assert all(r.score_status == "ok_stub" for r in rows.values())
    assert all(0.0 <= r.model_score < 1.0 for r in rows.values())
    again = {r.id: r.model_score for r in score_with_model(df, "doc_id", "text").collect()}
    assert again == {i: r.model_score for i, r in rows.items()}

    # injected scorer: real path, batch-shaped (list in, list out)
    def scorer(texts):
        return [float(len(t or "")) for t in texts]

    scored = {r.id: r for r in score_with_model(df, "doc_id", "text", scorer=scorer).collect()}
    assert scored[1].model_score == len("good document text")
    assert scored[2].model_score == 3.0
    assert scored[3].model_score == 0.0
    assert all(r.score_status == "ok" for r in scored.values())


def _length_scorer_factory():
    """Module-level factory used by the model_score scorerFactory test."""
    return lambda texts: [float(len(t or "")) for t in texts]


def test_model_score_transformer(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame([(1, "abc"), (2, "hello!")], ["doc_id", "text"])
    tf = TRANSFORMER_REGISTRY["model_score"]
    ctx = RunContext.create("t", spark)

    # annotate (default): original columns + score columns
    out = tf.transform(
        df,
        TransformationConfig(type="model_score", options={"idColumn": "doc_id"}),
        ctx,
    )
    assert {"doc_id", "text", "model_score", "score_status"} <= set(out.columns)
    assert out.count() == 2

    # replace + injected scorer via dotted factory path
    rep = tf.transform(
        df,
        TransformationConfig(
            type="model_score",
            options={
                "idColumn": "doc_id",
                "action": "replace",
                "scorerFactory": "tests.test_llm_operators:_length_scorer_factory",
            },
        ),
        ctx,
    )
    rows = {r.id: r for r in rep.collect()}
    assert rows[1].model_score == 3.0 and rows[2].model_score == 6.0
    assert rows[1].score_status == "ok"

    import pytest

    from etl_spark_gradle_spark.operators.relational import TransformationError

    with pytest.raises(TransformationError, match="idColumn"):
        tf.transform(df, TransformationConfig(type="model_score", options={}), ctx)


def test_arrow_stage_id_guard(spark):
    """Non-integral id columns fail fast JVM-side with a clear message
    instead of an opaque pandas astype ValueError mid-job (ADVICE r3);
    narrower integral ids are cast to long, not rejected."""
    import pytest

    from etl_spark_gradle_spark.operators import multimodal as mm
    from etl_spark_gradle_spark.operators import text as tx

    bad = spark.createDataFrame([("doc-a", b"x", "t")], ["id", "content", "text"])
    for op in (mm.decode_images, mm.decode_audio, mm.embed_media,
               mm.sample_frames, mm.resize_images):
        with pytest.raises(ValueError, match="integral"):
            op(bad)
    with pytest.raises(ValueError, match="integral"):
        tx.score_with_model(bad, "id", "text")
    with pytest.raises(ValueError, match="not in input schema"):
        mm.decode_images(bad, id_col="nope")

    ok = spark.createDataFrame([(7, b"x")], ["id", "content"])  # int32-ish
    out = mm.decode_images(ok.withColumn("id", ok["id"].cast("int")))
    assert out.schema["id"].dataType.simpleString() == "bigint"
    assert out.count() == 1


def test_bigram_lm_train_and_score_vs_python(spark):
    """Train + score must match a transparent pure-Python bigram LM
    (add-one smoothing) on every emitted column, including the float
    log-probability and perplexity."""
    import math

    from etl_spark_gradle_spark.operators.lm import (
        score_with_bigram_lm,
        train_bigram_lm,
    )

    corpus_rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog"),
        (4, "one"),          # 1 token -> contributes unigram, no bigrams
        (5, ""),             # empty -> nothing
    ]
    df = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    lm = train_bigram_lm(df, "text")

    # python reference
    def toks(s):
        return [t for t in s.strip().lower().split() if t]

    uni, big = {}, {}
    for _, s in corpus_rows:
        t = toks(s)
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    assert lm.vocab_size == len(uni)
    assert {(r.w, r.c1) for r in lm.unigrams.collect()} == set(uni.items())
    assert {(r.w1, r.w2, r.c2) for r in lm.bigrams.collect()} == {
        (a, b, c) for (a, b), c in big.items()
    }

    scored = {r.doc_id: r for r in score_with_bigram_lm(df, lm).collect()}
    assert set(scored) == {1, 2, 3}  # <2-token docs dropped
    v = len(uni)
    for did, s in corpus_rows[:3]:
        t = toks(s)
        pairs = list(zip(t, t[1:]))
        logps = [
            math.log((big.get(p, 0) + 1) / (uni[p[0]] + v)) for p in pairs
        ]
        r = scored[did]
        assert r.n_bigrams == len(pairs)
        assert r.sum_c2 == sum(big.get(p, 0) for p in pairs)
        assert r.sum_c1 == sum(uni[p[0]] for p in pairs)
        assert r.oov_bigrams == sum(1 for p in pairs if p not in big)
        assert r.avg_logprob == pytest.approx(sum(logps) / len(logps), rel=1e-12)
        assert r.ppl == pytest.approx(math.exp(-sum(logps) / len(logps)), rel=1e-12)


def test_bigram_lm_scores_rank_natural_text_higher(spark):
    """Scoring a candidate set against a reference corpus: in-domain
    text must beat shuffled-word soup (the actual filtering use)."""
    from etl_spark_gradle_spark.operators.lm import (
        score_with_bigram_lm,
        train_bigram_lm,
    )

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
        + [(100 + i, "a stitch in time saves nine every time") for i in range(20)],
        ["doc_id", "text"],
    )
    lm = train_bigram_lm(ref, "text")
    cand = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps again"),
            (2, "dog lazy the over jumps fox quick"),  # shuffled soup
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in score_with_bigram_lm(cand, lm).collect()}
    assert rows[1].avg_logprob > rows[2].avg_logprob
    assert rows[1].ppl < rows[2].ppl
    assert rows[2].oov_bigrams > rows[1].oov_bigrams


def test_lm_score_transformer(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    df = spark.createDataFrame(
        [(1, "alpha beta gamma alpha beta"), (2, "alpha beta delta")],
        ["doc_id", "text"],
    )
    tf = TRANSFORMER_REGISTRY["lm_score"]
    out = tf.transform(
        df,
        TransformationConfig(type="lm_score", options={"idColumn": "doc_id"}),
        RunContext.create("t", spark),
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert "text" in out.columns and "ppl" in out.columns  # annotate keeps frame
    assert rows[1].n_bigrams == 4 and rows[2].n_bigrams == 2

    from etl_spark_gradle_spark.operators.relational import TransformationError

    with pytest.raises(TransformationError, match="idColumn"):
        tf.transform(
            df, TransformationConfig(type="lm_score", options={}),
            RunContext.create("t", spark),
        )


def test_duplicated_window_spans_vs_python(spark):
    """Window flagging and merged coverage must match a transparent
    python reference, including the fixed-width union identity
    sum(min(w, gap)) + w."""
    import hashlib

    from etl_spark_gradle_spark.operators.dedup import duplicated_window_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"intro one two {shared} tail1 tail2"),
        (2, f"{shared} totally different ending here now"),
        (3, "no duplication in this document at all whatsoever today"),
        (4, "self self self self self self self self self self"),  # intra-doc only
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           duplicated_window_spans(df, "doc_id", "text", window_tokens=8).collect()}

    # python reference
    def toks(s):
        return s.strip().lower().split()

    w = 8
    wins = {}  # hash -> set of docs
    perdoc = {}
    for did, s in rows:
        t = toks(s)
        for i in range(len(t) - w + 1):
            h = hashlib.md5(" ".join(t[i : i + w]).encode()).hexdigest()
            wins.setdefault(h, set()).add(did)
            perdoc.setdefault(did, []).append((i + 1, h))
    expect = {}
    for did, s in rows:
        ps = sorted(p for p, h in perdoc.get(did, []) if len(wins[h]) >= 2)
        if ps:
            covered = sum(min(w, b - a) for a, b in zip(ps, ps[1:])) + w
            expect[did] = (len(toks(s)) - w + 1, len(ps), ps, covered, len(toks(s)))
    assert set(out) == set(expect)
    for did, (nw, dw, ps, cov, nt) in expect.items():
        r = out[did]
        assert (r.n_windows, r.dup_windows, list(r.dup_positions),
                r.covered_tokens, r.n_tokens) == (nw, dw, ps, cov, nt)
    # doc 3 absent (nothing flagged); doc 4 absent under cross_doc_only
    assert 3 not in out and 4 not in out
    # intra-doc repetition flags when cross_doc_only=False
    out2 = {r.doc_id: r for r in duplicated_window_spans(
        df, "doc_id", "text", window_tokens=8, cross_doc_only=False).collect()}
    assert 4 in out2 and out2[4].covered_tokens == 10  # whole doc covered


def test_remove_duplicated_spans(spark):
    from etl_spark_gradle_spark.operators.dedup import remove_duplicated_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, f"keep1 keep2 {shared} keep3"),
            (2, f"{shared} other words entirely different here"),
            (3, "untouched document stays byte identical INCLUDING case"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.text for r in
            remove_duplicated_spans(df, "doc_id", "text", window_tokens=8).collect()}
    assert rows[1] == "keep1 keep2 keep3"
    assert rows[2] == "other words entirely different here"
    # unflagged docs pass through VERBATIM (no normalization applied)
    assert rows[3] == "untouched document stays byte identical INCLUDING case"


def test_dedup_transformer_substring_strategy(spark):
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, f"keep1 keep2 {shared} keep3"), (2, f"{shared} more words here now ok")],
        ["doc_id", "text"],
    )
    tf = TRANSFORMER_REGISTRY["dedup"]
    out = tf.transform(
        df,
        TransformationConfig(
            type="dedup",
            options={"strategy": "substring", "idColumn": "doc_id",
                     "contentColumn": "text", "windowTokens": "8"},
        ),
        RunContext.create("t", spark),
    )
    rows = {r.doc_id: r.text for r in out.collect()}
    assert rows[1] == "keep1 keep2 keep3"
    assert rows[2] == "more words here now ok"

    from etl_spark_gradle_spark.operators.relational import TransformationError

    with pytest.raises(TransformationError, match="substring dedup requires"):
        tf.transform(
            df,
            TransformationConfig(type="dedup", options={"strategy": "substring"}),
            RunContext.create("t", spark),
        )


def test_embedding_normalize_and_quantize(spark):
    import math

    from etl_spark_gradle_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
        with_normalized_embeddings,
    )

    rows = [
        (1, [3.0, 4.0]),            # norm 5 -> [0.6, 0.8]
        (2, [0.0, 0.0]),            # zero vector passes through
        (3, [-1.0, 2.0, -2.0]),     # norm 3
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    norm = {r.vec_id: r.embedding for r in with_normalized_embeddings(df).collect()}
    assert norm[1] == pytest.approx([0.6, 0.8], abs=1e-6)
    assert norm[2] == [0.0, 0.0]
    assert math.sqrt(sum(x * x for x in norm[3])) == pytest.approx(1.0, abs=1e-6)

    q = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    # scale = max_abs/127; values land exactly on the int grid here
    assert q[1].q_embedding == [95, 127]  # round(3/ (4/127))=95.25->95, 4/scale=127
    assert q[1].q_scale == pytest.approx(4 / 127, abs=1e-7)
    assert q[2].q_embedding == [0, 0] and q[2].q_scale == 0.0
    assert q[3].q_embedding == [-64, 127, -127]  # round(±1/ (2/127))=63.5->64
    # dequantize reconstructs within one grid step
    deq = {r.vec_id: r.embedding for r in dequantize_embeddings(
        quantize_embeddings(df), out_col="embedding").collect()}
    for vid, vec in rows:
        step = max(abs(x) for x in vec) / 127 if any(vec) else 0.0
        assert all(abs(a - b) <= step / 2 + 1e-6 for a, b in zip(deq[vid], vec))


def test_ivf_index_persist_and_search(spark, emb, tmp_path):
    """build once, search many: a parquet-round-tripped IVF index
    (partitioned by cell) returns EXACTLY what ivf_topk computes from
    scratch with the same centroids — the corpus is never re-assigned."""
    queries = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assignments, cents = sim.build_ivf_index(emb, num_cells=8, train_iterations=2)
    path = str(tmp_path / "ivf_index")
    assignments.write.partitionBy("cell").parquet(path)
    loaded = spark.read.parquet(path)

    fresh = sim.ivf_topk(
        emb, queries, k=5, num_cells=8, nprobe=4, train_iterations=2
    ).collect()
    via_index = sim.ivf_search(loaded, cents, queries, k=5, nprobe=4).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted([(r.query_id, r.rank, r.neighbor_id) for r in via_index]) == sorted(
        [(r.query_id, r.rank, r.neighbor_id) for r in fresh]
    )
    # partition pruning: probing cells is a filter on the partition col
    import json as _json

    probed_cells = {r.cell for r in sim._nearest_cells(
        sim._centroid_frame(loaded, loaded.schema["cv"].dataType, cents),
        queries.select(F.col("query_id").alias("qid"), F.col("query_vec").alias("qv")),
        "qv", "qid", 4,
    ).collect()}
    assert len(probed_cells) <= 8


class TestFoldAccents:
    def test_latin_folding_and_expansions(self, spark):
        from etl_spark_gradle_spark.operators.text import fold_accents

        df = spark.createDataFrame(
            [("café déjà-vu Ñoño straße Æon Œuvre Þing ĆČĐŁŻ",)], "t string"
        )
        out = df.select(fold_accents("t").alias("f")).collect()[0].f
        assert out == "cafe deja-vu Nono strasse AEon OEuvre Thing CCDLZ"

    def test_non_latin_passthrough_and_null(self, spark):
        from etl_spark_gradle_spark.operators.text import fold_accents

        df = spark.createDataFrame(
            [("Ελληνικά Кириллица 中文 🙂 plain",), (None,)], "t string"
        )
        rows = df.select(fold_accents("t").alias("f")).collect()
        assert rows[0].f == "Ελληνικά Кириллица 中文 🙂 plain"
        assert rows[1].f is None

    def test_map_strings_are_parallel(self):
        from etl_spark_gradle_spark.operators.text import _ACCENT_DST, _ACCENT_SRC

        assert len(_ACCENT_SRC) == len(_ACCENT_DST)
        assert len(set(_ACCENT_SRC)) == len(_ACCENT_SRC)  # no double-mapping

    def test_adapter_fold_before_stats(self, spark):
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

        df = spark.createDataFrame([(1, "Çafé déjà vu")], "id long, text string")
        cfg = TransformationConfig(
            type="text_analysis",
            options={
                "textColumn": "text",
                "foldAccents": "true",
                "foldOutputColumn": "text_ascii",
                "stats": "true",
            },
        )
        out = TRANSFORMER_REGISTRY["text_analysis"].transform(
            df, cfg, RunContext.create("t-fold", spark)
        )
        row = out.collect()[0]
        assert row.text_ascii == "Cafe deja vu"
        assert row.text == "Çafé déjà vu"  # original intact
        assert "n_tokens" in out.columns  # stats read the folded column


class TestScriptProfile:
    def test_dominant_scripts(self, spark):
        from etl_spark_gradle_spark.operators.text import with_script_profile

        df = spark.createDataFrame(
            [
                ("hello world",),
                ("Привет мир hello",),
                ("中文文本测试",),
                ("مرحبا بالعالم",),
                ("한국어 텍스트",),
                ("नमस्ते दुनिया",),
            ],
            "t string",
        )
        out = {r.t: (r.script_name, r.script_letters) for r in
               with_script_profile(df, "t").collect()}
        assert out["hello world"] == ("latin", 10)
        assert out["Привет мир hello"][0] == "cyrillic"
        assert out["中文文本测试"] == ("han", 6)
        assert out["مرحبا بالعالم"][0] == "arabic"
        assert out["한국어 텍스트"][0] == "hangul"
        assert out["नमस्ते दुनिया"][0] == "devanagari"

    def test_no_letters_and_null(self, spark):
        from etl_spark_gradle_spark.operators.text import with_script_profile

        df = spark.createDataFrame([("123 !!!",), (None,)], "t string")
        rows = with_script_profile(df, "t").collect()
        assert rows[0].script_name == "none" and rows[0].script_ratio == 0.0
        assert rows[0].script_letters == 0
        assert rows[1].script_name == "none" and rows[1].script_letters is None

    def test_tie_breaks_to_alphabetically_last(self, spark):
        from etl_spark_gradle_spark.operators.text import with_script_profile

        # 3 Cyrillic + 3 Latin: tie -> 'latin' (sorts after 'cyrillic')
        df = spark.createDataFrame([("абв abc",)], "t string")
        r = with_script_profile(df, "t").collect()[0]
        assert r.script_name == "latin" and abs(r.script_ratio - 0.5) < 1e-15

    def test_adapter_flag(self, spark):
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

        df = spark.createDataFrame([(1, "Привет")], "id long, text string")
        cfg = TransformationConfig(
            type="text_analysis",
            options={"textColumn": "text", "scriptProfile": "true", "stats": "false"},
        )
        out = TRANSFORMER_REGISTRY["text_analysis"].transform(
            df, cfg, RunContext.create("t-script", spark)
        )
        assert out.collect()[0].script_name == "cyrillic"


class TestLineDedup:
    """Corpus-wide keep-first line dedup (dedup.line_dedup)."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "alpha beta gamma\nCOOKIE BANNER TEXT\nunique one"),
                (2, "COOKIE BANNER TEXT\nunique two\nunique two"),
                (3, "..\nCOOKIE BANNER TEXT\n.."),
                (4, None),
            ],
            "doc_id long, text string",
        )

    def test_keep_first_across_and_within_docs(self, spark):
        from etl_spark_gradle_spark.operators.dedup import line_dedup

        out = {
            r.doc_id: r
            for r in line_dedup(self._docs(spark), min_chars=5).collect()
        }
        # doc 1 holds the first occurrence of the banner -> intact
        assert out[1].text_dedup == (
            "alpha beta gamma\nCOOKIE BANNER TEXT\nunique one"
        )
        assert (out[1].n_lines, out[1].kept_lines) == (3, 3)
        # doc 2: banner copy dropped AND the within-doc repeat of
        # "unique two" dropped (keep-first is global over (id, pos))
        assert out[2].text_dedup == "unique two"
        assert (out[2].n_lines, out[2].kept_lines) == (3, 1)

    def test_short_line_guard_always_keeps(self, spark):
        from etl_spark_gradle_spark.operators.dedup import line_dedup

        out = {
            r.doc_id: r
            for r in line_dedup(self._docs(spark), min_chars=5).collect()
        }
        # ".." is under min_chars: both copies in doc 3 survive even
        # though the text repeats; only the banner line is dropped
        assert out[3].text_dedup == "..\n.."
        assert (out[3].n_lines, out[3].kept_lines) == (3, 2)

    def test_null_text_is_empty_single_line(self, spark):
        from etl_spark_gradle_spark.operators.dedup import line_dedup

        out = {
            r.doc_id: r
            for r in line_dedup(self._docs(spark), min_chars=5).collect()
        }
        assert out[4].text_dedup == ""
        assert (out[4].n_lines, out[4].kept_lines) == (1, 1)

    def test_deterministic_across_runs(self, spark):
        from etl_spark_gradle_spark.operators.dedup import line_dedup

        frames = [
            sorted(map(tuple, line_dedup(self._docs(spark)).collect()))
            for _ in range(3)
        ]
        assert frames[0] == frames[1] == frames[2]


class TestGopherRules:
    """Gopher quality-filter rule battery (text.with_gopher_rules)."""

    def test_rules_fire_individually(self, spark):
        from etl_spark_gradle_spark.operators.text import with_gopher_rules

        good = "the quick brown fox jumps to be sure of and that have " \
               "with many more plain words " + "word " * 40
        df = spark.createDataFrame(
            [
                (1, good),                          # passes everything
                (2, "too short to keep the be"),    # r_words
                (3, good + " ##### ### # # # # # # # # # # # # #"),  # r_symbol
                (4, good + "\n- b\n- b\n- b\n- b\n- b\n- b\n- b\n- b\n- b\n- b"),
                (5, good + "\nwait..."),            # r_ellipsis (1/2 lines)
                (6, ("123 456 789 " * 20) + "the be"),  # r_alpha
                (7, "zz yy xx ww vv " * 20),        # r_stop
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in with_gopher_rules(df).collect()}
        assert out[1].gopher_keep == 1
        assert out[2].r_words == 0 and out[2].gopher_keep == 0
        assert out[3].r_symbol == 0
        assert out[4].r_bullet == 0  # 10/11 lines bulleted > 0.9
        assert out[5].r_ellipsis == 0  # 1/2 lines > 0.3
        assert out[6].r_alpha == 0
        assert out[7].r_stop == 0 and out[7].stop_hits == 0
        # distinct-hit counting: repeated 'the' counts once
        df2 = spark.createDataFrame(
            [(8, "the the the the")], "doc_id long, text string"
        )
        assert with_gopher_rules(df2).collect()[0].stop_hits == 1

    def test_zero_shuffle_plan(self, spark):
        from etl_spark_gradle_spark.operators.text import with_gopher_rules

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = with_gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestNewAdapterRoutes:
    """Registry adapter routes for line_dedup and gopher rules."""

    def test_dedup_lines_strategy(self, spark):
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

        df = spark.createDataFrame(
            [(1, "dup line here\nkeep a", "en"), (2, "dup line here\nkeep b", "de")],
            "doc_id long, text string, lang string",
        )
        cfg = TransformationConfig(
            type="dedup",
            options={
                "strategy": "lines",
                "idColumn": "doc_id",
                "contentColumn": "text",
                "outputColumn": "text",
            },
        )
        out = {
            r.doc_id: r
            for r in TRANSFORMER_REGISTRY["dedup"]
            .transform(df, cfg, RunContext.create("t-ld", spark))
            .collect()
        }
        assert out[1].text == "dup line here\nkeep a" and out[2].text == "keep b"
        # adapter pass-through contract: non-text columns survive
        assert out[1].lang == "en" and out[2].lang == "de"
        assert (out[2].n_lines, out[2].kept_lines) == (2, 1)

    def test_dedup_lines_null_id_and_count_collisions(self, spark):
        """Round-8 ADVICE hardening: (a) a NULL idColumn row fails
        loudly instead of silently vanishing through the inner
        join-back; (b) pre-existing n_lines/kept_lines columns raise a
        TransformationError (round-9 ADVICE: replacing them silently
        dropped legitimate user columns)."""
        import pytest as _pytest

        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

        cfg = TransformationConfig(
            type="dedup",
            options={
                "strategy": "lines",
                "idColumn": "doc_id",
                "contentColumn": "text",
                "outputColumn": "text",
            },
        )
        bad = spark.createDataFrame(
            [(1, "a line here"), (None, "b line here")],
            "doc_id long, text string",
        )
        with _pytest.raises(Exception, match="NULL doc_id"):
            TRANSFORMER_REGISTRY["dedup"].transform(
                bad, cfg, RunContext.create("t-ld-null", spark)
            ).collect()

        dirty = spark.createDataFrame(
            [(1, "keep one\nkeep two", 99, 99)],
            "doc_id long, text string, n_lines long, kept_lines long",
        )
        with _pytest.raises(Exception, match="n_lines"):
            TRANSFORMER_REGISTRY["dedup"].transform(
                dirty, cfg, RunContext.create("t-ld-cols", spark)
            )
        out = TRANSFORMER_REGISTRY["dedup"].transform(
            dirty.drop("n_lines", "kept_lines"),
            cfg,
            RunContext.create("t-ld-cols2", spark),
        )
        row = out.collect()[0]
        assert (row.n_lines, row.kept_lines) == (2, 2)

    def test_dedup_lines_validation(self, spark):
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.plans.config import TransformationConfig

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        cfg = TransformationConfig(type="dedup", options={"strategy": "lines"})
        res = TRANSFORMER_REGISTRY["dedup"].validate(df, cfg)
        assert not res.is_valid and "idColumn" in res.errors[0]

    def test_text_analysis_gopher_route(self, spark):
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.plans.config import RunContext, TransformationConfig

        df = spark.createDataFrame(
            [(1, "the quick brown fox " * 20)], "doc_id long, text string"
        )
        cfg = TransformationConfig(
            type="text_analysis",
            options={
                "textColumn": "text",
                "stats": "false",
                "gopherRules": "true",
                "gopherMinStopHits": "1",
            },
        )
        r = (
            TRANSFORMER_REGISTRY["text_analysis"]
            .transform(df, cfg, RunContext.create("t-gr", spark))
            .collect()[0]
        )
        assert r.gopher_keep == 1 and r.n_words == 80


class TestLineDedupSkew:
    """Hot-key behavior: one boilerplate line shared by every doc."""

    def test_hot_line_keeps_exactly_one(self, spark):
        from pyspark.sql import functions as F

        from etl_spark_gradle_spark.operators.dedup import line_dedup

        n = 2000
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("COOKIE BANNER SHARED BY EVERY DOC\nunique-"),
                F.col("id").cast("string"),
            ).alias("text"),
        )
        out = line_dedup(df, "doc_id", "text")
        agg = out.agg(
            F.sum("kept_lines").cast("long").alias("k"),
            F.sum("n_lines").cast("long").alias("t"),
        ).collect()[0]
        # n unique lines + exactly ONE surviving banner copy
        assert (agg.k, agg.t) == (n + 1, 2 * n)
        first = out.where("doc_id = 0").collect()[0]
        assert first.text_dedup.startswith("COOKIE BANNER")
        rest = out.where("doc_id = 1").collect()[0]
        assert rest.text_dedup == "unique-1"


class TestPrefixJaccardJoin:
    """Lossless prefix-filter Jaccard join equals the full index."""

    def test_equals_uncapped_inverted_index(self, spark):
        import random

        from etl_spark_gradle_spark.operators.dedup import (
            ngram_jaccard_pairs,
            prefix_jaccard_join,
        )

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(30)]
        rows = []
        for i in range(60):
            body = " ".join(rng.choices(vocab, k=rng.randint(5, 40)))
            rows.append((i, body))
            if i % 4 == 0:  # inject near-dups: light tail edits
                rows.append((1000 + i, body + " w0 w1"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for t in (0.2, 0.5, 0.8):
            want = sorted(
                map(
                    tuple,
                    ngram_jaccard_pairs(
                        df, "doc_id", "text", n=3, threshold=t
                    ).collect(),
                )
            )
            got = sorted(
                map(
                    tuple,
                    prefix_jaccard_join(
                        df, "doc_id", "text", n=3, threshold=t
                    ).collect(),
                )
            )
            assert got == want, f"threshold {t}: {len(got)} vs {len(want)}"
            assert want, f"degenerate fixture at t={t}"  # pairs exist

    def test_identical_docs_and_boundary_threshold(self, spark):
        from etl_spark_gradle_spark.operators.dedup import prefix_jaccard_join

        df = spark.createDataFrame(
            [
                (1, "a b c d e f"),
                (2, "a b c d e f"),          # jaccard 1.0 with 1
                (3, "a b c d e g"),          # 3 of 5 shingles shared
                (4, "zz yy xx ww vv uu"),    # disjoint
            ],
            "doc_id long, text string",
        )
        out = {
            (r.id_a, r.id_b): r.jaccard
            for r in prefix_jaccard_join(
                df, "doc_id", "text", n=3, threshold=0.4
            ).collect()
        }
        assert out[(1, 2)] == 1.0
        assert abs(out[(1, 3)] - 3 / 5) < 1e-15  # exactly (4+4-3)=5 union? no: 3/(4+4-3)
        assert (1, 4) not in out and (2, 4) not in out


def test_topk_recall_operator(emb, spark):
    """topk_recall distributes the eval the earlier driver-side recall
    tests compute by hand: identical tables give recall 1.0, the LSH
    path lands in (0, 1], missing queries and empty-truth queries are
    visible instead of averaged away."""
    queries = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sim.brute_force_topk(emb, queries, k=5)
    approx = sim.lsh_bucketed_topk(
        emb, queries, k=5, dim=64, num_bits=16, bands=8
    )
    perfect = sim.topk_recall(exact, exact, k=5).collect()
    assert all(r.recall == 1.0 and r.hits == 5 for r in perfect)
    lsh = {r.query_id: r for r in sim.topk_recall(approx, exact, k=5).collect()}
    assert len(lsh) == 10
    assert all(0.0 <= r.recall <= 1.0 for r in lsh.values())
    # aggregate recall consistent with the set-based hand computation
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    hand = len(exact_set & approx_set) / len(exact_set)
    agg = sum(r.hits for r in lsh.values()) / sum(r.n_truth for r in lsh.values())
    assert abs(agg - hand) < 1e-12

    # a query present only in truth surfaces with recall 0, not dropped
    t = spark.createDataFrame([(1, 100), (2, 200)], "query_id int, neighbor_id int")
    c = spark.createDataFrame([(1, 100)], "query_id int, neighbor_id int")
    rows = {r.query_id: r for r in sim.topk_recall(c, t).collect()}
    assert rows[2].recall == 0.0 and rows[2].n_candidates == 0
    # candidate-only query: n_truth 0, recall NULL (not 0/0)
    rows2 = {r.query_id: r for r in sim.topk_recall(t, c).collect()}
    assert rows2[2].n_truth == 0 and rows2[2].recall is None


class TestKAnonymity:
    def _df(self, spark):
        rows = [
            # (age_band, zip3) quasi-identifiers
            ("30-39", "941", 1), ("30-39", "941", 2), ("30-39", "941", 3),
            ("40-49", "941", 4), ("40-49", "941", 5),
            ("50-59", "100", 6),             # singleton -> at risk
            (None, "100", 7), (None, "100", 8),  # NULL QI is a real group
        ]
        return spark.createDataFrame(rows, "age string, zip3 string, id long")

    def test_violations_summary_annotate(self, spark):
        from etl_spark_gradle_spark.operators.pii import k_anonymity

        df = self._df(spark)
        viol = {
            (r.age, r.zip3): r.n
            for r in k_anonymity(df, ["age", "zip3"], k=3).collect()
        }
        assert viol == {("40-49", "941"): 2, ("50-59", "100"): 1,
                        (None, "100"): 2}
        s = k_anonymity(df, ["age", "zip3"], k=3, output="summary").collect()[0]
        assert (s.total_rows, s.at_risk_rows, s.total_groups,
                s.violating_groups, s.min_group_size) == (8, 5, 4, 3, 1)
        assert s.at_risk_share == 5.0 / 8.0
        ann = {
            r.id: (r.qi_group_n, r.k_anonymous)
            for r in k_anonymity(
                df, ["age", "zip3"], k=3, output="annotate"
            ).collect()
        }
        assert ann[1] == (3, True) and ann[6] == (1, False)
        assert ann[7] == (2, False)  # NULL group joined null-safely
        assert len(ann) == 8         # annotate never drops rows

    def test_validation_and_adapter(self, spark):
        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.pii import k_anonymity
        from etl_spark_gradle_spark.operators.relational import (
            TransformationError,
        )
        from etl_spark_gradle_spark.plans.config import (
            RunContext,
            TransformationConfig,
        )

        df = self._df(spark)
        with pytest.raises(TransformationError, match="k >= 2"):
            k_anonymity(df, ["age"], k=1)
        with pytest.raises(TransformationError, match="not in input schema"):
            k_anonymity(df, ["nope"])
        with pytest.raises(TransformationError, match="output"):
            k_anonymity(df, ["age"], output="bogus")
        t = TRANSFORMER_REGISTRY["k_anonymity"]
        cfg = TransformationConfig(
            type="k_anonymity",
            options={"quasiIdentifiers": "age,zip3", "k": 3,
                     "output": "summary"},
        )
        assert t.validate(df, cfg).is_valid
        out = t.transform(
            df, cfg, RunContext(pipeline_id="t", run_id="r", spark=spark)
        )
        assert out.collect()[0].violating_groups == 3
        assert not t.validate(
            df, TransformationConfig(type="k_anonymity", options={})
        ).is_valid


class TestLDiversity:
    """Distinct l-diversity — the homogeneity-attack audit k-anonymity
    can't make (a large group whose members all share one sensitive
    value is k-anonymous yet fully leaky)."""

    def _df(self, spark):
        # group (A, 1): 3 rows, all sensitive 'x'  -> 1-diverse VIOLATION
        # group (A, 2): 2 rows, 'x' and 'y'        -> 2-diverse ok at l=2
        # group (B, 1): 3 rows, sensitive all NULL -> 0-diverse VIOLATION
        # group (B, 2): 2 rows, 'x' and NULL       -> 1-diverse VIOLATION
        rows = [
            ("A", 1, "x"), ("A", 1, "x"), ("A", 1, "x"),
            ("A", 2, "x"), ("A", 2, "y"),
            ("B", 1, None), ("B", 1, None), ("B", 1, None),
            ("B", 2, "x"), ("B", 2, None),
        ]
        return spark.createDataFrame(rows, "seg string, band int, diag string")

    def test_violations_hand_computed(self, spark):
        from etl_spark_gradle_spark.operators.pii import l_diversity

        out = {
            (r["seg"], r["band"]): (r["n"], r["distinct_sensitive"])
            for r in l_diversity(
                self._df(spark), ["seg", "band"], "diag", l=2
            ).collect()
        }
        assert out == {("A", 1): (3, 1), ("B", 1): (3, 0), ("B", 2): (2, 1)}

    def test_summary_and_higher_l(self, spark):
        from etl_spark_gradle_spark.operators.pii import l_diversity

        s = l_diversity(
            self._df(spark), ["seg", "band"], "diag", l=2, output="summary"
        ).collect()[0]
        assert s["total_rows"] == 10 and s["at_risk_rows"] == 8
        assert s["total_groups"] == 4 and s["violating_groups"] == 3
        assert s["min_diversity"] == 0
        assert s["at_risk_share"] == 8 / 10
        # at l=3 even the (A,2) group violates
        s3 = l_diversity(
            self._df(spark), ["seg", "band"], "diag", l=3, output="summary"
        ).collect()[0]
        assert s3["violating_groups"] == 4

    def test_validation_and_adapter(self, spark):
        import pytest as _pytest

        from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
        from etl_spark_gradle_spark.operators.pii import l_diversity
        from etl_spark_gradle_spark.operators.relational import (
            TransformationError,
        )
        from etl_spark_gradle_spark.plans.config import TransformationConfig

        df = self._df(spark)
        with _pytest.raises(TransformationError, match="l >= 2"):
            l_diversity(df, ["seg"], "diag", l=1)
        with _pytest.raises(TransformationError, match="not in input"):
            l_diversity(df, ["nope"], "diag")
        t = TRANSFORMER_REGISTRY["l_diversity"]
        cfg = TransformationConfig(
            type="l_diversity",
            options={"quasiIdentifiers": "seg,band",
                     "sensitiveColumn": "diag", "l": "2"},
        )
        assert t.validate(df, cfg).is_valid
        assert t.transform(df, cfg, None).count() == 3
        bad = TransformationConfig(
            type="l_diversity", options={"quasiIdentifiers": "seg"}
        )
        assert not t.validate(df, bad).is_valid


def test_containment_pairs_asymmetric(spark):
    """containment_pairs: the quote/subset detector — a short doc
    fully inside a long one has containment 1.0 forward but small
    backward; Jaccard alone would miss it."""
    import pytest as _pt

    from etl_spark_gradle_spark.operators.dedup import containment_pairs
    from etl_spark_gradle_spark.operators.relational import (
        TransformationError,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    article = (
        "yesterday a witness said " + quote +
        " and then everyone went home to think about what happened"
    )
    df = spark.createDataFrame(
        [(1, quote), (2, article), (3, "totally different content here")],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r for r in
           containment_pairs(df, "doc_id", "text", n=3,
                             threshold=0.5).collect()}
    # quote (7 trigrams) fully contained in article -> containment 1.0
    assert out[(1, 2)]["containment"] == 1.0
    assert out[(1, 2)]["inter"] == out[(1, 2)]["sz_a"] == 7
    # backward direction is weak and filtered at 0.5
    assert (2, 1) not in out
    assert all(k[0] != 3 and k[1] != 3 for k in out)
    with _pt.raises(TransformationError):
        containment_pairs(df, "doc_id", "text", threshold=0.0)

    # dedup adapter: strategy containment drops the CONTAINED doc
    from etl_spark_gradle_spark.operators import TRANSFORMER_REGISTRY
    from etl_spark_gradle_spark.plans.config import TransformationConfig

    t = TRANSFORMER_REGISTRY["dedup"]
    cfg = TransformationConfig(
        type="dedup",
        options={"strategy": "containment", "idColumn": "doc_id",
                 "contentColumn": "text", "threshold": "0.5"},
    )
    assert t.validate(df, cfg).is_valid
    kept = {r["doc_id"] for r in t.transform(df, cfg, None).collect()}
    assert kept == {2, 3}  # the quote is redundant given the article
