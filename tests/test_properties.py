"""Property-based tests (hypothesis): the Catalyst-expression operators
must agree with straightforward pure-Python reference implementations on
arbitrary generated text — the upgrade over the reference's
hand-computed-expected-values-only strategy (SURVEY §5).

One shared Spark round-trip per property batch: hypothesis generates a
corpus, we evaluate the operator over the whole corpus in one job, and
compare element-wise (per-example Spark jobs would be minutes-slow).
"""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_spark_gradle_spark.operators import dedup as dd
from etl_spark_gradle_spark.operators import text as tx

# printable-ish text incl. whitespace runs, unicode letters, punctuation
TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("Lu", "Ll", "Nd", "Po", "Zs"),
        include_characters=" \t",
    ),
    min_size=0,
    max_size=80,
)


def py_tokens(s: str) -> list[str]:
    t = s.strip()
    return re.split(r"\s+", t) if t else []


def py_token_shingles(s: str, n: int) -> set[str]:
    toks = [t for t in re.split(r"\s+", s.strip().lower())] if s.strip() else []
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def py_fingerprint(s: str) -> str:
    norm = re.sub(r"\s+", " ", s).strip().lower()
    return hashlib.md5(norm.encode("utf-8")).hexdigest()


def _batch_eval(spark, texts: list[str], col_builder) -> list:
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    rows = df.select("i", col_builder(F.col("t")).alias("out")).collect()
    return [r.out for r in sorted(rows, key=lambda r: r.i)]


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_token_count_matches_python(spark_prop, texts):
    outs = _batch_eval(spark_prop, texts, lambda c: tx.token_count(c))
    assert outs == [len(py_tokens(t)) for t in texts]


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_fingerprint_matches_python_md5(spark_prop, texts):
    outs = _batch_eval(spark_prop, texts, lambda c: tx.fingerprint(c))
    assert outs == [py_fingerprint(t) for t in texts]


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6), st.integers(min_value=1, max_value=4))
def test_token_shingles_match_python(spark_prop, texts, n):
    outs = _batch_eval(spark_prop, texts, lambda c: dd.token_shingles(c, n))
    for out, t in zip(outs, texts):
        assert set(out) == py_token_shingles(t, n)


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=2, max_size=6))
def test_simhash_identical_text_identical_signature(spark_prop, texts):
    doubled = texts + texts  # every text twice
    outs = _batch_eval(spark_prop, doubled, lambda c: dd.simhash(c))
    half = len(texts)
    assert outs[:half] == outs[half:]


@pytest.fixture(scope="module")
def spark_prop():
    from etl_spark_gradle_spark.session import get_spark

    return get_spark(
        app_name="tests-prop",
        master="local[4]",
        conf={"spark.sql.shuffle.partitions": "4"},
    )


def py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference union-find: min member id as cluster label."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_match_union_find(spark_prop, edges):
    pairs = spark_prop.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], ["id_a", "id_b"]
    )
    got = {r.id: r.cluster for r in dd.connected_components(pairs).collect()}
    assert got == py_components(edges)


def py_asof(left, right, direction):
    """Pure-python asof reference: backward = latest t' <= t, forward =
    earliest t' >= t, nearest = smaller |dt| with ties to backward.
    ``right`` must be deduped per (k, t)."""
    by_key = {}
    for k, t, v in right:
        by_key.setdefault(k, []).append((t, v))
    out = {}
    for i, (k, t) in enumerate(left):
        cands = by_key.get(k, [])
        back = max(((tt, v) for tt, v in cands if tt <= t), default=None)
        fwd = min(((tt, v) for tt, v in cands if tt >= t), default=None)
        if direction == "backward":
            pick = back
        elif direction == "forward":
            pick = fwd
        elif back is None or fwd is None:
            pick = back or fwd
        else:
            pick = fwd if (fwd[0] - t) < (t - back[0]) else back
        out[i] = None if pick is None else pick[1]
    return out


@settings(max_examples=10, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=10
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 999)),
        min_size=0,
        max_size=10,
    ),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
def test_asof_join_matches_python_reference(spark_prop, left, right, direction):
    from datetime import datetime, timedelta

    from etl_spark_gradle_spark.operators.relational import asof_join

    base = datetime(2024, 1, 1)
    # dedupe right per (k, t) (keep max v) so the match is deterministic
    rd = {}
    for k, t, v in right:
        rd[(k, t)] = max(rd.get((k, t), -1), v)
    right_d = [(k, t, v) for (k, t), v in rd.items()]

    ldf = spark_prop.createDataFrame(
        [(i, k, base + timedelta(seconds=t)) for i, (k, t) in enumerate(left)],
        ["i", "k", "t"],
    )
    rdf_rows = [(k, base + timedelta(seconds=t), v) for k, t, v in right_d]
    if rdf_rows:
        rdf = spark_prop.createDataFrame(rdf_rows, ["rk", "rt", "v"])
    else:
        rdf = spark_prop.createDataFrame(
            [], "rk INT, rt TIMESTAMP, v BIGINT"
        )
    got = {
        r.i: r.v
        for r in asof_join(
            ldf, rdf, "k", "rk", "t", "rt", ["v"], direction=direction
        ).collect()
    }
    assert got == py_asof(left, right_d, direction)


# ---------------------------------------------------------------------------
# Multimodal header parsers: construct → parse round-trips (pure Python,
# no Spark) over the full field domains
# ---------------------------------------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=2**31 - 1),
    h=st.integers(min_value=1, max_value=2**31 - 1),
    color_type=st.sampled_from([0, 2, 3, 4, 6]),
)
def test_png_header_roundtrip(w, h, color_type):
    from etl_spark_gradle_spark.operators import multimodal as mm

    payload = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    assert mm.parse_image_dims(payload) == (w, h, channels, "png")


@given(
    w=st.integers(min_value=1, max_value=65535),
    h=st.integers(min_value=1, max_value=65535),
    ncomp=st.sampled_from([1, 3, 4]),
    n_leading_segments=st.integers(min_value=0, max_value=3),
)
def test_jpeg_header_roundtrip(w, h, ncomp, n_leading_segments):
    from etl_spark_gradle_spark.operators import multimodal as mm

    # arbitrary APPn/COM segments before the SOF0 must be skipped
    leading = b""
    for i in range(n_leading_segments):
        body = bytes([i]) * (3 + i)
        leading += bytes([0xFF, 0xE1 + i]) + (len(body) + 2).to_bytes(2, "big") + body
    sof0 = (
        b"\xff\xc0" + (8 + 3 * ncomp).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
        + b"\x00" * (3 * ncomp)
    )
    payload = b"\xff\xd8" + leading + sof0 + b"\xff\xd9"
    assert mm.parse_image_dims(payload) == (w, h, ncomp, "jpeg")


@given(
    sample_rate=st.integers(min_value=1, max_value=384_000),
    channels=st.integers(min_value=1, max_value=8),
    bits=st.sampled_from([8, 16, 24, 32]),
    n_sec_frames=st.integers(min_value=0, max_value=100),
)
def test_wav_header_roundtrip(sample_rate, channels, bits, n_sec_frames):
    from etl_spark_gradle_spark.operators import multimodal as mm

    byte_rate = sample_rate * channels * (bits // 8)
    data_len = byte_rate * n_sec_frames // 10  # tenths of a second
    payload = (
        b"RIFF" + (36 + data_len).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little")
        + b"data" + data_len.to_bytes(4, "little")
    )
    got = mm.parse_audio_meta(payload)
    assert got == (sample_rate, channels, bits, data_len * 1000 // byte_rate)


@given(junk=st.binary(max_size=200))
def test_image_audio_parsers_never_crash(junk):
    from etl_spark_gradle_spark.operators import multimodal as mm

    # arbitrary bytes: parsers must return None or a well-formed tuple,
    # never raise (decode runs inside executor batches at corpus scale)
    for out in (mm.parse_image_dims(junk), mm.parse_audio_meta(junk)):
        assert out is None or (len(out) == 4)


@given(raw=st.text(max_size=300))
@settings(max_examples=30, deadline=None)
def test_clean_html_idempotent_and_safe(spark_prop, raw):
    """clean_html is total (never raises) and idempotent over
    entity-free text. NOT idempotent in general: tags are stripped
    BEFORE entities decode (the correct order — encoded markup shown as
    text must not be deleted as a tag), so double-encoded input like
    '&amp;lt;b&amp;gt;' decodes to '&lt;b&gt;' on pass one and to a
    stripped '<b>' on pass two. The property is therefore checked on
    input with entity ampersands escaped out."""
    from etl_spark_gradle_spark.operators import text as tx

    raw = raw.replace("&", "＆")  # fullwidth & — keeps text shape, no entities
    df = spark_prop.createDataFrame([(raw,)], "t STRING")
    once = df.select(tx.clean_html("t").alias("c")).collect()[0].c
    twice = (
        df.select(tx.clean_html("t").alias("c"))
        .select(tx.clean_html("c").alias("c2"))
        .collect()[0]
        .c2
    )
    assert twice == once
    # ASCII-space trim only: Python's str.strip() also strips \x1c-\x1f,
    # which are NOT Unicode whitespace and rightly survive cleaning
    assert once == once.strip(" ")
    assert "  " not in once  # whitespace fully collapsed


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, c, seed):
    """png_encode → png_decode is lossless for every supported shape."""
    import numpy as np

    from etl_spark_gradle_spark.operators import media_codecs as mc

    arr = np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)
    out = mc.png_decode(mc.png_encode(arr))
    assert out is not None and out.shape == arr.shape and (out == arr).all()


@given(
    n=st.integers(1, 500),
    rate=st.sampled_from([8000, 16000, 44100]),
    ch=st.integers(1, 2),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(n, rate, ch, seed):
    """wav_encode → wav_decode preserves shape/rate and is within PCM16
    quantization error."""
    import numpy as np

    from etl_spark_gradle_spark.operators import media_codecs as mc

    sig = np.random.default_rng(seed).uniform(-1, 1, (n, ch))
    got = mc.wav_decode(mc.wav_encode(sig, rate))
    assert got is not None
    r, c2, samples = got
    assert (r, c2) == (rate, ch) and samples.shape == (n, ch)
    assert np.abs(samples - sig).max() <= 1.5 / 32767


@given(delays=st.lists(st.integers(0, 5000), min_size=1, max_size=12))
@settings(max_examples=40, deadline=None)
def test_gif_delay_roundtrip_property(delays):
    """gif_encode_frames → gif_frame_delays recovers every delay (GIF
    stores centiseconds, so inputs are floored to 10 ms)."""
    from etl_spark_gradle_spark.operators import media_codecs as mc

    got = mc.gif_frame_delays(mc.gif_encode_frames(3, 2, delays))
    assert got == [d // 10 * 10 for d in delays]


@given(
    n_frames=st.integers(1, 10),
    num=st.sampled_from([10, 24, 25, 30, 50]),
    den=st.sampled_from([1, 2]),
    w=st.integers(2, 8),
    h=st.integers(2, 8),
)
@settings(max_examples=40, deadline=None)
def test_y4m_roundtrip_property(n_frames, num, den, w, h):
    from etl_spark_gradle_spark.operators import media_codecs as mc

    info = mc.y4m_parse(mc.y4m_encode(w, h, n_frames, fps_num=num, fps_den=den))
    assert info is not None
    assert (info["width"], info["height"]) == (w, h)
    assert (info["fps_num"], info["fps_den"]) == (num, den)
    assert info["n_frames"] == n_frames


@given(junk=st.binary(max_size=300))
@settings(max_examples=50, deadline=None)
def test_media_codecs_total_on_junk(junk):
    """Every decoder returns None (never raises) on arbitrary bytes —
    required: they run inside executor batches at corpus scale."""
    from etl_spark_gradle_spark.operators import media_codecs as mc

    assert mc.png_decode(junk) is None or junk[:8] == b"\x89PNG\r\n\x1a\n"
    mc.wav_decode(junk)
    mc.y4m_parse(junk)
    mc.gif_frame_delays(junk)


# -- session-4 operators ----------------------------------------------------


@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcdef", min_size=1, max_size=5),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=8,
    ),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=15, deadline=None)
def test_bpe_lossless_and_matches_reference(spark_prop, word_lists, n_merges):
    """Trainable BPE on arbitrary corpora: the learned merge table and
    every document's token sequence match the pure-Python reference,
    and concatenated tokens always reproduce the non-space text."""
    from etl_spark_gradle_spark.operators.bpe import (
        bpe_encode_word,
        bpe_tokenize,
        train_bpe,
    )

    texts = [" ".join(ws) for ws in word_lists]
    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    model = train_bpe(df, "text", num_merges=n_merges)
    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
    got = {r.id: r for r in bpe_tokenize(df, "id", "text", model["merges"]).collect()}
    for i, ws in enumerate(word_lists):
        expected = [t for w in ws for t in bpe_encode_word(w, ranks)]
        assert got[i].tokens == expected
        assert "".join(got[i].tokens) == "".join(ws)


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-1000, max_value=1000, allow_nan=False),
            st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        ),
        min_size=1, max_size=40,
    ),
    st.integers(min_value=2, max_value=12),
)
@settings(max_examples=15, deadline=None)
def test_z_value_matches_python_reference_property(spark_prop, points, bits):
    """Morton interleave on arbitrary doubles/bounds agrees with the
    pure-Python reference bit-for-bit (scaling truncation included)."""
    import math

    from etl_spark_gradle_spark.operators.layout import z_value

    xs, ys = [p[0] for p in points], [p[1] for p in points]
    bounds = [(min(xs), max(xs)), (min(ys), max(ys))]

    def ref_scale(v, mn, mx):
        top = (1 << bits) - 1
        if mx <= mn:
            return 0
        return max(0, min(top, math.floor((v - mn) * float(top) / (mx - mn))))

    def ref_z(x, y):
        zx, zy = ref_scale(x, *bounds[0]), ref_scale(y, *bounds[1])
        z = 0
        for b in range(bits):
            z += ((zx >> b) & 1) << (2 * b)
            z += ((zy >> b) & 1) << (2 * b + 1)
        return z

    df = spark_prop.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(points)], "id long, x double, y double"
    )
    got = {
        r.id: r.z
        for r in df.select("id", z_value(["x", "y"], bounds, bits).alias("z")).collect()
    }
    for i, (x, y) in enumerate(points):
        assert got[i] == ref_z(x, y), (i, x, y, bits)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=5),
        min_size=1, max_size=8, unique=True,
    ),
    st.text(alphabet="ab", max_size=60),
)
def test_aho_corasick_matches_bruteforce(patterns, text):
    """The automaton (goto/fail/dict-suffix links) must report exactly
    the brute-force `p in text` set. The 2-letter alphabet maximizes
    nested/overlapping/shared-prefix patterns — the cases where fail
    and dict-suffix links actually fire."""
    from etl_spark_gradle_spark.operators.keywords import AhoCorasick

    assert AhoCorasick(patterns).find_set(text) == {
        p for p in patterns if p in text
    }


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", categories=("Lu", "Ll", "Nd")),
            min_size=1, max_size=4,
        ),
        min_size=1, max_size=6, unique=True,
    ),
    st.text(
        alphabet=st.characters(codec="utf-8", categories=("Lu", "Ll", "Nd", "Zs")),
        max_size=40,
    ),
)
def test_aho_corasick_matches_bruteforce_unicode(patterns, text):
    from etl_spark_gradle_spark.operators.keywords import AhoCorasick

    assert AhoCorasick(patterns).find_set(text) == {
        p for p in patterns if p in text
    }


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=40),
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=20),
)
def test_bloom_semi_join_matches_set_semantics(spark_prop, fact_keys, build_keys):
    """Exact-mode bloom semi join over arbitrary (duplicated, negative)
    keys must equal plain key-membership filtering — multiplicity of
    the fact side preserved, build-side duplicates irrelevant."""
    from etl_spark_gradle_spark.operators.bloom import bloom_semi_join

    fact = spark_prop.createDataFrame(
        [(k, i) for i, k in enumerate(fact_keys)], "k long, rowid long"
    )
    build = spark_prop.createDataFrame([(k,) for k in build_keys], "k long")
    got = sorted(
        (r.k, r.rowid)
        for r in bloom_semi_join(fact, build, "k", num_bits=256).collect()
    )
    bset = set(build_keys)
    want = sorted((k, i) for i, k in enumerate(fact_keys) if k in bset)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.sampled_from("uvwxyz"), min_size=1, max_size=30),
    st.lists(st.sampled_from("uvwxyz"), min_size=1, max_size=30),
)
def test_tv_distance_matches_python_reference(spark_prop, cats_a, cats_b):
    """TV total matches the Counter-based reference, is symmetric, and
    sits in [0, 1]."""
    from collections import Counter

    from etl_spark_gradle_spark.operators.stats import tv_distance

    df_a = spark_prop.createDataFrame([(c,) for c in cats_a], "c string")
    df_b = spark_prop.createDataFrame([(c,) for c in cats_b], "c string")
    tv = tv_distance(df_a, df_b, "c").collect()[0]["tv"]
    tv_rev = tv_distance(df_b, df_a, "c").collect()[0]["tv"]
    ca, cb = Counter(cats_a), Counter(cats_b)
    ta, tb = len(cats_a), len(cats_b)
    want = 0.5 * sum(
        abs(ca.get(c, 0) / ta - cb.get(c, 0) / tb) for c in set(ca) | set(cb)
    )
    assert abs(tv - want) < 1e-12
    assert tv == tv_rev
    assert 0.0 <= tv <= 1.0


# ---------------------------------------------------------------------------
# Round-8 operators vs pure-Python references
# ---------------------------------------------------------------------------


def py_rolling_median(vals: list[float | None], w: int) -> list[float | None]:
    """Reference: trailing window of w rows, NULLs excluded, median in
    integer micro-units with the same fixed-order close as the op."""
    import math

    out = []
    for i in range(len(vals)):
        window = [v for v in vals[max(0, i - w + 1): i + 1] if v is not None]
        q = sorted(math.floor(round(v * 10**6, 6)) for v in window)
        n = len(q)
        if n == 0:
            out.append(None)
            continue
        lo, hi = q[(n + 1) // 2 - 1], q[n // 2]
        out.append(float(lo + hi) * 0.5 * 1e-6)
    return out


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(-1e6, 1e6, allow_nan=False).map(lambda x: round(x, 2)),
        ),
        min_size=1,
        max_size=30,
    ),
    w=st.integers(1, 8),
)
def test_rolling_median_matches_python(spark_prop, vals, w):
    from datetime import datetime, timedelta

    from etl_spark_gradle_spark.operators.timeseries import rolling_median

    base = datetime(2024, 1, 1)
    df = spark_prop.createDataFrame(
        [(i, base + timedelta(seconds=i), v) for i, v in enumerate(vals)],
        "i INT, ts TIMESTAMP, v DOUBLE",
    )
    got = {
        r.i: r.out
        for r in rolling_median(df, [], "ts", "v", w, out_col="out",
                                tiebreak=["i"]).collect()
    }
    want = py_rolling_median(vals, w)
    for i, exp in enumerate(want):
        if exp is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(exp, abs=2e-6)


def py_trimmed_mean(vals: list[float], lo: float, hi: float):
    import math

    s = sorted(vals)
    n = len(s)
    qlo = s[max(1, math.ceil(lo * n)) - 1]
    qhi = s[max(1, math.ceil(hi * n)) - 1]
    band = [v for v in s if qlo <= v <= qhi]
    return (sum(band) / len(band)) if band else None


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(
        st.floats(-1e4, 1e4, allow_nan=False).map(lambda x: round(x, 2)),
        min_size=1,
        max_size=40,
    ),
    bounds=st.tuples(st.floats(0, 1), st.floats(0, 1)).map(sorted),
)
def test_trimmed_mean_matches_python(spark_prop, vals, bounds):
    from etl_spark_gradle_spark.operators.stats import trimmed_mean

    lo, hi = bounds
    df = spark_prop.createDataFrame([(v,) for v in vals], "v double")
    row = trimmed_mean(df, "v", lo, hi).collect()[0]
    exp = py_trimmed_mean(vals, lo, hi)
    assert row.n == len(vals)
    if exp is None:
        assert row.mean is None
    else:
        assert row.mean == pytest.approx(exp, rel=1e-9, abs=1e-9)


@settings(max_examples=20, deadline=None)
@given(
    xs=st.lists(
        st.floats(-1e4, 1e4, allow_nan=False).map(lambda x: round(x, 2)),
        min_size=1, max_size=25,
    ),
    refs=st.lists(
        st.floats(-1e4, 1e4, allow_nan=False).map(lambda x: round(x, 2)),
        min_size=1, max_size=25,
    ),
)
def test_quantile_normalize_matches_python(spark_prop, xs, refs):
    """out(x) = smallest ref value whose cumulative count reaches
    ceil(rank_x(x)/n_x * n_ref) — checked against a direct Python
    computation with exact integer rank arithmetic."""
    import bisect
    import math

    from etl_spark_gradle_spark.operators.stats import quantile_normalize

    xdf = spark_prop.createDataFrame(
        [(i, v) for i, v in enumerate(xs)], "i INT, v DOUBLE"
    )
    rdf = spark_prop.createDataFrame([(v,) for v in refs], "r DOUBLE")
    got = {r.i: r.v_qnorm
           for r in quantile_normalize(xdf, "v", rdf, "r").collect()}

    sx, sr, nx, nr = sorted(xs), sorted(refs), len(xs), len(refs)
    for i, v in enumerate(xs):
        cum = bisect.bisect_right(sx, v)          # inclusive ecdf count
        rank = max(1, -((-cum * nr) // nx))       # ceil(cum*nr/nx)
        assert got[i] == sr[rank - 1], (v, cum, rank)


# ---------------------------------------------------------------------------
# round-8 continuation operators vs pure-python references
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                  # key
            st.integers(0, 10_000),             # time (integer units)
            st.integers(0, 10**6),              # unique-ish id source
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 500),
)
def test_sessionize_matches_python_reference(spark_prop, rows, gap):
    """Gap sessionization over arbitrary integer event streams equals
    a sequential pure-python fold (total order via a synthetic
    tiebreak)."""
    from etl_spark_gradle_spark.operators import events as ev

    data = [(k, t, i) for i, (k, t, _) in enumerate(rows)]
    df = spark_prop.createDataFrame(data, "k long, t long, eid long")
    got = {
        (r.k, r.eid): (r.session_seq, r.event_seq)
        for r in ev.sessionize(df, "k", "t", gap, "eid").collect()
    }
    want = {}
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, t, eid in data:
        by_key.setdefault(k, []).append((t, eid))
    for k, evs in by_key.items():
        evs.sort()
        sess, in_sess, last = 0, 0, None
        for t, eid in evs:
            if last is None or t - last > gap:
                sess += 1
                in_sess = 1
            else:
                in_sess += 1
            last = t
            want[(k, eid)] = (sess, in_sess)
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 5000)),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 300),
)
def test_debounce_matches_python_reference(spark_prop, rows, gap):
    from etl_spark_gradle_spark.operators import events as ev

    data = [(k, t, i) for i, (k, t) in enumerate(rows)]
    df = spark_prop.createDataFrame(data, "k long, t long, eid long")
    got = sorted(
        r.eid
        for r in ev.debounce(df, ["k"], "t", gap, tiebreak_col="eid").collect()
    )
    want = []
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, t, eid in data:
        by_key.setdefault(k, []).append((t, eid))
    for k, evs in by_key.items():
        evs.sort()
        last = None
        for t, eid in evs:
            if last is None or t - last > gap:
                want.append(eid)
            last = t  # trailing: gap measured to the previous RAW event
    assert got == sorted(want)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 10**6),
            st.integers(-10**6, 10**6),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_twap_matches_python_reference(spark_prop, rows):
    """TWAP over integer-quantized values/times equals the pure-python
    left-constant integral (values are x/1000 so the decimal(18,6)
    quantization is exact)."""
    import datetime as dt

    from etl_spark_gradle_spark.operators.timeseries import twap

    base = dt.datetime(2024, 1, 1)
    data = [
        (k, base + dt.timedelta(seconds=t, microseconds=i), v / 1000.0)
        for i, (k, t, v) in enumerate(rows)
    ]
    df = spark_prop.createDataFrame(data, "k long, ts timestamp, v double")
    got = {
        r.k: (r.n_obs, r.span_micros, r.twap)
        for r in twap(df, "ts", "v", group_by=["k"]).collect()
    }
    by_key: dict[int, list[tuple]] = {}
    for k, ts, v in data:
        by_key.setdefault(k, []).append((ts, v))
    for k, evs in by_key.items():
        evs.sort(key=lambda e: e[0])
        n = len(evs)
        if n < 2:
            assert got[k] == (n, None, None)
            continue
        us = [
            int(e[0].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            for e in evs
        ]
        span = us[-1] - us[0]
        # exact integer accumulation: v quantizes to micro-units
        wsum_micro = sum(
            round(evs[i][1] * 1_000_000) * (us[i + 1] - us[i])
            for i in range(n - 1)
        )
        assert got[k][0] == n and got[k][1] == span
        if span == 0:
            assert got[k][2] is None
        else:
            assert abs(got[k][2] - (wsum_micro / 1e6) / span) < 1e-9


_FH_TOKEN = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("Lu", "Ll", "Nd", "Po", "Sm")
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(st.lists(_FH_TOKEN, min_size=1, max_size=25), st.integers(1, 32))
def test_feature_hash_total_mass_conserved(spark_prop, tokens, n_features):
    """The hashing trick never loses tokens: per-doc tf sums equal the
    token count, and buckets stay in range, for any vocabulary and any
    n_features. (Alphabet excludes control chars: Python and Java
    disagree on whether \\x1c-\\x1f are whitespace — a reference-
    implementation artifact, not an operator property.)"""
    from etl_spark_gradle_spark.operators.features import feature_hash

    text = " ".join(tokens)
    df = spark_prop.createDataFrame([(1, text)], "doc_id long, text string")
    rows = feature_hash(df, "doc_id", "text", n_features=n_features).collect()
    import re as _re

    n_tok = len([t for t in _re.split(r"\s+", text) if t != ""])
    assert sum(r.tf for r in rows) == n_tok
    assert all(0 <= r.feature < n_features for r in rows)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                 # entity
            st.integers(0, 50),                # order key (may tie -> eid)
            st.one_of(st.none(), st.integers(-5, 5)),  # value
        ),
        min_size=1,
        max_size=40,
    )
)
def test_consolidate_matches_python_survivorship(spark_prop, rows):
    """first/last/first_non_null/last_non_null/max survivorship over
    arbitrary duplicate clusters equals a sequential pure-python fold
    (total order via a synthetic eid tiebreak)."""
    from etl_spark_gradle_spark.operators.delta import consolidate

    data = [(e, o, i, v) for i, (e, o, v) in enumerate(rows)]
    df = spark_prop.createDataFrame(
        data, "e long, o long, eid long, v long"
    )
    got = {
        r.e: (r.v, r.n_rows)
        for r in consolidate(
            df, ["e"], {"v": "last_non_null"}, order_by=["o", "eid"]
        ).collect()
    }
    by_e: dict[int, list] = {}
    for e, o, eid, v in data:
        by_e.setdefault(e, []).append((o, eid, v))
    for e, evs in by_e.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        want = None
        for _, _, v in evs:
            if v is not None:
                want = v
        assert got[e] == (want, len(evs))
    # positional first == the first row's value even when NULL
    got_first = {
        r.e: r.v
        for r in consolidate(
            df, ["e"], {"v": "first"}, order_by=["o", "eid"]
        ).collect()
    }
    for e, evs in by_e.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        assert got_first[e] == evs[0][2]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.integers(0, 6)), min_size=1,
             max_size=60),
    st.integers(1, 5),
)
def test_skew_report_matches_python_topk(spark_prop, values, top_k):
    """Top-k heaviest values (count desc, stringified value asc with
    NULL first) equal a pure-python counter for any value stream."""
    from collections import Counter

    from etl_spark_gradle_spark.operators.skew import skew_report

    df = spark_prop.createDataFrame([(v,) for v in values], "k int")
    nkey = lambda t: (t[0] is not None, t[0] or "", t[1], t[2])  # noqa: E731
    got = sorted(
        (
            (r.value, r.n, r.rank)
            for r in skew_report(df, ["k"], top_k=top_k).collect()
        ),
        key=nkey,
    )
    cnt = Counter(str(v) if v is not None else None for v in values)
    ordered = sorted(
        cnt.items(),
        key=lambda kv: (-kv[1], kv[0] is not None, kv[0] or ""),
    )[:top_k]
    want = sorted(
        ((val, n, rank + 1) for rank, (val, n) in enumerate(ordered)),
        key=nkey,
    )
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=-5, max_value=5),
                  st.booleans()),
        min_size=1,
        max_size=60,
    )
)
def test_auc_matches_python_mann_whitney(spark_prop, pairs):
    """Round-9 evaluation family: exact AUC must equal the pure-python
    Mann-Whitney computation with average ranks for ties, for ANY
    score/label multiset (tiny score domain forces dense ties)."""
    from etl_spark_gradle_spark.operators.evaluation import auc

    df = spark_prop.createDataFrame(
        [(float(s), int(l)) for s, l in pairs], "score double, label int"
    )
    row = auc(df, "score", "label").collect()[0]

    srt = sorted(pairs)
    rank_sum_pos, i = 0.0, 0
    while i < len(srt):
        j = i
        while j < len(srt) and srt[j][0] == srt[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        rank_sum_pos += avg * sum(1 for kk in range(i, j) if srt[kk][1])
        i = j
    np_ = sum(1 for _, l in pairs if l)
    nn = len(pairs) - np_
    if np_ == 0 or nn == 0:
        assert row["auc"] is None
    else:
        want = (rank_sum_pos - np_ * (np_ + 1) / 2.0) / (np_ * nn)
        assert row["auc"] == pytest.approx(want, abs=1e-12)
    assert (row["n"], row["n_pos"], row["n_neg"]) == (len(pairs), np_, nn)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=6),
                  st.booleans()),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=1, max_value=12),
)
def test_lift_table_buckets_match_python_ntile(spark_prop, rows, buckets):
    """lift_table's closed-form bucket arithmetic must equal the SQL
    NTILE definition (first n%B buckets get the extra row) over the
    (score desc, id asc) order for any multiset and bucket count."""
    from etl_spark_gradle_spark.operators.evaluation import lift_table

    df = spark_prop.createDataFrame(
        [(i, float(s), int(l)) for i, (s, l) in enumerate(rows)],
        "id long, score double, label int",
    )
    got = {
        r["bucket"]: (r["n"], r["n_pos"])
        for r in lift_table(df, "score", "label", "id", buckets).collect()
    }
    ordered = sorted(enumerate(rows), key=lambda t: (-t[1][0], t[0]))
    n, B = len(ordered), buckets
    q, r = divmod(n, B)
    want: dict[int, list[int]] = {}
    pos_in = 0
    for rank, (_i, (_s, l)) in enumerate(ordered, start=1):
        if rank <= r * (q + 1):
            b = (rank - 1) // (q + 1) + 1
        else:
            b = r + (rank - r * (q + 1) - 1) // max(q, 1) + 1
        acc = want.setdefault(b, [0, 0])
        acc[0] += 1
        acc[1] += int(l)
    assert got == {b: tuple(v) for b, v in want.items()}


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=9),
                  st.integers(min_value=0, max_value=9)),
        min_size=1,
        max_size=12,
    )
)
def test_isotonic_matches_pure_python_pav(spark_prop, spec):
    """isotonic_calibration must equal a pure-python PAV over any
    per-bin (n, pos<=n) profile: monotone fitted rates, exact pooled
    fractions, mass preserved."""
    from etl_spark_gradle_spark.operators.evaluation import (
        isotonic_calibration,
    )

    spec = [(n, min(p, n)) for n, p in spec]
    B = len(spec)
    rows = []
    for b, (n, p) in enumerate(spec):
        center = (b + 0.5) / B
        rows += [(center, 1)] * p + [(center, 0)] * (n - p)
    df = spark_prop.createDataFrame(rows, "score double, label int")
    out = {r["bin"]: r for r in
           isotonic_calibration(df, "score", "label", bins=B).collect()}

    pools = []
    for b, (n, p) in enumerate(spec):
        pools.append([[b], n, p])
        while len(pools) >= 2 and pools[-2][2] * pools[-1][1] > \
                pools[-1][2] * pools[-2][1]:
            bs, n2, p2 = pools.pop()
            pools[-1][0] += bs
            pools[-1][1] += n2
            pools[-1][2] += p2
    want = {}
    for bs, n, p in pools:
        for b in bs:
            want[b] = p / n
    got = {b: out[b]["rate_iso"] for b in out}
    assert got == want
    iso = [got[b] for b in sorted(got)]
    assert all(a <= c for a, c in zip(iso, iso[1:]))
