"""Properties of the sketch-based extension operators that have no SQL
oracle: recall against their exact twins, signature invariants, and
multimodal plumbing shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nbi_oedi_etl_v2_spark.operators import dedup, multimodal, similarity
from nbi_oedi_etl_v2_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_lsh_recall(docs):
    exact = _pair_set(dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.8))
    sketch = _pair_set(dedup.minhash_lsh_pairs(docs, "doc_id", "text", 3, threshold=0.8))
    assert exact, "fixture should contain planted near-dups"
    # candidates are verified with exact Jaccard → no false positives…
    assert sketch <= exact
    # …and banding at b=16/r=4 should catch essentially all j≥0.8 pairs
    recall = len(sketch & exact) / len(exact)
    assert recall >= 0.95, f"LSH recall {recall:.2f} over {len(exact)} pairs"


def test_ngram_stop_shingle_above_observed_df_is_identity(docs):
    # max_doc_freq above the corpus's highest shingle df → the stop-
    # shingle predicate drops nothing and results are bit-identical
    base = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.8)
    max_df = (
        dedup.shingle_rows(docs, "doc_id", "text", 3)
        .groupBy("shingle")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    capped = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", 3, 0.8, max_doc_freq=max_df
    )
    assert _pair_set(capped) == _pair_set(base)


def test_ngram_stop_shingle_prunes_boilerplate_but_keeps_pairs(spark):
    # every doc shares a boilerplate header (df = corpus size); the
    # near-dup pair differs in one token and is found via its rare
    # body shingles even when the header shingles are stop-dropped
    header = "standard license header text block"
    bodies = [f"unique body {i} content alpha beta gamma delta" for i in range(20)]
    rows = [(i, f"{header} {b}") for i, b in enumerate(bodies)]
    rows.append((100, f"{header} unique body 0 content alpha beta gamma echo"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", 3, 0.5, max_doc_freq=5
    )
    assert (0, 100) in _pair_set(pairs)


def test_repetition_scores_on_planted_repeats(spark):
    from nbi_oedi_etl_v2_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "line one\nline one\nline two"),       # 1 dup line of 3
            (2, "buy buy buy now"),                     # token run of 3
            (3, "alpha beta alpha beta alpha beta"),    # repeated bigrams
            (4, ""),                                    # empty: all zeros
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in
           text_ops.repetition_scores(df, "doc_id", "text").collect()}
    assert got[1]["n_lines"] == 3
    assert abs(got[1]["dup_line_frac"] - 1 / 3) < 1e-6
    assert got[2]["max_token_run"] == 3
    # 5 bigrams, 2 distinct ("alpha beta" ×3, "beta alpha" ×2) → 3/5 dup
    assert abs(got[3]["dup_bigram_frac"] - 0.6) < 1e-6
    assert got[4]["n_lines"] == 0 and got[4]["max_token_run"] == 0


def test_pii_redaction_on_planted_pii(spark):
    from nbi_oedi_etl_v2_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "mail a@b.com or 123-45-6789 or +1 (555) 123-4567 now"),
         (2, "clean text, nothing to scrub")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in
           text_ops.redact_pii(df, "doc_id", "text").collect()}
    assert got[1]["text_redacted"] == "mail <EMAIL> or <SSN> or <PHONE> now"
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ssn"]) == (1, 1, 1)
    assert got[2]["text_redacted"] == "clean text, nothing to scrub"
    assert got[2]["n_email"] == 0


def test_minhash_signature_shape(docs):
    sig = dedup.minhash_signatures(docs, "doc_id", "text", 3, 64).first()
    assert len(sig["sig"]) == 64


def test_simhash_identical_docs_collide(spark, docs):
    # duplicate every doc under a shifted id; each (id, id+100000) pair
    # has hamming 0 and must be reported
    shifted = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    both = docs.select("doc_id", "text").unionByName(shifted)
    pairs = dedup.simhash_near_pairs(both, "doc_id", "text", max_hamming=3)
    found = _pair_set(pairs.where(F.col("hamming") == 0))
    n_docs = docs.count()
    planted = {(i, i + 100000) for (i,) in docs.select("doc_id").collect()}
    assert planted <= found
    assert pairs.where(F.col("hamming") > 3).count() == 0
    assert n_docs > 0


def test_lsh_topk_recall(emb):
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=5).collect()
    }
    approx_df = similarity.lsh_cosine_topk(emb, queries, k=5)
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in approx_df.collect()
    }
    # this synthetic corpus has no truly-close neighbors (max cosine
    # ≈0.5 → angle ≈60°), the regime where hyperplane LSH is weakest;
    # query-side multiprobe (defaults planes=10, tables=12, radius=2)
    # measures ~0.9 here. Near-dup embeddings (cos ≥ 0.9) collide
    # w.p. ~1.
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"LSH top-k recall {recall:.2f}"
    assert all(q != n for q, n in approx)
    # recall must be bought within a candidate BUDGET, not by widening
    # to a full scan: the exact-cosine re-rank may touch at most ~55%
    # of the corpus per query on this worst-case corpus
    from nbi_oedi_etl_v2_spark.operators.similarity import (
        _probe_masks, hyperplane_signature, with_norm,
    )
    planes, tables, radius = 10, 12, 2

    def wb(df, ida):
        base = with_norm(df, "embedding").select(
            F.col("vec_id").alias(ida), F.col("vec"), F.col("norm")
        )
        sig = hyperplane_signature("vec", planes, seed="7 + t * 1299709")
        b = F.expr(
            f"transform(sequence(0, {tables} - 1), "
            f"t -> struct(t AS tbl, {sig} AS bucket))"
        )
        return base.select(ida, F.explode(b).alias("b")).select(
            ida, "b.tbl", "b.bucket"
        )

    masks = _probe_masks(planes, radius)
    probed = (
        wb(queries, "query_id")
        .select(
            "query_id", "tbl", "bucket",
            F.explode(
                F.array(*[F.lit(m).cast("long") for m in masks])
            ).alias("m"),
        )
        .select(
            "query_id", "tbl",
            F.col("bucket").bitwiseXOR(F.col("m")).alias("bucket"),
        )
    )
    n_cand = (
        wb(emb, "neighbor_id")
        .join(probed, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
        .count()
    )
    n_q, n_c = queries.count(), emb.count()
    assert n_cand / n_q <= 0.55 * n_c, (
        f"candidate budget blown: {n_cand / n_q:.0f} of {n_c} per query"
    )
    # plan pin: still a bucketed equi-join — no cartesian / nested-loop
    # fallback sneaking in a full scan
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_topk_recall(emb):
    """Recall ≥0.7 of exact top-5 on the uniform corpus (no planted
    neighbors — the hardest regime) while the measured candidate set
    stays under 55% of the corpus per query: the same recall-under-
    budget bar as the hyperplane-LSH test, so neither ANN path can
    pass by degenerating into a full scan."""
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_cosine_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"IVF top-k recall {recall:.2f}"
    assert all(q != n for q, n in approx)
    # measured scanned-fraction budget: rebuild the candidate join
    # (corpus cells × probed query cells) and count distinct pairs
    cents = similarity.ivf_centroids(emb, nlist=32, iterations=2)
    c = similarity.with_norm(emb, "embedding").select(
        F.col("vec_id").alias("neighbor_id"), "vec", "norm"
    )
    q = similarity.with_norm(queries, "embedding").select(
        F.col("vec_id").alias("query_id"), "vec", "norm"
    )
    n_cand = (
        similarity.ivf_assign(c, cents, "neighbor_id", nprobe=1)
        .select("neighbor_id", "cid")
        .join(
            similarity.ivf_assign(q, cents, "query_id", nprobe=12).select(
                "query_id", "cid"
            ),
            "cid",
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
        .count()
    )
    n_q, n_c = queries.count(), emb.count()
    assert n_cand / n_q <= 0.55 * n_c, (
        f"candidate budget blown: {n_cand / n_q:.0f} of {n_c} per query"
    )


def test_ivf_centroids_deterministic(emb):
    a = similarity.ivf_centroids(emb, nlist=8, iterations=1).collect()
    b = similarity.ivf_centroids(emb, nlist=8, iterations=1).collect()
    assert {r["cid"]: (tuple(r["c_vec"]), r["c_norm"]) for r in a} == {
        r["cid"]: (tuple(r["c_vec"]), r["c_norm"]) for r in b
    }


def test_multimodal_decode_shapes(docs):
    media = multimodal.attach_binary_payload(docs, "doc_id", "text")
    decoded = multimodal.decode_media(media)
    rows = decoded.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert r["n_bytes"] > 0
        assert 16 <= r["width"] <= 16 + 63 * 16
        assert 16 <= r["height"] <= 16 + 63 * 16
        assert 0.0 <= r["checksum_feature"] <= 1.0
    # determinism: same payload → same features
    again = {r["media_id"]: r["checksum_feature"] for r in decoded.collect()}
    assert {r["media_id"]: r["checksum_feature"] for r in rows} == again


def test_multimodal_resize_shapes(docs):
    """Non-PNG payloads must quarantine (NULL payload) rather than
    fabricate a stretched byte stream — VERDICT r3 item 6; the dims
    and passthrough columns survive so routing still works."""
    media = multimodal.attach_binary_payload(docs, "doc_id", "text")
    resized = multimodal.resize_media(media, 224, 224)
    rows = resized.limit(20).collect()
    assert rows and resized.columns == [
        "media_id", "payload", "media_type", "source_uri", "width", "height"
    ]
    for r in rows:
        assert r["width"] == 224 and r["height"] == 224
        assert r["payload"] is None  # text bytes are not a resizable image
        assert r["media_type"] is not None


def test_multimodal_metadata_only_scan_prunes_payload(docs):
    media = multimodal.attach_binary_payload(docs, "doc_id", "text")
    meta_only = media.select("media_id", "media_type")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # column pruning keeps bytes unread


def test_frame_sample_plan(spark, docs):
    # non-BMFF payloads fall back to default_frames (old contract)
    media = multimodal.attach_binary_payload(docs, "doc_id", "text", media_type="video")
    plan_df = multimodal.frame_sample_plan(media, every_n=10)
    first = plan_df.where(F.col("media_id") == plan_df.select(F.min("media_id")).first()[0])
    idxs = sorted(r["frame_index"] for r in first.collect())
    assert idxs == list(range(0, 101, 10))


def test_quantile_sketch_rank_bound_and_merge(spark):
    """Build-level rank error must stay within 1/max_centroids-ish;
    a day→all merge must stay within the 3/max_centroids merge bound;
    empty and all-null groups produce empty sketches (NULL estimate)."""
    import random

    from nbi_oedi_etl_v2_spark.operators import sketches

    rng = random.Random(42)
    rows = [
        (i % 8, rng.gauss(100 * (1 + i % 3), 25)) for i in range(20000)
    ]
    df = spark.createDataFrame(rows, "g int, v double")
    sk = sketches.quantile_sketch_build(df, ["g"], "v", max_centroids=64)
    merged = sketches.quantile_sketch_merge(
        sk.withColumn("all", F.lit(1)), ["all"], max_centroids=64
    )
    for q in (0.1, 0.5, 0.9):
        est_rows = sk.select(
            "g", sketches.quantile_sketch_value(F.col("sketch"), q).alias("e")
        ).collect()
        per_g = {}
        for g, v in rows:
            per_g.setdefault(g, []).append(v)
        for r in est_rows:
            vals = sorted(per_g[r["g"]])
            rank = sum(1 for v in vals if v <= r["e"]) / len(vals)
            assert abs(rank - q) <= 2 / 64 + 0.01, (r["g"], q, rank)
        m = merged.select(
            sketches.quantile_sketch_value(F.col("sketch"), q).alias("e")
        ).first()["e"]
        allv = sorted(v for _, v in rows)
        rank = sum(1 for v in allv if v <= m) / len(allv)
        assert abs(rank - q) <= 3 / 64 + 0.01, (q, rank)
    # all-null group → empty sketch, NULL estimate
    nulls = spark.createDataFrame(
        [(1, None), (1, None)], "g int, v double"
    )
    nsk = sketches.quantile_sketch_build(nulls, ["g"], "v")
    row = nsk.select(
        "n_rows",
        sketches.quantile_sketch_value(F.col("sketch"), 0.5).alias("e"),
    ).first()
    assert row["n_rows"] == 0 and row["e"] is None


def test_jpeg_decode_dc_only_closed_form():
    """The real baseline decoder (Huffman scan + dequant + IDCT) must
    reproduce the closed-form pixel sums of DC-only streams exactly —
    quantizer 8 makes each block's IDCT the integer cum_dc + 128."""
    for seed in range(30):
        p = multimodal.synth_jpeg_coded_payload(seed)
        w, h, ch, cks = multimodal.decode_jpeg(p)
        bx, by = 1 + seed % 6, 1 + (seed // 6) % 4
        dc, total = 0, 0
        for b in range(bx * by):
            dc += ((seed + 3 * b) % 9) - 4
            total += 64 * (dc + 128)
        assert (w, h, ch) == (bx * 8, by * 8, 1)
        assert cks == (total % 9973) / 9973


def test_jpeg_decode_nonzero_ac_vs_numpy_reference():
    """Random nonzero-AC blocks (runs, ZRL, negative coefficients)
    encoded with encode_jpeg_blocks must decode to the same pixels as
    an independent numpy dequant+IDCT of the source coefficients —
    the Huffman layer round-trips losslessly and the IDCT agrees."""
    import random

    import numpy as np

    i = np.arange(8).reshape(8, 1)
    j = np.arange(8).reshape(1, 8)
    basis = 0.5 * np.cos((2 * i + 1) * j * np.pi / 16)
    basis[:, 0] *= 1 / np.sqrt(2)

    def ref_checksum(blocks, quant, w, h):
        bx = (w + 7) // 8
        img = np.zeros(((h + 7) // 8 * 8, bx * 8))
        for bi, blk in enumerate(blocks):
            deq = np.asarray(blk) * np.asarray(quant)
            B = np.zeros((8, 8))
            B.flat[list(multimodal._ZIGZAG)] = deq
            my, mx = divmod(bi, bx)
            img[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.clip(
                np.round(basis @ B @ basis.T + 128), 0, 255
            )
        return (int(img[:h, :w].sum()) % 9973) / 9973

    rng = random.Random(7)
    for _ in range(15):
        w, h = 8 * rng.randint(1, 4), 8 * rng.randint(1, 3)
        nb = (w // 8) * (h // 8)
        quant = [rng.randint(1, 32) for _ in range(64)]
        blocks = [
            [rng.randint(-40, 40)]
            + [
                rng.randint(-15, 15) if rng.random() < 0.2 else 0
                for _ in range(63)
            ]
            for _ in range(nb)
        ]
        payload = multimodal.encode_jpeg_blocks(w, h, [blocks], quant)
        assert multimodal.decode_jpeg(payload) == (
            w, h, 1, ref_checksum(blocks, quant, w, h)
        )


def test_jpeg_decode_color_restarts_and_rejects():
    """3-component 4:4:4 decode; DRI/RSTn restart markers must not
    change the answer; header-only streams, progressive SOF2, and
    truncated entropy data must raise (route to metadata fallback),
    and decode_media must surface real JPEG checksums while keeping
    codec='jpeg'/NULL-checksum for the metadata-only subset."""
    import random

    rng = random.Random(3)
    w, h = 24, 16
    nb = 6
    quant = [rng.randint(1, 24) for _ in range(64)]
    comps = [
        [
            [rng.randint(-30, 30)]
            + [rng.randint(-9, 9) if rng.random() < 0.1 else 0 for _ in range(63)]
            for _ in range(nb)
        ]
        for _ in range(3)
    ]
    base = multimodal.encode_jpeg_blocks(w, h, comps, quant)
    out = multimodal.decode_jpeg(base)
    assert out[:3] == (w, h, 3)
    for interval in (1, 2, 5):
        rst = multimodal.encode_jpeg_blocks(
            w, h, comps, quant, restart_interval=interval
        )
        assert multimodal.decode_jpeg(rst) == out
    import pytest as _pytest

    with _pytest.raises(ValueError):  # header-only (no SOS)
        multimodal.decode_jpeg(multimodal.synth_jpeg_payload(4))
    with _pytest.raises(ValueError):  # progressive SOF2
        multimodal.decode_jpeg(multimodal.synth_jpeg_payload(5))
    with _pytest.raises(ValueError):  # truncated mid-entropy
        multimodal.decode_jpeg(base[: len(base) - 8])
    decoded = multimodal._decode_one(bytearray(base), "image")
    assert decoded["codec"] == "jpeg" and decoded["checksum_feature"] == out[3]
    meta = multimodal._decode_one(
        bytearray(multimodal.synth_jpeg_payload(4)), "image"
    )
    assert meta["codec"] == "jpeg" and meta["checksum_feature"] is None
    err = multimodal._decode_one(bytearray(b"\xff\xd8" + b"\x00" * 16), "image")
    assert err["codec"] == "error"


def test_mp4_box_walk_roundtrip(spark):
    """parse_mp4_header must recover the synthesis parameters from
    struct-packed ISO-BMFF bytes (seed-length free boxes at two
    nesting levels exercise a different walk per seed), reject
    non-BMFF and truncated payloads as is_mp4=false, and NULL the
    frame count when the stts table is malformed."""
    rows = [
        (s, bytearray(multimodal.synth_mp4_payload(s)), "video", f"s://{s}")
        for s in range(24)
    ]
    full = multimodal.synth_mp4_payload(3)
    rows += [
        (100, bytearray(b"definitely not an mp4 file......"), "video", "x"),
        (101, bytearray(b"tiny"), "video", "y"),
        (102, bytearray(full[: len(full) // 2]), "video", "z"),  # truncated
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in multimodal.parse_mp4_header(df, "media_id", "payload").collect()
    }
    for s in range(24):
        r = out[s]
        exp_frames = sum(10 + (s + i * 7) % 90 for i in range(1 + s % 3))
        assert r["is_mp4"] and r["major_brand"] == "isom"
        assert r["timescale"] == 1000 * (1 + s % 3)
        assert r["duration"] == (s * 37) % 100000
        assert r["n_frames"] == exp_frames
    assert not out[100]["is_mp4"] and not out[101]["is_mp4"]
    # truncation cuts inside moov: ftyp still present (is_mp4 true is
    # acceptable) but the stts walk must not invent a frame count
    assert out[102]["n_frames"] is None


def test_frame_sample_plan_real_counts(spark):
    """MP4 payloads drive the sampling plan from the track's real
    stts sample-count sum, not a hardcoded frame count; non-parsing
    payloads are excluded when default_frames=None."""
    rows = [
        (s, bytearray(multimodal.synth_mp4_payload(s)), "video", f"s://{s}")
        for s in range(8)
    ] + [(100, bytearray(b"not mp4"), "video", "x")]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    plan = multimodal.frame_sample_plan(df, every_n=10, default_frames=None)
    got = {
        r["media_id"]: r["n"]
        for r in plan.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    for s in range(8):
        exp_frames = sum(10 + (s + i * 7) % 90 for i in range(1 + s % 3))
        assert got[s] == (exp_frames + 9) // 10
    assert 100 not in got


def test_approx_distinct_within_rsd_bound(spark, sf_dir):
    # raw aggregate (the registered spec now emits the invariant form
    # — exact count + boolean — so the tolerance is asserted here on
    # the underlying sketch aggregate itself)
    from nbi_oedi_etl_v2_spark import workload
    from nbi_oedi_etl_v2_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # rsd=0.01 → generous 5-sigma acceptance; catches a broken
        # sketch, not estimator noise
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05, r
    # and the driver invariant form must hold its booleans
    inv = workload.all_specs()["approx_distinct_users"].fn(spark, sf_dir)
    assert all(r["within_5pct"] for r in inv.collect())


def test_parse_png_header_on_real_png_bytes(spark):
    import struct
    import zlib

    from nbi_oedi_etl_v2_spark.operators import multimodal

    def png(width, height, bit_depth=8, color_type=6):
        ihdr = struct.pack(">II5B", width, height, bit_depth, color_type, 0, 0, 0)
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        )

    rows = [
        (1, bytearray(png(640, 480))),
        (2, bytearray(png(2, 100000, bit_depth=16, color_type=0))),
        (3, bytearray(b"not a png at all, just bytes")),
        (4, bytearray(b"\x89PNG\r\n\x1a\nTRUNC")),  # signature but no IHDR
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           multimodal.parse_png_header(df, "media_id", "payload").collect()}
    assert out[1]["is_png"] and (out[1]["width"], out[1]["height"]) == (640, 480)
    assert out[1]["bit_depth"] == 8 and out[1]["color_type"] == 6
    assert out[2]["is_png"] and (out[2]["width"], out[2]["height"]) == (2, 100000)
    assert out[2]["bit_depth"] == 16 and out[2]["color_type"] == 0
    assert not out[3]["is_png"] and out[3]["width"] is None
    assert not out[4]["is_png"]


def test_parse_wav_header_on_real_wav_bytes(spark):
    import struct

    from nbi_oedi_etl_v2_spark.operators import multimodal

    def wav(channels, rate, bits):
        block = channels * bits // 8
        fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
        return (
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
        )

    rows = [
        (1, bytearray(wav(2, 44100, 16))),
        (2, bytearray(wav(1, 16000, 8))),
        (3, bytearray(b"RIFFxxxxNOTWAVE_atall_padpadpadpadpad")),
        (4, bytearray(b"short")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           multimodal.parse_wav_header(df, "media_id", "payload").collect()}
    assert out[1]["is_wav"] and out[1]["channels"] == 2
    assert out[1]["sample_rate"] == 44100 and out[1]["bits_per_sample"] == 16
    assert out[1]["audio_format"] == 1
    assert out[2]["is_wav"] and (out[2]["channels"], out[2]["sample_rate"]) == (1, 16000)
    assert not out[3]["is_wav"] and out[3]["sample_rate"] is None
    assert not out[4]["is_wav"]


def test_png_decode_real_roundtrip_all_filters(spark):
    # synth images write scanline r with filter r % 5, so an 8-row
    # image exercises None/Sub/Up/Average/Paeth; decode must recover
    # the exact closed-form pixels
    from nbi_oedi_etl_v2_spark.operators import multimodal

    for seed in (63, 56, 8, 127):  # h = 8 → all five filter types
        payload = multimodal.synth_png_payload(seed)
        w, h, ch, checksum = multimodal.decode_png(payload)
        ew, eh = 1 + seed % 8, 1 + (seed // 8) % 8
        assert (w, h, ch) == (ew, eh, 1)
        expect = sum(
            (seed * 31 + r * 7 + c * 3) % 256
            for r in range(eh)
            for c in range(ew)
        )
        assert abs(checksum - (expect % 9973) / 9973.0) < 1e-12


def test_png_decode_rgba_with_paeth(spark):
    # independent 2x2 RGBA image (filter Paeth on row 1) — decode must
    # invert filtering on multi-channel strides (bpp=4)
    import struct
    import zlib

    from nbi_oedi_etl_v2_spark.operators import multimodal

    rows = [bytes(range(8)), bytes(range(100, 108))]
    stream = bytearray([0]) + rows[0]
    # row 1 Paeth-filtered against row 0
    filt = bytearray([4])
    for i in range(8):
        left = rows[1][i - 4] if i >= 4 else 0
        up = rows[0][i]
        ul = rows[0][i - 4] if i >= 4 else 0
        filt.append((rows[1][i] - multimodal._paeth(left, up, ul)) & 0xFF)
    stream += filt
    ihdr = b"IHDR" + struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)
    idat = b"IDAT" + zlib.compress(bytes(stream))
    payload = bytearray(b"\x89PNG\r\n\x1a\n")
    for chunk in (ihdr, idat, b"IEND"):
        payload += struct.pack(">I", len(chunk) - 4)
        payload += chunk
        payload += struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    w, h, ch, pixels = multimodal._png_pixels(bytes(payload))
    assert (w, h, ch) == (2, 2, 4)
    assert bytes(pixels) == rows[0] + rows[1]


def test_wav_decode_real_pcm(spark):
    from nbi_oedi_etl_v2_spark.operators import multimodal

    for seed in (0, 1, 2, 3, 99):
        ch, rate, frames, checksum = multimodal.decode_wav(
            multimodal.synth_wav_payload(seed)
        )
        ech = 1 + seed % 2
        assert (ch, rate, frames) == (
            ech, 8000 + (seed % 4) * 4000, 50 + seed % 50
        )
        n = frames * ech
        expect = sum((seed * 7 + i * 13) % 65536 for i in range(n))
        assert abs(checksum - (expect % 9973) / 9973.0) < 1e-12


def test_decode_media_dispatch_and_corrupt_rows(spark):
    # one real PNG, one real WAV, one unknown blob, one corrupt PNG
    # (valid magic, garbage body) — dispatch by magic, never raise
    import zlib

    from nbi_oedi_etl_v2_spark.operators import multimodal

    rows = [
        (1, bytearray(multimodal.synth_png_payload(63)), "image", "s://1"),
        (2, bytearray(multimodal.synth_wav_payload(5)), "audio", "s://2"),
        (3, bytearray(b"just some plain bytes, not media"), "image", "s://3"),
        (4, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40), "image", "s://4"),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.decode_media(df).collect()}
    assert out[1]["codec"] == "png" and (out[1]["width"], out[1]["height"]) == (8, 8)
    assert out[1]["channels"] == 1 and out[1]["sample_rate"] is None
    assert out[2]["codec"] == "wav" and out[2]["channels"] == 2
    assert out[2]["sample_rate"] == 12000 and out[2]["n_samples"] == 55
    assert out[3]["codec"] == "raw" and out[3]["width"] is not None
    assert out[4]["codec"] == "error" and out[4]["checksum_feature"] is None


def test_resize_media_real_png_nearest_neighbor(spark):
    from nbi_oedi_etl_v2_spark.operators import multimodal

    seed = 63  # 8x8 grayscale
    rows = [(1, bytearray(multimodal.synth_png_payload(seed)), "image", "s://1")]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_media(df, 3, 3).collect()[0]
    assert (out["width"], out["height"]) == (3, 3)
    w, h, ch, px = multimodal._png_pixels(bytes(out["payload"]))
    assert (w, h, ch) == (3, 3, 1)
    expect = [
        (seed * 31 + (ty * 8 // 3) * 7 + (tx * 8 // 3) * 3) % 256
        for ty in range(3)
        for tx in range(3)
    ]
    assert list(px) == expect


def test_minhash_hot_band_candidates_bounded(spark):
    # 120 identical boilerplate docs: every band bucket holds all 120,
    # so the unguarded all-pairs join would emit 120*119/2 = 7140
    # candidate pairs. With the hot-band star guard the candidate set
    # collapses to n-1 star pairs — and since the docs ARE duplicates,
    # the verified output must still connect all of them through the
    # representative (plus 2 planted cold-bucket near-dups untouched).
    boiler = [(i, "the same boilerplate text repeated everywhere") for i in range(120)]
    distinct = [(1000, "a unique document about owls and rivers"),
                (1001, "a unique document about owls and rivers!")]
    docs = spark.createDataFrame(boiler + distinct, ["doc_id", "text"])
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", 3, threshold=0.8, hot_band_limit=20
    )
    got = _pair_set(pairs)
    star = {(0, i) for i in range(1, 120)}
    assert star <= got, "hot-bucket members must all connect to the representative"
    # bounded: no quadratic blow-up — only star pairs from the hot
    # buckets (plus the cold-bucket near-dup pair)
    boiler_pairs = {p for p in got if p[0] < 1000 and p[1] < 1000}
    assert boiler_pairs == star, f"{len(boiler_pairs)} pairs, expected {len(star)}"
    assert (1000, 1001) in got


def test_hll_sketch_rollup_matches_exact_within_tolerance(spark, sf_dir):
    """Daily sketches unioned to per-type estimates must land within
    ±5% of exact COUNT(DISTINCT) (lgK=12 ⇒ ~1.6% RSE), and the
    materialize→rollup path must agree with a direct one-shot sketch."""
    import pyspark.sql.functions as F

    from nbi_oedi_etl_v2_spark.operators import sketches
    from nbi_oedi_etl_v2_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = sketches.build_sketches(
        ev.withColumn("day", F.to_date("ts")), "user_id",
        ["event_type", "day"],
    )
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.rollup_sketches(daily, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        assert abs(approx[et] - ex) <= max(1, 0.05 * ex), (et, approx[et], ex)
    # merge path ≡ one-shot sketch (union is lossless for HLL)
    oneshot = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.rollup_sketches(
            sketches.build_sketches(ev, "user_id", ["event_type"]),
            ["event_type"],
        ).collect()
    }
    assert approx == oneshot


def test_hll_rollup_composes_hierarchically(spark, sf_dir):
    """rollup_sketches keeps the merged sketch column, so a coarser
    rollup can re-aggregate an intermediate rollup (day → month →
    per-type) instead of going back to the finest table — HLL union is
    lossless, so both routes must agree exactly (ADVICE r3)."""
    import pyspark.sql.functions as F

    from nbi_oedi_etl_v2_spark.operators import sketches
    from nbi_oedi_etl_v2_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = sketches.build_sketches(
        ev.withColumn("day", F.to_date("ts")), "user_id",
        ["event_type", "day"],
    )
    monthly = sketches.rollup_sketches(
        daily.withColumn("month", F.trunc("day", "month")),
        ["event_type", "month"],
    )
    assert "sketch" in monthly.columns  # the composable handle
    via_monthly = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.rollup_sketches(monthly, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.rollup_sketches(daily, ["event_type"]).collect()
    }
    assert via_monthly == direct


def test_jpeg_header_walk_real_bytes(spark):
    """The JVM marker walk must agree with the Python walk on real
    struct-packed JPEG bytes (variable-length COM segments, both
    SOF0/SOF2), and reject non-JPEG / SOF-less / truncated streams."""
    from nbi_oedi_etl_v2_spark.operators import multimodal

    rows = [
        (s, bytearray(multimodal.synth_jpeg_payload(s)), "image", f"s://{s}")
        for s in (0, 1, 8, 17, 100, 4095)
    ]
    rows += [
        (9001, bytearray(b"definitely not a jpeg"), "image", "s://x"),
        (9002, bytearray(b"\xff\xd8\xff\xd9"), "image", "s://y"),  # no SOF
        (9003, bytearray(b"\xff\xd8\xff\xe0\x00\x04\x00"), "image", "s://z"),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {
        r["media_id"]: r.asDict()
        for r in multimodal.parse_jpeg_header(df, "media_id", "payload").collect()
    }
    for s in (0, 1, 8, 17, 100, 4095):
        m, p, h, w, nc = multimodal._jpeg_sof(multimodal.synth_jpeg_payload(s))
        got = out[s]
        assert got["is_jpeg"] is True
        assert (got["sof_marker"], got["precision"]) == (m, p)
        assert (got["width"], got["height"], got["num_components"]) == (w, h, nc)
    for bad in (9001, 9002, 9003):
        assert out[bad]["is_jpeg"] is False and out[bad]["width"] is None


def test_decode_media_routes_jpeg_metadata_only(spark):
    """decode_media must emit codec='jpeg' with dims but a NULL
    checksum_feature (no fabricated pixel features), and corrupt
    JPEG-magic payloads must quarantine as codec='error'."""
    from nbi_oedi_etl_v2_spark.operators import multimodal

    rows = [
        (1, bytearray(multimodal.synth_jpeg_payload(17)), "image", "s://1"),
        (2, bytearray(b"\xff\xd8\xff\xd9"), "image", "s://2"),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r.asDict() for r in multimodal.decode_media(df).collect()}
    _, _, h, w, nc = multimodal._jpeg_sof(multimodal.synth_jpeg_payload(17))
    assert out[1]["codec"] == "jpeg"
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (w, h, nc)
    assert out[1]["checksum_feature"] is None
    assert out[2]["codec"] == "error" and out[2]["width"] is None


def test_compressibility_matches_stdlib_zlib(docs):
    """The pandas-UDF compressed length must equal direct
    zlib.compress bit-for-bit, and the ratio must actually separate
    repetitive text from prose."""
    import zlib

    from nbi_oedi_etl_v2_spark.operators import text as text_ops

    got = {
        r["id"]: (r["n_bytes"], r["n_compressed"], r["compress_ratio"])
        for r in text_ops.compressibility_scores(docs, "doc_id", "text")
        .limit(200).collect()
    }
    raw = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").limit(200).collect()
    }
    for did, t in raw.items():
        b = t.encode("utf-8")
        nb, nc, ratio = got[did]
        assert nb == len(b)
        assert nc == len(zlib.compress(b, 6))
        if nb > 0:
            assert ratio == round(nc / nb, 7)


def test_compressibility_separates_repetition_from_prose(spark):
    from nbi_oedi_etl_v2_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "spam " * 500),
         (2, "A quaint village nestled between misty hills hosted a "
             "curious market where travelers exchanged maps, spices, "
             "and improbable stories about distant storms.")],
        ["doc_id", "text"],
    )
    got = {r["id"]: r["compress_ratio"] for r in
           text_ops.compressibility_scores(df, "doc_id", "text").collect()}
    assert got[1] < 0.05 < got[2] < 1.0


def _encode_png_gray(pixels, w, h):
    """Minimal filter-0 grayscale PNG encoder for test fixtures."""
    import struct
    import zlib

    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += bytes(pixels[y * w : (y + 1) * w])
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    for chunk in (
        b"IHDR" + struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0),
        b"IDAT" + zlib.compress(bytes(raw)),
        b"IEND",
    ):
        out += struct.pack(">I", len(chunk) - 4)
        out += chunk
        out += struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    return bytes(out)


def test_image_ahash_near_dup_pairs(spark):
    """A perturbed copy must land within the Hamming radius of its
    original; a structurally different image must not. Undecodable
    payloads must never pair."""
    w = h = 32
    base = [(x * 13 + y * 29) % 251 for y in range(h) for x in range(w)]
    # small local perturbation: a near-duplicate (e.g. re-encode noise)
    near = list(base)
    for i in range(0, 40):
        near[i * 7 % (w * h)] = (near[i * 7 % (w * h)] + 3) % 251
    # different structure entirely
    other = [((x // 4 + y // 4) % 2) * 255 for y in range(h) for x in range(w)]
    rows = [
        (1, bytearray(_encode_png_gray(base, w, h)), "image", "s://a"),
        (2, bytearray(_encode_png_gray(near, w, h)), "image", "s://b"),
        (3, bytearray(_encode_png_gray(other, w, h)), "image", "s://c"),
        (4, bytearray(b"not an image"), "image", "s://d"),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    hashes = {r["media_id"]: r["ahash"] for r in multimodal.ahash_media(df).collect()}
    assert hashes[4] is None
    assert hashes[1] is not None and hashes[3] is not None
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.image_near_dup_pairs(df, max_hamming=6).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert (1, 3) not in pairs and (2, 3) not in pairs
    assert not any(4 in p for p in pairs)


def test_hamming_star_guard_lossless(spark):
    """exact_star_limit compresses identical-signature groups above
    the limit to a representative star. The encoding must be lossless:
    expanding stars (rep's pairs apply to every member; the group is a
    hamming-0 clique) must reconstruct exactly the unguarded output."""
    rows = (
        [(i, 0x0F0F0F0F0F0F0F0F) for i in range(1, 11)]  # big group, 10 members
        + [(20, 0x0F0F0F0F0F0F0F0E), (21, 0x0F0F0F0F0F0F0F0E)]  # near, small
        + [(30, 0x123456789ABCDEF0)]  # far: never pairs
        + [(40, None)]  # NULL sig: never pairs
    )
    sigs = spark.createDataFrame(rows, "doc long, h long")
    full = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.hamming_near_pairs(
            sigs, "doc", "h", max_hamming=3, exact_star_limit=None
        ).collect()
    }
    guarded = dedup.hamming_near_pairs(
        sigs, "doc", "h", max_hamming=3, exact_star_limit=4
    ).collect()
    # reconstruct: group members from star edges, then expand
    members = {}  # rep -> set of all group members incl. rep
    pair_rows = {}
    for r in guarded:
        a, b, d = r["id_a"], r["id_b"], r["hamming"]
        if d == 0 and a == 1 and 2 <= b <= 10:  # star edge of the big group
            members.setdefault(a, {a}).add(b)
        else:
            pair_rows[(a, b)] = d
    assert members == {1: set(range(1, 11))}
    expanded = {}
    for (a, b), d in pair_rows.items():
        for ea in sorted(members.get(a, {a})):
            for eb in sorted(members.get(b, {b})):
                lo, hi = min(ea, eb), max(ea, eb)
                expanded[(lo, hi)] = d
    for rep, mem in members.items():
        for ea in mem:
            for eb in mem:
                if ea < eb:
                    expanded[(ea, eb)] = 0
    assert expanded == full
    # only the representative of the big group appears in non-star pairs
    assert not any(
        2 <= a <= 10 or 2 <= b <= 10 for (a, b) in pair_rows
    )
    assert not any(40 in p for r in guarded for p in [(r["id_a"], r["id_b"])])


def test_heavy_hitters_shuffled_fallback_still_exact(spark, sf_dir):
    """broadcast_limit=0 forces the shuffled semi-join fallback (the
    ADVICE-r4 guard against an unbounded candidate broadcast); the
    answer must be identical to the default broadcast path."""
    from nbi_oedi_etl_v2_spark.operators import frequency
    from nbi_oedi_etl_v2_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = lambda df: {(r["key"], r["cnt"], r["share"]) for r in df.collect()}
    default = rows(frequency.heavy_hitters(ev, "user_id", 0.005))
    fallback = frequency.heavy_hitters(
        ev, "user_id", 0.005, broadcast_limit=0
    )
    plan = fallback._jdf.queryExecution().executedPlan().toString()
    assert default and rows(fallback) == default
    # the guard really changed the join strategy
    assert "BroadcastHashJoin" not in plan or "LeftSemi" not in plan.split(
        "BroadcastHashJoin"
    )[0]


def test_batch_threshold_is_subset_of_misra_gries():
    """The vectorized per-batch bar keeps a SUBSET of what the
    reference Misra-Gries summary keeps (its survival bar n/(k+1) is
    strictly below phi*n for k=ceil(1/phi)) — so the superset
    guarantee transfers."""
    import random

    from nbi_oedi_etl_v2_spark.operators import frequency

    rng = random.Random(7)
    phi = 0.05
    k = frequency.mg_counter_budget(phi)
    for _ in range(20):
        batch = [rng.randint(0, 40) for _ in range(rng.randint(1, 500))]
        bar = phi * len(batch)
        counts: dict = {}
        for v in batch:
            counts[v] = counts.get(v, 0) + 1
        kept = {v for v, c in counts.items() if c >= bar}
        mg = set(frequency.misra_gries(iter(batch), k))
        # threshold bar phi*n strictly exceeds MG's survival bar
        # n/(k+1), so every threshold survivor must be an MG survivor
        assert kept <= mg, (kept - mg, len(batch))


def test_heavy_hitters_partitioning_invariant(spark, sf_dir):
    """Per-batch candidate sets vary with batch boundaries, but the
    verified output must not: repartitioned input → identical rows."""
    from nbi_oedi_etl_v2_spark.operators import frequency
    from nbi_oedi_etl_v2_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    base = {
        (r["key"], r["cnt"], r["share"])
        for r in frequency.heavy_hitters(ev, "user_id", 0.005).collect()
    }
    shuffled = {
        (r["key"], r["cnt"], r["share"])
        for r in frequency.heavy_hitters(
            ev.repartition(37), "user_id", 0.005
        ).collect()
    }
    assert base and base == shuffled
    # and it really is the exact GROUP BY answer
    total = ev.count()
    exact = {
        (r["user_id"], r["cnt"])
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 0.005 * total).collect()
    }
    assert {(k, c) for k, c, _ in base} == exact


# ---------------------------------------------------------------------------
# Count-Min sketch family (operators/frequency.py cm_*)
# ---------------------------------------------------------------------------


def test_cm_estimate_dominates_exact_for_every_key(spark, sf_dir):
    # deterministic one-sided guarantee: est >= exact for ALL distinct
    # keys (cells only ever over-count via collisions)
    from nbi_oedi_etl_v2_spark.operators import frequency

    ev = load_table(spark, sf_dir, "events")
    sk = frequency.cm_build(ev, "user_id", [])
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    est = frequency.cm_lookup(sk, exact, "user_id", [])
    n = ev.where(F.col("user_id").isNotNull()).count()
    joined = exact.join(est, "user_id").collect()
    assert joined and len(joined) == exact.count()
    for r in joined:
        assert r["est_cnt"] >= r["exact"], (r["user_id"], r["est_cnt"], r["exact"])
        # measured collision envelope, far inside the 8N/width oracle bound
        assert r["est_cnt"] <= r["exact"] + 8.0 * n / 2048


def test_cm_merge_is_bit_identical_to_oneshot_build(spark, sf_dir):
    # counts sum -> merge is EXACTLY associative: day-sketch merge
    # equals a one-shot build over all data, cell for cell
    from nbi_oedi_etl_v2_spark.operators import frequency

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    merged = frequency.cm_merge(frequency.cm_build(ev, "user_id", ["day"]), [])
    oneshot = frequency.cm_build(ev, "user_id", [])
    diff = merged.join(
        oneshot.withColumnRenamed("cnt", "cnt2"), ["depth", "bucket"], "full"
    ).where(
        F.col("cnt").isNull()
        | F.col("cnt2").isNull()
        | (F.col("cnt") != F.col("cnt2"))
    )
    assert diff.count() == 0


def test_cm_lookup_absent_key_is_exact_zero(spark):
    # a key never inserted misses at least one populated cell in some
    # depth row -> the depth-count check restores exact 0, not a
    # collision-inflated estimate
    from nbi_oedi_etl_v2_spark.operators import frequency

    df = spark.range(100).select(F.col("id").alias("k"))
    sk = frequency.cm_build(df, "k", [], depth=4, width=2048)
    probes = spark.createDataFrame([(10**12 + 7,)], "k long")
    out = frequency.cm_lookup(sk, probes, "k", [], depth=4, width=2048)
    rows = out.collect()
    # every probe emits exactly one row per sketch group — even one
    # hitting zero populated cells (ADVICE r5: the inner join used to
    # drop fully-missing pairs entirely)
    assert len(rows) == 1
    # with only 100 keys in 2048 buckets, the absent key's cells are
    # overwhelmingly unpopulated in at least one depth; if all four
    # collide the estimate is still a valid upper bound
    assert rows[0]["est_cnt"] >= 0
    sparse = frequency.cm_build(df.limit(3), "k", [], depth=4, width=2048)
    out2 = frequency.cm_lookup(sparse, probes, "k", [], depth=4, width=2048)
    r2 = out2.collect()
    assert len(r2) == 1 and r2[0]["est_cnt"] == 0


def test_cm_null_keys_excluded(spark):
    from nbi_oedi_etl_v2_spark.operators import frequency

    df = spark.createDataFrame([(1,), (None,), (1,)], "k long")
    sk = frequency.cm_build(df, "k", [])
    total = sk.where(F.col("depth") == 0).agg(F.sum("cnt")).first()[0]
    assert total == 2  # the NULL row contributed nothing


# ---------------------------------------------------------------------------
# KMV bottom-k sketches (operators/sketches.py kmv_*)
# ---------------------------------------------------------------------------


def test_kmv_merge_is_bit_identical_to_oneshot_build(spark, sf_dir):
    # the k smallest distinct hashes of a union are exactly the k
    # smallest of the parts' k-smallest -> rollup is LOSSLESS and
    # deterministic, saturated or not
    from nbi_oedi_etl_v2_spark.operators import sketches

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    merged = sketches.kmv_rollup(
        sketches.kmv_build(ev, "user_id", ["event_type", "day"], k=16),
        ["event_type"],
        k=16,
    )
    oneshot = sketches.kmv_build(ev, "user_id", ["event_type"], k=16)
    j = merged.join(
        oneshot.withColumnRenamed("kmv", "kmv2"), "event_type"
    ).select((F.col("kmv") == F.col("kmv2")).alias("same"))
    rows = j.collect()
    assert rows and all(r["same"] for r in rows)


def test_kmv_estimates_saturated_regime(spark):
    # 40k distinct users split into two cohorts with a known 10k
    # overlap; k=512 sketches are saturated -> order-statistic
    # estimator, intersection within ~3/sqrt(k) of truth
    from nbi_oedi_etl_v2_spark.operators import sketches

    n, overlap = 25_000, 10_000
    a = spark.range(n).select(F.lit("a").alias("g"), F.col("id").alias("u"))
    b = spark.range(n - overlap, 2 * n - overlap).select(
        F.lit("b").alias("g"), F.col("id").alias("u")
    )
    sk = sketches.kmv_build(a.unionByName(b), "u", ["g"], k=512)
    wide = (
        sk.where(F.col("g") == "a")
        .select(F.col("kmv").alias("ka"))
        .crossJoin(sk.where(F.col("g") == "b").select(F.col("kmv").alias("kb")))
        .select(
            sketches.kmv_distinct_estimate(F.col("ka")).alias("da"),
            sketches.kmv_intersection_estimate(
                F.col("ka"), F.col("kb")
            ).alias("i"),
        )
        .first()
    )
    assert abs(wide["da"] - n) <= 0.15 * n, wide["da"]
    assert abs(wide["i"] - overlap) <= 0.2 * overlap + 3, wide["i"]


def test_kmv_unsaturated_is_exact(spark):
    from nbi_oedi_etl_v2_spark.operators import sketches

    a = spark.range(100).select(F.lit("a").alias("g"), F.col("id").alias("u"))
    b = spark.range(60, 160).select(F.lit("b").alias("g"), F.col("id").alias("u"))
    sk = sketches.kmv_build(a.unionByName(b), "u", ["g"], k=512)
    r = (
        sk.where(F.col("g") == "a")
        .select(F.col("kmv").alias("ka"))
        .crossJoin(sk.where(F.col("g") == "b").select(F.col("kmv").alias("kb")))
        .select(
            sketches.kmv_distinct_estimate(F.col("ka")).alias("da"),
            sketches.kmv_intersection_estimate(F.col("ka"), F.col("kb")).alias("i"),
        )
        .first()
    )
    assert r["da"] == 100.0
    assert r["i"] == 40.0


def test_pit_join_interval_edges(spark):
    # boundary semantics: ts == eff_from matches that version,
    # ts == eff_to belongs to the NEXT version (half-open), probes
    # before the first version and keys with no history get NULLs
    import datetime

    from nbi_oedi_etl_v2_spark.operators import history

    d = datetime.datetime
    dim = spark.createDataFrame(
        [
            (1, "v1", d(2024, 1, 1), d(2024, 2, 1)),
            (1, "v2", d(2024, 2, 1), None),
        ],
        "k long, val string, effective_from timestamp, effective_to timestamp",
    )
    fact = spark.createDataFrame(
        [
            (100, 1, d(2023, 12, 31)),  # pre-history -> NULL
            (101, 1, d(2024, 1, 1)),    # == eff_from -> v1
            (102, 1, d(2024, 1, 15)),   # inside      -> v1
            (103, 1, d(2024, 2, 1)),    # == eff_to   -> v2 (half-open)
            (104, 1, d(2025, 1, 1)),    # current     -> v2
            (105, 9, d(2024, 6, 1)),    # no history  -> NULL
        ],
        "fid long, k long, ts timestamp",
    )
    got = {
        r["fid"]: r["val"]
        for r in history.pit_join(fact, dim, "k", "k", "ts").collect()
    }
    assert got == {100: None, 101: "v1", 102: "v1", 103: "v2",
                   104: "v2", 105: None}


def test_pit_join_same_effective_from_tie(spark):
    # two versions sharing (key, effective_from) — scd2_from_history
    # emits exactly this when two runs start on the same date, the
    # earlier run getting an empty [t, t) interval. The empty interval
    # must never shadow the real version regardless of physical row
    # order (ADVICE r5 high: row-order-dependent NULLs).
    import datetime

    from nbi_oedi_etl_v2_spark.operators import history

    d = datetime.datetime
    t0, t1 = d(2024, 1, 1), d(2024, 3, 1)
    rows_fwd = [
        (1, "dead", t0, t0),   # empty [t0, t0) — matches nothing
        (1, "live", t0, t1),
        (1, "next", t1, None),
    ]
    fact = spark.createDataFrame(
        [(100, 1, d(2024, 1, 15)), (101, 1, d(2024, 6, 1))],
        "fid long, k long, ts timestamp",
    )
    schema = (
        "k long, val string, effective_from timestamp, "
        "effective_to timestamp"
    )
    for rows in (rows_fwd, list(reversed(rows_fwd))):
        dim = spark.createDataFrame(rows, schema).coalesce(1)
        got = {
            r["fid"]: r["val"]
            for r in history.pit_join(fact, dim, "k", "k", "ts").collect()
        }
        assert got == {100: "live", 101: "next"}, rows
    # non-empty same-_t tie: the version that extends further forward
    # (here: open-ended) must win deterministically
    dim2 = spark.createDataFrame(
        [(1, "short", t0, t1), (1, "long", t0, None)], schema
    )
    got2 = {
        r["fid"]: r["val"]
        for r in history.pit_join(fact, dim2, "k", "k", "ts").collect()
    }
    assert got2 == {100: "long", 101: "long"}


def test_dq_suite_counts_violations(spark):
    from nbi_oedi_etl_v2_spark.operators.quality import Suite

    df = spark.createDataFrame(
        [
            (1, 10, "O", 5.0),
            (1, None, "O", 5.0),     # dup key + null custkey
            (2, 99, "X", -3.0),      # bad status + bad price + orphan fk
            (3, 11, "F", 0.0),       # price not > 0
        ],
        "k long, ck long, st string, price double",
    )
    dim = spark.createDataFrame([(10,), (11,)], "c long")
    got = {
        r["check_name"]: (r["observed"], r["passed"])
        for r in (
            Suite(df)
            .unique("k")
            .not_null("ck")
            .in_set("st", ["O", "F", "P"])
            .satisfies("price_positive", F.col("price") > 0)
            .foreign_key("ck", dim, "c")
            .run()
            .collect()
        )
    }
    assert got == {
        "unique(k)": (1, False),
        "not_null(ck)": (1, False),
        "in_set(st)": (1, False),
        "satisfies(price_positive)": (2, False),
        "fk(ck)": (1, False),
    }


def test_snapshot_diff_classification_and_null_transitions(spark):
    from nbi_oedi_etl_v2_spark.operators import history

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, None, 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 1.0),      # unchanged -> dropped
            (2, "b", 2.0),      # NULL -> value = changed(v)
            (4, "x", None),     # two columns changed
            (5, "new", 5.0),    # added
        ],                       # 3 removed
        "k long, s string, v double",
    )
    got = {
        r["k"]: (r["change_type"], r["changed_cols"])
        for r in history.snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("changed", "v"),
        3: ("removed", None),
        4: ("changed", "s,v"),
        5: ("added", None),
    }


def test_ivfpq_recall_and_exact_rerank(spark, sf_dir_oracle):
    # composed IVF-PQ: recall floor vs exact on the uniform synthetic,
    # and every emitted cosine must be the EXACT value (the re-rank
    # computes true dot products; only candidate selection is approx)
    from nbi_oedi_etl_v2_spark.operators import similarity
    from nbi_oedi_etl_v2_spark.tables import load_table

    emb = load_table(spark, sf_dir_oracle, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(emb, q, "vec_id", "embedding", k=5)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    exact_cos = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in exact.collect()
    }
    got = similarity.ivfpq_cosine_topk(emb, q, "vec_id", "embedding", k=5)
    rows = got.collect()
    pairs = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.7, recall
    for r in rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cosine"] - exact_cos[key]) < 1e-9


def test_aqp_estimator_deterministic_and_calibrated(spark):
    from nbi_oedi_etl_v2_spark.operators import stats as stats_ops

    df = spark.range(20000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 97).cast("double").alias("x"),
    )
    a = stats_ops.sampled_sum_estimate(df, "k", "x", ["g"]).collect()
    b = stats_ops.sampled_sum_estimate(df, "k", "x", ["g"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # no RNG state
    exact = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(F.sum("x").alias("s")).collect()
    }
    for r in a:
        assert abs(r["est_sum"] - exact[r["g"]]) <= r["ci_half_3sigma"]
        # the sample really is ~1/10
        assert 0.05 * 20000 / 3 < r["n_sampled"] < 0.2 * 20000 / 3


def test_pq_tiny_corpus_smaller_than_codebook(spark):
    # 6 vectors < ksub=16: the codebook shrinks to the sample size and
    # encode/ADC must still produce exact-reranked results, not NULLs
    from nbi_oedi_etl_v2_spark.operators import similarity

    rows = [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.pq_cosine_topk(
        emb, emb, "vec_id", "embedding", k=2, m=4, ksub=16, rerank=6
    ).collect()
    assert len(got) == 12  # 6 queries x top-2
    assert all(r["cosine"] is not None for r in got)
    got2 = similarity.ivfpq_cosine_topk(
        emb, emb, "vec_id", "embedding", k=2, nlist=2, nprobe=2,
        m=4, ksub=16, rerank=6,
    ).collect()
    assert got2 and all(r["cosine"] is not None for r in got2)


# ---------------------------------------------------------------------------
# hot-shingle star guard on the exact path (round 7, VERDICT r6 #4)
# ---------------------------------------------------------------------------

def _boilerplate_corpus(spark):
    # ids 1-6: one identical mega-cluster (every shingle df=6);
    # ids 7-8: a near-dup pair whose shingles stay cold (df=2);
    # id 9: unrelated
    boiler = "alpha beta gamma delta epsilon zeta eta theta"
    near = "one two three four five six seven"
    rows = (
        [(i, boiler) for i in range(1, 7)]
        + [(7, near), (8, near + " eight")]
        + [(9, "totally different words nothing shared here at all")]
    )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_shingle_guard_stars_the_mega_cluster(spark):
    corpus = _boilerplate_corpus(spark)
    exact = _pair_set(
        dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", 3, 0.6)
    )
    capped = _pair_set(
        dedup.ngram_jaccard_pairs(
            corpus, "doc_id", "text", 3, 0.6, hot_shingle_limit=3
        )
    )
    # uncapped: all 15 cluster pairs + the (7, 8) near-dup
    assert {(a, b) for a, b in exact if a < 7 and b < 7} == {
        (a, b) for a in range(1, 7) for b in range(a + 1, 7)
    }
    assert (7, 8) in exact
    # capped: the cluster collapses to the star around doc 1 — O(m)
    # pairs, connectivity preserved through the representative
    assert {(a, b) for a, b in capped if a < 7 and b < 7} == {
        (1, b) for b in range(2, 7)
    }
    # cold pairs are untouched by the guard
    assert (7, 8) in capped
    # a limit above every df must be byte-identical to uncapped
    assert _pair_set(
        dedup.ngram_jaccard_pairs(
            corpus, "doc_id", "text", 3, 0.6, hot_shingle_limit=1000
        )
    ) == exact


def test_hot_shingle_accounting_counts_the_cap(spark):
    corpus = _boilerplate_corpus(spark)
    acct = dedup.hot_shingle_accounting(
        corpus, "doc_id", "text", 3, 0.6, hot_shingle_limit=3
    ).first()
    assert acct.max_df == 6           # the boilerplate cluster
    assert acct.n_hot_shingles >= 1   # its prefix shingles fired
    assert acct.n_hot_occurrences >= 6
    clean = dedup.hot_shingle_accounting(
        corpus, "doc_id", "text", 3, 0.6, hot_shingle_limit=1000
    ).first()
    assert clean.n_hot_shingles == 0 and clean.n_hot_occurrences == 0
