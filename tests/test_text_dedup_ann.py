"""Text analysis, dedup, ANN, window, multimodal stage tests."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _read(name, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/{name}.parquet", columns=columns)


def _collect(ds):
    from docetl_ray.util import collect

    return collect(ds)


def test_token_count_matches_python():
    from docetl_ray.stages.textops import token_count

    docs = _read("documents", columns=["doc_id", "text"])
    out = _collect(token_count(docs, "text")).sort_by([("doc_id", "ascending")])
    import pyarrow.parquet as pq

    raw = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).sort_by(
        [("doc_id", "ascending")]
    )
    expect = [len(t.split()) for t in raw["text"].to_pylist()]
    assert out["n_tokens"].to_pylist() == expect


def test_quality_score_ranges():
    from docetl_ray.stages.textops import quality_score

    docs = _read("documents", columns=["doc_id", "text"])
    out = _collect(quality_score(docs, "text"))
    q = out["quality"].to_pylist()
    assert all(0.0 <= v <= 1.0 for v in q)
    assert out["n_chars"].to_pylist() == [len(t) for t in out["text"].to_pylist()]


def test_lang_id_heuristic():
    import ray.data as rd
    from docetl_ray.stages.textops import lang_id

    t = pa.table(
        {
            "id": [1, 2, 3, 4, 5],
            "text": [
                "the cat sat on the mat and it was happy with this",
                "der Hund ist nicht mit der Katze und das ist ein Problem",
                "le chat est dans la maison et les enfants sont pour une surprise",
                "el perro es una mascota y los gatos son para la casa",
                "这是一个中文句子",
            ],
        }
    )
    out = _collect(lang_id(rd.from_arrow(t), "text")).sort_by([("id", "ascending")])
    assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "es", "zh"]


def test_fingerprint_stability_and_sensitivity():
    import ray.data as rd
    from docetl_ray.stages.textops import fingerprint

    t = pa.table({"id": [1, 2], "text": ["hello world document", "hello world document"]})
    out = _collect(fingerprint(rd.from_arrow(t), "text"))
    fps = out["fingerprint"].to_pylist()
    assert fps[0] == fps[1]
    t2 = pa.table({"id": [1], "text": ["a completely different text body"]})
    out2 = _collect(fingerprint(rd.from_arrow(t2), "text"))
    assert out2["fingerprint"].to_pylist()[0] != fps[0]


def _near_dup_corpus():
    base = (
        "the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the quiet mountain village in the golden evening light"
    )
    return pa.table(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                base,
                base + " today",  # near-dup of 0
                base.replace("quick", "rapid"),  # near-dup of 0
                "completely unrelated content about database query engines and shuffles",
                "another distinct document covering distributed systems and ray data",
            ],
        }
    )


def test_minhash_dedup_clusters_near_dups():
    import ray.data as rd
    from docetl_ray.stages.dedup import minhash_dedup

    ds = rd.from_arrow(_near_dup_corpus())
    deduped, cmap = minhash_dedup(ds, "text", "doc_id", threshold=0.6)
    kept = sorted(_collect(deduped)["doc_id"].to_pylist())
    assert kept == [0, 3, 4]
    assert cmap.get(1) == 0 and cmap.get(2) == 0


def test_minhash_estimates_track_exact_jaccard():
    """The synthetic corpus contains genuine near-dups (identical
    prefixes); every LSH candidate's estimate must track exact Jaccard."""
    import pyarrow.parquet as pq
    from docetl_ray.stages.dedup import jaccard_ngram, minhash_candidates

    docs = _read("documents", columns=["doc_id", "text"])
    cand = _collect(minhash_candidates(docs, "text", "doc_id", threshold=0.9))
    assert cand.num_rows > 0  # corpus has near-dups at char-5-gram level
    texts = dict(
        zip(
            *[
                pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])[c].to_pylist()
                for c in ("doc_id", "text")
            ]
        )
    )
    for r in cand.to_pylist():
        exact = jaccard_ngram(texts[r["id_a"]], texts[r["id_b"]])
        assert exact > 0.75, (r, exact)  # no gross false positives
        assert abs(exact - r["est_jaccard"]) < 0.15


def test_simhash_dedup_exact_duplicates():
    import ray.data as rd
    from docetl_ray.stages.dedup import simhash_dedup, simhash64

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["same text here", "same text here", "different text entirely okay"],
        }
    )
    out = _collect(simhash_dedup(rd.from_arrow(t), "text", "doc_id"))
    assert sorted(out["doc_id"].to_pylist()) == [1, 3]
    assert simhash64("same text here") == simhash64("same text here")


def test_embedding_dedup():
    import ray.data as rd
    from docetl_ray.stages.dedup import embedding_dedup

    rng = np.random.RandomState(3)
    v1 = rng.randn(64)
    v2 = v1 + rng.randn(64) * 0.01  # near-dup
    v3 = rng.randn(64)
    t = pa.table(
        {
            "vec_id": [10, 11, 12],
            "embedding": pa.array([v.tolist() for v in (v1, v2, v3)], pa.list_(pa.float64())),
        }
    )
    deduped, cmap = embedding_dedup(rd.from_arrow(t), "embedding", "vec_id", threshold=0.98)
    kept = sorted(_collect(deduped)["vec_id"].to_pylist())
    assert kept == [10, 12]
    assert cmap.get(11) == 10


def test_ann_bruteforce_matches_numpy():
    from docetl_ray.stages.ann import ann_topk_bruteforce
    import pyarrow.parquet as pq

    emb = _read("embeddings", columns=["vec_id", "embedding"])
    raw = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(raw["vec_id"].to_pylist())
    m = np.asarray(raw["embedding"].to_pylist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1)[:, None]
    queries = m[:3]
    qn = queries / np.linalg.norm(queries, axis=1)[:, None]
    sim = qn @ mn.T

    out = _collect(ann_topk_bruteforce(emb, "embedding", "vec_id", queries, k=5))
    for qi in range(3):
        got = (
            out.filter(pa.compute.equal(out["query_id"], qi))
            .sort_by([("score", "descending"), ("vec_id", "ascending")])["vec_id"]
            .to_pylist()
        )
        order = np.lexsort((ids, -sim[qi]))[:5]
        assert got == ids[order].tolist()


def test_ann_lsh_finds_self():
    from docetl_ray.stages.ann import ann_topk_lsh
    import pyarrow.parquet as pq

    emb = _read("embeddings", columns=["vec_id", "embedding"])
    raw = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = np.asarray(raw["embedding"].to_pylist()[:3], dtype=np.float64)
    out = _collect(ann_topk_lsh(emb, "embedding", "vec_id", queries, k=3, probe_flips=1))
    # each query vector is in the corpus; its own bucket must contain it -> top-1 self
    for qi in range(3):
        rows = (
            out.filter(pa.compute.equal(out["query_id"], qi))
            .sort_by([("score", "descending")])
        )
        assert rows["score"].to_pylist()[0] == pytest.approx(1.0)
        assert rows["vec_id"].to_pylist()[0] == raw["vec_id"].to_pylist()[qi]


def test_ann_ivf_full_probe_equals_bruteforce():
    # nprobe == nlist probes every inverted list -> IVF degenerates to
    # exact search and must reproduce brute force bit-for-bit
    from docetl_ray.stages.ann import ann_topk_bruteforce, ann_topk_ivf
    import pyarrow.parquet as pq

    emb = _read("embeddings", columns=["vec_id", "embedding"])
    raw = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = np.asarray(raw["embedding"].to_pylist()[:3], dtype=np.float64)
    bf = _collect(ann_topk_bruteforce(emb, "embedding", "vec_id", queries, k=5))
    ivf = _collect(
        ann_topk_ivf(emb, "embedding", "vec_id", queries, k=5, nlist=8, nprobe=8)
    )
    key = [("query_id", "ascending"), ("score", "descending"), ("vec_id", "ascending")]
    assert bf.sort_by(key)["vec_id"].to_pylist() == ivf.sort_by(key)["vec_id"].to_pylist()


def test_ann_ivf_finds_self():
    # a corpus query's own list is its top-1 probe -> self is always found
    from docetl_ray.stages.ann import ann_topk_ivf
    import pyarrow.parquet as pq

    emb = _read("embeddings", columns=["vec_id", "embedding"])
    raw = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = np.asarray(raw["embedding"].to_pylist()[:3], dtype=np.float64)
    out = _collect(ann_topk_ivf(emb, "embedding", "vec_id", queries, k=3, nlist=8, nprobe=2))
    for qi in range(3):
        rows = out.filter(pa.compute.equal(out["query_id"], qi)).sort_by(
            [("score", "descending")]
        )
        assert rows["score"].to_pylist()[0] == pytest.approx(1.0)
        assert rows["vec_id"].to_pylist()[0] == raw["vec_id"].to_pylist()[qi]


def test_ivf_kmeans_deterministic():
    from docetl_ray.stages.ann import ann_topk_ivf, ivf_train_kmeans
    import pyarrow.parquet as pq

    raw = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = np.asarray(raw["embedding"].to_pylist(), dtype=np.float64)
    c1 = ivf_train_kmeans(m[:64], 4, iters=5)
    c2 = ivf_train_kmeans(m[:64], 4, iters=5)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    # trained centroids plug into the same search path
    emb = _read("embeddings", columns=["vec_id", "embedding"])
    out = _collect(
        ann_topk_ivf(emb, "embedding", "vec_id", m[:2], k=3, nprobe=2, centroids=c1)
    )
    assert out.num_rows == 6


def test_tumbling_window_vs_duckdb():
    import duckdb
    from docetl_ray.stages.window import tumbling_window_aggregate

    ev = _read("events", columns=["user_id", "ts", "value"])
    out = tumbling_window_aggregate(
        ev, "ts", "user_id", window_seconds=86400,
        aggs=[("value", "sum", "sum_value"), ("value", "count", "n_events")],
    )
    got = _collect(out).sort_by([("user_id", "ascending"), ("window_start", "ascending")])
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT user_id,
                   to_timestamp(floor(epoch(ts) / 86400) * 86400)::TIMESTAMP AS window_start,
                   sum(value) AS sum_value, count(value) AS n_events
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetch_arrow_table()
    assert got.num_rows == want.num_rows
    assert got["user_id"].to_pylist() == want["user_id"].to_pylist()
    assert got["n_events"].to_pylist() == want["n_events"].to_pylist()
    assert got["window_start"].cast(pa.int64()).to_pylist() == want["window_start"].cast(
        pa.timestamp("us")
    ).cast(pa.int64()).to_pylist()
    for a, b in zip(got["sum_value"].to_pylist(), want["sum_value"].to_pylist()):
        assert abs(a - b) < 1e-9


def test_session_windows():
    import ray.data as rd
    from docetl_ray.stages.window import session_windows

    base = 1_700_000_000_000_000
    t = pa.table(
        {
            "user_id": [1, 1, 1, 1, 2],
            "ts": pa.array(
                [base, base + 10_000_000, base + 500_000_000, base + 505_000_000, base],
                pa.timestamp("us"),
            ),
        }
    )
    out = _collect(session_windows(rd.from_arrow(t), "ts", "user_id", gap_seconds=60))
    out = out.sort_by([("user_id", "ascending"), ("session_start", "ascending")])
    assert out["n_events"].to_pylist() == [2, 2, 1]


def test_multimodal_image_stage():
    import ray.data as rd
    from docetl_ray.stages.multimodal import image_pipeline, ImageFeatureStage

    t = pa.table(
        {
            "id": [1, 2, 3],
            "image": pa.array([b"\x89PNGfake1", b"\x89PNGfake2", None], pa.binary()),
        }
    )
    out = _collect(image_pipeline(rd.from_arrow(t), bytes_col="image"))
    out = out.sort_by([("id", "ascending")])
    assert "image" not in out.column_names  # payload projected away
    feats = out["image_features"].to_pylist()
    assert all(len(f) == 16 for f in feats)
    assert feats[2] == [0.0] * 16  # null payload
    # deterministic: same payload -> same features
    s = ImageFeatureStage()
    assert s._decode(b"\x89PNGfake1").tolist() == feats[0]
    # real-decode path (stdlib PNG/BMP/PPM, stages/imagecodec.py) rejects
    # undecodable bytes with ValueError; tests/test_multimodal_codec.py
    # covers the successful decodes
    with pytest.raises(ValueError):
        ImageFeatureStage(fake=False)._decode(b"x")


def test_multimodal_audio_frames():
    import ray.data as rd
    from docetl_ray.stages.multimodal import AudioFrameSampleStage

    t = pa.table({"id": [1, 2], "audio": pa.array([b"wavdata", None], pa.binary())})
    out = _collect(
        rd.from_arrow(t).map_batches(AudioFrameSampleStage, batch_format="pyarrow",
                                     batch_size=16, concurrency=1)
    )
    assert out.num_rows == 4  # 4 frames for the non-null payload, 0 for null
    assert set(out["frame_no"].to_pylist()) == {0, 1, 2, 3}


def test_minhash_dedup_edge_cases():
    import ray.data as rd
    from docetl_ray.stages.dedup import minhash_dedup

    one = rd.from_arrow(pa.table({"doc_id": [1], "text": ["only document"]}))
    out, cmap = minhash_dedup(one, "text", "doc_id")
    assert _collect(out).num_rows == 1 and cmap == {}

    same = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3, 4], "text": ["same text body here"] * 4})
    )
    out2, _ = minhash_dedup(same, "text", "doc_id")
    assert sorted(_collect(out2)["doc_id"].to_pylist()) == [1]


def test_minhash_dedup_distributed_matches_driver():
    """distributed=True (shuffle verify + min-label-propagation CC +
    anti-join keep) must keep exactly the same representatives as the
    driver union-find path."""
    from docetl_ray.stages.dedup import minhash_dedup

    docs = _read("documents", columns=["doc_id", "text"])
    kept_driver, cmap = minhash_dedup(docs, "text", "doc_id", threshold=0.7)
    kept_dist, labels = minhash_dedup(
        docs, "text", "doc_id", threshold=0.7, distributed=True
    )
    a = sorted(_collect(kept_driver)["doc_id"].to_pylist())
    b = sorted(_collect(kept_dist)["doc_id"].to_pylist())
    assert a == b and len(a) < docs.count()  # corpus has near-dups
    # labels Dataset agrees with the driver canonical map on non-trivial ids
    lab = {
        r["id"]: r["label"] for r in _collect(labels).to_pylist()
    }
    for k, v in cmap.items():
        assert lab.get(k, k) == v


def test_connected_components_distributed_chain():
    """A long path graph needs multiple propagation rounds — the label
    must still converge to the global min of the component."""
    import ray.data as rd
    from docetl_ray.stages.dedup import connected_components_distributed

    # path 0-1-2-...-9 plus an isolated edge 100-101
    edges = pa.table(
        {
            "id_a": list(range(9)) + [100],
            "id_b": list(range(1, 10)) + [101],
        }
    )
    labels = connected_components_distributed(rd.from_arrow(edges))
    lab = {r["id"]: r["label"] for r in _collect(labels).to_pylist()}
    assert all(lab[i] == 0 for i in range(10))
    assert lab[100] == 100 and lab[101] == 100


def test_embedding_dedup_distributed():
    import ray.data as rd
    from docetl_ray.stages.dedup import embedding_dedup

    rng = np.random.RandomState(3)
    v1 = rng.randn(64)
    v2 = v1 + rng.randn(64) * 0.01
    v3 = rng.randn(64)
    t = pa.table(
        {
            "vec_id": [10, 11, 12],
            "embedding": pa.array([v.tolist() for v in (v1, v2, v3)], pa.list_(pa.float64())),
        }
    )
    deduped, labels = embedding_dedup(
        rd.from_arrow(t), "embedding", "vec_id", threshold=0.98, distributed=True
    )
    assert sorted(_collect(deduped)["vec_id"].to_pylist()) == [10, 12]


def test_multimodal_video_keyframes():
    import ray.data as rd
    from docetl_ray.stages.multimodal import VideoKeyframeStage

    t = pa.table({"id": [1, 2], "video": pa.array([b"MP4fakepayload", None], pa.binary())})
    out = _collect(
        rd.from_arrow(t).map_batches(VideoKeyframeStage, batch_format="pyarrow",
                                     batch_size=8, concurrency=1)
    )
    assert out.num_rows == 3  # 3 keyframes for the non-null payload
    assert "video" not in out.column_names
    assert all(len(f) == 8 for f in out["keyframe_features"].to_pylist())
    ts = out["keyframe_ts"].to_pylist()
    assert ts == sorted(ts) and all(v > 0 for v in ts)


def test_simhash_near_dedup_hamming_radius():
    """Banding over r+1 disjoint chunks must find EVERY pair within the
    radius (pigeonhole full recall), none beyond it."""
    import ray.data as rd
    from docetl_ray.stages.dedup import simhash64, simhash_near_dedup

    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "the quick brown fox jumps over the lazy dog again and again!",  # near
        3: "completely different content about database shuffle partitions",
        4: "the quick brown fox jumps over the lazy dog again and again",  # exact dup of 1
    }
    ds = rd.from_arrow(
        pa.table({"doc_id": list(texts), "text": list(texts.values())})
    )
    out, cmap = simhash_near_dedup(ds, "text", "doc_id", max_hamming=3)
    res = {r["doc_id"]: r["canonical_id"] for r in _collect(out).to_pylist()}
    # exact dup always collapses
    assert res[4] == 1
    # doc 3 stays its own cluster
    assert res[3] == 3
    # near-dup collapses iff its fingerprint is within the radius — check
    # consistency against the direct hamming distance
    h1, h2 = simhash64(texts[1]), simhash64(texts[2])
    within = bin(h1 ^ h2).count("1") <= 3
    assert (res[2] == 1) == within


def test_minhash_dedup_auto_switches_on_edge_volume():
    import ray.data as rd
    from docetl_ray.stages.dedup import minhash_dedup

    ds = rd.from_arrow(_near_dup_corpus())
    # tiny edge set -> auto picks the driver path (dict canonical map)
    out_a, cmap_a = minhash_dedup(ds, "text", "doc_id", threshold=0.6,
                                  distributed="auto")
    assert isinstance(cmap_a, dict)
    # force the doc-count probe to 0 -> auto picks the distributed path
    # (auto now decides BEFORE the candidate pass, so the broadcast
    # driver signature map is never built for huge corpora)
    out_b, labels_b = minhash_dedup(ds, "text", "doc_id", threshold=0.6,
                                    distributed="auto", auto_doc_threshold=0)
    assert not isinstance(labels_b, dict)
    assert sorted(_collect(out_a)["doc_id"].to_pylist()) == \
        sorted(_collect(out_b)["doc_id"].to_pylist()) == [0, 3, 4]


def test_gopher_quality_rules():
    import ray.data as rd
    from docetl_ray.stages.textops import gopher_quality
    from docetl_ray.util import collect

    good = ("the quick brown fox jumps over and over with great energy; "
            "that should have been enough words to clear the fifty word "
            "minimum for the gopher rules, so we keep padding the text "
            "with plain english sentences of ordinary shape and length "
            "until the counter is satisfied for sure today okay.")
    bullets = "\n".join("- item" for _ in range(10))
    ds = rd.from_items([
        {"doc_id": 1, "text": good},
        {"doc_id": 2, "text": "too short"},
        {"doc_id": 3, "text": bullets},
        {"doc_id": 4, "text": ""},
    ])
    t = collect(gopher_quality(ds, "text")).sort_by("doc_id")
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    assert rows[1]["gopher_pass"] is True
    assert rows[1]["n_stop_hits"] >= 2
    assert rows[2]["gopher_pass"] is False          # word-count band
    assert rows[3]["bullet_line_frac"] == 1.0
    assert rows[3]["gopher_pass"] is False          # bullet fraction
    assert rows[4]["n_words"] == 0 and rows[4]["gopher_pass"] is False
    assert rows[4]["mean_word_len"] == 0.0


def test_repetition_stats_line_dedup():
    import ray.data as rd
    from docetl_ray.stages.textops import repetition_stats
    from docetl_ray.util import collect

    ds = rd.from_items([
        {"doc_id": 1, "text": "aaa\nbbb\naaa\n\nccc"},   # 4 non-empty, 3 distinct
        {"doc_id": 2, "text": "x\nx\nx"},                # fully duplicated
        {"doc_id": 3, "text": "unique\nlines\nonly"},
        {"doc_id": 4, "text": ""},                       # no non-empty lines
    ])
    t = collect(repetition_stats(ds, "text")).sort_by("doc_id")
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    assert rows[1]["dup_line_frac"] == (4 - 3) / 4
    # dup chars: 'aaa' occurs twice -> 6 of 12 total line chars
    assert rows[1]["dup_line_char_frac"] == 6 / 12
    assert rows[2]["dup_line_frac"] == (3 - 1) / 3
    assert rows[2]["dup_line_char_frac"] == 1.0
    assert rows[3]["dup_line_frac"] == 0.0
    assert rows[4]["dup_line_frac"] == 0.0 and rows[4]["dup_line_char_frac"] == 0.0
