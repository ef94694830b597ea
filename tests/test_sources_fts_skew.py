"""Sources/parsing tools, BM25 top_fts, top_embedding, and skew-balance tests."""

import math
import re

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds):
    from docetl_ray.util import collect

    return collect(ds)


def test_parse_files_fan_out(tmp_path):
    import ray.data as rd

    from docetl_ray.sources import parse_files, read_dataset

    f1 = tmp_path / "a.txt"
    f1.write_text("doc one content")
    f2 = tmp_path / "b.txt"
    f2.write_text("doc two content")
    ds = rd.from_items([{"path": str(f1), "tag": "x"}, {"path": str(f2), "tag": "y"}])
    out = _collect(parse_files(ds, path_col="path", parser="txt_to_string"))
    assert sorted(out["content"].to_pylist()) == ["doc one content", "doc two content"]
    assert set(out["tag"].to_pylist()) == {"x", "y"}  # extras copied

    t = read_dataset(str(f1))
    assert t.count() == 1


def test_stub_parsers_raise():
    # xlsx/docx/pptx are real stdlib parsers now (docetl_ray/ooxml.py,
    # tests/test_ooxml.py); only the model/network-dependent parsers stub
    from docetl_ray.sources import whisper_speech_to_text

    with pytest.raises(NotImplementedError):
        whisper_speech_to_text("/tmp/x.wav")


def test_top_fts_bm25_matches_reference_impl():
    import ray.data as rd

    from docetl_ray.stages.sample import top_fts

    docs = [
        "spark window merge spark spark",
        "window functions in sql",
        "completely unrelated text body",
        "merge sort algorithm details merge",
        "spark",
    ]
    t = pa.table({"doc_id": list(range(5)), "text": docs})
    out = _collect(top_fts(rd.from_arrow(t), "text", "doc_id", "spark merge", 3))

    # reference BM25 computed directly
    word = re.compile(r"\w+")
    toks = [[w.lower() for w in word.findall(d)] for d in docs]
    n, avg = len(docs), sum(len(x) for x in toks) / len(docs)
    scores = []
    for ts in toks:
        s = 0.0
        for q in ("spark", "merge"):
            df = sum(q in set(x) for x in toks)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            f = ts.count(q)
            if f:
                s += idf * f * 2.5 / (f + 1.5 * (1 - 0.75 + 0.75 * len(ts) / avg))
        scores.append(s)
    expect = sorted(range(5), key=lambda i: (-scores[i], i))[:3]
    assert out.sort_by([("score", "descending")])["doc_id"].to_pylist() == expect


def test_top_embedding_single_query():
    import pyarrow.parquet as pq
    import ray.data as rd

    from docetl_ray.stages.sample import top_embedding

    SF = "/root/testdata/sf0.001"
    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    raw = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = raw.sort_by([("vec_id", "ascending")])["embedding"][0].as_py()
    out = _collect(top_embedding(emb, "embedding", "vec_id", q, 5))
    top = out.sort_by([("score", "descending")])
    assert top["score"].to_pylist()[0] == pytest.approx(1.0)  # self
    assert top.num_rows == 5


def test_partial_combine_balances_hot_keys():
    """The Zipf-head url must not dominate any shuffle partition: after the
    per-batch LWW combine a hot url contributes at most one row per batch."""
    from docetl_ray import synth
    from docetl_ray.cdc.apply import partial_apply

    ev = synth.events_table(0, 20000)
    hot_events = sum(1 for u in ev["url"].to_pylist() if u == "https://hot.example/")
    assert hot_events > 15  # the skew exists in the fixture
    out = partial_apply(ev, num_partitions=8)
    hot_rows = sum(1 for u in out["url"].to_pylist() if u == "https://hot.example/")
    assert hot_rows == 1  # collapsed before the exchange

    # partition sizes stay balanced (no partition > 3x the mean)
    parts = out["part"].to_pylist()
    import collections

    counts = collections.Counter(parts)
    mean = len(parts) / len(counts)
    assert max(counts.values()) < 3 * mean


def test_get_parser_entry_point_lookup(tmp_path):
    """get_parser: registered first, unknown raises with the registry list."""
    import pytest
    from docetl_ray.sources import PARSERS, get_parser, register_parser

    def my_parser(path):
        return ["parsed"]

    register_parser("my_custom", my_parser)
    try:
        assert get_parser("my_custom") is my_parser
        assert get_parser("txt_to_string") is PARSERS["txt_to_string"]
        with pytest.raises(KeyError):
            get_parser("definitely_not_registered")
    finally:
        PARSERS.pop("my_custom", None)
