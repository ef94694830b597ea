"""URL canonicalization + per-host stats (stages/urlops.py).

The CDC lake's primary key is ``url``; these stages are the key-hygiene
layer that collapses spelling variants BEFORE the keyed LWW apply.
"""

import pyarrow as pa
import ray.data as rd

from docetl_ray.stages.urlops import add_host, host_stats, normalize_urls, url_normalize
from docetl_ray.util import collect


def test_normalize_urls_rules():
    arr = pa.array(
        [
            "HTTP://Docs.Example.COM:80/a/b#frag",   # scheme+host case, default port, fragment
            "https://h1.example.com:443/x",           # https default port
            "https://h1.example.com:8080/x",          # non-default port survives
            "http://h2.example.com",                  # empty path -> /
            "not a url at all",                       # pass-through
            "ftp://Mixed.Case/z",                     # non-http scheme: ports untouched
        ]
    )
    out = normalize_urls(arr).to_pylist()
    assert out == [
        "http://docs.example.com/a/b",
        "https://h1.example.com/x",
        "https://h1.example.com:8080/x",
        "http://h2.example.com/",
        "not a url at all",
        "ftp://mixed.case/z",
    ]


def test_url_normalize_and_add_host_stage():
    ds = rd.from_items(
        [
            {"i": 0, "url": "HTTPS://A.Example.COM:443/p#x"},
            {"i": 1, "url": "plain text"},
        ]
    )
    t = collect(add_host(url_normalize(ds, "url"), "url")).sort_by("i")
    assert t["url"].to_pylist() == ["https://a.example.com/p", "plain text"]
    assert t["host"].to_pylist() == ["a.example.com", None]


def test_host_stats_counts_pages_and_distinct_urls():
    # two spellings of one page + a second page on the same host + one
    # page on another host: normalization must collapse spellings
    # before counting.
    ds = rd.from_items(
        [
            {"url": "http://H1.example.com/a"},
            {"url": "HTTP://h1.Example.Com:80/a#sec"},
            {"url": "http://h1.example.com/b"},
            {"url": "https://h2.example.com/"},
        ]
    )
    t = collect(host_stats(ds, "url")).sort_by("host")
    rows = {r["host"]: r for r in t.to_pylist()}
    assert rows["h1.example.com"]["n_pages"] == 3
    assert rows["h1.example.com"]["n_urls"] == 2
    assert rows["h2.example.com"]["n_pages"] == 1
    assert rows["h2.example.com"]["n_urls"] == 1


def test_paragraph_dedup_drops_corpuswide_boilerplate():
    import ray.data as rd

    from docetl_ray.stages.textops import paragraph_counts, paragraph_dedup
    from docetl_ray.util import collect

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "unique body one\nSubscribe now\n\nCopyright 2024"},
            {"doc_id": 2, "text": "another body\nSubscribe now\nCopyright 2024"},
            {"doc_id": 3, "text": "third body\nown footer"},
            {"doc_id": 4, "text": ""},
        ]
    )
    counts = {
        r["para"]: r["n_docs"]
        for r in collect(paragraph_counts(ds, "text")).to_pylist()
    }
    assert counts["Subscribe now"] == 2
    assert counts["Copyright 2024"] == 2
    assert counts["unique body one"] == 1
    assert "" not in counts

    t = collect(paragraph_dedup(ds, "text")).sort_by("doc_id")
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    # hot paragraphs dropped everywhere; empty paragraphs preserved
    assert texts[1] == "unique body one\n"
    assert texts[2] == "another body"
    assert texts[3] == "third body\nown footer"
    assert texts[4] == ""


def test_pii_scrub_rules():
    from docetl_ray.stages.textops import pii_scrub

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "mail me at jo.doe+spam@sub.example.org today",
                        "server 10.0.255.3 called +44 20-7946-0958 twice",
                        "no pii here, just 3.14 and v1.2.3 strings",
                    ]
                ),
            }
        )
    )
    out = collect(pii_scrub(ds, "text", out_col="clean")).sort_by(
        [("doc_id", "ascending")]
    )
    assert out["clean"].to_pylist() == [
        "mail me at <EMAIL> today",
        "server <IP> called <PHONE> twice",
        "no pii here, just 3.14 and v1.2.3 strings",
    ]
    assert out["n_email"].to_pylist() == [1, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 1, 0]
    assert out["n_phone"].to_pylist() == [0, 1, 0]
    # in-place scrub keeps the original column name
    out2 = collect(pii_scrub(ds, "text")).sort_by([("doc_id", "ascending")])
    assert "<EMAIL>" in out2["text"].to_pylist()[0]
