import pyarrow as pa

from docetl_ray.html_text import extract_text_batch, extract_text_bytes
from docetl_ray import synth


def test_basic_extraction():
    html = b"<html><head><title>T1</title></head><body><p>hello  world</p></body></html>"
    assert extract_text_bytes(html) == "T1\nhello world"


def test_script_style_comments_dropped():
    html = (
        b"<html><body><script>var x = '<p>no</p>';</script>"
        b"<style>p { color: red }</style><!-- hidden --><p>keep</p></body></html>"
    )
    assert extract_text_bytes(html) == "keep"


def test_entities_pinned_order():
    assert extract_text_bytes(b"<p>a &amp; b &lt;c&gt; &quot;d&quot; &nbsp;e</p>") == 'a & b <c> "d" e'
    # &amp; decoded last: &amp;lt; -> &lt; literally, not <
    assert extract_text_bytes(b"<p>&amp;lt;</p>") == "&lt;"


def test_null_and_empty():
    assert extract_text_bytes(None) == ""
    assert extract_text_bytes(b"") == ""
    assert extract_text_bytes(b"<p></p><div>  </div>") == ""


def test_batch_fn_matches_scalar():
    t = synth.pages_table(0, 50)
    redone = extract_text_batch(t.drop_columns(["text"]))
    assert redone["text"].to_pylist() == t["text"].to_pylist()


def test_deterministic_golden_column():
    # the synth text column IS the extraction output (byte-identity oracle)
    t = synth.pages_table(100, 20)
    for h, x in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text_bytes(h) == x


def test_batch_replaces_existing_text_col():
    t = pa.table({"html": [b"<p>x</p>"], "text": ["stale"]})
    out = extract_text_batch(t)
    assert out["text"].to_pylist() == ["x"]
