"""Property-based CDC tests: arbitrary event streams (random ops, urls,
out-of-order timestamps, duplicate LSNs, arbitrary epoch splits, mixed
merge/delta modes) must always produce exactly the replay-oracle state."""

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docetl_ray.cdc import LakeTable, apply_events, read_state, replay_oracle

BASE = 1_704_067_200_000_000

event_strategy = st.fixed_dictionaries(
    {
        "url_i": st.integers(0, 8),      # few urls -> heavy key collisions
        "op_i": st.integers(0, 9),       # 10% deletes, 30% updates
        "ts_jitter": st.integers(-50, 50),  # out-of-order timestamps
    }
)


def _build_events(specs) -> pa.Table:
    rows = {
        "lsn": [], "op": [], "url": [], "warc_ts": [], "html": [], "lang": [],
    }
    for lsn, s in enumerate(specs):
        op = "delete" if s["op_i"] == 0 else ("update" if s["op_i"] < 4 else "insert")
        rows["lsn"].append(lsn)
        rows["op"].append(op)
        rows["url"].append(f"https://u{s['url_i']}.example/")
        rows["warc_ts"].append(BASE + (lsn + s["ts_jitter"]) * 1_000_000)
        rows["html"].append(
            None if op == "delete" else b"<p>v%d</p>" % lsn
        )
        rows["lang"].append(None if op == "delete" else "en")
    return pa.table(
        {
            "lsn": pa.array(rows["lsn"], pa.int64()),
            "op": pa.array(rows["op"], pa.string()),
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
            "html": pa.array(rows["html"], pa.binary()),
            "lang": pa.array(rows["lang"], pa.string()),
        }
    )


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    specs=st.lists(event_strategy, min_size=1, max_size=60),
    split=st.integers(0, 60),
    modes=st.tuples(st.sampled_from(["merge", "delta"]),
                    st.sampled_from(["merge", "delta"])),
)
def test_any_event_stream_matches_oracle(tmp_path_factory, specs, split, modes):
    import ray.data as rd

    from docetl_ray.util import collect

    events = _build_events(specs)
    split = min(split, events.num_rows)
    root = str(tmp_path_factory.mktemp("lake"))
    table = LakeTable(root, num_partitions=3)
    seg1, seg2 = events.slice(0, split), events.slice(split)
    if seg1.num_rows:
        apply_events(table, rd.from_arrow(seg1), epoch=0, mode=modes[0])
    if seg2.num_rows:
        apply_events(table, rd.from_arrow(seg2), epoch=1, mode=modes[1])

    oracle = replay_oracle(events, include_tombstones=True)
    engine = collect(read_state(table, include_tombstones=True)).sort_by(
        [("url", "ascending")]
    )
    assert engine.num_rows == oracle.num_rows
    for c in ("url", "lsn", "text", "_deleted"):
        assert engine[c].to_pylist() == oracle[c].to_pylist(), c


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(specs=st.lists(event_strategy, min_size=1, max_size=40))
def test_duplicate_replay_never_changes_state(tmp_path_factory, specs):
    import ray.data as rd

    from docetl_ray.util import collect

    events = _build_events(specs)
    root = str(tmp_path_factory.mktemp("lake"))
    table = LakeTable(root, num_partitions=2)
    apply_events(table, rd.from_arrow(events), epoch=0, mode="delta")
    before = collect(read_state(table, include_tombstones=True)).sort_by(
        [("url", "ascending")]
    )
    # replay the whole segment again as a new epoch
    apply_events(table, rd.from_arrow(events), epoch=1, mode="delta")
    after = collect(read_state(table, include_tombstones=True)).sort_by(
        [("url", "ascending")]
    )
    assert before.equals(after)
