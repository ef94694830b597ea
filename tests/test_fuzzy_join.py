import pyarrow as pa


def _collect(ds):
    from docetl_ray.util import collect

    return collect(ds)


def _sides():
    import ray.data as rd

    left = pa.table(
        {
            "lid": [1, 2, 3],
            "name": [
                "international business machines corporation",
                "apache software foundation ray project",
                "acme widgets limited",
            ],
        }
    )
    right = pa.table(
        {
            "rid": [10, 11, 12, 13],
            "title": [
                "international business machines corp",
                "the apache software foundation ray projects",
                "zzz totally unrelated entity qqq",
                "international business machines corporation",
            ],
        }
    )
    return rd.from_arrow(left), rd.from_arrow(right)


def test_fuzzy_join_finds_near_matches():
    from docetl_ray.stages.fuzzy_join import fuzzy_join

    l, r = _sides()
    out = _collect(
        fuzzy_join(l, r, left_text="name", right_text="title",
                   left_id="lid", right_id="rid", threshold=0.5)
    )
    pairs = {(a, b) for a, b in zip(out["lid"].to_pylist(), out["rid"].to_pylist())}
    assert (1, 10) in pairs and (1, 13) in pairs
    assert (2, 11) in pairs
    assert not any(b == 12 for _, b in pairs)  # unrelated never matches


def test_fuzzy_join_limits_cap_matches():
    from docetl_ray.stages.fuzzy_join import fuzzy_join

    l, r = _sides()
    out = _collect(
        fuzzy_join(l, r, left_text="name", right_text="title",
                   left_id="lid", right_id="rid", threshold=0.5,
                   limits=(1, None))
    )
    lids = out["lid"].to_pylist()
    assert lids.count(1) == 1  # capped to best match
    # the kept match is the higher-jaccard one (exact duplicate rid=13)
    kept = {a: b for a, b in zip(lids, out["rid"].to_pylist())}
    assert kept[1] == 13
