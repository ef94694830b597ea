"""Relational operator stages vs DuckDB oracles on the driver testdata."""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pytest

SF = "/root/testdata/sf0.001"


def _read(name, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/{name}.parquet", columns=columns)


def _duck(sql):
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation", "region", "documents",
              "embeddings", "events", "part", "supplier"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetch_arrow_table()


def _to_arrow(ds) -> pa.Table:
    import ray

    from docetl_ray.util import collect
    return collect(ds)


def _cmp(ds, sql, sort_cols):
    got = _to_arrow(ds)
    want = _duck(sql)
    got = got.select(sorted(got.column_names)).sort_by([(c, "ascending") for c in sort_cols])
    want = want.select(sorted(want.column_names)).sort_by([(c, "ascending") for c in sort_cols])
    assert got.num_rows == want.num_rows, f"{got.num_rows} != {want.num_rows}"
    for c in want.column_names:
        g, w = got[c].to_pylist(), want[c].to_pylist()
        if pa.types.is_floating(want[c].type):
            assert all(
                (a is None and b is None) or abs(a - b) < 1e-6 * max(1, abs(b))
                for a, b in zip(g, w)
            ), f"float col {c} differs"
        else:
            assert g == w, f"col {c} differs"


def test_code_map_and_filter():
    from docetl_ray.stages import code_map, code_filter

    ds = _read("lineitem", columns=["l_extendedprice", "l_discount", "l_quantity"])
    ds = code_map(
        ds,
        lambda t: t.append_column(
            "revenue", pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        ),
    )
    ds = code_filter(ds, lambda t: pc.greater(t["l_quantity"], 30.0))
    _cmp(
        ds,
        """SELECT l_extendedprice, l_discount, l_quantity,
                  l_extendedprice * (1 - l_discount) AS revenue
           FROM lineitem WHERE l_quantity > 30""",
        ["l_extendedprice", "revenue"],
    )


def test_grouped_aggregate_q1():
    from docetl_ray.stages import grouped_aggregate

    ds = _read("lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity",
                                    "l_extendedprice"])
    out = grouped_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum", "sum_qty"),
            ("l_extendedprice", "sum", "sum_price"),
            ("l_quantity", "mean", "avg_qty"),
            ("l_quantity", "count", "count_order"),
            ("l_extendedprice", "max", "max_price"),
        ],
    )
    _cmp(
        out,
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
                  sum(l_extendedprice) AS sum_price, avg(l_quantity) AS avg_qty,
                  count(l_quantity) AS count_order, max(l_extendedprice) AS max_price
           FROM lineitem GROUP BY 1, 2""",
        ["l_returnflag", "l_linestatus"],
    )


def test_global_aggregate():
    from docetl_ray.stages import global_aggregate

    ds = _read("orders", columns=["o_totalprice"])
    out = global_aggregate(
        ds,
        [("o_totalprice", "sum", "s"), ("o_totalprice", "mean", "m"),
         ("o_totalprice", "count", "n"), ("o_totalprice", "min", "lo")],
    )
    want = _duck(
        "SELECT sum(o_totalprice) s, avg(o_totalprice) m, count(*) n, min(o_totalprice) lo FROM orders"
    ).to_pylist()[0]
    assert out["n"] == want["n"]
    assert abs(out["s"] - want["s"]) < 1e-6
    assert abs(out["m"] - want["m"]) < 1e-9
    assert out["lo"] == want["lo"]


def test_code_reduce_pass_through_counts():
    from docetl_ray.stages import code_reduce

    ds = _read("orders", columns=["o_orderstatus", "o_totalprice", "o_orderpriority"])
    out = code_reduce(
        ds,
        ["o_orderstatus"],
        lambda g: {"total": pc.sum(g["o_totalprice"]).as_py()},
        pass_through=True,
        counts_column="_counts_prereduce_reduce",
    )
    t = _to_arrow(out)
    want = _duck(
        "SELECT o_orderstatus, count(*) n, sum(o_totalprice) s FROM orders GROUP BY 1"
    )
    wmap = {r["o_orderstatus"]: r for r in want.to_pylist()}
    assert t.num_rows == want.num_rows
    for r in t.to_pylist():
        w = wmap[r["o_orderstatus"]]
        assert r["_counts_prereduce_reduce"] == w["n"]
        assert abs(r["total"] - w["s"]) < 1e-6
        assert "o_orderpriority" in r  # pass_through extra


def test_broadcast_join_inner():
    from docetl_ray.stages import broadcast_join
    import pyarrow.parquet as pq

    ds = _read("customer", columns=["c_custkey", "c_name", "c_nationkey"])
    nation = pq.read_table(f"{SF}/nation.parquet")
    out = broadcast_join(ds, nation, on="c_nationkey", right_on="n_nationkey", how="inner")
    _cmp(
        out,
        """SELECT c_custkey, c_name, c_nationkey, n_nationkey, n_name, n_regionkey
           FROM customer JOIN nation ON c_nationkey = n_nationkey""",
        ["c_custkey"],
    )


def test_broadcast_semi_anti():
    from docetl_ray.stages import broadcast_join
    import pyarrow.parquet as pq

    ds = _read("customer", columns=["c_custkey", "c_name"])
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey"])
    semi = broadcast_join(ds, orders, on="c_custkey", right_on="o_custkey", how="semi")
    anti = broadcast_join(ds, orders, on="c_custkey", right_on="o_custkey", how="anti")
    _cmp(
        semi,
        """SELECT c_custkey, c_name FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders)""",
        ["c_custkey"],
    )
    _cmp(
        anti,
        """SELECT c_custkey, c_name FROM customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
        ["c_custkey"],
    )


def test_hash_join_large_large():
    from docetl_ray.stages import hash_join

    li = _read("lineitem", columns=["l_orderkey", "l_quantity"])
    orders = _read("orders", columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
    out = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", how="inner",
                    num_buckets=8)
    _cmp(
        out,
        """SELECT l_orderkey, l_quantity, o_orderkey, o_totalprice, o_orderstatus
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
        ["l_orderkey", "l_quantity", "o_totalprice"],
    )


def test_hash_join_collision_suffix():
    import ray.data as rd
    from docetl_ray.stages import hash_join

    l = rd.from_arrow(pa.table({"id": [1, 2], "name": ["a", "b"]}))
    r = rd.from_arrow(pa.table({"id": [1, 2], "name": ["x", "y"]}))
    out = _to_arrow(hash_join(l, r, on="id", how="inner", num_buckets=2))
    assert set(out.column_names) == {"id", "name", "name_right"}


def test_topk_and_stratified():
    from docetl_ray.stages.sample import topk, topk_stratified

    orders = _read("orders", columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
    out = topk(orders, "o_totalprice", 10)
    _cmp(
        out,
        """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
           ORDER BY o_totalprice DESC LIMIT 10""",
        ["o_totalprice"],
    )
    strat = topk_stratified(orders, "o_orderstatus", "o_totalprice", 3)
    _cmp(
        strat,
        """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
           QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice DESC) <= 3""",
        ["o_orderstatus", "o_totalprice"],
    )


def test_sample_uniform_hash_matches_sql():
    from docetl_ray.stages.sample import sample_uniform_hash, hash_threshold_for_frac

    ds = _read("orders", columns=["o_orderkey", "o_totalprice"])
    out = sample_uniform_hash(ds, "o_orderkey", 0.25)
    thr = hash_threshold_for_frac(0.25)
    _cmp(
        out,
        f"""SELECT o_orderkey, o_totalprice FROM orders
            WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) < '{thr}'""",
        ["o_orderkey"],
    )
    n = _to_arrow(out).num_rows
    assert 0.15 * 1500 < n < 0.35 * 1500  # roughly 25%


def test_unnest_list_and_struct():
    import ray.data as rd
    from docetl_ray.stages.unnest_split_gather import unnest

    t = pa.table({"id": [1, 2, 3], "tags": [["a", "b"], [], ["c"]]})
    out = _to_arrow(unnest(rd.from_arrow(t), "tags"))
    assert out.sort_by([("id", "ascending"), ("tags", "ascending")])["tags"].to_pylist() == ["a", "b", "c"]
    out2 = _to_arrow(unnest(rd.from_arrow(t), "tags", keep_empty=True))
    assert out2.num_rows == 4

    s = pa.table(
        {
            "id": [1, 2],
            "user": pa.array(
                [{"name": "x", "age": 3}, {"name": "y", "age": 4}],
                pa.struct({"name": pa.string(), "age": pa.int64()}),
            ),
        }
    )
    out3 = _to_arrow(unnest(rd.from_arrow(s), "user")).sort_by([("id", "ascending")])
    assert out3["name"].to_pylist() == ["x", "y"]
    assert out3["age"].to_pylist() == [3, 4]
    assert "user" in out3.column_names  # key preservation (unnest.py:186-191)


def test_split_then_gather_roundtrip():
    import ray.data as rd
    from docetl_ray.stages.unnest_split_gather import split, gather

    docs = pa.table(
        {"doc": ["para one\n\npara two\n\npara three", "single para"]}
    )
    chunks = split(rd.from_arrow(docs), "doc", name="sp", method="delimiter",
                   delimiter="\n\n")
    ct = _to_arrow(chunks)
    assert ct.num_rows == 4
    assert set(ct.column_names) >= {"doc_chunk", "sp_id", "sp_chunk_num"}
    # ids deterministic: same input -> same id
    ct2 = _to_arrow(split(rd.from_arrow(docs), "doc", name="sp", method="delimiter",
                          delimiter="\n\n"))
    assert sorted(ct["sp_id"].to_pylist()) == sorted(ct2["sp_id"].to_pylist())

    gathered = gather(chunks, "doc_chunk", "sp_id", "sp_chunk_num")
    gt = _to_arrow(gathered).sort_by([("sp_id", "ascending"), ("sp_chunk_num", "ascending")])
    rendered = gt["doc_chunk_rendered"].to_pylist()
    assert all("--- Begin Main Chunk ---" in r for r in rendered)
    three = [r for r in rendered if "para two" in r and "Begin Main" in r.split("para two")[0]]
    assert any("--- Previous Chunk 1 ---" in r for r in rendered)
    assert any("--- Next Chunk" in r for r in rendered)


def test_split_token_count():
    import ray.data as rd
    from docetl_ray.stages.unnest_split_gather import split

    docs = pa.table({"doc": [" ".join(f"w{i}" for i in range(25))]})
    out = _to_arrow(split(rd.from_arrow(docs), "doc", name="sp", method="token_count",
                          token_count=10))
    assert out.num_rows == 3
    assert out["sp_chunk_num"].to_pylist() == [1, 2, 3]
    assert len(out["doc_chunk"].to_pylist()[0].split()) == 10
    assert len(out["doc_chunk"].to_pylist()[2].split()) == 5


def test_dedup_exact():
    from docetl_ray.stages.resolve import dedup_exact

    docs = _read("documents", columns=["doc_id", "text"])
    out = dedup_exact(docs, "text", tiebreak_col="doc_id", keep="min")
    _cmp(
        out,
        "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text",
        ["doc_id"],
    )


def test_resolve_fuzzy_union_find():
    import ray.data as rd
    from docetl_ray.stages.resolve import resolve_fuzzy

    t = pa.table(
        {
            "id": [1, 2, 3, 4, 5],
            "block": ["b1", "b1", "b1", "b2", "b2"],
            "text": [
                "patient takes metformin daily",
                "patient takes metformin every day",
                "completely different sentence entirely",
                "aspirin for headache",
                "aspirin for headaches",
            ],
        }
    )
    out = _to_arrow(
        resolve_fuzzy(
            rd.from_arrow(t), blocking_col="block", text_col="text",
            threshold=0.5, id_col="id",
        )
    ).sort_by([("id", "ascending")])
    canon = out["canonical_id"].to_pylist()
    assert canon[0] == canon[1] == 1  # near-dups cluster to min id
    assert canon[2] == 3  # singleton keeps itself
    assert canon[3] == canon[4] == 4


def test_code_reduce_lineage():
    from docetl_ray.stages import code_reduce

    ds = _read("orders", columns=["o_orderstatus", "o_orderkey", "o_totalprice"])
    out = code_reduce(
        ds,
        ["o_orderstatus"],
        lambda g: {"n": g.num_rows},
        lineage_keys=["o_orderkey"],
        lineage_column="reduce_lineage",
    )
    t = _to_arrow(out)
    for r in t.to_pylist():
        assert len(r["reduce_lineage"]) == r["n"]
        assert all("o_orderkey" in d for d in r["reduce_lineage"])


def test_resolve_fuzzy_overwrite_and_kv_pairs():
    import ray.data as rd
    from docetl_ray.stages.resolve import resolve_fuzzy

    t = pa.table(
        {
            "id": [1, 2],
            "block": ["b", "b"],
            "text": ["patient takes metformin daily", "patient takes metformin every day"],
        }
    )
    out = _to_arrow(
        resolve_fuzzy(
            rd.from_arrow(t), blocking_col="block", text_col="text",
            threshold=0.5, id_col="id",
            overwrite_cols=["text"], kv_pairs_column="_kv_pairs_preresolve_resolve",
        )
    ).sort_by([("id", "ascending")])
    texts = out["text"].to_pylist()
    assert texts[0] == texts[1] == "patient takes metformin daily"  # canonical
    kv = out["_kv_pairs_preresolve_resolve"].to_pylist()
    assert kv[1]["text"] == "patient takes metformin every day"  # original saved


def test_auto_compare_batch_size_matches_reference_formula():
    from docetl_ray.stages.resolve import auto_compare_batch_size

    # m = all pairs of n: discriminant 1, k2 = n+1 (reference takes the
    # larger root, resolve.py:502-511)
    assert auto_compare_batch_size(10, 45) == 11
    # huge pair count -> capped at 500 (the reference's 4o-mini limit)
    assert auto_compare_batch_size(10_000, 10_000 * 9_999 // 2) == 500
    # negative discriminant (inconsistent m) -> cap
    assert auto_compare_batch_size(10, 10**9) == 500
    assert auto_compare_batch_size(2, 1) == 3
