"""Schema DSL, rate limiter, observability, skip_on_error tests."""

import time

import pyarrow as pa
import pytest

from docetl_ray.schemas import dsl_schema, dsl_to_arrow, enum_values, unify_tables


def test_dsl_scalars_and_aliases():
    assert dsl_to_arrow("str") == pa.string()
    assert dsl_to_arrow("varchar") == pa.string()
    assert dsl_to_arrow("int") == pa.int64()
    assert dsl_to_arrow("number") == pa.float64()
    assert dsl_to_arrow("boolean") == pa.bool_()


def test_dsl_enum_list_struct():
    assert pa.types.is_dictionary(dsl_to_arrow("enum[a, b, c]"))
    assert enum_values("enum[a, b, c]") == ["a", "b", "c"]
    assert dsl_to_arrow("list[int]") == pa.list_(pa.int64())
    assert dsl_to_arrow("list[list[str]]") == pa.list_(pa.list_(pa.string()))
    st = dsl_to_arrow("{name: str, age: int, tags: list[str]}")
    assert pa.types.is_struct(st)
    assert st.field("age").type == pa.int64()
    nested = dsl_to_arrow({"user": {"name": "str"}, "score": "float"})
    assert nested.field("user").type.field("name").type == pa.string()


def test_dsl_schema_and_errors():
    s = dsl_schema({"a": "int", "b": "list[float]"})
    assert s.field("b").type == pa.list_(pa.float64())
    with pytest.raises(ValueError):
        dsl_to_arrow("frobnicate")


def test_unify_tables_promotes():
    a = pa.table({"x": pa.array([1], pa.int32())})
    b = pa.table({"x": pa.array([2], pa.int64()), "y": ["s"]})
    u = unify_tables([a, b])
    assert u.schema.field("x").type == pa.int64()
    assert u["y"].to_pylist() == [None, "s"]


def test_token_bucket():
    from docetl_ray.ratelimiter import TokenBucket

    b = TokenBucket(rate=1000, capacity=2)
    assert b.try_acquire() and b.try_acquire()
    assert not b.try_acquire()  # burst exhausted
    t0 = time.monotonic()
    assert b.acquire(1, timeout=1.0)  # refills at 1000/s -> ~1ms
    assert time.monotonic() - t0 < 0.5


def test_shared_limiter_actor():
    from docetl_ray.ratelimiter import shared_limiter
    import ray

    lim = shared_limiter("test-limiter", rate=10_000, capacity=5)
    assert ray.get(lim.try_acquire.remote())
    # second handle resolves to the same named actor
    lim2 = shared_limiter("test-limiter", rate=1, capacity=1)
    got = [ray.get(lim2.try_acquire.remote()) for _ in range(10)]
    assert any(got)  # shared bucket, high rate from first creation
    ray.kill(ray.get_actor("test-limiter"))


def test_llm_observability_column():
    import ray.data as rd

    from docetl_ray.stages.llm import llm_map
    from docetl_ray.util import collect

    t = pa.table({"text": ["x", "y"]})
    out = collect(
        llm_map(rd.from_arrow(t), "P {{ input.text }}", {"v": "int"},
                observability=True, op_name="myop", concurrency=1)
    )
    col = out["_observability_myop"].to_pylist()
    assert all("P x" in c or "P y" in c for c in col)


def test_code_map_skip_on_error():
    import ray.data as rd

    from docetl_ray.runner import _apply_op
    from docetl_ray.util import collect

    ds = rd.from_items([{"x": 1}, {"x": 0}, {"x": 2}])
    op = {
        "name": "inv", "type": "code_map", "on_error": "skip",
        "code": "def transform(doc):\n    return {'inv': 1.0 / doc['x']}\n",
    }
    out = collect(_apply_op(ds, op))
    assert sorted(out["x"].to_pylist()) == [1, 2]  # the x=0 row skipped
    # without skip the error propagates
    op2 = dict(op)
    op2.pop("on_error")
    with pytest.raises(Exception):
        collect(_apply_op(ds, op2))
