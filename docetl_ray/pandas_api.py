"""Pandas accessor parity: the reference's ``df.semantic.*`` surface
(``/root/reference/docetl/apis/pd_accessors.py:62-998``) as eager
wrappers over the Ray stage library.

Each call converts the DataFrame to a Ray Dataset, runs the
corresponding stage, and returns a pandas DataFrame (the reference is
likewise eager, executing on ``df.to_dict("records")``).  Op history is
recorded on the accessor (``pd_accessors.py:102-147``).

Usage::

    import docetl_ray.pandas_api  # registers the accessor
    df.semantic.map(code="def transform(doc): ...")
    df.semantic.agg(reduce_key="k", code="def transform(rows): ...")
"""

from __future__ import annotations

import pandas as pd


def _to_ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df.reset_index(drop=True))


def _to_df(ds) -> pd.DataFrame:
    from .util import collect

    return collect(ds).to_pandas()


@pd.api.extensions.register_dataframe_accessor("semantic")
class SemanticAccessor:
    def __init__(self, df: pd.DataFrame):
        self._df = df
        # pandas builds a FRESH accessor per df.semantic access, so
        # history must live on the DataFrame itself (df.attrs survives
        # across accesses and shallow copies) — pd_accessors.py:102-147
        self.history: list[dict] = df.attrs.setdefault("_docetl_history", [])

    def _record(self, op: str, **kw):
        self.history.append({"op": op, **kw})

    def map(self, *, code: str | None = None, prompt: str | None = None,
            output_schema: dict | None = None, drop_keys=None) -> pd.DataFrame:
        from .runner import _apply_op

        op = {"name": "map", "type": "code_map" if code else "map"}
        if code:
            op["code"] = code
        else:
            op["prompt"] = prompt
            op["output"] = {"schema": output_schema or {}}
        if drop_keys:
            op["drop_keys"] = list(drop_keys)
        self._record("map", code=bool(code))
        return _to_df(_apply_op(_to_ds(self._df), op))

    def filter(self, *, code: str | None = None, prompt: str | None = None) -> pd.DataFrame:
        from .runner import _apply_op

        op = {"name": "filter", "type": "code_filter" if code else "filter"}
        if code:
            op["code"] = code
        else:
            op["prompt"] = prompt
        self._record("filter", code=bool(code))
        return _to_df(_apply_op(_to_ds(self._df), op))

    def agg(self, *, reduce_key, code: str | None = None, prompt: str | None = None,
            output_schema: dict | None = None) -> pd.DataFrame:
        from .runner import _apply_op

        op = {"name": "agg", "type": "code_reduce" if code else "reduce",
              "reduce_key": reduce_key}
        if code:
            op["code"] = code
        else:
            op["prompt"] = prompt
            op["output"] = {"schema": output_schema or {}}
        self._record("agg", reduce_key=reduce_key)
        return _to_df(_apply_op(_to_ds(self._df), op))

    def merge(self, right: pd.DataFrame, *, on, right_on=None, how: str = "inner") -> pd.DataFrame:
        from .stages.joins import broadcast_join

        self._record("merge", on=on, how=how)
        return _to_df(broadcast_join(_to_ds(self._df), right, on=on,
                                     right_on=right_on, how=how))

    def split(self, *, split_key: str, method: str = "token_count", **kwargs) -> pd.DataFrame:
        from .stages.unnest_split_gather import split

        self._record("split", split_key=split_key)
        return _to_df(split(_to_ds(self._df), split_key, method=method, **kwargs))

    def gather(self, *, content_key: str, doc_id_key: str, order_key: str, **kwargs) -> pd.DataFrame:
        from .stages.unnest_split_gather import gather

        self._record("gather", content_key=content_key)
        return _to_df(gather(_to_ds(self._df), content_key, doc_id_key, order_key, **kwargs))

    def unnest(self, *, unnest_key: str, keep_empty: bool = False) -> pd.DataFrame:
        from .stages.unnest_split_gather import unnest

        self._record("unnest", unnest_key=unnest_key)
        return _to_df(unnest(_to_ds(self._df), unnest_key, keep_empty=keep_empty))
