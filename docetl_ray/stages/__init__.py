"""Operator library: DocETL's operator inventory (SURVEY.md §2)
re-expressed as composable Ray Data stage functions.

Every stage takes and returns a ``ray.data.Dataset`` (lazy, streaming) and
is vectorized over Arrow batches; stateful stages are callable classes run
as actor pools via ``map_batches(Cls, concurrency=...)``.
"""

from .maps import code_map, code_filter, parallel_map, drop_keys, add_hash_id  # noqa: F401
from .reduces import code_reduce, grouped_aggregate, global_aggregate  # noqa: F401
from .joins import broadcast_join, hash_join  # noqa: F401
from .grouped import grouped_map  # noqa: F401
from .util_ray import exchange_map_groups  # noqa: F401
