"""docetl_ray — a Ray-Data-native data-processing / CDC-ingest engine.

A from-scratch engine with the query and data-processing capabilities of
the reference DocETL system (SiriusHsh/docetl), re-expressed Ray-Data-first:
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages, ``groupby``/``sort``/``repartition``
for the wide steps, and a CDC apply layer (WAL tail -> keyed LWW upsert ->
exactly-once partitioned Parquet sink with manifest-based checkpoints).

Nothing here calls ``ray.init()`` — the host (driver, bench.py, tests)
owns the Ray session.
"""

__version__ = "0.1.0"
