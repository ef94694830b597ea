from .flagship import cdc_flagship, wal_from_documents  # noqa: F401
