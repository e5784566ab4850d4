from .broadcast import cached_get, process_embedding_table

__all__ = ["cached_get", "process_embedding_table"]
