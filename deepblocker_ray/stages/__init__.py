from .canonicalize import CANONICAL_SCHEMA, bucket_of, canonicalize

__all__ = ["CANONICAL_SCHEMA", "bucket_of", "canonicalize"]
