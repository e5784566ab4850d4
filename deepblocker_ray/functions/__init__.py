from .hash_embedding import HashEmbedding, mean_pool_embed
from .textsim import cosine, jaro, jaro_winkler, levenshtein, levenshtein_ratio
from .tokenizer import sql_tokens_expr, tokenize, tokenize_many

__all__ = [
    "HashEmbedding",
    "mean_pool_embed",
    "cosine",
    "jaro",
    "jaro_winkler",
    "levenshtein",
    "levenshtein_ratio",
    "sql_tokens_expr",
    "tokenize",
    "tokenize_many",
]
