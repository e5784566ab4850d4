"""basic_english tokenizer, re-implemented from its public semantics.

The reference tokenizes every tuple string with torchtext's
``get_tokenizer("basic_english")`` (/root/reference/tuple_embedding_models.py:47,89,203).
torchtext is not a dependency of this engine; the normalization rules are
public and tiny: lowercase, then a fixed ordered list of regex substitutions
(apostrophe split, quote removal, punctuation padding), then whitespace split.

This module is the vocabulary definition for every embedding stage, so the
rules must stay byte-stable; they are pinned by tests/test_tokenizer.py.
"""

from __future__ import annotations

import re

# (pattern, replacement) applied IN ORDER after lowercasing.
_RULES: list[tuple[re.Pattern[str], str]] = [
    (re.compile(r"\'"), " ' "),
    (re.compile(r"\""), ""),
    (re.compile(r"\."), " . "),
    (re.compile(r"<br \/>"), " "),
    (re.compile(r","), " , "),
    (re.compile(r"\("), " ( "),
    (re.compile(r"\)"), " ) "),
    (re.compile(r"\!"), " ! "),
    (re.compile(r"\?"), " ? "),
    (re.compile(r"\;"), " "),
    (re.compile(r"\:"), " "),
    (re.compile(r"\s+"), " "),
]


def tokenize(text: str) -> list[str]:
    """basic_english tokenization of one string."""
    line = text.lower()
    for pattern, repl in _RULES:
        line = pattern.sub(repl, line)
    return line.split()


def tokenize_many(texts) -> list[list[str]]:
    """Tokenize an iterable of strings (None → empty list)."""
    return [tokenize(t) if t is not None else [] for t in texts]


# DuckDB-SQL equivalent of ``tokenize`` — used by __ray_entry__.oracle_sql so
# the driver can cross-check token-level operators. Keep in lockstep with
# _RULES. ``{col}`` is the input string expression.
SQL_NORMALIZE_TEMPLATE = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace("
    "lower({col}),"
    " '''', ' '' ', 'g'),"            # \'  -> " ' "
    " '\"', '', 'g'),"                 # \"  -> ""
    " '\\.', ' . ', 'g'),"             # .   -> " . "
    " '<br \\/>', ' ', 'g'),"          # <br \/> -> " "
    " ',', ' , ', 'g'),"               # ,
    " '\\(', ' ( ', 'g'),"             # (
    " '\\)', ' ) ', 'g'),"             # )
    " '!', ' ! ', 'g'),"               # !
    " '\\?', ' ? ', 'g'),"             # ?
    " '[;:]', ' ', 'g'),"              # ; and :
    " '\\s+', ' ', 'g')"               # whitespace collapse
)


def sql_tokens_expr(col: str) -> str:
    """DuckDB expression producing the token list for a string column."""
    norm = SQL_NORMALIZE_TEMPLATE.format(col=col)
    return (
        "list_filter(string_split(trim(" + norm + "), ' '), t -> t <> '')"
    )
