"""Phonetic blocking key (simplified American Soundex).

The classic entity-resolution blocking function: names that sound alike
map to the same 4-char key (first letter + 3 consonant-class digits), so
spelling variants land in one block. The reference blocks with embeddings
only; this is the deterministic lexical blocking key every traditional ER
stack (Fellegi-Sunter, Magellan, Splink) ships.

VARIANT (pinned, both engine and SQL twin): the simplified Soundex without
the H/W-bridging rule — H, W and Y are treated as vowels (class 0), runs
of EQUAL digit classes collapse (including zero runs) over the raw code
string, then the first position is dropped, zeros removed, and the tail
zero-padded to 3. Classic vectors: ROBERT→R163, HONEYMAN→H555,
TYMCZAK→T522; ASHCRAFT gives A226 here (A261 with the full H/W rule).
Non-letters are stripped first; names with no A-Z letters key to ''.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_MAP = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"
)
_NON_AZ = re.compile(r"[^A-Z]")
_RUNS = re.compile(r"(.)\1+")


def soundex(name: str | None) -> str:
    """Simplified Soundex of one string ('' for empty/no-letter input)."""
    u = _NON_AZ.sub("", (name or "").upper())
    if not u:
        return ""
    collapsed = _RUNS.sub(r"\1", u.translate(_MAP))
    tail = collapsed[1:].replace("0", "")
    return u[0] + (tail + "000")[:3]


def soundex_series(values) -> np.ndarray:
    """Vectorized-per-distinct Soundex: factorize first so the scalar
    kernel runs once per DISTINCT name (names repeat heavily in entity
    tables), then broadcast back through the codes."""
    codes, uniq = pd.factorize(
        pd.Series(values, dtype=object), use_na_sentinel=False
    )
    mapped = np.fromiter(
        (soundex(u if u is not None and u == u else None) for u in uniq),
        object,
        len(uniq),
    )
    return mapped[codes]


# DuckDB twin of ``soundex`` — keep in lockstep with the variant above.
# RE2 has no backreferences, so the run collapse is a list lambda over
# the code string's positions. ``{col}`` is the input string expression.
SQL_SOUNDEX_TEMPLATE = """(
    WITH _sx1 AS (
        SELECT regexp_replace(upper(coalesce({col}, '')), '[^A-Z]', '', 'g')
            AS u
    ),
    _sx2 AS (
        SELECT u,
               translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                         '01230120022455012623010202') AS code
        FROM _sx1
    ),
    _sx3 AS (
        SELECT u,
               list_aggregate(
                   list_transform(
                       list_filter(range(1, len(code) + 1),
                                   i -> i = 1 OR code[i] <> code[i-1]),
                       i -> code[i]),
                   'string_agg', '') AS collapsed
        FROM _sx2
    )
    SELECT CASE WHEN u = '' THEN ''
           ELSE substr(u, 1, 1) ||
                substr(rpad(replace(substr(collapsed, 2), '0', ''),
                            3, '0'), 1, 3)
           END
    FROM _sx3
)"""


def sql_soundex_expr(col: str) -> str:
    """DuckDB scalar-subquery expression computing the same key."""
    return SQL_SOUNDEX_TEMPLATE.format(col=col)
