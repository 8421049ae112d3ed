"""Shared batch tokenization for the model stages.

One lower+split+explode per Arrow batch, reused by language ID and
perplexity (operators/langid.py, operators/perplexity.py, fused in
operators/enrich.py) so the text is tokenized exactly once per batch.

CJK handling: scripts without whitespace word boundaries are split to
character unigrams first (space-injection) — applied ONLY to rows that
contain CJK (the regex rewrite is the expensive part, and most web text is
not CJK). 'Tokens' are words for latin scripts, characters for CJK.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd

# The ONE definition of "CJK" for the whole engine: the langid zh override
# (langid._CJK_RE) and the space-injection table below both derive from this
# range — extending coverage (e.g. Extension A) in one place but not the
# other would classify a doc as zh while still tokenizing it as one giant
# word (n_words=1, mean_word_len huge), silently breaking the stats the
# space-injection exists to provide (r04 review).
CJK_LO, CJK_HI = 0x4E00, 0x9FFF  # CJK Unified Ideographs
CJK_RE = rf"[{chr(CJK_LO)}-{chr(CJK_HI)}]"
# str.translate table: every CJK codepoint → " <char> " (C-speed per-char
# splitting; a capture-group regexp_replace measured ~10× slower)
_CJK_TABLE = {c: f" {chr(c)} " for c in range(CJK_LO, CJK_HI + 1)}


class Tokenized(NamedTuple):
    tokens: pd.Series  # list[str] per row
    exploded: pd.Series  # one token per row, original index preserved
    n_tokens: pd.Series  # int per row (≥1 to avoid div-by-zero)
    codes: np.ndarray  # positional row id (0..n-1) per exploded token
    n_rows: int


def tokenize(texts: pd.Series) -> Tokenized:
    filled = texts.fillna("")
    norm = filled.str.lower()
    has_cjk = filled.str.contains(CJK_RE, regex=True)
    if has_cjk.any():
        norm = norm.copy()
        norm.loc[has_cjk] = norm.loc[has_cjk].map(lambda s: s.translate(_CJK_TABLE))
    tokens = norm.str.split()
    lens = tokens.str.len().to_numpy()
    exploded = tokens.explode()
    exploded = exploded[exploded.notna()]
    codes = np.repeat(np.arange(len(texts)), lens)
    n_tokens = pd.Series(lens, index=texts.index).clip(lower=1)
    return Tokenized(tokens, exploded, n_tokens, codes, len(texts))
