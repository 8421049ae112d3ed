"""HTML → text extraction stage (SURVEY.md §2B "Extract").

Vectorized pandas UDF over Arrow batches (BASELINE.json:15: no per-row
Python in the Spark row path — the work happens on whole pandas Series
inside the Python worker).

The extractor is deterministic and versioned: byte-identical text per url is
a hard invariant (BASELINE.json:15), so there is no heuristic readability
scoring here — a fixed grammar (main-content element, entity unescape,
whitespace preserved exactly). Real-world swap-in (trafilatura etc.) must
keep the same signature + determinism contract.
"""

from __future__ import annotations

import html as html_mod
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTOR_VERSION = "1"

_MAIN_RE = re.compile(r"<main>(.*?)</main>", re.DOTALL)


def extract_text_series(html_bytes: pd.Series) -> pd.Series:
    """Pure-pandas extraction: decode → main-content slice → unescape."""
    s = html_bytes.map(lambda b: b.decode("utf-8", "replace") if b is not None else None)
    s = s.str.extract(_MAIN_RE, expand=False)
    # str.extract yields NaN (float) for null html or no <main> — emit NULL text
    return s.map(lambda x: html_mod.unescape(x) if isinstance(x, str) else None)


@F.pandas_udf(T.StringType())
def extract_text_udf(html_bytes: pd.Series) -> pd.Series:
    return extract_text_series(html_bytes)


def extracted_text(html_col: str | Column = "html") -> Column:
    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return extract_text_udf(col)
