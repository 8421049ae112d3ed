"""Frozen-model artifact loading — the ONE dir-or-zip resolver.

Workers import the package from sc.addPyFile's zip (deploy.ensure_shipped /
spark-submit --py-files), where model .npz files are zip members, not
filesystem paths; on the driver (or a checked-out repo) they are plain
files. Both operators that ship frozen artifacts (perplexity's bigram LM,
langid_ngram's trigram scorer) previously carried identical copies of this
fallback logic — a packaging-path fix applied to one copy would leave the
other broken on workers (r04 review)."""

from __future__ import annotations

import io
import os
import pkgutil

import numpy as np

_MODELS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "models")


def open_model(filename: str):
    """np.load the artifact whether the package is a directory or a zip
    (pkgutil reads through zipimport)."""
    path = os.path.join(_MODELS_DIR, filename)
    if os.path.exists(path):
        return np.load(path, allow_pickle=True)
    blob = pkgutil.get_data("wikidataquality_spark", f"models/{filename}")
    if blob is None:
        raise FileNotFoundError(f"model artifact {filename} not packaged")
    return np.load(io.BytesIO(blob), allow_pickle=True)
