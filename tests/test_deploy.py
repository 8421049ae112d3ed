"""Packaging: the --py-files zip must carry code AND frozen model artifacts."""

from __future__ import annotations

import zipfile

from wikidataquality_spark.deploy import package_zip


def test_zip_contains_models_and_code():
    names = set(zipfile.ZipFile(package_zip()).namelist())
    assert "wikidataquality_spark/operators/enrich.py" in names
    assert "wikidataquality_spark/models/bigram_lm_v2.npz" in names
    assert "wikidataquality_spark/models/langid_ngram_v1.npz" in names
    # no bytecode/junk
    assert not any(n.endswith(".pyc") for n in names)


def test_model_loads_from_zip_bytes():
    """The pkgutil branch of _open_model: load the LM straight from the zip
    blob (what a worker does when the package is only on sys.path as a zip)."""
    import io

    import numpy as np

    blob = zipfile.ZipFile(package_zip()).read(
        "wikidataquality_spark/models/bigram_lm_v2.npz"
    )
    z = np.load(io.BytesIO(blob), allow_pickle=True)
    assert len(z["vocab"]) > 1000 and len(z["bigram_keys"]) > 1000
