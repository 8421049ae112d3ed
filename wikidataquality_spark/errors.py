"""The ONE error-label convention for total (error-row-emitting) operators.

Every total decode/parse path — media codecs (operators/multimodal.py),
perceptual fingerprints (operators/mediahash.py), WARC ingest (io/warc.py) —
stamps failures with this formatter, so the contract (TypeName: message,
160-char bound, this repo's own ValueError constants rather than stdlib
text that drifts across Python versions) lives in exactly one place, and
both the io and operators layers can import it without depending on each
other."""

from __future__ import annotations


def err_str(e: Exception) -> str:
    return f"{type(e).__name__}: {e}"[:160]
