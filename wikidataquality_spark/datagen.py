"""Deterministic synthesis of the `pages` input table (BASELINE.json:15 shape).

Schema: (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
— Common-Crawl-style web pages with planted defects so every pipeline rule has
work to do (FIXTURES.md §2):

  - hosts Zipf-distributed (host index 0 is hot → exercises salting/AQE skew)
  - language-specific prose from per-language wordlists (langid has signal)
  - PII tokens: emails, phone numbers, IPv4s (scrub targets)
  - blocklisted words (toxicity conflicts_with)
  - too-short / too-long docs, high-symbol docs, repeated-line docs
  - exact duplicates and near-duplicates of earlier docs (dedup targets)
  - gibberish docs (perplexity target) and wrong `lang` claims (langid target)

Everything is seeded (seed=42, numpy Generator) and version-frozen: the golden
keep/drop + scrubbed fixtures are derived from this corpus, so any change here
is a fixture-breaking change (SURVEY.md §7 "What's hard" #1/#2).

Parity note: this plays the role of the reference's external test dumps
imported by ref≈maintenance/UpdateExternalData.php:~20-150 — a frozen corpus
with known-good expected outcomes.
"""

from __future__ import annotations

import html as html_mod
import os

import numpy as np
import pandas as pd

SEED = 42

# bump when generate_pages / generate_pages_with_meta output changes — the
# shared /tmp corpus caches are keyed by this, so stale fixtures MISS instead
# of silently validating old datagen output (write_pages_parquet skips
# generation when the file exists).
# v2: exact_dup pages stay byte-exact (no post-copy PII/blockword injection)
#     and dup pages' true_lang follows the copied SOURCE text — the v1
#     labels poisoned ~10% of langid training rows and falsified ~22% of
#     exact_dup planted-truth labels.
DATAGEN_VERSION = 2


def fixture_pages_path(
    n_rows: int, seed: int = SEED, base: str | None = None
) -> str:
    """Shared cross-run corpus cache, content-keyed by (n, seed, generator
    version). Every consumer of the fixed corpus cache (golden gates,
    property tests, the qf_golden_confusion driver query, make_goldens) must
    come through here so they stay in lockstep when DATAGEN_VERSION bumps.

    Default root is the per-uid 0o700 cache dir, NOT bare /tmp: this cache
    feeds every correctness gate, and a world-shared path lets another local
    uid pre-plant a poisoned fixture parquet that the gates then trust
    (r04 review — same discipline as the media/centroid/pyfiles caches)."""
    if base is None:
        from wikidataquality_spark.io.locking import user_cache_root

        base = user_cache_root("wdq_pages_fixture")
    return write_pages_parquet(
        os.path.join(base, f"pages_{n_rows}_{seed}_v{DATAGEN_VERSION}.parquet"),
        n_rows,
        seed,
    )

# Per-language wordlists: ~30 common words each so language ID has real signal.
WORDLISTS: dict[str, list[str]] = {
    "en": "the of and to in is was for on with as by at from that it he she they this have had not are were which".split(),
    "fr": "le la les de des et un une dans est pour que qui sur avec par il elle nous vous sont était cette mais comme".split(),
    "es": "el la los las de y un una en es para que por con del se no más como pero sus fue este había son".split(),
    "de": "der die das und zu in ist von mit für auf den dem ein eine nicht als auch es sich bei wurde sind oder aber".split(),
    "zh": list("的一是了我不人在他有这个上们来到时大地为子中你说生国年着就那和要她出也得里后自以会"),
}
LANGS = tuple(WORDLISTS)

# Content words shared across latin-script languages (topic vocabulary).
TOPIC_WORDS = (
    "data web page crawl index filter quality spark table column batch stream "
    "model language text token document corpus pipeline shuffle partition "
    "network server client cache memory disk graph node edge vector"
).split()

BLOCKWORDS = ("badword", "toxicword", "slurword")

HOSTS_N = 40


def _host(rng: np.random.Generator) -> str:
    # Zipf over hosts: host0 receives ~25-30% of pages (the hot key).
    z = min(int(rng.zipf(1.6)) - 1, HOSTS_N - 1)
    return f"host{z}.example.org"


def _sentence(rng: np.random.Generator, lang: str, n: int) -> str:
    fn = WORDLISTS[lang]
    out = []
    for _ in range(n):
        if lang == "zh":
            out.append("".join(rng.choice(fn, size=3)))
        elif rng.random() < 0.45:
            out.append(str(rng.choice(fn)))
        else:
            out.append(str(rng.choice(TOPIC_WORDS)))
    return " ".join(out)


def _gibberish(rng: np.random.Generator, n: int) -> str:
    toks = []
    for _ in range(n):
        ln = rng.integers(4, 12)
        toks.append("".join(rng.choice(list("bcdfghjklmnpqrstvwxz"), size=ln)))
    return " ".join(toks)


def _pii(rng: np.random.Generator) -> str:
    kind = rng.integers(0, 3)
    if kind == 0:
        return f"user{rng.integers(1, 999)}@mail{rng.integers(1, 99)}.com"
    if kind == 1:
        return f"+1-{rng.integers(200, 999)}-{rng.integers(200, 999)}-{rng.integers(1000, 9999)}"
    return f"{rng.integers(1, 255)}.{rng.integers(0, 255)}.{rng.integers(0, 255)}.{rng.integers(1, 255)}"


def render_html(text: str) -> bytes:
    """Deterministic page template. extract_text() inverts it byte-exactly."""
    body = html_mod.escape(text, quote=False)
    return (
        "<html><head><title>page</title></head><body>"
        "<nav>home | about | login</nav>"
        f"<main>{body}</main>"
        "<footer>© example</footer></body></html>"
    ).encode("utf-8")


def generate_pages(n_rows: int, seed: int = SEED) -> pd.DataFrame:
    """Build the pages corpus as pandas (driver-side; test scale only —
    at production scale this table *is* the input, not something we make).
    Output columns are EXACTLY the input contract (url, warc_ts, html, text,
    lang) — BASELINE.json:15."""
    return generate_pages_with_meta(n_rows, seed)[
        ["url", "warc_ts", "html", "text", "lang"]
    ]


def generate_pages_with_meta(n_rows: int, seed: int = SEED) -> pd.DataFrame:
    """Same corpus + ground-truth columns (true_lang, defect) for model
    training / evaluation (tools/train_langid.py). Identical RNG sequence to
    generate_pages — the extra columns are recorded, never drawn."""
    rng = np.random.default_rng(seed)
    rows: list[dict] = []
    texts: list[str] = []
    true_langs: list[str] = []

    for i in range(n_rows):
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        defect = rng.random()
        n_sent = int(rng.integers(4, 10))
        sents = [_sentence(rng, lang, int(rng.integers(8, 18))) for _ in range(n_sent)]

        defect_kind = "none"
        if defect < 0.06 and i > 10:
            # exact duplicate of an earlier page — the COPY's ground truth is
            # the source page's language (the drawn `lang` is wrong with
            # p=4/5 and was poisoning ~10% of langid training labels), and
            # the copy must stay byte-exact: PII/blockword injection below is
            # skipped, else ~22% of 'exact_dup'-labeled pages weren't dups
            defect_kind = "exact_dup"
            j = int(rng.integers(0, i))
            text = texts[j]
            lang = true_langs[j]
        elif defect < 0.12 and i > 10:
            # near duplicate: copy an earlier page, perturb one sentence.
            # Ground truth follows the SOURCE page (majority of the text).
            defect_kind = "near_dup"
            j = int(rng.integers(0, i))
            src = texts[j]
            lines = src.split("\n")
            lines[int(rng.integers(0, len(lines)))] = _sentence(rng, lang, 10)
            text = "\n".join(lines)
            lang = true_langs[j]
        elif defect < 0.18:
            # gibberish (high perplexity)
            defect_kind = "gibberish"
            text = "\n".join(_gibberish(rng, int(rng.integers(10, 20))) for _ in range(3))
        elif defect < 0.24:
            # repeated-line page (boilerplate spam)
            defect_kind = "repeated_lines"
            line = sents[0]
            text = "\n".join([line] * int(rng.integers(5, 9)))
        elif defect < 0.28:
            # too short
            defect_kind = "too_short"
            text = _sentence(rng, lang, int(rng.integers(1, 4)))
        elif defect < 0.32:
            # high symbol ratio
            defect_kind = "symbol_spam"
            text = "\n".join(
                s + " " + "".join(rng.choice(list("!@#$%^&*()[]{}<>"), size=30))
                for s in sents[:3]
            )
        else:
            text = "\n".join(sents)

        # PII / blockword injection (orthogonal to other defects) — but never
        # into an exact_dup page: mutating the copy would falsify its label.
        # The rng.random() draws still happen so the stream position advances
        # uniformly whether or not the page is a dup.
        if rng.random() < 0.15 and defect_kind != "exact_dup":
            words = text.split(" ")
            pos = int(rng.integers(0, len(words)))
            words.insert(pos, _pii(rng))
            text = " ".join(words)
        if rng.random() < 0.08 and defect_kind != "exact_dup":
            words = text.split(" ")
            pos = int(rng.integers(0, len(words)))
            words.insert(pos, str(rng.choice(list(BLOCKWORDS))))
            text = " ".join(words)

        claimed_lang = lang if rng.random() > 0.07 else LANGS[int(rng.integers(0, len(LANGS)))]
        host = _host(rng)
        rows.append(
            {
                "url": f"https://{host}/p/{i:07d}",
                "warc_ts": pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=97 * i),
                "html": render_html(text),
                "text": text,
                "lang": claimed_lang,
                "true_lang": lang,
                "defect": defect_kind,
            }
        )
        texts.append(text)
        true_langs.append(lang)

    return pd.DataFrame(rows)


def write_pages_parquet(path: str, n_rows: int, seed: int = SEED) -> str:
    """Materialize the corpus to parquet — write-once and crash/concurrency
    safe. Every correctness gate (golden confusion, property tests, stream
    corpus, make_goldens) trusts this shared cross-session cache, so it gets
    the same staged-rename + flock publish as the media cache (r03 ADVICE:
    a crashed writer used to leave a partial file at the final path that the
    exists() fast-path then trusted forever)."""
    from wikidataquality_spark.io.locking import publish_file

    def write(staging: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = generate_pages(n_rows, seed)
        schema = pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("warc_ts", pa.timestamp("us")),
                pa.field("html", pa.binary()),
                pa.field("text", pa.string()),
                pa.field("lang", pa.string()),
            ]
        )
        pq.write_table(pa.Table.from_pandas(pdf, schema=schema), staging)

    return publish_file(path, write)
