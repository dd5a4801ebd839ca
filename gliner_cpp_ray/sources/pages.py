"""Synthetic Common-Crawl-style ``pages`` corpus (deterministic, seeded).

Emits the exact input_hint schema (BASELINE.json:15):
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``
where ``text`` is the ground-truth extraction target — the HTML→text
stage must reproduce it byte-identically per url.

Every page is a pure function of ``(seed, page_index)``, so:
* generation can run distributed (Ray ``range → map_batches →
  write_parquet``) or driver-side, with identical content;
* the *expected* KG triples are computable in closed form at generation
  time (the generator knows which relation sentences it injected) and
  are written alongside as ``expected_triples`` — the pipeline must
  rediscover them from HTML alone.  This is the P/R parity target.

Row-size skew is built in (FIXTURES.md F1): a small fraction of pages
repeat their body 100-300x, exercising byte-size repartitioning.
"""

from __future__ import annotations

import os
from html import escape

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gliner_cpp_ray.sources import world
from gliner_cpp_ray.stages.html_to_text import doc_id_of, normalize_text

_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

EXPECTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("subj_canon", pa.string()),
        ("obj_canon", pa.string()),
        ("subj_label", pa.string()),
        ("obj_label", pa.string()),
    ]
)

_LANGS = ["en", "de", "uk", "zh", "es"]
_LANG_P = [0.80, 0.05, 0.05, 0.05, 0.05]

_CAPITAL_CITIES = sorted(world.CAPITALS)
_ALL_CITIES = sorted(world.CITIES)
_ALL_PEOPLE = sorted(world.PEOPLE)
_ALL_ORGS = sorted(world.ORGS)
_PREDS = sorted(world.RELATIONS)


def _surface(rng: np.random.Generator, canon: str, aliases: list[str]) -> str:
    opts = world.written_surfaces(canon, aliases)
    if len(opts) > 1 and rng.random() < 0.3:
        return opts[int(rng.integers(1, len(opts)))]
    return opts[0]


def _relation_sentence(rng: np.random.Generator):
    """Returns (sentence, record) where record matches EXPECTED_SCHEMA tail."""
    pred = _PREDS[int(rng.integers(0, len(_PREDS)))]
    subj_label, connective, obj_label = world.RELATIONS[pred]
    if pred == "capital_of":
        c = _CAPITAL_CITIES[int(rng.integers(0, len(_CAPITAL_CITIES)))]
        country, c_alias = world.CITIES[c]
        s = _surface(rng, c, c_alias)
        o = _surface(rng, country, world.COUNTRIES[country])
        sc, oc = c, country
    elif pred == "located_in":
        c = _ALL_CITIES[int(rng.integers(0, len(_ALL_CITIES)))]
        country, c_alias = world.CITIES[c]
        s = _surface(rng, c, c_alias)
        o = _surface(rng, country, world.COUNTRIES[country])
        sc, oc = c, country
    elif pred == "born_in":
        p = _ALL_PEOPLE[int(rng.integers(0, len(_ALL_PEOPLE)))]
        city, p_alias = world.PEOPLE[p]
        s = _surface(rng, p, p_alias)
        o = _surface(rng, city, world.CITIES[city][1])
        sc, oc = p, city
    elif pred == "headquartered_in":
        g = _ALL_ORGS[int(rng.integers(0, len(_ALL_ORGS)))]
        city, g_alias = world.ORGS[g]
        s = _surface(rng, g, g_alias)
        o = _surface(rng, city, world.CITIES[city][1])
        sc, oc = g, city
    else:  # acquired
        a, b = world.ACQUISITIONS[int(rng.integers(0, len(world.ACQUISITIONS)))]
        s = _surface(rng, a, world.ORGS[a][1])
        o = _surface(rng, b, world.ORGS[b][1])
        sc, oc = a, b
    sentence = s + connective + o + "."
    return sentence, (s, pred, o, sc, oc, subj_label, obj_label)


def _mention_sentence(rng: np.random.Generator) -> str:
    tmpl, label, kind = world.MENTION_ONLY_TEMPLATES[
        int(rng.integers(0, len(world.MENTION_ONLY_TEMPLATES)))
    ]
    if kind == "city":
        c = _ALL_CITIES[int(rng.integers(0, len(_ALL_CITIES)))]
        s = _surface(rng, c, world.CITIES[c][1])
    elif kind == "person":
        p = _ALL_PEOPLE[int(rng.integers(0, len(_ALL_PEOPLE)))]
        s = _surface(rng, p, world.PEOPLE[p][1])
    elif kind == "org":
        g = _ALL_ORGS[int(rng.integers(0, len(_ALL_ORGS)))]
        s = _surface(rng, g, world.ORGS[g][1])
    else:
        c = sorted(world.COUNTRIES)[int(rng.integers(0, len(world.COUNTRIES)))]
        s = _surface(rng, c, world.COUNTRIES[c])
    return tmpl.format(**{kind: s})


def _filler_sentence(rng: np.random.Generator, lang: str) -> str:
    pool = world.FILLER_EN if lang == "en" else world.FILLER_BY_LANG[lang]
    n = int(rng.integers(4, 12))
    idx = rng.integers(0, len(pool), size=n)
    return " ".join(pool[j] for j in idx) + "."


def _page_plan(i: int, seed: int):
    """Deterministic plan: (lang, title, paragraphs, records, repeat)."""
    rng = np.random.default_rng([seed, i])
    lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_P))]
    title = f"Crawl page {i}"
    paragraphs: list[str] = []
    records: list[tuple] = []
    n_para = int(rng.integers(2, 6))
    for _ in range(n_para):
        sents: list[str] = []
        for _ in range(int(rng.integers(1, 5))):
            u = rng.random()
            if lang == "en" and u < 0.35:
                sent, rec = _relation_sentence(rng)
                sents.append(sent)
                records.append(rec)
            elif lang == "en" and u < 0.55:
                sents.append(_mention_sentence(rng))
            else:
                sents.append(_filler_sentence(rng, lang))
        paragraphs.append(" ".join(sents))
    repeat = 1
    if rng.random() < 0.005:  # long-tail skew: html 100-300x median
        repeat = int(rng.integers(100, 301))
    return lang, title, paragraphs, records, repeat


def _render_html(rng: np.random.Generator, title: str, paragraphs: list[str]) -> str:
    parts = [
        "<!DOCTYPE html>\n<html><head><title>", escape(title, quote=False),
        "</title>\n<style>body { font: 14px sans-serif; }</style>\n",
        "<script>var tracker = 1 < 2;</script></head>\n<body>\n",
        '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>\n',
        "<!-- crawler boilerplate -->\n<main>\n<h1>",
        escape(title, quote=False), "</h1>\n",
    ]
    for para in paragraphs:
        body = escape(para, quote=False)
        style = rng.random()
        if style < 0.25:  # inline markup around the first word
            head, _, tail = body.partition(" ")
            body = "<b>" + head + "</b> " + tail if tail else "<b>" + body + "</b>"
            parts.append("<p>" + body + "</p>\n")
        elif style < 0.35:  # malformed: unclosed <p>
            parts.append("<p>" + body + "\n")
        elif style < 0.45:  # div + <br>
            parts.append("<div>" + body + "<br></div>\n")
        else:
            parts.append("<p>" + body + "</p>\n")
    parts.append("</main>\n<footer>&copy; 2024 crawler corp</footer>\n</body></html>")
    return "".join(parts)


def make_page_batch(indices: np.ndarray, seed: int) -> pa.Table:
    urls, ts, htmls, texts, langs = [], [], [], [], []
    for i in map(int, indices):
        lang, title, paragraphs, _, repeat = _page_plan(i, seed)
        body_paras = paragraphs * repeat
        rng = np.random.default_rng([seed, i, 1])  # render-only randomness
        html = _render_html(rng, title, body_paras)
        text = normalize_text(title + "\n" + "\n".join(body_paras))
        urls.append(f"https://example.org/p/{i:08d}")
        ts.append(_EPOCH_2024_US + i * 1_000_000)
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def make_expected_batch(indices: np.ndarray, seed: int) -> pa.Table:
    cols: dict[str, list] = {f.name: [] for f in EXPECTED_SCHEMA}
    for i in map(int, indices):
        lang, _, _, records, repeat = _page_plan(i, seed)
        if lang != "en" or not records:
            continue  # pipeline filters to the 'en' allowlist
        url = f"https://example.org/p/{i:08d}"
        did = doc_id_of(url)
        for _ in range(repeat):
            for s, pred, o, sc, oc, sl, ol in records:
                cols["doc_id"].append(did)
                cols["url"].append(url)
                cols["subj"].append(s)
                cols["pred"].append(pred)
                cols["obj"].append(o)
                cols["subj_canon"].append(sc)
                cols["obj_canon"].append(oc)
                cols["subj_label"].append(sl)
                cols["obj_label"].append(ol)
    return pa.table(cols, schema=EXPECTED_SCHEMA)


# --- corpus materialization ---------------------------------------------

# bump when generator/world semantics change: stale cached corpora under
# /tmp would otherwise silently disagree with the code that reads them
GEN_VERSION = 2


def corpus_dir_for(n_pages: int, seed: int = 7, root: str = "/tmp/kgray_corpus") -> str:
    return os.path.join(root, f"n{n_pages}_s{seed}_g{GEN_VERSION}")


def ensure_corpus(
    n_pages: int,
    seed: int = 7,
    root: str = "/tmp/kgray_corpus",
    rows_per_file: int = 2048,
) -> str:
    """Generate (idempotently) and return the corpus directory with
    ``pages/`` and ``expected_triples/`` parquet subdirs."""
    out = corpus_dir_for(n_pages, seed, root)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    pages_dir = os.path.join(out, "pages")
    expected_dir = os.path.join(out, "expected_triples")
    os.makedirs(pages_dir, exist_ok=True)
    os.makedirs(expected_dir, exist_ok=True)
    shard = rows_per_file
    bounds = [(lo, min(lo + shard, n_pages)) for lo in range(0, n_pages, shard)]

    use_ray = False
    if n_pages >= 20_000:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            pass
    if use_ray:
        # page content is a pure function of (seed, index) — shard
        # generation parallelizes trivially
        import ray

        @ray.remote
        def gen(lo: int, hi: int) -> None:
            _write_shard(lo, hi, seed, pages_dir, expected_dir)

        ray.get([gen.remote(lo, hi) for lo, hi in bounds])
    else:
        for lo, hi in bounds:
            _write_shard(lo, hi, seed, pages_dir, expected_dir)
    with open(marker, "w") as f:
        f.write(f"n_pages={n_pages} seed={seed}\n")
    return out


def _write_shard(lo: int, hi: int, seed: int, pages_dir: str, expected_dir: str) -> None:
    idx = np.arange(lo, hi, dtype=np.int64)
    pq.write_table(
        make_page_batch(idx, seed), os.path.join(pages_dir, f"part-{lo:08d}.parquet")
    )
    pq.write_table(
        make_expected_batch(idx, seed),
        os.path.join(expected_dir, f"part-{lo:08d}.parquet"),
    )


def n_pages_for_sf(sf_dir: str) -> int:
    """Corpus size tied to the driver's scale factor directories."""
    name = os.path.basename(os.path.normpath(sf_dir))
    table = {"sf0.001": 200, "sf0.01": 2000, "sf0.1": 20000}
    return table.get(name, 2000)
