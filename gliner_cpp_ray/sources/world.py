"""Deterministic entity world for the synthetic corpus and the KG stages.

Defines the closed-form ground truth everything is checked against:
entities (with alias surfaces), relation sentence templates (the exact
connective strings the relation extractor matches on), the NER
gazetteer, the alias dictionary for entity linking, and deterministic
unit embeddings for cosine re-ranking.  All derived tables (expected
triples, expected edges) are computable from this module plus the page
seed — no external data (BASELINE.json:input_hint).
"""

from __future__ import annotations

import hashlib

import numpy as np

# --- entity inventory ----------------------------------------------------
# (canonical_name, aliases...)  — aliases never nest inside one another.
COUNTRIES: dict[str, list[str]] = {
    "Ukraine": [],
    "France": [],
    "Germany": ["Deutschland"],
    "United States": ["USA", "America"],
    "United Kingdom": ["Britain"],
    "Japan": [],
    "Brazil": [],
    "Canada": [],
    "Spain": [],
    "Italy": [],
    "Poland": [],
    "China": [],
    "India": [],
    "Egypt": [],
    "Switzerland": [],
    "Australia": [],
}

# city -> (country_canon, aliases)
CITIES: dict[str, tuple[str, list[str]]] = {
    "Kyiv": ("Ukraine", ["Kiev"]),
    "Paris": ("France", []),
    "Berlin": ("Germany", []),
    "London": ("United Kingdom", []),
    "Tokyo": ("Japan", []),
    "Ottawa": ("Canada", []),
    "Madrid": ("Spain", []),
    "Rome": ("Italy", ["Roma"]),
    "Warsaw": ("Poland", ["Warszawa"]),
    "Beijing": ("China", []),
    "New Delhi": ("India", []),
    "Cairo": ("Egypt", []),
    "New York": ("United States", ["NYC"]),
    "San Francisco": ("United States", []),
    "Zürich": ("Switzerland", ["Zurich"]),
    "Köln": ("Germany", ["Cologne"]),
    "São Paulo": ("Brazil", []),
    "Kharkiv": ("Ukraine", []),
    "Lyon": ("France", []),
    "Munich": ("Germany", ["München"]),
    # deliberately ambiguous alias "Victoria": two city entities share the
    # surface; only embedding cosine re-ranking against sentence context
    # (the country on the other side of a located_in triple) disambiguates.
    "Victoria (Canada)": ("Canada", ["Victoria"]),
    "Victoria (Australia)": ("Australia", ["Victoria"]),
}

# person -> (birth_city_canon, aliases)
PEOPLE: dict[str, tuple[str, list[str]]] = {
    "Marie Curie": ("Warsaw", []),
    "Ada Lovelace": ("London", []),
    "Alan Turing": ("London", []),
    "Grace Hopper": ("New York", []),
    "Taras Shevchenko": ("Kyiv", []),
    "Blaise Pascal": ("Paris", []),
    "Max Planck": ("Munich", []),
    "Leonhard Euler": ("Zürich", []),
    "Santos Dumont": ("São Paulo", []),
    "Hideo Ito": ("Tokyo", []),
}

# org -> (hq_city_canon, aliases)  — fictional organizations.
ORGS: dict[str, tuple[str, list[str]]] = {
    "Acme Corp": ("New York", ["Acme"]),
    "Globex Systems": ("San Francisco", ["Globex"]),
    "Initech": ("Tokyo", []),
    "Umbrella Logistics": ("Berlin", []),
    "Vandelay Industries": ("London", ["Vandelay"]),
    "Hooli Labs": ("San Francisco", []),
    "Wernham Hogg": ("London", []),
    "Soylent Foods": ("Cairo", []),
    "Pied Piper": ("Paris", []),
    "Tyrell Analytics": ("Tokyo", []),
}

# (acquirer_canon, acquired_canon)
ACQUISITIONS: list[tuple[str, str]] = [
    ("Acme Corp", "Initech"),
    ("Globex Systems", "Pied Piper"),
    ("Umbrella Logistics", "Wernham Hogg"),
    ("Hooli Labs", "Tyrell Analytics"),
    ("Vandelay Industries", "Soylent Foods"),
]

LABEL_CITY = "city"
LABEL_COUNTRY = "country"
LABEL_PERSON = "person"
LABEL_ORG = "organization"
NER_LABELS = [LABEL_CITY, LABEL_COUNTRY, LABEL_PERSON, LABEL_ORG]

# --- relation templates --------------------------------------------------
# pred -> (subj_label, connective, obj_label).  The relation extractor
# matches the exact connective byte string between two adjacent mentions.
RELATIONS: dict[str, tuple[str, str, str]] = {
    "capital_of": (LABEL_CITY, " is the capital of ", LABEL_COUNTRY),
    "located_in": (LABEL_CITY, " is located in ", LABEL_COUNTRY),
    "born_in": (LABEL_PERSON, " was born in ", LABEL_CITY),
    "headquartered_in": (LABEL_ORG, " is headquartered in ", LABEL_CITY),
    "acquired": (LABEL_ORG, " acquired ", LABEL_ORG),
}

# capital pairs (subset of CITIES; the rest use located_in)
CAPITALS = {
    "Kyiv", "Paris", "Berlin", "London", "Tokyo", "Ottawa", "Madrid",
    "Rome", "Warsaw", "Beijing", "New Delhi", "Cairo",
}


def qid_of(label: str, canon: str) -> str:
    return "Q_" + label + "_" + canon.lower().replace(" ", "_")


def written_surfaces(canon: str, aliases: list[str]) -> list[str]:
    """Surfaces that actually appear in text.  Canonical names containing
    parentheses (disambiguation suffixes like "Victoria (Canada)") are
    identifiers only — never written; their aliases are."""
    if "(" in canon:
        return list(aliases)
    return [canon, *aliases]


def all_surfaces() -> dict[str, list[tuple[str, str, str]]]:
    """label -> [(surface, canon, qid)] including aliases."""
    out: dict[str, list[tuple[str, str, str]]] = {l: [] for l in NER_LABELS}
    for canon, aliases in COUNTRIES.items():
        for s in written_surfaces(canon, aliases):
            out[LABEL_COUNTRY].append((s, canon, qid_of(LABEL_COUNTRY, canon)))
    for canon, (_, aliases) in CITIES.items():
        for s in written_surfaces(canon, aliases):
            out[LABEL_CITY].append((s, canon, qid_of(LABEL_CITY, canon)))
    for canon, (_, aliases) in PEOPLE.items():
        for s in written_surfaces(canon, aliases):
            out[LABEL_PERSON].append((s, canon, qid_of(LABEL_PERSON, canon)))
    for canon, (_, aliases) in ORGS.items():
        for s in written_surfaces(canon, aliases):
            out[LABEL_ORG].append((s, canon, qid_of(LABEL_ORG, canon)))
    return out


def ner_gazetteer() -> dict[str, list[str]]:
    """label -> surfaces, for GazetteerScoringModel."""
    return {lbl: [s for s, _, _ in rows] for lbl, rows in all_surfaces().items()}


def alias_rows() -> list[dict]:
    """Alias dictionary for entity linking: one row per (surface, label)."""
    rows = []
    for lbl, entries in all_surfaces().items():
        for surface, canon, q in entries:
            rows.append(
                {
                    "alias_norm": normalize_surface(surface),
                    "label": lbl,
                    "qid": q,
                    "canon": canon,
                }
            )
    return rows


def normalize_surface(s: str) -> str:
    """Canonicalization key: casefold + strip + collapse inner whitespace."""
    return " ".join(s.casefold().split())


def _hash_vec(key: str, dim: int) -> np.ndarray:
    h = hashlib.sha256(key.encode("utf-8")).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


def _embed_anchors() -> dict[str, str]:
    """qid -> anchor key.  Cities anchor to their country, countries to
    themselves — so cosine(city_vec, country_vec) is high exactly when
    the city is in that country, making embedding re-ranking genuinely
    able to resolve ambiguous aliases from sentence context."""
    anchors: dict[str, str] = {}
    for canon in COUNTRIES:
        anchors[qid_of(LABEL_COUNTRY, canon)] = "country:" + canon
    for canon, (country, _) in CITIES.items():
        anchors[qid_of(LABEL_CITY, canon)] = "country:" + country
    return anchors


_ANCHORS = None


def entity_embedding(qid: str, dim: int = 32) -> np.ndarray:
    """Deterministic unit vector per entity.  Geo entities mix a shared
    country anchor (weight 0.8) with a per-entity component (0.2)."""
    global _ANCHORS
    if _ANCHORS is None:
        _ANCHORS = _embed_anchors()
    own = _hash_vec(qid, dim)
    anchor_key = _ANCHORS.get(qid)
    v = own if anchor_key is None else 0.8 * _hash_vec(anchor_key, dim) + 0.2 * own
    return (v / np.linalg.norm(v)).astype(np.float32)


# filler vocabulary (never forms a gazetteer surface: all lowercase)
FILLER_EN = (
    "the data stream joins with a fast sort and a small merge while the "
    "batch window keeps rows in order for the query engine and the table "
    "scan reads café pages with naïve text across many shards"
).split()
FILLER_BY_LANG = {
    "de": "die daten fließen durch das system und werden sortiert gruppiert".split(),
    "uk": "дані обробляються системою та сортуються за ключем щодня".split(),
    "zh": "数据 系统 处理 排序 分组 查询 表格 批次 流式 引擎".split(),
    "es": "los datos fluyen por el sistema y se ordenan por clave".split(),
}
MENTION_ONLY_TEMPLATES = [
    ("{city} has many museums and parks.", LABEL_CITY, "city"),
    ("{person} wrote several famous papers.", LABEL_PERSON, "person"),
    ("{org} reported strong results this year.", LABEL_ORG, "org"),
    ("{country} exports grain and machinery.", LABEL_COUNTRY, "country"),
]
